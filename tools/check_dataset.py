#!/usr/bin/env python3
"""EVE dataset integrity checker.

Validates an on-disk EVE dataset tree (DATASET.md layout; reference
layout documented in /root/reference/DATASET.md) BEFORE a multi-hour
training run trips over it: missing/extra files, unparseable or
non-monotonic timestamps, HDF5 label arrays whose lengths disagree with
the frame timestamps, video frame counts that disagree with the
timestamp files, and (optionally) an actual decode probe per video.

Usage:
    python tools/check_dataset.py /data/eve [--cameras webcam_c ...]
        [--participants train01 ...] [--decode-probe] [--max-clips N]

Exit code 0 = no errors (warnings allowed), 1 = structural errors found.
Designed to run WITHOUT the full framework environment: h5py/cv2 are
optional — absent libraries skip their checks with a note.
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from eve_tpu.data.specs import (  # noqa: E402
    CAMERAS, predefined_splits, source_to_fps,
    stimulus_type_from_folder_name)

# Per-frame label groups the training pipeline consumes (dataset.py
# load_all_from_source). The tobii GT groups are withheld on the test
# split, so their absence is a warning, not an error.
REQUIRED_GROUPS = ('left_o', 'right_o', 'left_R', 'right_R', 'head_rvec',
                   'left_h', 'right_h', 'left_p', 'right_p')
GT_GROUPS = ('left_g_tobii', 'right_g_tobii',
             'left_PoG_tobii', 'right_PoG_tobii')
REQUIRED_SCALARS = ('camera_transformation', 'inv_camera_transformation',
                    'millimeters_per_pixel', 'pixels_per_millimeter')


class Report:
    def __init__(self, max_shown=40):
        self.errors = []
        self.warnings = []
        self.notes = []
        self.clips = 0
        self.cameras = 0
        self.max_shown = max_shown

    def error(self, where, msg):
        self.errors.append('%s: %s' % (where, msg))

    def warn(self, where, msg):
        self.warnings.append('%s: %s' % (where, msg))

    def note(self, msg):
        if msg not in self.notes:
            self.notes.append(msg)

    def dump(self, out=sys.stdout):
        for tag, items in (('ERROR', self.errors), ('WARN', self.warnings)):
            for line in items[:self.max_shown]:
                print('%s %s' % (tag, line), file=out)
            if len(items) > self.max_shown:
                print('%s ... and %d more' % (tag, len(items)
                                              - self.max_shown), file=out)
        for line in self.notes:
            print('NOTE %s' % line, file=out)
        print('checked %d clips / %d camera streams: %d errors, %d warnings'
              % (self.clips, self.cameras, len(self.errors),
                 len(self.warnings)), file=out)


def read_timestamps(path, report, where):
    """Parse a .timestamps.txt; returns the array or None on error."""
    try:
        ts = np.loadtxt(path, dtype=np.int64, ndmin=1)
    except (OSError, ValueError) as exc:
        report.error(where, 'unreadable timestamps (%s)' % exc)
        return None
    if ts.size == 0:
        report.error(where, 'empty timestamps file')
        return None
    deltas = np.diff(ts)
    if (deltas <= 0).any():
        report.error(where, 'timestamps not strictly increasing '
                            '(first violation at line %d)'
                     % (int(np.argmax(deltas <= 0)) + 2))
    return ts


def check_fps(ts, expected_fps, report, where):
    if ts is None or ts.size < 3:
        return
    median_ms = float(np.median(np.diff(ts))) / 1e6
    if median_ms <= 0:
        return
    fps = 1e3 / median_ms
    if abs(fps - expected_fps) > 0.2 * expected_fps:
        report.warn(where, 'median frame rate %.1f fps; expected ~%d fps'
                    % (fps, expected_fps))


def video_frame_count(path):
    """Container frame count via cv2 metadata; None if unavailable."""
    try:
        import cv2
    except ImportError:
        return None
    cap = cv2.VideoCapture(path)
    try:
        if not cap.isOpened():
            return -1  # distinguishable from "cv2 missing"
        return int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
    finally:
        cap.release()


def check_video(path, n_ts, report, where, decode_probe):
    if not os.path.isfile(path):
        report.error(where, 'missing video %s' % os.path.basename(path))
        return
    count = video_frame_count(path)
    if count is None:
        report.note('cv2 unavailable: video frame-count/decode checks '
                    'skipped')
    elif count == -1:
        report.error(where, 'cv2 cannot open %s' % os.path.basename(path))
    elif n_ts is not None and count != n_ts:
        # Container metadata can be off by a frame or two on sane files;
        # larger disagreement means truncated download or wrong pairing.
        level = report.warn if abs(count - n_ts) <= 2 else report.error
        level(where, '%s: %d container frames vs %d timestamps'
              % (os.path.basename(path), count, n_ts))
    if decode_probe and count not in (None, -1):
        from eve_tpu.data.video import VideoReader
        probe = sorted({0, max(0, (n_ts or count) - 1)})
        try:
            _, frames = VideoReader(path, frame_indices=probe).get_frames()
        except Exception as exc:  # noqa: BLE001 — report, keep scanning
            report.error(where, 'decode probe failed on %s (%s)'
                         % (os.path.basename(path), exc))
            return
        if frames.shape[0] < len(probe):
            report.error(where, 'decode probe returned %d/%d frames of %s'
                         % (frames.shape[0], len(probe),
                            os.path.basename(path)))


def check_h5(path, n_ts, report, where):
    try:
        import h5py
    except ImportError:
        report.note('h5py unavailable: label checks skipped')
        return
    try:
        hdf = h5py.File(path, 'r')
    except OSError as exc:
        report.error(where, 'unreadable h5 (%s)' % exc)
        return
    with hdf:
        groups, datasets = {}, set()
        for k, v in hdf.items():
            if isinstance(v, h5py.Group):
                if 'data' not in v or 'validity' not in v:
                    report.error(where, 'h5 group %s lacks data/validity'
                                 % k)
                    continue
                n_data, n_valid = v['data'].shape[0], v['validity'].shape[0]
                if n_data != n_valid:
                    report.error(where, 'h5 group %s: data rows %d != '
                                        'validity rows %d'
                                 % (k, n_data, n_valid))
                if n_ts is not None and n_data != n_ts:
                    report.error(where, 'h5 group %s: %d rows vs %d '
                                        'timestamps' % (k, n_data, n_ts))
                groups[k] = n_data
            else:
                datasets.add(k)
        for k in REQUIRED_GROUPS:
            if k not in groups:
                report.error(where, 'h5 missing required group %s' % k)
        missing_gt = [k for k in GT_GROUPS if k not in groups]
        if missing_gt:
            report.warn(where, 'h5 missing GT group(s) %s (expected on '
                               'the withheld test split)'
                        % ','.join(missing_gt))
        for k in REQUIRED_SCALARS:
            if k not in datasets:
                report.error(where, 'h5 missing dataset %s' % k)


def check_clip(path, cameras, report, decode_probe):
    """One stimulus directory: screen pair + each camera triple."""
    report.clips += 1
    name = os.path.basename(path)
    try:
        stimulus_type_from_folder_name(name)
    except (ValueError, IndexError):
        report.error(path, 'unrecognized stimulus folder name')

    screen_ts = None
    ts_path = os.path.join(path, 'screen.timestamps.txt')
    if os.path.isfile(ts_path):
        screen_ts = read_timestamps(ts_path, report, path)
        check_fps(screen_ts, source_to_fps['screen'], report, path)
        n = None if screen_ts is None else screen_ts.size
        check_video(os.path.join(path, 'screen.128x72.mp4'), n, report,
                    path, decode_probe)
    else:
        report.warn(path, 'no screen.timestamps.txt (refine_net configs '
                          'need screen content)')

    found_any = False
    for cam in cameras:
        ts_path = os.path.join(path, cam + '.timestamps.txt')
        h5_path = os.path.join(path, cam + '.h5')
        if not os.path.isfile(ts_path) and not os.path.isfile(h5_path):
            continue
        found_any = True
        report.cameras += 1
        where = os.path.join(path, cam)
        ts = read_timestamps(ts_path, report, where) \
            if os.path.isfile(ts_path) else None
        if ts is None and not os.path.isfile(ts_path):
            report.error(where, 'missing %s.timestamps.txt' % cam)
        check_fps(ts, source_to_fps[cam], report, where)
        n = None if ts is None else ts.size
        check_video(os.path.join(path, cam + '_eyes.mp4'), n, report,
                    where, decode_probe)
        if os.path.isfile(h5_path):
            check_h5(h5_path, n, report, where)
        else:
            report.error(where, 'missing %s.h5' % cam)
    if not found_any:
        report.error(path, 'no camera streams found (looked for: %s)'
                     % ', '.join(cameras))


def main(argv=None):
    parser = argparse.ArgumentParser(
        description='Validate an EVE dataset tree (DATASET.md layout).')
    parser.add_argument('root', help='dataset root (the --datasrc-eve dir)')
    parser.add_argument('--cameras', nargs='*', default=list(CAMERAS))
    parser.add_argument('--participants', nargs='*', default=None,
                        help='subset to check (default: all found)')
    parser.add_argument('--decode-probe', action='store_true',
                        help='decode first+last frame of every video '
                             '(slow; catches corrupt payloads metadata '
                             'checks miss)')
    parser.add_argument('--max-clips', type=int, default=0,
                        help='stop after N clips (0 = all)')
    args = parser.parse_args(argv)

    known = {p for split in predefined_splits.values() for p in split}
    report = Report()
    if not os.path.isdir(args.root):
        print('ERROR dataset root does not exist: %s' % args.root)
        return 1
    participants = sorted(
        d for d in os.listdir(args.root)
        if os.path.isdir(os.path.join(args.root, d)))
    if args.participants:
        missing = [p for p in args.participants if p not in participants]
        for p in missing:
            report.error(os.path.join(args.root, p),
                         'requested participant missing')
        participants = [p for p in participants if p in args.participants]
    if not participants:
        report.error(args.root, 'no participant directories found')
    for p in participants:
        if p not in known:
            report.warn(os.path.join(args.root, p),
                        'not a predefined split participant '
                        '(train01..39/val01..05/test01..10/etc01..02)')
        pdir = os.path.join(args.root, p)
        clips = sorted(d for d in os.listdir(pdir)
                       if os.path.isdir(os.path.join(pdir, d)))
        if not clips:
            report.warn(pdir, 'participant has no stimulus folders')
        for clip in clips:
            if args.max_clips and report.clips >= args.max_clips:
                report.note('stopped at --max-clips %d' % args.max_clips)
                break
            check_clip(os.path.join(pdir, clip), args.cameras, report,
                       args.decode_probe)

    report.dump()
    return 1 if report.errors else 0


if __name__ == '__main__':
    sys.exit(main())
