"""Shared implementation of the fake ``ffmpeg`` / ``ffprobe`` test binaries.

The CI image has no ffmpeg, so the real subprocess machinery of
``eve_tpu/data/video.py`` (pipe framing, frame-exact ``select`` picking,
``-ss`` input seeking, early-close reaping, probe parsing — the twin of the
reference's ``src/datasources/common.py:74-139``) would otherwise never
execute. These executables implement the SUBSET of the ffmpeg/ffprobe CLI
the framework emits, strictly (any unexpected argv exits non-zero, so a
regression in command construction fails loudly), decoding from a sidecar
file instead of the mp4 container:

    <video>.fakedecode.npz
        frames  (N, H, W, 3) uint8 RGB   — the "decoded" stream
        fps     ()           float       — container frame rate
        vfr     ()           bool        — if true, ffprobe reports
                                           avg_frame_rate != r_frame_rate
                                           (the CFR gate must then refuse
                                           to seek)

Semantics implemented (matching ffmpeg >= 2.1 behavior for CFR streams):
  * input ``-ss T`` before ``-i``: decode starts at the first frame with
    pts >= T, i.e. index ceil(T * fps) for CFR; output frame numbering
    (the ``n`` in ``select``) restarts at the seek point.
  * ``-vf select='eq(n,a)+eq(n,b)...'[,scale=W:H]``: emit each matching
    frame once, in stream order; scale resizes (the fake uses bilinear —
    scaler-kernel parity is NOT the point of these tests, framing and
    frame identity are).
  * rawvideo rgb24 frames stream to stdout one frame at a time; a closed
    pipe (reader early-close) terminates the fake silently, like the real
    binary being reaped.
"""

import os
import re
import sys

import numpy as np


def load_sidecar(video_path):
    sidecar = video_path + '.fakedecode.npz'
    if not os.path.isfile(sidecar):
        sys.stderr.write('fake-av: no sidecar %s\n' % sidecar)
        sys.exit(3)
    data = np.load(sidecar)
    return (data['frames'], float(data['fps']),
            bool(data['vfr']) if 'vfr' in data else False)


def write_sidecar(video_path, frames, fps, vfr=False):
    np.savez(video_path + '.fakedecode.npz',
             frames=np.asarray(frames, np.uint8), fps=float(fps),
             vfr=bool(vfr))


def _fail(msg):
    sys.stderr.write('fake-av: %s\n' % msg)
    sys.exit(2)


def fake_ffprobe(argv):
    want = ['-v', 'quiet', '-select_streams', 'v:0', '-show_entries']
    if argv[:len(want)] != want or len(argv) != len(want) + 4:
        _fail('unexpected ffprobe argv: %r' % (argv,))
    entries, of_flag, of_value, path = argv[len(want):]
    if of_flag != '-of' or of_value != 'csv=p=0':
        _fail('unexpected ffprobe output spec: %r' % (argv,))
    frames, fps, vfr = load_sidecar(path)
    if entries == 'stream=avg_frame_rate,r_frame_rate':
        num = int(round(fps * 1000))
        avg = '%d/1000' % num
        r = ('%d/1000' % (num * 2)) if vfr else avg
        sys.stdout.write('%s,%s\n' % (avg, r))
    elif entries == 'stream=width,height':
        sys.stdout.write('%d,%d\n' % (frames.shape[2], frames.shape[1]))
    else:
        _fail('unexpected ffprobe entries: %r' % entries)
    return 0


_SELECT_RE = re.compile(r"^select='((?:eq\(n,\d+\)\+?)+)'$")


def fake_ffmpeg(argv):
    args = list(argv)
    if args[:2] != ['-vsync', '0']:
        _fail('expected -vsync 0 first: %r' % (args,))
    args = args[2:]
    seek_s = None
    if args and args[0] == '-ss':
        seek_s = float(args[1])
        args = args[2:]
    if not args or args[0] != '-i':
        _fail('expected -i: %r' % (args,))
    path = args[1]
    args = args[2:]
    vf = None
    if args and args[0] == '-vf':
        vf = args[1]
        args = args[2:]
    if args != ['-f', 'rawvideo', '-pix_fmt', 'rgb24',
                '-loglevel', 'quiet', 'pipe:']:
        _fail('unexpected output spec: %r' % (args,))

    frames, fps, _ = load_sidecar(path)
    if seek_s is not None:
        # First frame with pts >= seek target (CFR: pts of frame i = i/fps).
        start = int(np.ceil(seek_s * fps - 1e-9))
        frames = frames[start:]

    indices = None
    scale = None
    if vf is not None:
        rest = vf
        if rest.startswith("select='"):
            end = rest.index("'", len("select='"))
            sel = rest[:end + 1]
            if not _SELECT_RE.match(sel):
                _fail('malformed select filter: %r' % sel)
            indices = [int(x) for x in re.findall(r'eq\(n,(\d+)\)', sel)]
            rest = rest[end + 1:]
            if rest.startswith(','):
                rest = rest[1:]
        if rest.startswith('scale='):
            w, h = rest[len('scale='):].split(':')
            scale = (int(w), int(h))
            rest = ''
        if rest:
            _fail('unexpected -vf remainder: %r in %r' % (rest, vf))

    if indices is not None:
        # select emits each matching frame once, in stream order.
        wanted = sorted(set(i for i in indices if i < len(frames)))
        frames = frames[wanted] if wanted else frames[:0]
    if scale is not None and frames.size:
        import cv2
        frames = np.stack([
            cv2.resize(f, scale, interpolation=cv2.INTER_LINEAR)
            for f in frames])

    out = sys.stdout.buffer
    try:
        for f in frames:
            out.write(np.ascontiguousarray(f, np.uint8).tobytes())
            out.flush()
    except BrokenPipeError:
        # Reader closed the pipe (early close) — exit quietly like the
        # real binary being reaped.
        os._exit(0)
    return 0
