"""Data-layer tests over the on-disk synthetic EVE-layout dataset."""

import os

import numpy as np
import pytest

from eve_tpu.config import DefaultConfig
from eve_tpu.data import loader as loader_lib
from eve_tpu.data import segmentation as seg_lib
from eve_tpu.data.dataset import EVESequencesBase, rodrigues_np
from eve_tpu.data.synthetic import write_synthetic_dataset
from eve_tpu.data.video import VideoReader


@pytest.fixture(scope='module')
def dataset_root(tmp_path_factory):
    root = tmp_path_factory.mktemp('eve_synth')
    write_synthetic_dataset(str(root), participants=('train01', 'train02'),
                            num_frames=40)
    return str(root)


@pytest.fixture
def config(tmp_path):
    DefaultConfig._reset_instance_for_testing()
    cfg = DefaultConfig()
    cfg.import_dict({'max_sequence_len': 6, 'assumed_frame_rate': 10,
                     'load_screen_content': True})
    yield cfg
    DefaultConfig._reset_instance_for_testing()


def make_dataset(dataset_root, config, tmp_path, **kw):
    return EVESequencesBase(
        dataset_root, config=config, participants_to_use=['train01'],
        cameras_to_use=['webcam_c'], types_of_stimuli=['image'],
        cache_dir=str(tmp_path / 'segcache'), **kw)


def test_video_reader_frame_exact(dataset_root):
    video = os.path.join(dataset_root, 'train01', 'step008_image_test',
                         'webcam_c_eyes.mp4')
    indices = [0, 3, 6, 9, 12]
    ts, frames = VideoReader(video, frame_indices=indices).get_frames()
    assert frames.shape == (5, 128, 256, 3)
    assert len(ts) == 5
    # The top band encodes the frame index (5 + 6*i), codec-lossy tolerance
    # (probe the inner rows of the 128//12=10-row band, clear of edge blur).
    for j, i in enumerate(indices):
        expected = 5 + 6 * i
        got = float(frames[j][2:6].mean())
        assert abs(got - expected) < 6, (i, expected, got)


def test_segmentation_cache(dataset_root, config, tmp_path):
    segs = seg_lib.build_segmentation_cache(
        dataset_root, 10, 6, cache_dir=str(tmp_path / 'segcache'))
    cam = segs['train01']['step008_image_test']['webcam_c']
    # 40 frames at 30 fps, 6-frame windows at 10 Hz -> window 18, interval 3:
    # segments [0..17:3], [18..35:3], [36..39:3]
    assert cam[0] == [0, 3, 6, 9, 12, 15]
    assert cam[1] == [18, 21, 24, 27, 30, 33]
    assert cam[2] == [36, 39]
    # screen at 30 fps has identical segmentation
    assert segs['train01']['step008_image_test']['screen'] == cam


def test_dataset_getitem(dataset_root, config, tmp_path):
    ds = make_dataset(dataset_root, config, tmp_path)
    assert len(ds) == 3  # 3 windows for 1 participant/stimulus/camera
    item = ds[0]
    assert item['left_eye_patch'].shape == (6, 128, 128, 3)
    assert item['right_eye_patch'].shape == (6, 128, 128, 3)
    assert item['screen_frame'].shape == (6, 72, 128, 3)
    assert item['left_eye_patch'].dtype == np.float32
    assert item['left_eye_patch'].min() >= -1.0
    assert item['left_eye_patch'].max() <= 1.0
    assert item['screen_frame'].min() >= 0.0
    assert item['timestamps'].dtype == np.int64
    assert item['head_R'].shape == (6, 3, 3)
    assert item['left_PoG_tobii'].shape == (6, 2)
    assert item['camera_transformation'].shape == (6, 4, 4)
    assert item['participant'] == 'train01'
    assert item['camera'] == 'webcam_c'
    # Eye split: left patch is the RIGHT half of the strip
    # (reference eve_sequences.py:283-285).


def test_dataset_padding(dataset_root, config, tmp_path):
    ds = make_dataset(dataset_root, config, tmp_path)
    item = ds[2]  # partial window: 2 frames padded to 6
    assert item['left_eye_patch'].shape == (6, 128, 128, 3)
    assert item['timestamps'][2:].tolist() == [0, 0, 0, 0]
    np.testing.assert_array_equal(item['left_eye_patch'][2:], 0.0)
    assert item['left_PoG_tobii_validity'][:2].all()
    assert not item['left_PoG_tobii_validity'][2:].any()


def test_basler_60fps_decimation(tmp_path_factory, config, tmp_path):
    """The 60 fps basler camera decimates by 6 to the assumed 10 Hz (the
    webcams by 3); the segmentation and decode must stay frame-exact."""
    root = str(tmp_path_factory.mktemp('eve_synth_basler'))
    write_synthetic_dataset(root, participants=('train01',),
                            cameras=('basler',), num_frames=40)
    segs = seg_lib.build_segmentation_cache(
        root, 10, 6, cache_dir=str(tmp_path / 'segcache'))
    cam = segs['train01']['step008_image_test']['basler']
    # 80 basler frames at 60 fps: 6-frame windows cover 36 frames, skip 6.
    assert cam[0] == [0, 6, 12, 18, 24, 30]
    assert cam[1] == [36, 42, 48, 54, 60, 66]

    ds = EVESequencesBase(
        root, config=config, participants_to_use=['train01'],
        cameras_to_use=['basler'], types_of_stimuli=['image'],
        cache_dir=str(tmp_path / 'segcache'))
    item = ds[0]
    # The top band encodes the frame index (5 + 6*i); patches are in [-1, 1].
    for t, i in enumerate(cam[0]):
        got = (float(item['left_eye_patch'][t][2:6].mean()) + 1.0) \
            * (255.0 / 2.0)
        assert abs(got - (5 + 6 * i)) < 6, (t, i, got)


def test_async_reader_matches_sync(dataset_root):
    """AsyncVideoReader must yield exactly the sync reader's frames and
    timestamps, on every available backend, including frame picking and
    scaling (reference async-mode semantics, common.py:141-172)."""
    from eve_tpu.data.video import AsyncVideoReader, _FFMPEG
    video = os.path.join(dataset_root, 'train01', 'step008_image_test',
                         'webcam_c_eyes.mp4')
    backends = ['cv2'] + (['ffmpeg'] if _FFMPEG else [])
    for backend in backends:
        for indices, size in ((None, None), ([0, 3, 6, 9], (64, 32))):
            sync_ts, sync_frames = VideoReader(
                video, frame_indices=indices, output_size=size,
                backend=backend).get_frames()
            with AsyncVideoReader(video, frame_indices=indices,
                                  output_size=size,
                                  backend=backend) as rd:
                got = list(rd)
            assert len(got) == len(sync_frames), (backend, indices)
            for (ts, frame), want_ts, want_frame in zip(
                    got, sync_ts, sync_frames):
                assert ts == want_ts
                np.testing.assert_array_equal(frame, want_frame,
                                              err_msg=str((backend, indices)))


def test_async_reader_rejects_nonmonotonic_indices(dataset_root):
    """Duplicates / reordered frame_indices cannot stream; a loud error
    beats silently truncating and mispairing (timestamp, frame)."""
    from eve_tpu.data.video import AsyncVideoReader
    video = os.path.join(dataset_root, 'train01', 'step008_image_test',
                         'webcam_c_eyes.mp4')
    for bad in ([3, 1, 1], [0, 2, 2], [5, 4]):
        with pytest.raises(ValueError, match='strictly increasing'):
            AsyncVideoReader(video, frame_indices=bad)


def test_async_reader_early_close(dataset_root):
    """Stopping mid-stream must not leak the ffmpeg subprocess."""
    from eve_tpu.data.video import AsyncVideoReader, _FFMPEG
    if not _FFMPEG:
        pytest.skip('no ffmpeg binary')
    video = os.path.join(dataset_root, 'train01', 'step008_image_test',
                         'webcam_c_eyes.mp4')
    with AsyncVideoReader(video, backend='ffmpeg') as rd:
        it = iter(rd)
        next(it)
        next(it)
    assert rd._proc is None  # closed by the context manager


def test_gaze_patch_encoding_roundtrip():
    """render_gaze_patches must be invertible to ~1px precision: the fixture
    only proves the pixels->gaze learning path if the pixels really do
    determine the gaze."""
    from eve_tpu.data.synthetic import (
        render_gaze_patches, decode_gaze_from_patch, GAZE_ENC_RANGE)
    rng = np.random.RandomState(3)
    g = rng.uniform(-0.45, 0.45, (16, 2)).astype(np.float32)
    patches = render_gaze_patches(g, 128)
    assert patches.shape == (16, 128, 128, 3)
    decoded = decode_gaze_from_patch(patches)
    np.testing.assert_allclose(decoded, g, atol=0.02)
    assert GAZE_ENC_RANGE >= 0.5  # fixture gazes stay inside full scale


def test_dataset_gaze_encoding_survives_codec(dataset_root, config, tmp_path):
    """Eye patches decoded from the mp4 must still encode the h5 gaze: the
    learnable mapping has to survive the lossy video round-trip."""
    from eve_tpu.data.synthetic import decode_gaze_from_patch
    ds = make_dataset(dataset_root, config, tmp_path)
    item = ds[0]
    for side in ('left', 'right'):
        patch = (item[side + '_eye_patch'] + 1.0) * (255.0 / 2.0)
        decoded = decode_gaze_from_patch(patch)
        valid = item[side + '_g_tobii_validity'] > 0
        err = np.abs(decoded - item[side + '_g_tobii'])[valid]
        assert err.max() < 0.06, (side, err.max())


def test_rodrigues_roundtrip(dataset_root, config, tmp_path):
    ds = make_dataset(dataset_root, config, tmp_path)
    item = ds[0]
    # head_R computed from head_rvec must be orthonormal with det 1
    for R in item['head_R']:
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
        assert abs(np.linalg.det(R) - 1.0) < 1e-5


def test_loader_batching_and_device(dataset_root, config, tmp_path):
    ds = make_dataset(dataset_root, config, tmp_path)
    dl = loader_lib.DataLoader(ds, batch_size=2, shuffle=True, drop_last=True,
                               num_workers=2, seed=0)
    assert len(dl) == 1
    batches = list(dl)
    assert len(batches) == 1
    batch = batches[0]
    assert batch['left_eye_patch'].shape == (2, 6, 128, 128, 3)
    assert isinstance(batch['participant'], list)

    device_batch, host = loader_lib.to_device_arrays(batch)
    assert 'participant' in host and 'participant' not in device_batch
    assert 'timestamps_ns' in host
    ts = np.asarray(device_batch['timestamps'])
    assert ts.dtype == np.float32
    real = ts[ts > 0]
    assert real.min() == 1.0  # rebased
    assert real.max() < 1e10


def test_loader_workers_match_serial(dataset_root, config, tmp_path):
    ds = make_dataset(dataset_root, config, tmp_path)
    dl0 = loader_lib.DataLoader(ds, batch_size=3, num_workers=0)
    dl2 = loader_lib.DataLoader(ds, batch_size=3, num_workers=2)
    b0, b2 = next(iter(dl0)), next(iter(dl2))
    for k in b0:
        if k in loader_lib.STRING_KEYS:
            assert b0[k] == b2[k]
        else:
            np.testing.assert_array_equal(b0[k], b2[k])


def test_device_prefetcher_releases_producer_on_abandon():
    """An abandoned consumer must release the producer thread even when it
    is blocked on a full queue — including the sentinel/exception puts."""
    import threading
    import time as time_lib

    batches = [{'x': np.zeros(4, np.float32)} for _ in range(50)]
    before = set(threading.enumerate())
    prefetcher = loader_lib.DevicePrefetcher(batches, device_put=lambda d: d,
                                             depth=1)
    it = iter(prefetcher)
    next(it)
    it.close()  # abandon mid-iteration with the queue full

    extra = []
    deadline = time_lib.time() + 10.0
    while time_lib.time() < deadline:
        extra = [t for t in set(threading.enumerate()) - before
                 if t.is_alive()]
        if not extra:
            break
        time_lib.sleep(0.05)
    assert not extra, 'producer thread leaked: %r' % extra


def test_device_prefetcher_propagates_producer_error():
    class Boom(RuntimeError):
        pass

    def bad_loader():
        yield {'x': np.zeros(2, np.float32)}
        raise Boom('decode failed')

    prefetcher = loader_lib.DevicePrefetcher(bad_loader(),
                                             device_put=lambda d: d)
    it = iter(prefetcher)
    next(it)
    with pytest.raises(Boom):
        next(it)


@pytest.mark.slow
def test_end_to_end_forward_from_disk(dataset_root, config, tmp_path):
    """Disk -> loader -> EVE forward: the full input contract in one test."""
    import jax
    from eve_tpu.models import eve as eve_lib
    ds = make_dataset(dataset_root, config, tmp_path)
    dl = loader_lib.DataLoader(ds, batch_size=2, num_workers=0)
    batch = next(iter(dl))
    device_batch, host = loader_lib.to_device_arrays(batch)
    # Drop screen-only auxiliary keys the model does not consume.
    spec = eve_lib.EveSpec(refine_net_enabled=True, load_screen_content=True)
    params = eve_lib.init_params(spec, jax.random.PRNGKey(0))
    out = eve_lib.forward(spec, params, device_batch, training=False,
                          output_predictions=True)
    assert np.isfinite(float(out['full_loss']))
    assert out['PoG_px_final'].shape == (2, 6, 2)
    # Untrained eye-net outputs zero gaze (zero-init head); the projected
    # PoG must still be on-screen and finite.
    assert np.isfinite(np.asarray(out['PoG_px_initial'])).all()


def test_camera_frame_type_full(dataset_root, config, tmp_path):
    """camera_frame_type='full' loads the raw camera video as 'frame'."""
    config.import_dict({'camera_frame_type': 'full',
                        'load_screen_content': False})
    ds = make_dataset(dataset_root, config, tmp_path)
    item = ds[0]
    assert 'frame' in item and 'left_eye_patch' not in item
    # Synthetic full-frame stand-in video is 192x108; values in [-1, 1].
    assert item['frame'].shape == (6, 108, 192, 3)
    assert item['frame'].dtype == np.float32
    assert item['frame'].min() >= -1.0 and item['frame'].max() <= 1.0


def test_live_validation_cache_is_per_clip(dataset_root, config, tmp_path):
    """Distinct windows of one video must not collide in the live-val cache.

    (The reference keys its cache by path/source only — eve_sequences.py:312
    — returning window 0's data for every window; intended behavior here.)
    """
    config.import_dict({'load_screen_content': False})
    ds = make_dataset(dataset_root, config, tmp_path, live_validation=True)
    assert len(ds) >= 2
    a0 = ds[0]
    a1 = ds[1]
    assert not np.array_equal(a0['timestamps'], a1['timestamps'])
    # Cached re-reads return the right entries.
    np.testing.assert_array_equal(ds[0]['timestamps'], a0['timestamps'])
    np.testing.assert_array_equal(ds[1]['timestamps'], a1['timestamps'])


def test_final_test_cache_threaded(dataset_root, config, tmp_path):
    """The final-test whole-video cache is shared by worker THREADS
    (full_test_data_workers); concurrent __getitem__ across clip
    boundaries must neither crash nor corrupt items."""
    import threading

    ds = make_dataset(dataset_root, config, tmp_path, is_final_test=True)
    serial = [ds[i] for i in range(len(ds))]

    ds2 = make_dataset(dataset_root, config, tmp_path, is_final_test=True)
    results = [None] * len(ds2)
    errors = []

    def fetch(i):
        try:
            results[i] = ds2[i]
        except Exception as e:  # noqa: BLE001
            errors.append((i, e))

    for _ in range(3):  # several rounds to shake out interleavings
        threads = [threading.Thread(target=fetch, args=(i,))
                   for i in range(len(ds2))]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
    assert not errors, errors
    for i, (a, b) in enumerate(zip(serial, results)):
        np.testing.assert_array_equal(a['left_eye_patch'],
                                      b['left_eye_patch'], err_msg=str(i))
        np.testing.assert_array_equal(a['timestamps'], b['timestamps'])


def test_final_test_tolerates_truncated_video(dataset_root, config,
                                              tmp_path):
    """A video that decodes fewer frames than its timestamps list claims
    yields zero-validity padding, not an IndexError (whole-video path)."""
    import shutil

    root = tmp_path / 'trunc'
    shutil.copytree(dataset_root, root)
    # Truncate the EYES video to its first 12 frames (cv2 re-encode; no
    # ffmpeg binary on this host). camera_frame_type defaults to 'eyes',
    # so webcam_c_eyes.mp4 is the stream the dataset actually decodes.
    import cv2

    folder = next((root / 'train01').glob('step*image*'))
    video = str(folder / 'webcam_c_eyes.mp4')
    cap = cv2.VideoCapture(video)
    frames = []
    for _ in range(12):
        ok, frame = cap.read()
        assert ok
        frames.append(frame)
    cap.release()
    h, w = frames[0].shape[:2]
    cut = str(folder / 'cut.mp4')
    writer = cv2.VideoWriter(cut, cv2.VideoWriter_fourcc(*'mp4v'),
                             30.0, (w, h))
    for frame in frames:
        writer.write(frame)
    writer.release()
    os.replace(cut, video)

    ds = EVESequencesBase(
        str(root), config=config, participants_to_use=['train01'],
        cameras_to_use=['webcam_c'], types_of_stimuli=['image'],
        cache_dir=str(tmp_path / 'segcache_trunc'), is_final_test=True)
    saw_truncated = False
    for i in range(len(ds)):
        item = ds[i]  # must not raise
        T = item['left_eye_patch'].shape[0]
        assert T == config.max_sequence_len
        # Frames beyond the truncation are zero-validity padding.
        if not bool(item['left_o_validity'].all()):
            saw_truncated = True
            assert item['left_eye_patch'][-1].max() == 0.0
    assert saw_truncated, 'truncation never bit; the test would be vacuous'


# -- fast-seek frame exactness -----------------------------------------


@pytest.fixture(scope='module')
def fingerprint_video(tmp_path_factory):
    """A 200-frame mp4 whose frames carry a compression-robust binary
    fingerprint (large black/white blocks encoding the frame index), plus
    a matching timestamps file. Small per-pixel index encodings are
    destroyed by mp4v quantization — measured on this host — so exactness
    tests MUST use block fingerprints."""
    import cv2

    root = tmp_path_factory.mktemp('seek')
    path = str(root / 'cam.mp4')
    w, h, bits, n = 128, 72, 8, 200
    writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*'mp4v'),
                             30.0, (w, h))
    for i in range(n):
        frame = np.zeros((h, w, 3), np.uint8)
        for b in range(bits):
            if (i >> b) & 1:
                frame[:36, b * 16:(b + 1) * 16, :] = 255
        writer.write(frame)
    writer.release()
    # Claim 300 frames in the timestamps file while the video has 200:
    # mimics a truncated video (the dataset's tolerance path) so tests can
    # request label-valid indices beyond the decodable range.
    np.savetxt(str(root / 'cam.timestamps.txt'),
               (np.arange(n + 100, dtype=np.int64) + 1) * 33_000_000,
               fmt='%d')
    return path


def _fingerprint(frame, bits=8):
    value = 0
    for b in range(bits):
        if frame[18, b * 16 + 8, 0] > 127:
            value |= 1 << b
    return value


def test_cv2_seek_is_frame_exact(fingerprint_video, monkeypatch):
    """Fast-seek decode returns byte-identical frames to the sequential
    scan, and the frames are the absolutely-correct indices (fingerprint
    check), including mid-GOP and late-window positions."""
    for indices in ([150, 153, 156, 159], [1], [37, 38, 39],
                    [0, 100, 199], [199]):
        monkeypatch.setenv('EVE_VIDEO_SEEK', '0')
        ts_scan, frames_scan = VideoReader(
            fingerprint_video, frame_indices=indices).get_frames()
        monkeypatch.setenv('EVE_VIDEO_SEEK', '1')
        ts_seek, frames_seek = VideoReader(
            fingerprint_video, frame_indices=indices).get_frames()
        np.testing.assert_array_equal(ts_scan, ts_seek)
        np.testing.assert_array_equal(frames_scan, frames_seek)
        for j, i in enumerate(indices):
            assert _fingerprint(frames_seek[j]) == i, (indices, i)


def test_cv2_seek_duplicate_and_reordered_indices(fingerprint_video,
                                                  monkeypatch):
    monkeypatch.setenv('EVE_VIDEO_SEEK', '1')
    indices = [120, 110, 120, 115]
    _, frames = VideoReader(
        fingerprint_video, frame_indices=indices).get_frames()
    assert [_fingerprint(f) for f in frames] == indices


def test_cv2_seek_beyond_eof_returns_empty(fingerprint_video, monkeypatch):
    """Indices within the timestamps file but beyond the decodable video
    (truncated file) return zero frames — the dataset's padding path then
    zeroes validity — rather than raising or returning wrong frames."""
    monkeypatch.setenv('EVE_VIDEO_SEEK', '1')
    ts, frames = VideoReader(
        fingerprint_video, frame_indices=[250, 260]).get_frames()
    assert frames.shape[0] == 0


def test_empty_index_list_returns_empty(fingerprint_video):
    ts, frames = VideoReader(
        fingerprint_video, frame_indices=[]).get_frames()
    assert frames.shape[0] == 0 and ts.shape[0] == 0


def test_async_cv2_seek_matches_sync(fingerprint_video, monkeypatch):
    from eve_tpu.data.video import AsyncVideoReader

    monkeypatch.setenv('EVE_VIDEO_SEEK', '1')
    indices = [140, 145, 150]
    sync_ts, sync_frames = VideoReader(
        fingerprint_video, frame_indices=indices).get_frames()
    with AsyncVideoReader(fingerprint_video, frame_indices=indices,
                          backend='cv2') as reader:
        pairs = list(reader)
    assert len(pairs) == len(indices)
    for j, (ts, frame) in enumerate(pairs):
        assert ts == sync_ts[j]
        np.testing.assert_array_equal(frame, sync_frames[j])
        assert _fingerprint(frame) == indices[j]


def test_ffmpeg_pipe_cmd_seek_construction():
    """The ffmpeg command builder (no binary on this host; the builder is
    pure) places an input-side -ss strictly before -i, targets the
    midpoint between frames first-1 and first, and rebases the select
    indices by the first wanted frame (output frame numbering restarts at
    the seek point)."""
    from eve_tpu.data.video import ffmpeg_pipe_cmd

    cmd = ffmpeg_pipe_cmd('v.mp4', [150, 153, 156], (64, 64), fps=30.0)
    assert cmd.index('-ss') < cmd.index('-i')
    assert cmd[cmd.index('-ss') + 1] == '%.6f' % (149.5 / 30.0)
    vf = cmd[cmd.index('-vf') + 1]
    assert "select='eq(n,0)+eq(n,3)+eq(n,6)'" in vf
    assert 'scale=64:64' in vf

    # Early windows (seek saves <2s of decode) and seek=False keep the
    # reference's absolute-index command exactly.
    for kwargs in ({'fps': 30.0}, {'fps': None}, {'fps': 30.0,
                                                  'seek': False}):
        cmd = ffmpeg_pipe_cmd('v.mp4', [3, 6, 9], (64, 64), **kwargs)
        assert '-ss' not in cmd
        assert "eq(n,3)+eq(n,6)+eq(n,9)" in cmd[cmd.index('-vf') + 1]

    # Unknown fps (VFR / no ffprobe) must never seek even for late windows.
    cmd = ffmpeg_pipe_cmd('v.mp4', [150, 153], None, fps=None)
    assert '-ss' not in cmd
    assert "eq(n,150)+eq(n,153)" in cmd[cmd.index('-vf') + 1]


def test_probe_cfr_fps_parsing(monkeypatch):
    from eve_tpu.data import video as video_lib

    monkeypatch.setattr(video_lib, '_FFPROBE', '/usr/bin/ffprobe')
    cases = [
        ('30/1,30/1', 30.0),          # CFR
        ('30000/1001,30000/1001', 30000.0 / 1001.0),  # NTSC CFR
        ('25/1,30/1', None),          # VFR signature: avg != r
        ('0/0,30/1', None),           # malformed
        ('garbage', None),
    ]
    for raw, expected in cases:
        monkeypatch.setattr(
            video_lib.subprocess, 'check_output',
            lambda *a, raw=raw, **k: (raw + '\n').encode())
        got = video_lib._probe_cfr_fps('v.mp4')
        if expected is None:
            assert got is None, raw
        else:
            assert got == pytest.approx(expected), raw


def test_cv2_seek_straddling_eof(fingerprint_video, monkeypatch):
    """An index list partly beyond the decodable range of a truncated
    video returns the in-range prefix (the dataset's alignment then
    zeroes validity for the tail) — sync and async paths."""
    from eve_tpu.data.video import AsyncVideoReader

    monkeypatch.setenv('EVE_VIDEO_SEEK', '1')
    indices = [190, 195, 250]
    ts, frames = VideoReader(
        fingerprint_video, frame_indices=indices).get_frames()
    assert ts.shape[0] == 3  # timestamps file claims 300 frames
    assert frames.shape[0] == 2
    assert [_fingerprint(f) for f in frames] == [190, 195]

    with AsyncVideoReader(fingerprint_video, frame_indices=indices,
                          backend='cv2') as reader:
        pairs = list(reader)
    assert len(pairs) == 2
    assert [_fingerprint(f) for _, f in pairs] == [190, 195]


def test_seek_verify_mode(fingerprint_video, monkeypatch):
    """EVE_VIDEO_SEEK=verify cross-checks the first seek-decode of each
    video against the sequential scan, then trusts seeks for that video;
    a divergent seek-decode raises instead of returning wrong frames."""
    from eve_tpu.data import video as video_lib

    monkeypatch.setenv('EVE_VIDEO_SEEK', 'verify')
    with video_lib._VERIFIED_SEEK_LOCK:
        video_lib._VERIFIED_SEEK_PATHS.clear()

    indices = [150, 153, 156]
    _, frames = VideoReader(
        fingerprint_video, frame_indices=indices).get_frames()
    assert [_fingerprint(f) for f in frames] == indices
    assert video_lib._seek_verified('cv2', fingerprint_video)

    # Simulate a codec whose seek lands wrong: corrupt the seek-decode.
    with video_lib._VERIFIED_SEEK_LOCK:
        video_lib._VERIFIED_SEEK_PATHS.clear()
    original = video_lib.VideoReader._decode_cv2

    def corrupted(self, use_seek=True):
        frames = original(self, use_seek=use_seek)
        if use_seek and frames.size:
            frames = frames.copy()
            frames[0, 0, 0, 0] ^= 0xFF
        return frames

    monkeypatch.setattr(video_lib.VideoReader, '_decode_cv2', corrupted)
    with pytest.raises(RuntimeError, match='does not match'):
        VideoReader(fingerprint_video, frame_indices=indices).get_frames()
    assert not video_lib._seek_verified('cv2', fingerprint_video)


def test_empty_decode_keeps_frame_dims(fingerprint_video, monkeypatch):
    """Zero-frame decodes must return (0, H, W, 3) with REAL dims so the
    dataset's zero-padding yields correctly-shaped clips that still stack
    into a batch (a (T, 0, 0, 3) clip would crash collate)."""
    monkeypatch.setenv('EVE_VIDEO_SEEK', '1')
    _, frames = VideoReader(fingerprint_video, frame_indices=[250, 260],
                            output_size=(64, 48)).get_frames()
    assert frames.shape == (0, 48, 64, 3)
    _, frames = VideoReader(fingerprint_video,
                            frame_indices=[250, 260]).get_frames()
    assert frames.shape == (0, 72, 128, 3)  # probed native size
    _, frames = VideoReader(fingerprint_video,
                            frame_indices=[]).get_frames()
    assert frames.shape == (0, 72, 128, 3)


def test_windowed_truncated_video_keeps_batch_shape(dataset_root, config,
                                                    tmp_path):
    """WINDOWED (training) items over a truncated video: windows fully
    beyond the decodable range still produce full-shape zero-validity
    clips, and scalar-derived labels (camera matrices) keep their real
    repeated values in padded rows (reference parity: the reference's pad
    loop never touches full-length repeated scalars)."""
    import shutil

    import cv2

    root = tmp_path / 'trunc_windowed'
    shutil.copytree(dataset_root, root)
    folder = next((root / 'train01').glob('step*image*'))
    for name in ('webcam_c_eyes.mp4', 'webcam_c.128x72.mp4'):
        video = str(folder / name)
        if not os.path.exists(video):
            continue
        cap = cv2.VideoCapture(video)
        frames = []
        for _ in range(12):
            ok, frame = cap.read()
            assert ok
            frames.append(frame)
        cap.release()
        h, w = frames[0].shape[:2]
        cut = str(folder / 'cut.mp4')
        writer = cv2.VideoWriter(cut, cv2.VideoWriter_fourcc(*'mp4v'),
                                 30.0, (w, h))
        for frame in frames:
            writer.write(frame)
        writer.release()
        os.replace(cut, video)

    ds = EVESequencesBase(
        str(root), config=config, participants_to_use=['train01'],
        cameras_to_use=['webcam_c'], types_of_stimuli=['image'],
        cache_dir=str(tmp_path / 'segcache_tw'))
    saw_fully_truncated = False
    items = [ds[i] for i in range(len(ds))]
    for item in items:
        assert item['left_eye_patch'].shape[0] == config.max_sequence_len
        if not bool(item['left_o_validity'].any()):
            saw_fully_truncated = True
        # Scalar-derived labels stay real (non-zero) at every row.
        assert np.abs(item['camera_transformation']).sum(axis=(1, 2)).min() > 0
    assert saw_fully_truncated, \
        'no fully-truncated window; the test would be vacuous'
    # And the items still stack into a batch.
    from eve_tpu.data.loader import collate
    batch = collate(items)
    assert batch['left_eye_patch'].shape[0] == len(items)


def _fake_ffmpeg_reader(monkeypatch, frames_by_cmd):
    """Install a VideoReader with backend='ffmpeg' whose subprocess pipe is
    simulated: frames_by_cmd(cmd) -> list of per-frame fill values (1x2
    RGB frames). No ffmpeg binary exists on this host, so the remap and
    verify logic is pinned against a mock pipe."""
    from eve_tpu.data import video as video_lib

    class FakeCompleted:
        def __init__(self, stdout):
            self.stdout = stdout

    def fake_run(cmd, stdout=None, check=False):
        values = frames_by_cmd(cmd)
        raw = b''.join(bytes([v]) * 6 for v in values)  # 1x2x3 per frame
        return FakeCompleted(raw)

    monkeypatch.setattr(video_lib, '_FFMPEG', '/usr/bin/ffmpeg')
    monkeypatch.setattr(video_lib.subprocess, 'run', fake_run)
    monkeypatch.setattr(video_lib, '_probe_cfr_fps_cached',
                        lambda path: 30.0)
    return video_lib


def test_ffmpeg_decode_honors_request_order(fingerprint_video, monkeypatch):
    """The ffmpeg backend's select filter emits each frame once in stream
    order; the reader must remap to the requested order with duplicates —
    the same contract the cv2 backend honors."""
    def frames_for(cmd):
        vf = cmd[cmd.index('-vf') + 1]
        # extract the select indices in stream order
        import re
        idx = [int(m) for m in re.findall(r'eq\(n,(\d+)\)', vf)]
        assert idx == sorted(set(idx)), 'must request sorted-unique'
        return [i % 251 for i in idx]

    _fake_ffmpeg_reader(monkeypatch, frames_for)
    monkeypatch.setenv('EVE_VIDEO_SEEK', '0')
    reader = VideoReader(fingerprint_video,
                         frame_indices=[120, 110, 120, 115],
                         output_size=(2, 1), backend='ffmpeg')
    _, frames = reader.get_frames()
    assert frames.shape == (4, 1, 2, 3)
    assert [int(f[0, 0, 0]) for f in frames] == [120, 110, 120, 115]


def test_ffmpeg_verify_mode_cross_checks(fingerprint_video, monkeypatch):
    """EVE_VIDEO_SEEK=verify must cover the ffmpeg backend too: a seek
    pipe that disagrees with the sequential pipe raises; agreement marks
    the video verified (per backend)."""
    from eve_tpu.data import video as video_lib

    def consistent(cmd):
        import re
        vf = cmd[cmd.index('-vf') + 1]
        idx = [int(m) for m in re.findall(r'eq\(n,(\d+)\)', vf)]
        if '-ss' in cmd:  # rebased: recover absolute via the seek target
            base = int(round(float(cmd[cmd.index('-ss') + 1]) * 30.0 + 0.5))
            idx = [i + base for i in idx]
        return [i % 251 for i in idx]

    def broken(cmd):
        good = consistent(cmd)
        if '-ss' in cmd:
            return [(v + 1) % 251 for v in good]  # off-by-one seek
        return good

    monkeypatch.setenv('EVE_VIDEO_SEEK', 'verify')
    with video_lib._VERIFIED_SEEK_LOCK:
        video_lib._VERIFIED_SEEK_PATHS.clear()

    _fake_ffmpeg_reader(monkeypatch, broken)
    with pytest.raises(RuntimeError, match='not frame-exact'):
        VideoReader(fingerprint_video, frame_indices=[150, 153],
                    output_size=(2, 1), backend='ffmpeg').get_frames()

    _fake_ffmpeg_reader(monkeypatch, consistent)
    _, frames = VideoReader(fingerprint_video, frame_indices=[150, 153],
                            output_size=(2, 1),
                            backend='ffmpeg').get_frames()
    assert [int(f[0, 0, 0]) for f in frames] == [150, 153]
    assert video_lib._seek_verified('ffmpeg', fingerprint_video)
    assert not video_lib._seek_verified('cv2', fingerprint_video)


def test_check_dataset_tool(dataset_root, tmp_path, capsys):
    """tools/check_dataset.py: clean synthetic tree passes (exit 0, no
    errors); a corrupted copy (truncated timestamps, deleted h5, bogus
    participant) is reported with exit 1."""
    import shutil
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..',
                                    'tools'))
    import check_dataset

    assert check_dataset.main([dataset_root, '--decode-probe']) == 0
    out = capsys.readouterr().out
    assert '0 errors' in out

    broken = tmp_path / 'broken'
    shutil.copytree(dataset_root, broken)
    clip = next((broken / 'train01').iterdir())
    ts = clip / 'webcam_c.timestamps.txt'
    ts.write_text(''.join(ts.read_text().splitlines(True)[:3]))
    os.remove(next((broken / 'train02').iterdir()) / 'webcam_c.h5')
    (broken / 'zz_bogus').mkdir()

    assert check_dataset.main([str(broken)]) == 1
    out = capsys.readouterr().out
    assert 'vs 3 timestamps' in out
    assert 'missing webcam_c.h5' in out
    assert 'not a predefined split participant' in out
