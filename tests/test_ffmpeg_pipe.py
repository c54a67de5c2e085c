"""The ffmpeg subprocess path, executed for real via fake binaries.

This image has no ffmpeg, so without these fixtures the pipe framing,
frame-exact ``select`` picking, input ``-ss`` seeking, probe parsing and
early-close reaping of ``VideoReader``/``AsyncVideoReader`` — the
compat-critical twin of the reference's subprocess decode
(``/root/reference/src/datasources/common.py:74-139``) — would run zero
times in CI (only argv construction was unit-tested). ``tests/fakebin/``
provides strict fake ``ffmpeg``/``ffprobe`` executables that implement
exactly the CLI subset the framework emits (anything else exits non-zero,
so a command-construction regression fails loudly) and decode from a
sidecar file; here the REAL subprocess code runs against them end-to-end.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

import eve_tpu.data.video as video_mod
from eve_tpu.data.video import AsyncVideoReader, VideoReader

try:
    import cv2
except ImportError:
    cv2 = None

FAKEBIN = os.path.join(os.path.dirname(os.path.abspath(__file__)), 'fakebin')
sys.path.insert(0, FAKEBIN)
import _fake_av_impl  # noqa: E402


def _make_video(path, num_frames=120, fps=30.0, size=(48, 32), vfr=False):
    """A tiny 'video': frames with compression-robust block fingerprints
    (top half white-block count encodes the index) + timestamps + the
    fake-decoder sidecar. The mp4 itself only needs to exist for the
    path assertions — the fake binaries decode from the sidecar."""
    w, h = size
    frames = np.zeros((num_frames, h, w, 3), np.uint8)
    for i in range(num_frames):
        frames[i, :, :, 0] = 17 * (i % 15)
        frames[i, :, :, 1] = (i * 31) % 251
        frames[i, h // 2:, :, 2] = 255 - (i % 13)
    with open(path, 'wb') as f:
        f.write(b'\x00fake-mp4')
    _fake_av_impl.write_sidecar(path, frames, fps, vfr=vfr)
    ts = (np.arange(num_frames, dtype=np.int64) * int(1e9 / fps)) + int(1e9)
    np.savetxt(video_mod.timestamps_path_for(path), ts, fmt='%d')
    return frames


@pytest.fixture
def fake_av(monkeypatch, tmp_path):
    """Point the video module at the fake binaries; return a video path."""
    monkeypatch.setattr(video_mod, '_FFMPEG',
                        os.path.join(FAKEBIN, 'ffmpeg'))
    monkeypatch.setattr(video_mod, '_FFPROBE',
                        os.path.join(FAKEBIN, 'ffprobe'))
    path = str(tmp_path / 'webcam_c_eyes.mp4')
    frames = _make_video(path)
    return path, frames


def test_fake_binaries_execute(fake_av):
    """Sanity: the fakes run as real subprocesses and are strict."""
    path, _ = fake_av
    out = subprocess.check_output(
        [os.path.join(FAKEBIN, 'ffprobe'), '-v', 'quiet',
         '-select_streams', 'v:0', '-show_entries', 'stream=width,height',
         '-of', 'csv=p=0', path]).decode().strip()
    assert out == '48,32'
    with pytest.raises(subprocess.CalledProcessError):
        subprocess.check_output(
            [os.path.join(FAKEBIN, 'ffmpeg'), '--definitely-not-a-flag'],
            stderr=subprocess.DEVNULL)


def test_pipe_frame_exact_native_size(fake_av):
    """The raw pipe yields exactly the requested frames, request order,
    duplicates included (the sorted-unique decode + remap path)."""
    path, frames = fake_av
    indices = [7, 3, 3, 19, 0]
    ts, got = VideoReader(path, frame_indices=indices,
                          backend='ffmpeg').get_frames()
    assert got.shape == (5, 32, 48, 3)
    for j, i in enumerate(indices):
        np.testing.assert_array_equal(got[j], frames[i], err_msg=str(i))
    expected_ts = np.loadtxt(video_mod.timestamps_path_for(path))[indices]
    np.testing.assert_array_equal(ts, expected_ts.astype(np.int64))


def test_pipe_scale_filter(fake_av):
    """scale=w:h flows through the pipe with correct byte framing."""
    path, frames = fake_av
    ts, got = VideoReader(path, frame_indices=[2, 5], output_size=(24, 16),
                          backend='ffmpeg').get_frames()
    assert got.shape == (2, 16, 24, 3)
    if cv2 is not None:
        for j, i in enumerate([2, 5]):
            np.testing.assert_array_equal(
                got[j], cv2.resize(frames[i], (24, 16),
                                   interpolation=cv2.INTER_LINEAR))


def test_pipe_input_seek_frame_exact(fake_av, monkeypatch):
    """Late windows engage the input -ss fast seek (first/fps > 2 s); the
    decoded frames must equal the sequential scan's exactly — including
    under EVE_VIDEO_SEEK=verify, which cross-checks inside the reader."""
    path, frames = fake_av
    indices = [100, 102, 104, 110]

    monkeypatch.setenv('EVE_VIDEO_SEEK', '0')
    _, scanned = VideoReader(path, frame_indices=indices,
                             backend='ffmpeg').get_frames()
    monkeypatch.setenv('EVE_VIDEO_SEEK', '1')
    _, seeked = VideoReader(path, frame_indices=indices,
                            backend='ffmpeg').get_frames()
    np.testing.assert_array_equal(seeked, scanned)
    for j, i in enumerate(indices):
        np.testing.assert_array_equal(seeked[j], frames[i], err_msg=str(i))
    # The seek actually happened: the command builder must emit -ss here.
    fps = video_mod._probe_cfr_fps(path)
    assert fps == pytest.approx(30.0)
    cmd = video_mod.ffmpeg_pipe_cmd(path, sorted(set(indices)), None, fps)
    assert '-ss' in cmd

    monkeypatch.setenv('EVE_VIDEO_SEEK', 'verify')
    video_mod._VERIFIED_SEEK_PATHS.clear()
    _, verified = VideoReader(path, frame_indices=indices,
                              backend='ffmpeg').get_frames()
    np.testing.assert_array_equal(verified, scanned)
    assert video_mod._seek_verified('ffmpeg', path)


def test_pipe_vfr_refuses_seek(fake_av, monkeypatch, tmp_path):
    """avg_frame_rate != r_frame_rate (the VFR container signature) must
    disable input seeking — frame-number seek is not exact there."""
    path = str(tmp_path / 'vfr' / 'webcam_c_eyes.mp4')
    os.makedirs(os.path.dirname(path))
    frames = _make_video(path, vfr=True)
    assert video_mod._probe_cfr_fps(path) is None
    indices = [100, 104]
    _, got = VideoReader(path, frame_indices=indices,
                         backend='ffmpeg').get_frames()
    for j, i in enumerate(indices):
        np.testing.assert_array_equal(got[j], frames[i])


def test_pipe_truncated_stream_yields_prefix(fake_av, tmp_path):
    """A video stream shorter than its timestamps file (truncated upload —
    the real-world case the dataset layer zero-pads): the pipe ends early
    and the reader returns the decodable prefix."""
    path = str(tmp_path / 'trunc' / 'webcam_c_eyes.mp4')
    os.makedirs(os.path.dirname(path))
    frames = _make_video(path, num_frames=120)
    # Re-write the sidecar with only 110 decodable frames; the 120-entry
    # timestamps file stays (the index space the dataset layer uses).
    _fake_av_impl.write_sidecar(path, frames[:110], 30.0)
    ts, got = VideoReader(path, frame_indices=[105, 108, 115, 118],
                          backend='ffmpeg').get_frames()
    assert got.shape[0] == 2
    np.testing.assert_array_equal(got[0], frames[105])
    np.testing.assert_array_equal(got[1], frames[108])


def test_async_pipe_matches_sync_and_reaps(fake_av):
    """AsyncVideoReader's streaming pipe yields the sync frames one at a
    time; early close terminates and reaps the child process."""
    path, frames = fake_av
    indices = [1, 4, 9]
    sync_ts, sync_frames = VideoReader(path, frame_indices=indices,
                                       backend='ffmpeg').get_frames()
    with AsyncVideoReader(path, frame_indices=indices,
                          backend='ffmpeg') as rd:
        got = list(rd)
    assert len(got) == 3
    for (ts, frame), want_ts, want in zip(got, sync_ts, sync_frames):
        assert ts == want_ts
        np.testing.assert_array_equal(frame, want)

    # Early close: take one frame, close, assert the child is reaped.
    rd = AsyncVideoReader(path, backend='ffmpeg')
    it = iter(rd)
    next(it)
    proc = rd._proc
    assert proc is not None and proc.poll() is None  # still streaming
    rd.close()
    assert rd._proc is None
    assert proc.returncode is not None  # waited on, no zombie


def test_probe_size_via_ffprobe(fake_av):
    """_probe_size goes through the fake ffprobe (no output_size given)."""
    path, frames = fake_av
    reader = VideoReader(path, frame_indices=[], backend='ffmpeg')
    assert reader._probe_size() == (48, 32)
    # Empty index list short-circuits but must keep probed H/W.
    _, got = reader.get_frames()
    assert got.shape == (0, 32, 48, 3)
