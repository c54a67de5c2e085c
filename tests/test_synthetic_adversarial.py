"""Adversarial appearance fixture (round 5).

The flat pupil-disc fixture is trivially decodable (a 6-line thresholded
centroid inverts it to ~1 px), so converged-accuracy equality measured on
it cannot discriminate architectures that trade spatial detail (the exact
caveat recorded against the patchify8 promotion, BASELINE.md). These tests
pin the hardened fixture's contract:

  * naive decoding FAILS: both the bright-centroid decoder (the original
    attack) and the obvious dark-centroid follow-up read > 5 deg mean
    angular error — glints/sclera are the brightest pixels and
    lashes/dark distractors share the pupil's darkness;
  * the gaze information is still PRESENT and codec-robust: an oracle
    that re-renders candidate gazes against the same per-frame latents
    recovers gaze to well under a degree, before and after an mp4
    round-trip;
  * rendering is deterministic given (gaze, latents), which is what makes
    the oracle construction valid;
  * the batch maker and the on-disk dataset writer expose the fixture via
    ``appearance='adversarial'`` with unchanged analytic geometry labels.
"""

import os

import numpy as np
import pytest

from eve_tpu.data import synthetic as syn
from eve_tpu.utils import gaze_np


def _ang_err_deg(a, b):
    va = gaze_np.pitchyaw_to_vector(a)
    vb = gaze_np.pitchyaw_to_vector(b)
    return np.degrees(np.arccos(np.clip((va * vb).sum(-1), -1.0, 1.0)))


def _render(n=32, size=96, seed=0):
    rng = np.random.RandomState(seed)
    g = rng.uniform(-0.45, 0.45, (n, 2)).astype(np.float32)
    lat = syn.sample_appearance_latents(rng, (n,))
    return g, lat, syn.render_gaze_patches_adversarial(g, size, lat)


def test_naive_centroid_decoders_fail():
    """The done-criterion from round 4's verdict: the thresholded-centroid
    decoder must fail (> 5 deg) on the hardened fixture. Both polarities."""
    g, _lat, patches = _render()
    size = patches.shape[-2]

    bright = syn.decode_gaze_from_patch(patches)
    assert _ang_err_deg(bright, g).mean() > 5.0

    # Dark-centroid (the obvious second attack: the pupil is dark).
    p = patches.astype(np.float32).mean(-1)
    mask = (p < 60).astype(np.float32)
    yy = np.arange(size, dtype=np.float32)[:, None]
    xx = np.arange(size, dtype=np.float32)[None, :]
    tot = np.maximum(mask.sum((-2, -1)), 1e-6)
    cy = (mask * yy).sum((-2, -1)) / tot
    cx = (mask * xx).sum((-2, -1)) / tot
    dark = np.stack([(cy / size - 0.5), (cx / size - 0.5)],
                    -1) / syn.GAZE_ENC_AMPL * syn.GAZE_ENC_RANGE
    assert _ang_err_deg(dark, g).mean() > 5.0


def test_deterministic_given_latents():
    g, lat, patches = _render(n=4, size=64)
    again = syn.render_gaze_patches_adversarial(g, 64, lat)
    np.testing.assert_array_equal(patches, again)


def test_oracle_recovers_gaze():
    """Re-render template matching inverts the encoding to sub-degree:
    the information naive decoders cannot reach is present in the pixels
    (so a CNN can, in principle, learn it — convergence on the real TPU is
    recorded in BASELINE.md round 5)."""
    g, lat, patches = _render(n=6, size=64, seed=1)
    est = syn.oracle_decode_gaze(patches, lat)
    err = _ang_err_deg(est, g)
    assert err.mean() < 1.5, err
    assert err.max() < 3.0, err


@pytest.mark.slow
def test_codec_roundtrip():
    """The encoding survives the mp4 codec: post-decode, the oracle still
    reads sub-degree while the naive decoder still fails."""
    import cv2
    g, lat, frames = _render(n=10, size=64, seed=2)
    path = '/tmp/eve_tpu_test_adv_rt.mp4'
    syn._write_video(path, frames, 30)
    try:
        cap = cv2.VideoCapture(path)
        rec = []
        while True:
            ok, f = cap.read()
            if not ok:
                break
            rec.append(cv2.cvtColor(f, cv2.COLOR_BGR2RGB))
        cap.release()
    finally:
        os.unlink(path)
    rec = np.stack(rec)
    assert rec.shape == frames.shape
    est = syn.oracle_decode_gaze(rec, lat)
    assert _ang_err_deg(est, g).mean() < 2.0
    naive = syn.decode_gaze_from_patch(rec)
    assert _ang_err_deg(naive, g).mean() > 5.0


def test_pupil_region_remains_visible():
    """The eyelid clamp keeps the gaze-encoding region learnable: across
    frames, the small disc at the encoded iris center is darker than the
    patch mean (iris/pupil visible, not skinned over) in the typical case.
    Individual frames may catch a glint over the pupil — that is realistic
    and allowed — so the assertion is on the median."""
    g, _lat, patches = _render(n=48, size=96, seed=3)
    size = patches.shape[-2]
    enc = np.clip(g / syn.GAZE_ENC_RANGE, -1, 1) * syn.GAZE_ENC_AMPL
    cy = ((0.5 + enc[:, 0]) * size).astype(int)
    cx = ((0.5 + enc[:, 1]) * size).astype(int)
    lum = patches.astype(np.float32).mean(-1)
    deltas = []
    for i in range(len(g)):
        r = 3
        region = lum[i, cy[i] - r:cy[i] + r + 1, cx[i] - r:cx[i] + r + 1]
        deltas.append(region.mean() - lum[i].mean())
    assert np.median(deltas) < -30.0, np.median(deltas)


def test_batch_maker_adversarial():
    rng = np.random.RandomState(0)
    batch = syn.make_synthetic_batch(rng, batch_size=2, sequence_len=3,
                                     eyes_size=64,
                                     appearance='adversarial')
    for side in ('left', 'right'):
        patch = batch[side + '_eye_patch']
        assert patch.shape == (2, 3, 64, 64, 3)
        # float path is [-1, 1]; appearance must not be the binary disc
        # (which has exactly two distinct values).
        assert patch.min() >= -1.0 and patch.max() <= 1.0
        assert len(np.unique(patch[0, 0])) > 100
    # Geometry labels still analytic/consistent (same path as disc mode).
    assert np.isfinite(batch['left_g_tobii']).all()


def test_dataset_writer_adversarial(tmp_path):
    import cv2
    root = syn.write_synthetic_dataset(
        str(tmp_path), participants=('train01',), num_frames=8,
        eyes_size=64, appearance='adversarial')
    d = os.path.join(root, 'train01', 'step008_image_test')
    cap = cv2.VideoCapture(os.path.join(d, 'webcam_c_eyes.mp4'))
    ok, frame = cap.read()
    cap.release()
    assert ok and frame.shape == (64, 128, 3)
    # Adversarial appearance: rich value distribution below the top
    # frame-index band (the disc fixture had ~2 values).
    body = frame[12:]
    assert len(np.unique(body)) > 60
    assert os.path.exists(os.path.join(d, 'webcam_c.h5'))
