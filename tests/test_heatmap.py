"""Golden tests for eve_tpu.ops.heatmap against naive numpy oracles."""

import numpy as np

import jax.numpy as jnp

from eve_tpu.ops import heatmap as HM


def np_make_heatmap(centre_px, sigma, w=128, h=72, sw=1920.0, sh=1080.0):
    xs = np.arange(w, dtype=np.float32)
    ys = np.arange(h, dtype=np.float32)[:, None]
    cx = (w / sw) * centre_px[0]
    cy = (h / sh) * centre_px[1]
    alpha = -0.5 / sigma ** 2
    return np.exp(alpha * ((xs - cx) ** 2 + (ys - cy) ** 2)) + 1e-8


def np_soft_argmax(hm, w=128, h=72, sw=1920.0, sh=1080.0, beta=100.0):
    ref_x, ref_y = np.meshgrid(np.linspace(0, 1, w), np.linspace(0, 1, h),
                               indexing='xy')
    x = hm.reshape(-1).astype(np.float64)
    e = np.exp(beta * (x - x.max()))
    p = e / e.sum()
    lx = float((ref_x.reshape(-1) * p).sum())
    ly = float((ref_y.reshape(-1) * p).sum())
    return np.array([np.clip(sw * lx, 0, sw), np.clip(sh * ly, 0, sh)])


def np_history_map(timestamps, heatmaps, validities, decay=0.999):
    """Naive re-reduction oracle matching the reference exactly."""
    nz = [t for t in timestamps if t != 0]
    target = nz[-1]
    out = np.zeros_like(heatmaps[0])
    for ts, hm, v in zip(timestamps, heatmaps, validities):
        if ts == 0:
            continue
        diff_ms = (target - ts) * 1e-6
        out = out + float(v) * (decay ** diff_ms) * hm
    return out


def test_make_heatmaps_matches_oracle(rng):
    centres = np.stack([rng.uniform(0, 1920, 9),
                        rng.uniform(0, 1080, 9)], -1).astype(np.float32)
    for sigma in (10.0, 3.0, 5.0):
        ours = np.asarray(HM.make_heatmaps(jnp.asarray(centres), sigma))
        assert ours.shape == (9, 72, 128)
        for i in range(9):
            np.testing.assert_allclose(
                ours[i], np_make_heatmap(centres[i], sigma), atol=1e-6)


def test_make_heatmaps_batched_bt(rng):
    centres = rng.uniform(0, 1000, (2, 5, 2)).astype(np.float32)
    out = np.asarray(HM.make_heatmaps(jnp.asarray(centres), 10.0))
    assert out.shape == (2, 5, 72, 128)
    flat = np.asarray(HM.make_heatmaps(jnp.asarray(centres.reshape(-1, 2)), 10.0))
    np.testing.assert_allclose(out.reshape(-1, 72, 128), flat, atol=0)


def test_soft_argmax_recovers_peak(rng):
    centres = np.stack([rng.uniform(200, 1700, 16),
                        rng.uniform(150, 950, 16)], -1).astype(np.float32)
    hms = HM.make_heatmaps(jnp.asarray(centres), 10.0)
    out = np.asarray(HM.soft_argmax(hms))
    # Soft-argmax over a clean Gaussian should recover the center within the
    # grid resolution (one heatmap cell = 15 px).
    np.testing.assert_allclose(out, centres, atol=16.0)


def test_soft_argmax_matches_oracle(rng):
    hm = rng.uniform(0, 1, (3, 72, 128)).astype(np.float32)
    ours = np.asarray(HM.soft_argmax(jnp.asarray(hm)))
    for i in range(3):
        np.testing.assert_allclose(ours[i], np_soft_argmax(hm[i]), atol=1e-2)


def test_history_scan_matches_reference_rereduction(rng):
    B, T = 3, 8
    hms = rng.uniform(0, 1, (B, T, 72, 128)).astype(np.float32)
    # Nanosecond timestamps at ~30 fps, last 2 frames padded (ts = 0)
    base = 1.6e18
    ts = np.zeros((B, T), np.float64)
    for b in range(B):
        for t in range(T - 2):
            ts[b, t] = base + t * 33.3e6 + rng.uniform(0, 1e6)
    valid = (rng.uniform(size=(B, T)) > 0.3).astype(np.float32)
    valid[:, T - 2:] = 0.0

    # Rebase like the data layer does: keep 0 for padding.
    ts_rebased = np.where(ts > 0, ts - base + 1.0, 0.0).astype(np.float32)

    ours = np.asarray(HM.decayed_history_scan(
        jnp.asarray(hms), jnp.asarray(ts_rebased), jnp.asarray(valid)))
    assert ours.shape == (B, T, 72, 128)
    for b in range(B):
        for t in range(T):
            if ts_rebased[b, : t + 1].max() == 0:
                continue  # reference asserts at least one nonzero ts
            expected = np_history_map(
                ts_rebased[b, : t + 1].astype(np.float64),
                [hms[b, s] for s in range(t + 1)],
                valid[b, : t + 1])
            np.testing.assert_allclose(ours[b, t], expected, rtol=2e-4,
                                       atol=2e-4)


def test_history_padded_frames_freeze():
    hm = np.ones((1, 4, 72, 128), np.float32)
    ts = np.array([[1.0, 34e6, 0.0, 0.0]], np.float32)
    valid = np.ones((1, 4), np.float32)
    out = np.asarray(HM.decayed_history_scan(
        jnp.asarray(hm), jnp.asarray(ts), jnp.asarray(valid)))
    np.testing.assert_allclose(out[0, 2], out[0, 1], atol=0)
    np.testing.assert_allclose(out[0, 3], out[0, 1], atol=0)
