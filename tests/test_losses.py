"""Loss-framework tests vs a per-item loop oracle (reference semantics)."""

import numpy as np
import pytest

import jax.numpy as jnp

from eve_tpu import losses as L


def oracle_masked(per_frame, validity):
    """Reference BaseLossWithValidity normalization, per-item loop."""
    B = per_frame.shape[0]
    acc_items = []
    for b in range(B):
        v = validity[b].astype(np.float64)
        num_valid = v.sum()
        acc = (v * per_frame[b]).sum()
        if num_valid > 1:
            acc /= num_valid
        acc_items.append(acc)
    return np.sum(acc_items) / B


def test_masked_mean_matches_oracle(rng):
    loss = rng.rand(4, 7).astype(np.float32)
    validity = (rng.rand(4, 7) > 0.4).astype(np.float32)
    ours = float(L.masked_mean(jnp.asarray(loss), jnp.asarray(validity)))
    np.testing.assert_allclose(ours, oracle_masked(loss, validity), rtol=1e-6)


def test_masked_mean_single_valid_edge_case():
    """num_valid == 1: reference does NOT divide — exact edge semantics."""
    loss = np.array([[3.0, 5.0, 7.0]], np.float32)
    validity = np.array([[0.0, 1.0, 0.0]], np.float32)
    ours = float(L.masked_mean(jnp.asarray(loss), jnp.asarray(validity)))
    assert ours == 5.0  # sum, not mean
    validity2 = np.array([[0.0, 1.0, 1.0]], np.float32)
    ours2 = float(L.masked_mean(jnp.asarray(loss), jnp.asarray(validity2)))
    assert abs(ours2 - 6.0) < 1e-6  # (5+7)/2


def test_masked_mean_all_invalid():
    loss = np.array([[3.0, 5.0]], np.float32)
    validity = np.zeros((1, 2), np.float32)
    assert float(L.masked_mean(jnp.asarray(loss), jnp.asarray(validity))) == 0.0


def test_mse_euclidean_l1(rng):
    pred = rng.randn(3, 5, 2).astype(np.float32)
    gt = rng.randn(3, 5, 2).astype(np.float32)
    v = np.ones((3, 5), np.float32)
    mse = float(L.mse_loss(jnp.asarray(pred), jnp.asarray(gt), jnp.asarray(v)))
    np.testing.assert_allclose(
        mse, oracle_masked(((pred - gt) ** 2).mean(-1), v), rtol=1e-5)
    euc = float(L.euclidean_loss(jnp.asarray(pred), jnp.asarray(gt),
                                 jnp.asarray(v)))
    np.testing.assert_allclose(
        euc, oracle_masked(np.sqrt(((pred - gt) ** 2).sum(-1)), v), rtol=1e-5)
    l1 = float(L.l1_loss(jnp.asarray(pred), jnp.asarray(gt), jnp.asarray(v)))
    np.testing.assert_allclose(
        l1, oracle_masked(np.abs(pred - gt).mean(-1), v), rtol=1e-5)


def test_l1_1d_predictions(rng):
    """Pupil-size losses are (B, T) without a feature dim."""
    pred = rng.rand(2, 6).astype(np.float32)
    gt = rng.rand(2, 6).astype(np.float32)
    v = (rng.rand(2, 6) > 0.3).astype(np.float32)
    ours = float(L.l1_loss(jnp.asarray(pred), jnp.asarray(gt), jnp.asarray(v)))
    np.testing.assert_allclose(ours, oracle_masked(np.abs(pred - gt), v),
                               rtol=1e-5)


def test_cross_entropy_matches_torch(rng):
    torch = pytest.importorskip('torch')
    import torch.nn.functional as F
    pred = rng.uniform(0.02, 0.98, (2, 4, 72, 128)).astype(np.float32)
    gt = rng.uniform(0.0, 1.0, (2, 4, 72, 128)).astype(np.float32)
    v = np.ones((2, 4), np.float32)
    ours = float(L.cross_entropy_loss(jnp.asarray(pred), jnp.asarray(gt),
                                      jnp.asarray(v)))
    per_frame = np.zeros((2, 4))
    for b in range(2):
        for t in range(4):
            per_frame[b, t] = F.binary_cross_entropy(
                torch.tensor(pred[b, t]), torch.tensor(gt[b, t])).item()
    np.testing.assert_allclose(ours, oracle_masked(per_frame, v), rtol=1e-5)


def test_angular_loss_degrees():
    pred = jnp.asarray([[[0.0, 0.0], [0.0, 0.0]]])
    gt = jnp.asarray([[[0.0, np.pi / 2], [0.0, 0.0]]])
    v = jnp.ones((1, 2))
    ours = float(L.angular_loss(pred, gt, v))
    np.testing.assert_allclose(ours, 45.0, atol=0.05)  # (90 + ~0.03) / 2
