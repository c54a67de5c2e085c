"""Pallas kernel parity and gradient tests (interpret mode on CPU).

The fused TPU kernels (eve_tpu/kernels/heatmap_kernels.py) must match the
jnp formulations bit-for-bit in value, and the ``custom_vjp`` dispatch in
eve_tpu/ops/heatmap.py must produce the jnp gradients — training
differentiates through both the heatmap render (RefineNet input) and the
soft-argmax (final PoG losses).
"""

import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from eve_tpu.kernels import heatmap_kernels as kern
from eve_tpu.ops import heatmap as hm


@pytest.fixture
def centres():
    rng = np.random.RandomState(0)
    return jnp.asarray(
        np.stack([rng.uniform(0, 1920, 5), rng.uniform(0, 1080, 5)], -1),
        jnp.float32)


@pytest.fixture
def heatmaps():
    rng = np.random.RandomState(1)
    return jnp.asarray(rng.uniform(0, 1, (4, 72, 128)), jnp.float32)


def test_pallas_render_matches_jnp(centres):
    ours = kern.pallas_make_heatmaps(centres, 10.0, interpret=True)
    ref = hm.make_heatmaps(centres, 10.0)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               rtol=1e-6, atol=1e-7)


def test_pallas_soft_argmax_matches_jnp(heatmaps):
    ours = kern.pallas_soft_argmax(heatmaps, interpret=True)
    ref = hm.soft_argmax(heatmaps)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               rtol=1e-5, atol=1e-3)


@pytest.fixture
def pallas_on_cpu(monkeypatch):
    """Force the fast-path dispatch through interpret-mode kernels."""
    monkeypatch.setattr(hm, '_pallas_ok', lambda: True)
    monkeypatch.setattr(kern, 'pallas_make_heatmaps',
                        functools.partial(kern.pallas_make_heatmaps,
                                          interpret=True))
    monkeypatch.setattr(kern, 'pallas_soft_argmax',
                        functools.partial(kern.pallas_soft_argmax,
                                          interpret=True))


def test_render_dispatch_grad_matches_jnp(pallas_on_cpu, centres):
    def f(c):
        return jnp.sum(hm.make_heatmaps_fast(c, 10.0, use_pallas=True) ** 2)

    def f_ref(c):
        return jnp.sum(hm.make_heatmaps(c, 10.0) ** 2)

    v, g = jax.value_and_grad(f)(centres)
    v_ref, g_ref = jax.value_and_grad(f_ref)(centres)
    np.testing.assert_allclose(float(v), float(v_ref), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                               rtol=1e-5, atol=1e-7)


def test_soft_argmax_dispatch_grad_matches_jnp(pallas_on_cpu, heatmaps):
    def f(x):
        return jnp.sum(hm.soft_argmax_fast(x, use_pallas=True))

    def f_ref(x):
        return jnp.sum(hm.soft_argmax(x))

    v, g = jax.value_and_grad(f)(heatmaps)
    v_ref, g_ref = jax.value_and_grad(f_ref)(heatmaps)
    np.testing.assert_allclose(float(v), float(v_ref), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-6)


def test_dispatch_batched_shapes(pallas_on_cpu):
    rng = np.random.RandomState(2)
    c = jnp.asarray(rng.uniform(0, 1000, (2, 3, 2)), jnp.float32)
    out = hm.make_heatmaps_fast(c, 5.0, use_pallas=True)
    assert out.shape == (2, 3, 72, 128)
    x = jnp.asarray(rng.uniform(0, 1, (2, 3, 72, 128)), jnp.float32)
    out = hm.soft_argmax_fast(x, use_pallas=True)
    assert out.shape == (2, 3, 2)
