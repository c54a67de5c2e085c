"""Fused Pallas TPU kernels: Gaussian heatmap render and soft-argmax.

These are the hottest non-matmul ops in EVE (SURVEY.md section 7 build plan
step 9): per frame the model renders multiple 72x128 Gaussian maps and
soft-argmaxes the refined heatmap. XLA fuses the naive formulations into a
few VPU passes already; the Pallas versions cut memory traffic further:

* render: one pass, no (..., H) / (..., W) broadcast temporaries in HBM;
* soft-argmax: single VMEM-resident sweep producing max, exp-sums and both
  weighted coordinate sums without materializing the softmax tensor.

Both operate on (N, 72, 128) blocks — (72, 128) is exactly 9x1 float32
(8, 128) tiles, so layouts are aligned. Kernels run only on TPU; callers
fall back to the jnp formulations elsewhere (see eve_tpu/ops/heatmap.py).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

HEATMAP_H = 72
HEATMAP_W = 128


def _render_kernel(centres_ref, out_ref, *, alpha, scale_x, scale_y, h, w):
    i = pl.program_id(0)
    cx = centres_ref[i, 0] * scale_x
    cy = centres_ref[i, 1] * scale_y
    ys = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0).astype(jnp.float32)
    xs = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1).astype(jnp.float32)
    d2 = (xs - cx) ** 2 + (ys - cy) ** 2
    out_ref[0] = jnp.exp(alpha * d2) + 1e-8


def pallas_make_heatmaps(centres_px, sigma, heatmap_size=(HEATMAP_W, HEATMAP_H),
                         actual_screen_size=(1920.0, 1080.0),
                         interpret=False):
    """(N, 2) screen-px centers -> (N, H, W) Gaussian heatmaps (float32)."""
    w, h = heatmap_size
    n = centres_px.shape[0]
    kernel = functools.partial(
        _render_kernel,
        alpha=-0.5 / float(sigma) ** 2,
        scale_x=w / float(actual_screen_size[0]),
        scale_y=h / float(actual_screen_size[1]),
        h=h, w=w)
    return pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h, w), jnp.float32),
        interpret=interpret,
    )(centres_px.astype(jnp.float32))


def _reduce12(x, fn):
    """Reduce axes (1, 2) with keepdims as TWO single-axis reductions.

    MULTI-axis reductions (``jnp.max(x, axis=(1, 2))``) are the trigger for
    the Mosaic vector-layout-inference crash on the current toolchain
    (``Check failed: arr.size() >= layout_rank`` in layout.h) — bisected on
    the real v5e 2026-08-19: single-axis reductions, (BN,1,1) outputs,
    broadcasts and axis-2 concats all compile; any axis=(1,2) reduce
    SIGABRTs the compile helper. Staging sublanes-then-lanes is
    mathematically identical for max/sum.
    """
    return fn(fn(x, axis=1, keepdims=True), axis=2, keepdims=True)


def _softargmax_kernel(hm_ref, out_ref, *, beta, h, w, sw, sh):
    # Block of BN maps; all reductions vectorized over the sample axis so
    # the expensive cross-lane reduces amortize over the whole block
    # (one map per grid step measured ~15x slower: pure launch/reduce
    # overhead at 480 tiny steps, BASELINE.md). Every intermediate stays
    # rank >= 2 (keepdims + 3-D iotas) and every reduction single-axis
    # (see _reduce12) to stay inside Mosaic's layout-inference support.
    x = hm_ref[...].astype(jnp.float32)                     # (BN, h, w)
    m = _reduce12(x, jnp.max)                               # (BN, 1, 1)
    p = jnp.exp(beta * (x - m))
    total = _reduce12(p, jnp.sum)                           # (BN, 1, 1)
    # Coordinate grids in [0, 1] (linspace with endpoint=True)
    xs = jax.lax.broadcasted_iota(
        jnp.int32, (1, h, w), 2).astype(jnp.float32) / (w - 1)
    ys = jax.lax.broadcasted_iota(
        jnp.int32, (1, h, w), 1).astype(jnp.float32) / (h - 1)
    inv = 1.0 / total
    px = _reduce12(p * xs, jnp.sum) * inv * sw
    py = _reduce12(p * ys, jnp.sum) * inv * sh
    out = jnp.concatenate(
        [jnp.clip(px, 0.0, sw), jnp.clip(py, 0.0, sh)], axis=2)
    out_ref[...] = out                                       # (BN, 1, 2)


def pallas_soft_argmax(heatmaps, heatmap_size=(HEATMAP_W, HEATMAP_H),
                       actual_screen_size=(1920.0, 1080.0), beta=100.0,
                       block_n=16, interpret=False):
    """(N, H, W) heatmaps -> (N, 2) screen-px coordinates (float32)."""
    w, h = heatmap_size
    n = heatmaps.shape[0]
    if n == 0:  # empty batch: match the jnp fallback
        return jnp.zeros((0, 2), jnp.float32)
    bn = min(block_n, n)
    pad = (-n) % bn
    if pad:
        # Padded maps soft-argmax to garbage rows that are sliced off.
        heatmaps = jnp.concatenate(
            [heatmaps, jnp.zeros((pad, h, w), heatmaps.dtype)], axis=0)
    kernel = functools.partial(
        _softargmax_kernel, beta=float(beta), h=h, w=w,
        sw=float(actual_screen_size[0]), sh=float(actual_screen_size[1]))
    out = pl.pallas_call(
        kernel,
        grid=((n + pad) // bn,),
        in_specs=[pl.BlockSpec((bn, h, w), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((bn, 1, 2), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n + pad, 1, 2), jnp.float32),
        interpret=interpret,
    )(heatmaps)
    return out[:n, 0] if pad else out[:, 0]
