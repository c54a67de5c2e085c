"""Heatmap rendering, soft-argmax and gaze-history recurrence, pure JAX.

Replaces the reference's per-sample Python loops
(``/root/reference/src/models/common.py:226-323``) with fully batched,
fusion-friendly array ops:

* ``make_heatmaps`` renders Gaussian heatmaps for any batch of centers in one
  broadcasted expression (the reference stacks a Python list comprehension
  per batch item, common.py:242-243).
* ``soft_argmax`` is the beta=100 softmax expectation over the grid
  (common.py:294-323), computed in float32.
* ``history_update`` / ``decayed_history_scan`` implement the time-decayed
  gaze-history map as an O(T) scan recurrence. The reference re-reduces the
  whole history list at every timestep (O(T^2) work,
  common.py:249-287); the recurrence H_t = decay^dt * H_{t-1} + valid_t * h_t
  (with zero-timestamp padded frames skipped) produces identical values.
"""

import jax
import jax.numpy as jnp

HEATMAP_W = 128
HEATMAP_H = 72
SCREEN_W = 1920.0
SCREEN_H = 1080.0
SOFTARGMAX_BETA = 100.0


def make_heatmaps(centres_px, sigma,
                  heatmap_size=(HEATMAP_W, HEATMAP_H),
                  actual_screen_size=(SCREEN_W, SCREEN_H),
                  dtype=jnp.float32):
    """Render Gaussian heatmaps at screen-pixel centers.

    Args:
      centres_px: (..., 2) PoG in screen pixels (x, y).
      sigma: Gaussian sigma in *heatmap* pixels (scalar).

    Returns:
      (..., H, W) heatmaps, values in (1e-8, 1 + 1e-8].

    Reference semantics: common.py:226-243 (center scaled from the
    1920x1080 screen to the heatmap grid; +1e-8 floor).
    """
    w, h = heatmap_size
    xs = jnp.arange(w, dtype=dtype)
    ys = jnp.arange(h, dtype=dtype)
    alpha = -0.5 / (float(sigma) ** 2)
    cx = (w / float(actual_screen_size[0])) * centres_px[..., 0]
    cy = (h / float(actual_screen_size[1])) * centres_px[..., 1]
    dx2 = (xs - cx[..., None]) ** 2                    # (..., W)
    dy2 = (ys - cy[..., None]) ** 2                    # (..., H)
    hm = jnp.exp(alpha * (dy2[..., :, None] + dx2[..., None, :]))
    return hm + 1e-8


def soft_argmax(heatmaps,
                heatmap_size=(HEATMAP_W, HEATMAP_H),
                actual_screen_size=(SCREEN_W, SCREEN_H),
                beta=SOFTARGMAX_BETA):
    """Soft-argmax of heatmaps -> screen-pixel coordinates.

    Args:
      heatmaps: (..., H, W).

    Returns:
      (..., 2) (x, y) in screen pixels, clamped to the screen.

    Reference: common.py:294-323 (beta=100 softmax over the flattened grid,
    expectation against a [0, 1] meshgrid with ``endpoint=True``, rescale to
    1920x1080 and clamp). Accumulation is forced to float32 — this op is a
    bf16 stability hazard (SURVEY.md section 7 item 5).
    """
    w, h = heatmap_size
    x = heatmaps.astype(jnp.float32)
    ref_xs = jnp.linspace(0.0, 1.0, w, dtype=jnp.float32)          # (W,)
    ref_ys = jnp.linspace(0.0, 1.0, h, dtype=jnp.float32)          # (H,)
    flat = x.reshape(x.shape[:-2] + (h * w,))
    p = jax.nn.softmax(beta * flat, axis=-1).reshape(x.shape)
    lmrk_x = jnp.sum(p * ref_xs, axis=(-2, -1))
    lmrk_y = jnp.sum(p * ref_ys[..., None], axis=(-2, -1))
    sw, sh = float(actual_screen_size[0]), float(actual_screen_size[1])
    return jnp.stack([
        jnp.clip(sw * lmrk_x, 0.0, sw),
        jnp.clip(sh * lmrk_y, 0.0, sh),
    ], axis=-1)


def history_update(carry, heatmap, timestamp, validity,
                   decay_per_ms=0.999):
    """One step of the decayed gaze-history recurrence.

    Args:
      carry: tuple ``(H, last_ts)`` with H (..., H, W) float32 and last_ts
        (...,) float32 (0 means "no frame seen yet").
      heatmap: (..., H, W) history-sigma heatmap for this frame.
      timestamp: (...,) frame timestamp in nanoseconds (0 for padded frames).
      validity: (...,) 0/1 validity gate for this frame.

    Returns:
      (new_carry, history_map) where history_map equals the reference's
      ``make_gaze_history_map`` over all frames up to and including this one
      (common.py:249-273: per-term weight decay^((t_last_valid - ts)*1e-6),
      zero-timestamp frames skipped entirely).
    """
    H, last_ts = carry
    is_real = timestamp > 0
    dt_ms = (timestamp - last_ts) * 1e-6
    decay = jnp.power(jnp.float32(decay_per_ms), dt_ms)
    # First real frame: no decay of (zero) history; padded frame: freeze.
    scale = jnp.where(is_real & (last_ts > 0), decay, 1.0)
    add = jnp.where(is_real, validity.astype(H.dtype), 0.0)
    new_H = scale[..., None, None] * H + add[..., None, None] * heatmap
    new_last = jnp.where(is_real, timestamp, last_ts)
    new_H = jnp.where(is_real[..., None, None], new_H, H)
    return (new_H, new_last), new_H


def decayed_history_scan(heatmaps, timestamps, validities,
                         decay_per_ms=0.999):
    """Full-sequence decayed history maps, scanned over the T axis.

    Args:
      heatmaps: (B, T, H, W).
      timestamps: (B, T) nanosecond stamps, 0 = padding.
      validities: (B, T) in {0, 1}.

    Returns:
      (B, T, H, W) where entry t matches the reference's history map after
      frame t.
    """
    B, T, h, w = heatmaps.shape
    init = (jnp.zeros((B, h, w), jnp.float32), jnp.zeros((B,), jnp.float32))

    def step(carry, xs):
        hm, ts, v = xs
        return history_update(
            carry, hm.astype(jnp.float32), ts.astype(jnp.float32), v,
            decay_per_ms=decay_per_ms)

    xs = (jnp.moveaxis(heatmaps, 1, 0),
          jnp.moveaxis(timestamps, 1, 0),
          jnp.moveaxis(validities, 1, 0))
    _, out = jax.lax.scan(step, init, xs)
    return jnp.moveaxis(out, 0, 1)


def _pallas_ok():
    return jax.default_backend() == 'tpu'


def make_heatmaps_fast(centres_px, sigma, heatmap_size=(HEATMAP_W, HEATMAP_H),
                       actual_screen_size=(SCREEN_W, SCREEN_H),
                       use_pallas=False):
    """make_heatmaps with optional fused Pallas path on TPU.

    The Pallas kernel has no autodiff rule, so it is wrapped in a
    ``custom_vjp`` whose backward pass differentiates the (numerically
    identical) jnp formulation — training gets exact gradients while the
    forward stays fused.
    """
    if use_pallas and _pallas_ok():
        from eve_tpu.kernels.heatmap_kernels import pallas_make_heatmaps
        lead = centres_px.shape[:-1]
        flat = centres_px.reshape(-1, 2)

        def jnp_render(c):
            return make_heatmaps(c, sigma, heatmap_size, actual_screen_size)

        @jax.custom_vjp
        def render(c):
            return pallas_make_heatmaps(c, sigma, heatmap_size,
                                        actual_screen_size)

        def render_fwd(c):
            return render(c), c

        def render_bwd(c, g):
            _, vjp = jax.vjp(jnp_render, c)
            return vjp(g)

        render.defvjp(render_fwd, render_bwd)
        out = render(flat)
        return out.reshape(lead + out.shape[1:])
    return make_heatmaps(centres_px, sigma, heatmap_size, actual_screen_size)


def soft_argmax_fast(heatmaps, heatmap_size=(HEATMAP_W, HEATMAP_H),
                     actual_screen_size=(SCREEN_W, SCREEN_H),
                     beta=SOFTARGMAX_BETA, use_pallas=False):
    """soft_argmax with optional fused Pallas path on TPU.

    Same custom_vjp arrangement as ``make_heatmaps_fast``: Pallas forward,
    jnp-derived backward.
    """
    if use_pallas and _pallas_ok():
        from eve_tpu.kernels.heatmap_kernels import pallas_soft_argmax
        lead = heatmaps.shape[:-2]
        flat = heatmaps.reshape((-1,) + heatmaps.shape[-2:])

        def jnp_sam(x):
            return soft_argmax(x, heatmap_size, actual_screen_size, beta)

        @jax.custom_vjp
        def sam(x):
            return pallas_soft_argmax(x.astype(jnp.float32), heatmap_size,
                                      actual_screen_size, beta)

        def sam_fwd(x):
            return sam(x), x

        def sam_bwd(x, g):
            _, vjp = jax.vjp(jnp_sam, x)
            return vjp(g)

        sam.defvjp(sam_fwd, sam_bwd)
        out = sam(flat)
        return out.reshape(lead + (2,))
    return soft_argmax(heatmaps, heatmap_size, actual_screen_size, beta)
