"""Validity-masked losses, fully vectorized over (B, T).

Reproduces the reference loss framework
(``/root/reference/src/losses/base_loss_with_validity.py:32-73`` and the five
loss types under ``src/losses/``) without the per-batch-item Python loop:

per item b:  acc_b = sum_t validity[b,t] * loss[b,t]
             acc_b /= num_valid_b   (only when num_valid_b > 1 — the exact
                                     reference edge case)
final     :  mean_b acc_b

Losses are computed in float32.
"""

import jax
import jax.numpy as jnp

from eve_tpu.ops.geometry import angular_error_degrees


def masked_mean(per_frame_loss, validity):
    """Apply the reference's validity normalization.

    Args:
      per_frame_loss: (B, T) float losses.
      validity: (B, T) bool/0-1 validity of the ground truth.

    Returns:
      scalar float32 loss.
    """
    v = validity.astype(jnp.float32)
    l = per_frame_loss.astype(jnp.float32)
    # where (not v*l) so invalid frames contribute neither value nor
    # cotangent — their loss may be garbage (padded zero labels).
    l = jnp.where(v > 0, l, 0.0)
    num_valid = jnp.sum(v, axis=1)                      # (B,)
    acc = jnp.sum(l, axis=1)                            # (B,)
    acc = jnp.where(num_valid > 1, acc / jnp.maximum(num_valid, 1.0), acc)
    return jnp.mean(acc)


def _feature_axes(x):
    """Axes beyond (B, T)."""
    return tuple(range(2, x.ndim))


def mse_loss(pred, gt, validity):
    """Per-frame mean squared error over feature dims."""
    if pred.ndim > 2:
        per_frame = jnp.mean(
            jnp.square(pred.astype(jnp.float32) - gt.astype(jnp.float32)),
            axis=_feature_axes(pred))
    else:
        per_frame = jnp.square(pred.astype(jnp.float32) -
                               gt.astype(jnp.float32))
    return masked_mean(per_frame, validity)


def l1_loss(pred, gt, validity):
    """Per-frame mean absolute error over feature dims."""
    if pred.ndim > 2:
        per_frame = jnp.mean(
            jnp.abs(pred.astype(jnp.float32) - gt.astype(jnp.float32)),
            axis=_feature_axes(pred))
    else:
        per_frame = jnp.abs(pred.astype(jnp.float32) - gt.astype(jnp.float32))
    return masked_mean(per_frame, validity)


def euclidean_loss(pred, gt, validity):
    """Per-frame sqrt of the summed squared difference over feature dims.

    Double-where guards the sqrt: at ssd == 0 (e.g. identical left/right
    predictions on zero-padded frames) sqrt's VJP is inf, and even a zero
    cotangent yields 0 * inf = NaN without the guard.
    """
    ssd = jnp.sum(
        jnp.square(pred.astype(jnp.float32) - gt.astype(jnp.float32)),
        axis=_feature_axes(pred))
    safe = jnp.where(ssd > 0.0, ssd, 1.0)
    per_frame = jnp.where(ssd > 0.0, jnp.sqrt(safe), 0.0)
    return masked_mean(per_frame, validity)


def angular_loss(pred, gt, validity):
    """Per-frame angular error in degrees (pitch/yaw or 3D inputs)."""
    per_frame = angular_error_degrees(pred.astype(jnp.float32),
                                      gt.astype(jnp.float32))
    return masked_mean(per_frame, validity)


def cross_entropy_loss(pred, gt, validity):
    """Per-frame binary cross entropy, mean over heatmap pixels.

    torch.nn.functional.binary_cross_entropy semantics: elementwise
    -(y log x + (1-y) log(1-x)) with log clamped at -100.

    Saturated inputs need double-where guards: the rendered Gaussian peaks
    at exactly 1.0 in float32 (and a sigmoid can emit exact 0/1), where
    log's VJP is infinite — the -100 clamp fixes the value but not the
    0 * inf = NaN cotangent. Deviation from torch: saturated pixels get
    zero gradient here (torch clamps the denominator to 1e-12, producing
    huge-but-clipped gradients instead).
    """
    x = pred.astype(jnp.float32)
    y = gt.astype(jnp.float32)
    pos = x > 0.0
    log_x = jnp.where(pos,
                      jnp.maximum(jnp.log(jnp.where(pos, x, 1.0)), -100.0),
                      -100.0)
    lt1 = x < 1.0
    log_1mx = jnp.where(lt1,
                        jnp.maximum(jnp.log1p(-jnp.where(lt1, x, 0.0)),
                                    -100.0),
                        -100.0)
    ce = -(y * log_x + (1.0 - y) * log_1mx)
    per_frame = jnp.mean(ce, axis=_feature_axes(ce))
    return masked_mean(per_frame, validity)
