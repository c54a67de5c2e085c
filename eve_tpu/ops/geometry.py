"""Gaze geometry ops, pure JAX, batched over arbitrary leading dimensions.

Semantics match the reference torch ops in
``/root/reference/src/models/common.py:32-218`` (pitch/yaw conventions, sign
flips between camera- and user-perspective, the z=0 plane intersection and the
mm->px screen projection) so that PoG numbers are bit-comparable. Unlike the
reference (which operates on flat ``(N, ...)`` tensors inside a per-timestep
Python loop), every function here broadcasts over arbitrary leading batch
dims ``(..., F)`` so a whole ``(B, T)`` clip batch is processed in one fused
XLA computation.

Angles are ``(pitch, yaw)`` in radians. The 3D convention: x right, y down
(pitch positive looking down in camera frame), z forward; gaze vectors stored
in *user* perspective (negated camera-perspective rays) exactly like the
reference.
"""

import jax
import jax.numpy as jnp

# All contractions here are tiny 3x3 rotations; force full float32 so
# TPU default-bf16 matmul precision cannot corrupt the geometry.
_PREC = jax.lax.Precision.HIGHEST

SCREEN_W_PX = 1920.0
SCREEN_H_PX = 1080.0


def pitchyaw_to_vector(a):
    """(..., 2) pitch/yaw -> (..., 3) unit vector; (..., 3) -> normalized.

    Reference: src/models/common.py:32-40.
    """
    if a.shape[-1] == 2:
        sin = jnp.sin(a)
        cos = jnp.cos(a)
        return jnp.stack([
            cos[..., 0] * sin[..., 1],
            sin[..., 0],
            cos[..., 0] * cos[..., 1],
        ], axis=-1)
    elif a.shape[-1] == 3:
        # torch.nn.functional.normalize: x / max(||x||, eps), eps=1e-12
        norm = _safe_norm(a, axis=-1, keepdims=True)
        return a / jnp.maximum(norm, 1e-12)
    raise ValueError('Cannot convert tensor of trailing dim %d' % a.shape[-1])


def _safe_norm(a, axis=-1, keepdims=False, eps=1e-14):
    """L2 norm with a finite gradient at ``a == 0``.

    ``jnp.linalg.norm`` has a NaN VJP at exactly zero (0/0); padded frames
    carry all-zero rotations/origins, so zero vectors DO occur on the loss
    path. sqrt(sum(a^2) + eps) keeps the value within 1e-7 and the gradient
    finite (zero) at the origin.
    """
    return jnp.sqrt(jnp.sum(jnp.square(a), axis=axis, keepdims=keepdims) + eps)


def vector_to_pitchyaw(a):
    """(..., 3) vector -> (..., 2) pitch/yaw. Reference: common.py:43-54."""
    if a.shape[-1] == 2:
        return a
    if a.shape[-1] != 3:
        raise ValueError('Cannot convert tensor of trailing dim %d' % a.shape[-1])
    # Zero vectors (padded frames) map to pitch/yaw (0, 0) like the
    # reference's atan2(0, 0) — but atan2's VJP at (0, 0) is NaN, so swap
    # in the frontal vector first (identical output, finite gradient).
    sq = jnp.sum(jnp.square(a), axis=-1, keepdims=True)
    frontal = jnp.zeros_like(a).at[..., 2].set(1.0)
    a = jnp.where(sq > 1e-12, a, frontal)
    norm_a = a / (_safe_norm(a, axis=-1, keepdims=True) + 1e-7)
    # At the pitch poles (x == z == 0, gaze along +-y) the yaw is genuinely
    # undefined and atan2's VJP is again 0/0 = NaN. Swap in the frontal
    # (x, z) = (0, 1) pair there: yaw 0 with zero gradient, same guard
    # pattern as above (the reference returns atan2 of float noise here).
    x, y, z = norm_a[..., 0], norm_a[..., 1], norm_a[..., 2]
    horiz = jnp.square(x) + jnp.square(z)
    off_pole = horiz > 1e-12
    x = jnp.where(off_pole, x, 0.0)
    z = jnp.where(off_pole, z, 1.0)
    return jnp.stack([jnp.arcsin(y), jnp.arctan2(x, z)], axis=-1)


def pitchyaw_to_rotation(a):
    """(..., 2) pitch/yaw (or (..., 3) vector) -> (..., 3, 3) rotation.

    R = R_yaw @ R_pitch, matching reference common.py:57-76.
    """
    if a.shape[-1] == 3:
        a = vector_to_pitchyaw(a)
    cos = jnp.cos(a)
    sin = jnp.sin(a)
    ones = jnp.ones_like(cos[..., 0])
    zeros = jnp.zeros_like(cos[..., 0])
    cp, cy = cos[..., 0], cos[..., 1]
    sp, sy = sin[..., 0], sin[..., 1]
    m1 = jnp.stack([ones, zeros, zeros,
                    zeros, cp, sp,
                    zeros, -sp, cp], axis=-1).reshape(a.shape[:-1] + (3, 3))
    m2 = jnp.stack([cy, zeros, sy,
                    zeros, ones, zeros,
                    -sy, zeros, cy], axis=-1).reshape(a.shape[:-1] + (3, 3))
    return jnp.einsum('...ij,...jk->...ik', m2, m1, precision=_PREC)


def rotation_to_vector(a):
    """(..., 3, 3) rotation -> (..., 3, 1) rotated frontal vector [0,0,1].

    Reference: common.py:79-86 (returns the last column of R).
    """
    return a[..., :, 2:3]


def apply_transformation(T, vec):
    """Homogeneous transform: (..., 4, 4) x (..., 3) -> (..., 3).

    Reference: common.py:89-94.
    """
    if vec.shape[-1] == 2:
        vec = pitchyaw_to_vector(vec)
    return jnp.einsum('...ij,...j->...i', T[..., :3, :3], vec, precision=_PREC) + T[..., :3, 3]


def apply_rotation(T, vec):
    """Rotation part only: (..., >=3, >=3) x (..., 3) -> (..., 3).

    Reference: common.py:97-102.
    """
    if vec.shape[-1] == 2:
        vec = pitchyaw_to_vector(vec)
    R = T[..., :3, :3]
    return jnp.einsum('...ij,...j->...i', R, vec, precision=_PREC)


def get_intersect_with_zero(o, g):
    """Intersect gaze rays (origin ``o``, direction ``g``) with the z=0 plane.

    Returns (..., 2) in-plane coordinates. Reference: common.py:109-126
    (plane normal [0,0,1], support point [1,0,0], denom eps 1e-7).
    """
    numer = -o[..., 2]          # sum((a - o) * n) with a=[1,0,0], n=[0,0,1]
    denom = g[..., 2] + 1e-7    # sum(g * n) + eps
    t = (numer / denom)[..., None]
    return (o + t * g)[..., :2]


def to_screen_coordinates(origin, direction, rotation, reference_dict,
                          actual_screen_size=(SCREEN_W_PX, SCREEN_H_PX)):
    """Project a gaze (origin mm, direction pitch/yaw, head rotation) to screen.

    Returns ``(PoG_mm, PoG_px)`` with px clamped to the physical screen.
    Reference: common.py:149-179. ``reference_dict`` must contain
    ``inv_camera_transformation`` (..., 4, 4) and ``pixels_per_millimeter``
    (..., 2).
    """
    direction = pitchyaw_to_vector(direction)
    direction = -direction                                # to camera perspective
    inv_rotation = jnp.swapaxes(rotation, -1, -2)
    direction = jnp.einsum('...ij,...j->...i', inv_rotation, direction, precision=_PREC)

    inv_camera_T = reference_dict['inv_camera_transformation']
    direction = apply_rotation(inv_camera_T, direction)
    origin = apply_transformation(inv_camera_T, origin)

    PoG_mm = get_intersect_with_zero(origin, direction)

    ppm = reference_dict['pixels_per_millimeter']
    PoG_px = jnp.stack([
        jnp.clip(PoG_mm[..., 0] * ppm[..., 0], 0.0, float(actual_screen_size[0])),
        jnp.clip(PoG_mm[..., 1] * ppm[..., 1], 0.0, float(actual_screen_size[1])),
    ], axis=-1)
    return PoG_mm, PoG_px


def calculate_combined_gaze_direction(avg_origin, avg_PoG, head_rotation,
                                      camera_transformation):
    """Combined L/R gaze direction from 3D origin and screen-plane PoG (mm).

    Reference: common.py:129-146.
    """
    PoG_3D = jnp.concatenate(
        [avg_PoG, jnp.zeros_like(avg_PoG[..., :1])], axis=-1)
    PoG_3D = apply_transformation(camera_transformation, PoG_3D)
    direction = PoG_3D - avg_origin
    direction = jnp.einsum('...ij,...j->...i', head_rotation, direction, precision=_PREC)
    direction = -direction                                # to user perspective
    return vector_to_pitchyaw(direction)


def apply_offset_augmentation(gaze_direction, head_rotation, kappa,
                              inverse_kappa=False):
    """Rotate a gaze by a per-sample kappa offset in head-relative space.

    Reference: common.py:182-218 (de-rotate to user perspective, apply kappa
    to the frontal vector via the head-relative gaze rotation, re-rotate).
    """
    g = pitchyaw_to_vector(gaze_direction)
    g = -g                                                # camera perspective
    inv_head_rotation = jnp.swapaxes(head_rotation, -1, -2)
    g = jnp.einsum('...ij,...j->...i', inv_head_rotation, g, precision=_PREC)
    g = -g                                                # user perspective

    kappa_vector = pitchyaw_to_vector(kappa)
    if inverse_kappa:
        kappa_vector = jnp.concatenate(
            [-kappa_vector[..., :2], kappa_vector[..., 2:3]], axis=-1)

    head_relative_gaze_rotation = pitchyaw_to_rotation(vector_to_pitchyaw(g))
    g = jnp.einsum('...ij,...j->...i', head_relative_gaze_rotation, kappa_vector, precision=_PREC)

    g = -g                                                # camera perspective
    g = jnp.einsum('...ij,...j->...i', head_rotation, g, precision=_PREC)
    g = -g                                                # user perspective
    return vector_to_pitchyaw(g)


def rodrigues(rvec):
    """Rotation vector (..., 3) -> rotation matrix (..., 3, 3).

    Replaces the reference's ``cv.Rodrigues`` call
    (src/datasources/eve_sequences.py:232) with pure array math so it can run
    vectorized on device or host.
    """
    # _safe_norm, not linalg.norm: the latter's VJP is NaN at rvec == 0 and
    # a value-level where() cannot fix a cotangent. With the 1e-14 floor,
    # theta >= 1e-7 everywhere and k = rvec/theta -> 0 at the origin; since
    # sin(theta)*K == sin(theta)/theta * cross(rvec) and (1-cos)K^2 ==
    # (1-cos)/theta^2 * cross(rvec)^2, the floor only perturbs terms below
    # f32 resolution — the Taylor limit (identity at rvec = 0) emerges
    # exactly, with a finite (zero) gradient, no branch needed.
    theta = _safe_norm(rvec, axis=-1, keepdims=True)
    k = rvec / theta
    kx, ky, kz = k[..., 0], k[..., 1], k[..., 2]
    zeros = jnp.zeros_like(kx)
    K = jnp.stack([zeros, -kz, ky,
                   kz, zeros, -kx,
                   -ky, kx, zeros], axis=-1).reshape(rvec.shape[:-1] + (3, 3))
    eye = jnp.broadcast_to(jnp.eye(3, dtype=rvec.dtype), K.shape)
    s = jnp.sin(theta)[..., None]
    c = jnp.cos(theta)[..., None]
    return eye + s * K + (1.0 - c) * jnp.einsum(
        '...ij,...jk->...ik', K, K, precision=_PREC)


def angular_error_degrees(a, b):
    """Angular error in degrees between pitch/yaw (or 3D) gazes.

    Matches the reference loss math (src/losses/angular.py:29-38): cosine
    similarity with eps, hardtanh clamp to +-(1 - 1e-8), acos, degrees.
    """
    va = pitchyaw_to_vector(a) if a.shape[-1] == 2 else a
    vb = pitchyaw_to_vector(b) if b.shape[-1] == 2 else b
    na = _safe_norm(va, axis=-1)
    nb = _safe_norm(vb, axis=-1)
    dot = jnp.sum(va * vb, axis=-1)
    # torch cosine_similarity semantics: dot / max(|a|*|b|, eps)
    sim = dot / jnp.maximum(na * nb, 1e-8)
    # The reference clamps to +-(1 - 1e-8) (hardtanh, src/losses/angular.py)
    # but 1 - 1e-8 is NOT representable in float32 — it rounds to 1.0,
    # leaving arccos' VJP infinite at sim == 1 (true at init: the zero-init
    # gaze head makes pred == pred). 1 - 1e-7 is representable and keeps the
    # clamp's intent (min reportable angle 0.026 deg vs 0.0081 deg).
    sim = jnp.clip(sim, -1.0 + 1e-7, 1.0 - 1e-7)
    return jnp.degrees(jnp.arccos(sim))
