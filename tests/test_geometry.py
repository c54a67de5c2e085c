"""Golden tests for eve_tpu.ops.geometry against naive numpy oracles.

The oracles are written independently from first principles (per-sample
loops, explicit matrix construction) mirroring the documented reference
semantics; the JAX implementations must match them elementwise.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from eve_tpu.ops import geometry as G


def np_pitchyaw_to_vector(a):
    p, y = a[0], a[1]
    return np.array([np.cos(p) * np.sin(y), np.sin(p), np.cos(p) * np.cos(y)])


def np_vector_to_pitchyaw(v):
    v = v / (np.linalg.norm(v) + 1e-7)
    return np.array([np.arcsin(v[1]), np.arctan2(v[0], v[2])])


def np_rotation(pitchyaw):
    p, y = pitchyaw
    Rx = np.array([[1, 0, 0],
                   [0, np.cos(p), np.sin(p)],
                   [0, -np.sin(p), np.cos(p)]])
    Ry = np.array([[np.cos(y), 0, np.sin(y)],
                   [0, 1, 0],
                   [-np.sin(y), 0, np.cos(y)]])
    return Ry @ Rx


def random_pitchyaw(rng, n):
    return np.stack([rng.uniform(-1.2, 1.2, n), rng.uniform(-1.5, 1.5, n)], -1)


def test_pitchyaw_vector_roundtrip(rng):
    a = random_pitchyaw(rng, 64).astype(np.float32)
    v = np.asarray(G.pitchyaw_to_vector(jnp.asarray(a)))
    for i in range(64):
        np.testing.assert_allclose(v[i], np_pitchyaw_to_vector(a[i]), atol=1e-6)
    back = np.asarray(G.vector_to_pitchyaw(jnp.asarray(v)))
    np.testing.assert_allclose(back, a, atol=1e-4)


def test_pitchyaw_to_vector_3d_normalizes(rng):
    v = rng.randn(10, 3).astype(np.float32)
    out = np.asarray(G.pitchyaw_to_vector(jnp.asarray(v)))
    np.testing.assert_allclose(np.linalg.norm(out, axis=-1), 1.0, atol=1e-5)


def test_pitchyaw_to_rotation(rng):
    a = random_pitchyaw(rng, 32).astype(np.float32)
    R = np.asarray(G.pitchyaw_to_rotation(jnp.asarray(a)))
    for i in range(32):
        np.testing.assert_allclose(R[i], np_rotation(a[i]), atol=1e-6)
        # R rotates the frontal vector into the pitchyaw direction.
        np.testing.assert_allclose(
            R[i] @ np.array([0, 0, 1.0]), np_pitchyaw_to_vector(a[i]), atol=1e-6)


def test_rotation_to_vector(rng):
    a = random_pitchyaw(rng, 8).astype(np.float32)
    R = G.pitchyaw_to_rotation(jnp.asarray(a))
    v = np.asarray(G.rotation_to_vector(R))[..., 0]
    for i in range(8):
        np.testing.assert_allclose(v[i], np_pitchyaw_to_vector(a[i]), atol=1e-6)


def test_apply_transformation_and_rotation(rng):
    T = np.tile(np.eye(4, dtype=np.float32), (5, 1, 1))
    Rs = [np_rotation(p) for p in random_pitchyaw(rng, 5)]
    for i in range(5):
        T[i, :3, :3] = Rs[i]
        T[i, :3, 3] = rng.randn(3)
    v = rng.randn(5, 3).astype(np.float32)
    out_t = np.asarray(G.apply_transformation(jnp.asarray(T), jnp.asarray(v)))
    out_r = np.asarray(G.apply_rotation(jnp.asarray(T), jnp.asarray(v)))
    for i in range(5):
        np.testing.assert_allclose(out_t[i], Rs[i] @ v[i] + T[i, :3, 3], atol=1e-5)
        np.testing.assert_allclose(out_r[i], Rs[i] @ v[i], atol=1e-5)


def test_intersect_with_zero_analytic():
    # Ray from (0, 0, 10) toward -z hits the plane at its (x, y) = (0, 0).
    o = jnp.asarray([[0.0, 0.0, 10.0], [1.0, 2.0, 5.0]])
    g = jnp.asarray([[0.0, 0.0, -1.0], [0.0, 0.0, -1.0]])
    out = np.asarray(G.get_intersect_with_zero(o, g))
    np.testing.assert_allclose(out, [[0, 0], [1, 2]], atol=1e-4)

    # 45 degree ray: z drop of 10 means x shift of 10.
    g2 = jnp.asarray([[np.sqrt(0.5), 0.0, -np.sqrt(0.5)]])
    out2 = np.asarray(G.get_intersect_with_zero(o[:1], g2))
    np.testing.assert_allclose(out2, [[10.0, 0.0]], atol=1e-3)


def _fake_camera(rng, n):
    """Random but sane camera rigs: screen plane z=0, camera in front."""
    cam_T = np.tile(np.eye(4, dtype=np.float32), (n, 1, 1))
    for i in range(n):
        R = np_rotation(rng.uniform(-0.2, 0.2, 2))
        cam_T[i, :3, :3] = R
        cam_T[i, :3, 3] = [rng.uniform(-50, 50), rng.uniform(-30, 30),
                           rng.uniform(-20, 20)]
    inv_T = np.linalg.inv(cam_T).astype(np.float32)
    ppm = np.tile(np.array([[1920.0 / 530.0, 1080.0 / 300.0]], np.float32),
                  (n, 1))
    return cam_T, inv_T, ppm


def test_to_screen_coordinates_roundtrip(rng):
    """PoG -> combined gaze -> PoG must be a fixed point."""
    n = 16
    cam_T, inv_T, ppm = _fake_camera(rng, n)
    ref = {'inv_camera_transformation': jnp.asarray(inv_T),
           'pixels_per_millimeter': jnp.asarray(ppm)}
    # Gaze origins in camera space (mm): roughly 60cm in front of camera.
    o = np.stack([rng.uniform(-30, 30, n), rng.uniform(-20, 20, n),
                  rng.uniform(550, 650, n)], -1).astype(np.float32)
    head_R = np.stack(
        [np_rotation(p) for p in random_pitchyaw(rng, n) * 0.2]
    ).astype(np.float32)

    # Pick a target PoG on the screen (in mm), derive the user-perspective
    # gaze with calculate_combined_gaze_direction, then project it back.
    PoG_mm_target = np.stack([rng.uniform(100, 430, n),
                              rng.uniform(50, 250, n)], -1).astype(np.float32)
    g = G.calculate_combined_gaze_direction(
        jnp.asarray(o), jnp.asarray(PoG_mm_target),
        jnp.asarray(head_R), jnp.asarray(cam_T))
    PoG_mm, PoG_px = G.to_screen_coordinates(
        jnp.asarray(o), g, jnp.asarray(head_R), ref)
    np.testing.assert_allclose(np.asarray(PoG_mm), PoG_mm_target,
                               rtol=1e-3, atol=0.5)
    expected_px = PoG_mm_target * ppm
    np.testing.assert_allclose(np.asarray(PoG_px), expected_px,
                               rtol=1e-3, atol=1.0)


def test_offset_augmentation_inverse(rng):
    """Applying kappa then inverse kappa returns the original gaze."""
    n = 12
    g = (random_pitchyaw(rng, n) * 0.3).astype(np.float32)
    head_R = np.stack(
        [np_rotation(p) for p in random_pitchyaw(rng, n) * 0.2]
    ).astype(np.float32)
    kappa = (rng.randn(n, 2) * 0.05).astype(np.float32)
    g_aug = G.apply_offset_augmentation(
        jnp.asarray(g), jnp.asarray(head_R), jnp.asarray(kappa))
    # zero kappa is identity
    g_same = G.apply_offset_augmentation(
        jnp.asarray(g), jnp.asarray(head_R), jnp.zeros_like(jnp.asarray(kappa)))
    np.testing.assert_allclose(np.asarray(g_same), g, atol=1e-5)
    # augmented differs
    assert np.abs(np.asarray(g_aug) - g).max() > 1e-3


def test_rodrigues_vs_cv2(rng):
    cv2 = pytest.importorskip('cv2')
    rvecs = (rng.randn(20, 3) * 0.8).astype(np.float64)
    rvecs[0] = 0.0  # identity corner case
    ours = np.asarray(G.rodrigues(jnp.asarray(rvecs.astype(np.float32))))
    for i in range(20):
        expected, _ = cv2.Rodrigues(rvecs[i])
        np.testing.assert_allclose(ours[i], expected, atol=1e-5)


def test_angular_error_degrees():
    a = jnp.asarray([[0.0, 0.0]])
    b = jnp.asarray([[0.0, np.pi / 2]])
    err = np.asarray(G.angular_error_degrees(a, b))
    np.testing.assert_allclose(err, [90.0], atol=1e-3)
    same = np.asarray(G.angular_error_degrees(a, a))
    assert same[0] < 0.05  # f32-safe clamp floor is ~0.028 deg (see geometry.py)


def test_batched_leading_dims(rng):
    """All ops accept (B, T, ...) batches and match the flat computation."""
    a = random_pitchyaw(rng, 24).astype(np.float32).reshape(4, 6, 2)
    flat = np.asarray(G.pitchyaw_to_vector(jnp.asarray(a.reshape(-1, 2))))
    nested = np.asarray(G.pitchyaw_to_vector(jnp.asarray(a)))
    np.testing.assert_allclose(nested.reshape(-1, 3), flat, atol=1e-7)

    R = np.asarray(G.pitchyaw_to_rotation(jnp.asarray(a)))
    Rf = np.asarray(G.pitchyaw_to_rotation(jnp.asarray(a.reshape(-1, 2))))
    np.testing.assert_allclose(R.reshape(-1, 3, 3), Rf, atol=1e-7)


def test_numpy_gaze_twin_matches_device_ops():
    """Offline numpy helpers agree with the device ops on angular error.

    The two reference twins differ by a y-sign in the 3D convention
    (src/core/gaze.py:38 vs src/models/common.py:36); angular error is
    invariant to the consistent flip, so the numbers must match.
    """
    from eve_tpu.utils import gaze_np
    rng = np.random.RandomState(0)
    a = rng.uniform(-1.0, 1.0, (16, 2)).astype(np.float32)
    b = rng.uniform(-1.0, 1.0, (16, 2)).astype(np.float32)
    ours_np = gaze_np.angular_error(a, b)
    ours_dev = np.asarray(G.angular_error_degrees(
        jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(ours_np, ours_dev, rtol=1e-3, atol=1e-3)

    # Round trip in the numpy twin's own convention
    v = gaze_np.pitchyaw_to_vector(a)
    back = gaze_np.vector_to_pitchyaw(v)
    np.testing.assert_allclose(back, a, atol=1e-5)

    # gaussian_2d peaks at the centre with value 1
    hm = gaze_np.gaussian_2d((31, 41), centre=(20, 15), sigma=3.0)
    assert hm.shape == (31, 41)
    assert hm.max() == 1.0
    ij = np.unravel_index(hm.argmax(), hm.shape)
    assert abs(ij[1] - 20) <= 1 and abs(ij[0] - 15) <= 1
