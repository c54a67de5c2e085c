"""Synthetic EVE-like data with analytically known geometry.

The real EVE dataset is unavailable in CI; this module builds batches (and,
via ``write_synthetic_dataset``, an on-disk dataset tree mimicking the EVE
layout) where the gaze geometry is constructed so the ground-truth PoG is
exactly recoverable: a virtual camera at a known rig transform, eyes at a
known 3D origin, gaze directions derived from chosen screen points via the
same combined-gaze math the model uses. This substitutes for the reference's
missing test data (SURVEY.md section 4) and gives end-to-end correctness
signals.
"""

import numpy as np

from eve_tpu.ops import geometry as geo

import jax.numpy as jnp


def _rotation_np(pitchyaw):
    p, y = pitchyaw
    Rx = np.array([[1, 0, 0],
                   [0, np.cos(p), np.sin(p)],
                   [0, -np.sin(p), np.cos(p)]])
    Ry = np.array([[np.cos(y), 0, np.sin(y)],
                   [0, 1, 0],
                   [-np.sin(y), 0, np.cos(y)]])
    return (Ry @ Rx).astype(np.float32)


def make_synthetic_batch(rng, batch_size=2, sequence_len=4, eyes_size=64,
                         screen_size=(128, 72), with_screen=True,
                         with_gt=True, fps=30.0):
    """Build a geometry-consistent (B, T, ...) input batch (numpy, NHWC).

    The ground-truth gazes are derived from sampled screen points through
    ``calculate_combined_gaze_direction``, so a perfect gaze estimator
    projects back onto those points exactly.
    """
    B, T = batch_size, sequence_len
    mm_w, mm_h = 530.0, 300.0  # physical screen size (mm)
    ppm = np.array([1920.0 / mm_w, 1080.0 / mm_h], np.float32)

    batch = {}
    batch['left_eye_patch'] = rng.uniform(
        -1, 1, (B, T, eyes_size, eyes_size, 3)).astype(np.float32)
    batch['right_eye_patch'] = rng.uniform(
        -1, 1, (B, T, eyes_size, eyes_size, 3)).astype(np.float32)
    if with_screen:
        batch['screen_frame'] = rng.uniform(
            0, 1, (B, T, screen_size[1], screen_size[0], 3)).astype(np.float32)

    # Camera rig: camera-space -> screen-space homogeneous transform.
    cam_T = np.tile(np.eye(4, dtype=np.float32), (B, T, 1, 1))
    for b in range(B):
        R = _rotation_np(rng.uniform(-0.15, 0.15, 2))
        t = np.array([rng.uniform(-40, 40), rng.uniform(-20, 20),
                      rng.uniform(-10, 10)], np.float32)
        cam_T[b, :, :3, :3] = R
        cam_T[b, :, :3, 3] = t
    inv_cam_T = np.linalg.inv(cam_T).astype(np.float32)
    batch['camera_transformation'] = cam_T
    batch['inv_camera_transformation'] = inv_cam_T
    batch['millimeters_per_pixel'] = np.tile(
        (1.0 / ppm).astype(np.float32), (B, T, 1))
    batch['pixels_per_millimeter'] = np.tile(ppm, (B, T, 1))

    # Eye origins ~60 cm in front of the camera, slightly apart.
    o_mid = np.stack([rng.uniform(-30, 30, (B, T)),
                      rng.uniform(-20, 20, (B, T)),
                      rng.uniform(550, 650, (B, T))], -1).astype(np.float32)
    eye_gap = np.array([31.0, 0.0, 0.0], np.float32)
    batch['left_o'] = o_mid + eye_gap
    batch['right_o'] = o_mid - eye_gap

    # Head rotation (shared L/R as in the dataset).
    head_R = np.zeros((B, T, 3, 3), np.float32)
    for b in range(B):
        head_R[b, :] = _rotation_np(rng.uniform(-0.2, 0.2, 2))
    batch['head_R'] = head_R
    batch['left_R'] = head_R.copy()
    batch['right_R'] = head_R.copy()
    batch['left_h'] = rng.uniform(-0.3, 0.3, (B, T, 2)).astype(np.float32)
    batch['right_h'] = rng.uniform(-0.3, 0.3, (B, T, 2)).astype(np.float32)

    # Timestamps: rebased nanoseconds, frame 0 at 1 ns.
    step_ns = 1e9 / fps
    ts = (np.arange(T) * step_ns + 1.0)[None, :].repeat(B, 0)
    batch['timestamps'] = ts.astype(np.float32)

    ones = np.ones((B, T), np.float32)
    for side in ('left', 'right'):
        batch[side + '_o_validity'] = ones.copy()
        batch[side + '_R_validity'] = ones.copy()

    if with_gt:
        # Sample PoG on screen; derive the exact user-perspective gaze.
        PoG_px = np.stack([rng.uniform(200, 1700, (B, T)),
                           rng.uniform(150, 950, (B, T))], -1).astype(np.float32)
        PoG_mm = PoG_px / ppm
        for side in ('left', 'right'):
            g = geo.calculate_combined_gaze_direction(
                jnp.asarray(batch[side + '_o']), jnp.asarray(PoG_mm),
                jnp.asarray(head_R), jnp.asarray(cam_T))
            batch[side + '_g_tobii'] = np.asarray(g)
            batch[side + '_g_tobii_validity'] = ones.copy()
            batch[side + '_PoG_tobii'] = PoG_px.copy()
            batch[side + '_PoG_tobii_validity'] = ones.copy()
            batch[side + '_p'] = rng.uniform(
                2, 5, (B, T)).astype(np.float32)
            batch[side + '_p_validity'] = ones.copy()

    return batch
