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


# Pupil-disc gaze encoding: the disc center offset from the patch center is
# linear in the gaze pitchyaw, so a CNN *can* regress gaze from pixels and
# the end-to-end learning path (pixels -> EyeNet -> angular loss) is
# exercised for real, not just the screen-prior RefineNet path. Full scale
# GAZE_ENC_RANGE rad maps to +-GAZE_ENC_AMPL of the patch; with the disc
# radius this keeps the disc inside [0.12, 0.88] of the patch, clear of the
# frame-index strip written by write_synthetic_dataset.
GAZE_ENC_RANGE = 1.0
GAZE_ENC_AMPL = 0.25
GAZE_ENC_RADIUS = 0.09


def render_gaze_patches(g_pitchyaw, size):
    """Render eye patches whose pupil position encodes gaze.

    Args:
      g_pitchyaw: (..., 2) gaze directions (pitch, yaw) in radians.
      size: patch height/width in pixels.

    Returns:
      (..., size, size, 3) uint8 patches: dark background, bright disc at
      center + (pitch, yaw) / GAZE_ENC_RANGE * GAZE_ENC_AMPL * size.
    """
    g = np.asarray(g_pitchyaw, np.float32)
    lead = g.shape[:-1]
    enc = np.clip(g / GAZE_ENC_RANGE, -1.0, 1.0) * GAZE_ENC_AMPL
    cy = (0.5 + enc[..., 0]) * size  # pitch -> vertical
    cx = (0.5 + enc[..., 1]) * size  # yaw -> horizontal
    yy = np.arange(size, dtype=np.float32)[:, None]
    xx = np.arange(size, dtype=np.float32)[None, :]
    d2 = ((yy - cy[..., None, None]) ** 2 +
          (xx - cx[..., None, None]) ** 2)
    r2 = (GAZE_ENC_RADIUS * size) ** 2
    disc = d2 <= r2
    patch = np.full(lead + (size, size), 30, np.uint8)
    patch[disc] = 230
    return np.repeat(patch[..., None], 3, axis=-1)


def decode_gaze_from_patch(patch_uint8):
    """Inverse of :func:`render_gaze_patches` (centroid of bright pixels).

    Tolerates codec loss; used by tests to confirm the encoding survives
    video round-trips. Returns (pitch, yaw) in radians.
    """
    p = np.asarray(patch_uint8, np.float32).mean(-1)
    size = p.shape[-1]
    mask = (p > 128).astype(np.float32)
    # Ignore the frame-index band written by write_synthetic_dataset (top
    # rows, bright for late frames); the disc never enters the top 0.15.
    mask[..., :int(0.15 * size), :] = 0.0
    yy = np.arange(size, dtype=np.float32)[:, None]
    xx = np.arange(size, dtype=np.float32)[None, :]
    total = np.maximum(mask.sum((-2, -1)), 1e-6)
    cy = (mask * yy).sum((-2, -1)) / total
    cx = (mask * xx).sum((-2, -1)) / total
    pitch = (cy / size - 0.5) / GAZE_ENC_AMPL * GAZE_ENC_RANGE
    yaw = (cx / size - 0.5) / GAZE_ENC_AMPL * GAZE_ENC_RANGE
    return np.stack([pitch, yaw], -1)


def make_synthetic_batch(rng, batch_size=2, sequence_len=4, eyes_size=64,
                         screen_size=(128, 72), with_screen=True,
                         with_gt=True, fps=30.0, frame_dtype=np.float32):
    """Build a geometry-consistent (B, T, ...) input batch (numpy, NHWC).

    The ground-truth gazes are derived from sampled screen points through
    ``calculate_combined_gaze_direction``, so a perfect gaze estimator
    projects back onto those points exactly.

    ``frame_dtype=np.uint8`` emits raw camera/screen bytes for the
    on-device-preprocessing path (tpu_on_device_preprocess).
    """
    B, T = batch_size, sequence_len
    mm_w, mm_h = 530.0, 300.0  # physical screen size (mm)
    ppm = np.array([1920.0 / mm_w, 1080.0 / mm_h], np.float32)

    batch = {}
    if with_screen:
        if frame_dtype == np.uint8:
            batch['screen_frame'] = rng.randint(
                0, 256, (B, T, screen_size[1], screen_size[0], 3)
            ).astype(np.uint8)
        else:
            batch['screen_frame'] = rng.uniform(
                0, 1, (B, T, screen_size[1], screen_size[0], 3)
            ).astype(np.float32)

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

    # Eye patches: pupil-disc rendering of the GT gaze (so the CNN can learn
    # pixels -> gaze); pure noise when no GT exists to encode.
    for side in ('left', 'right'):
        if with_gt:
            patch = render_gaze_patches(batch[side + '_g_tobii'], eyes_size)
        else:
            patch = rng.randint(0, 256, (B, T, eyes_size, eyes_size, 3)
                                ).astype(np.uint8)
        if frame_dtype == np.uint8:
            batch[side + '_eye_patch'] = patch
        else:
            batch[side + '_eye_patch'] = (
                patch.astype(np.float32) * (2.0 / 255.0) - 1.0)

    return batch


# ----------------------------------------------------------------------
# On-disk synthetic dataset (EVE directory layout)
# ----------------------------------------------------------------------

def _write_video(path, frames_uint8, fps):
    """Write uint8 RGB frames to an mp4 via OpenCV."""
    import cv2
    h, w = frames_uint8.shape[1:3]
    writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*'mp4v'),
                             fps, (w, h))
    assert writer.isOpened(), path
    for frame in frames_uint8:
        writer.write(cv2.cvtColor(frame, cv2.COLOR_RGB2BGR))
    writer.release()


def write_synthetic_dataset(root, participants=('train01',),
                            stimuli=('step008_image_test',),
                            cameras=('webcam_c',), num_frames=40,
                            eyes_size=128, seed=0):
    """Write an EVE-layout dataset tree with analytic geometry labels.

    Per participant/stimulus: camera ``<cam>_eyes.mp4`` (2*eyes x eyes strip,
    30 fps), ``<cam>.h5`` labels, ``<cam>.timestamps.txt``; plus
    ``screen.128x72.mp4`` + ``screen.timestamps.txt``. Eye patches render the
    GT gaze as a pupil disc (:func:`render_gaze_patches`), making the
    pixels->gaze path genuinely learnable; a top band (and, in the screen/
    full-frame videos, every pixel) encodes the frame index (5 + 6*index) so
    frame-exact decode stays verifiable through the lossy codec.
    """
    import h5py
    import os
    rng = np.random.RandomState(seed)
    fps = 30
    base_ns = int(1.6e18)
    step_ns = int(1e9 / fps)

    mm_w, mm_h = 530.0, 300.0
    ppm = np.array([1920.0 / mm_w, 1080.0 / mm_h], np.float32)

    for participant in participants:
        for stimulus in stimuli:
            d = os.path.join(root, participant, stimulus)
            os.makedirs(d, exist_ok=True)
            N = num_frames
            timestamps = base_ns + np.arange(N, dtype=np.int64) * step_ns \
                + rng.randint(0, 1000, N)
            timestamps.sort()

            # Screen video (30 fps, same length)
            screen_frames = np.zeros((N, 72, 128, 3), np.uint8)
            for i in range(N):
                screen_frames[i] = min(5 + 6 * i, 250)
            _write_video(os.path.join(d, 'screen.128x72.mp4'),
                         screen_frames, fps)
            # Stand-in for the full-resolution screen recording consumed by
            # the inference visualizer (load_full_frame_for_visualization;
            # the real dataset ships 1920x1080 — the overlay scales PoG
            # coordinates to the actual canvas size).
            full_screen = np.zeros((N, 216, 384, 3), np.uint8)
            for i in range(N):
                full_screen[i] = min(5 + 6 * i, 250)
            _write_video(os.path.join(d, 'screen.mp4'), full_screen, fps)
            np.savetxt(os.path.join(d, 'screen.timestamps.txt'),
                       timestamps, fmt='%d')

            for cam in cameras:
                cam_fps = 60 if cam == 'basler' else 30
                Nc = N * cam_fps // fps
                cam_ts = base_ns + np.arange(Nc, dtype=np.int64) * \
                    int(1e9 / cam_fps)
                # Small stand-in for the full camera frame video (the real
                # dataset ships 1080p; inference.py takes this path as its
                # --input-path identifier).
                full_frames = np.zeros((Nc, 108, 192, 3), np.uint8)
                for i in range(Nc):
                    full_frames[i] = min(5 + 6 * i, 250)
                _write_video(os.path.join(d, '%s.mp4' % cam),
                             full_frames, cam_fps)
                np.savetxt(os.path.join(d, '%s.timestamps.txt' % cam),
                           cam_ts, fmt='%d')

                # Geometry labels: camera rig + gaze toward sampled PoG
                cam_T = np.eye(4, dtype=np.float32)
                cam_T[:3, :3] = _rotation_np(rng.uniform(-0.1, 0.1, 2))
                cam_T[:3, 3] = [rng.uniform(-30, 30), rng.uniform(-15, 15),
                                rng.uniform(-5, 5)]
                inv_cam_T = np.linalg.inv(cam_T).astype(np.float32)

                o_mid = np.stack([
                    rng.uniform(-30, 30, Nc), rng.uniform(-20, 20, Nc),
                    rng.uniform(550, 650, Nc)], -1).astype(np.float32)
                left_o = o_mid + np.array([31.0, 0, 0], np.float32)
                right_o = o_mid - np.array([31.0, 0, 0], np.float32)
                head_pitchyaw = rng.uniform(-0.2, 0.2, 2)
                head_R = np.tile(_rotation_np(head_pitchyaw), (Nc, 1, 1))
                head_rvec = np.tile(
                    _rvec_from_R(_rotation_np(head_pitchyaw)), (Nc, 1))

                PoG_px = np.stack([rng.uniform(200, 1700, Nc),
                                   rng.uniform(150, 950, Nc)],
                                  -1).astype(np.float32)
                PoG_mm = PoG_px / ppm
                cam_T_b = np.tile(cam_T, (Nc, 1, 1))
                g_left = np.asarray(geo.calculate_combined_gaze_direction(
                    jnp.asarray(left_o), jnp.asarray(PoG_mm),
                    jnp.asarray(head_R), jnp.asarray(cam_T_b)))
                g_right = np.asarray(geo.calculate_combined_gaze_direction(
                    jnp.asarray(right_o), jnp.asarray(PoG_mm),
                    jnp.asarray(head_R), jnp.asarray(cam_T_b)))

                # Eyes video: per-frame pupil-disc gaze encoding. The strip
                # is [right | left] (the LEFT patch is the right half,
                # reference eve_sequences.py:283-285); a thin top band
                # encodes the frame index (5 + 6*i) for frame-exactness
                # probes, clear of the disc excursion range.
                left_half = render_gaze_patches(g_left, eyes_size)
                right_half = render_gaze_patches(g_right, eyes_size)
                eyes_frames = np.concatenate([right_half, left_half], axis=2)
                band = max(eyes_size // 12, 2)
                for i in range(Nc):
                    eyes_frames[i, :band] = min(5 + 6 * i, 250)
                _write_video(os.path.join(d, '%s_eyes.mp4' % cam),
                             eyes_frames, cam_fps)

                ones = np.ones(Nc, np.uint8)
                with h5py.File(os.path.join(d, '%s.h5' % cam), 'w') as f:
                    def grp(name, data, validity=None):
                        g = f.create_group(name)
                        g.create_dataset('data', data=data)
                        g.create_dataset(
                            'validity',
                            data=ones if validity is None else validity)

                    grp('left_o', left_o)
                    grp('right_o', right_o)
                    grp('left_R', head_R)
                    grp('right_R', head_R)
                    grp('head_rvec', head_rvec.astype(np.float32))
                    grp('left_h', rng.uniform(
                        -0.3, 0.3, (Nc, 2)).astype(np.float32))
                    grp('right_h', rng.uniform(
                        -0.3, 0.3, (Nc, 2)).astype(np.float32))
                    grp('left_p', rng.uniform(2, 5, Nc).astype(np.float32))
                    grp('right_p', rng.uniform(2, 5, Nc).astype(np.float32))
                    grp('left_g_tobii', g_left.astype(np.float32))
                    grp('right_g_tobii', g_right.astype(np.float32))
                    grp('left_PoG_tobii', PoG_px)
                    grp('right_PoG_tobii', PoG_px.copy())
                    f.create_dataset('camera_transformation', data=cam_T)
                    f.create_dataset('inv_camera_transformation',
                                     data=inv_cam_T)
                    f.create_dataset('millimeters_per_pixel',
                                     data=(1.0 / ppm).astype(np.float32))
                    f.create_dataset('pixels_per_millimeter', data=ppm)
    return root


def _rvec_from_R(R):
    """Rotation matrix -> rotation vector (inverse Rodrigues), numpy."""
    cos_theta = np.clip((np.trace(R) - 1.0) / 2.0, -1.0, 1.0)
    theta = np.arccos(cos_theta)
    if theta < 1e-8:
        return np.zeros(3, np.float32)
    axis = np.array([R[2, 1] - R[1, 2], R[0, 2] - R[2, 0],
                     R[1, 0] - R[0, 1]]) / (2.0 * np.sin(theta))
    return (theta * axis).astype(np.float32)
