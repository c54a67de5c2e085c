"""Numpy gaze utilities for offline evaluation and visualization.

Twin of the reference's numpy helpers (``src/core/gaze.py:25-90``): angular
error between pitch/yaw gazes and an arrow-drawing helper for overlays.

NOTE the reference's two conversion twins disagree on a sign: the numpy twin
uses ``y = -sin(pitch)`` (src/core/gaze.py:38) while the torch/model twin
uses ``y = +sin(pitch)`` (src/models/common.py:36). Angular *error* is
invariant to a consistent y-flip of both arguments, so the numbers match
as long as both gazes go through the same twin. This module reproduces the
numpy twin's convention exactly; the device ops (eve_tpu/ops/geometry.py)
reproduce the model twin's.
"""

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None


def pitchyaw_to_vector(pitchyaws):
    """(N, 2) pitch/yaw -> (N, 3) unit vectors, numpy-twin sign convention."""
    pitchyaws = np.asarray(pitchyaws, np.float64)
    sin = np.sin(pitchyaws)
    cos = np.cos(pitchyaws)
    out = np.empty((pitchyaws.shape[0], 3))
    out[:, 0] = np.multiply(cos[:, 0], sin[:, 1])
    out[:, 1] = -sin[:, 0]                      # note: -sin (gaze.py:38)
    out[:, 2] = np.multiply(cos[:, 0], cos[:, 1])
    return out


def vector_to_pitchyaw(vectors):
    """(N, 3) vectors -> (N, 2) pitch/yaw, numpy-twin sign convention."""
    vectors = np.asarray(vectors, np.float64)
    n = vectors / np.linalg.norm(vectors, axis=1, keepdims=True)
    out = np.empty((vectors.shape[0], 2))
    out[:, 0] = np.arcsin(-n[:, 1])
    out[:, 1] = np.arctan2(n[:, 0], n[:, 2])
    return out


def angular_error(a, b):
    """Per-sample angular errors in degrees.

    Accepts (N, 2) pitch/yaw or (N, 3) direction vectors per argument,
    matching the reference's shape dispatch (gaze.py:55-58).
    """
    a = np.asarray(a)
    b = np.asarray(b)
    a = pitchyaw_to_vector(a) if a.shape[1] == 2 else a
    b = pitchyaw_to_vector(b) if b.shape[1] == 2 else b
    ab = np.sum(a * b, axis=1)
    na = np.clip(np.linalg.norm(a, axis=1), 1e-8, None)
    nb = np.clip(np.linalg.norm(b, axis=1), 1e-8, None)
    sim = ab / (na * nb)
    sim = np.clip(sim, -1.0 + 1e-8, 1.0 - 1e-8)
    return np.degrees(np.arccos(sim))


def draw_gaze(image, pos, pitchyaw, length=40.0, thickness=2,
              color=(0, 0, 255)):
    """Draw a gaze arrow at ``pos`` on a BGR image (in place).

    Reference: src/core/gaze.py:80-90.
    """
    assert cv2 is not None
    image_out = image
    if len(image_out.shape) == 2 or image_out.shape[2] == 1:
        image_out = cv2.cvtColor(image_out, cv2.COLOR_GRAY2BGR)
    dx = -length * np.sin(pitchyaw[1])
    dy = -length * np.sin(pitchyaw[0])
    cv2.arrowedLine(
        image_out, tuple(np.round(pos).astype(np.int32)),
        tuple(np.round([pos[0] + dx, pos[1] + dy]).astype(int)),
        color, thickness, cv2.LINE_AA, tipLength=0.2)
    return image_out


def gaussian_2d(shape=(32, 32), centre=(16, 16), sigma=1.0):
    """Dense 2D Gaussian, peak-normalized. Reference: utils/heatmap.py:31-41.

    (The reference's sibling ``onehot_from_values`` references a config key
    that does not exist — latent dead code, intentionally not ported.)
    """
    xs = np.arange(0.5, shape[1] + 0.5, step=1.0, dtype=np.float32)
    ys = np.arange(0.5, shape[0] + 0.5, step=1.0,
                   dtype=np.float32)[:, np.newaxis]
    alpha = -0.5 / (sigma ** 2)
    heatmap = np.exp(alpha * ((xs - centre[0]) ** 2 + (ys - centre[1]) ** 2))
    return heatmap / heatmap.max()
