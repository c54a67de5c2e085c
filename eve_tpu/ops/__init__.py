"""Pure-JAX ops: gaze geometry, heatmaps, soft-argmax, history recurrence."""

from eve_tpu.ops.geometry import (  # noqa: F401
    pitchyaw_to_vector,
    vector_to_pitchyaw,
    pitchyaw_to_rotation,
    rotation_to_vector,
    apply_transformation,
    apply_rotation,
    get_intersect_with_zero,
    to_screen_coordinates,
    calculate_combined_gaze_direction,
    apply_offset_augmentation,
    rodrigues,
)
from eve_tpu.ops.heatmap import (  # noqa: F401
    make_heatmaps,
    soft_argmax,
    history_update,
    decayed_history_scan,
)
