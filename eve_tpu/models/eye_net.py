"""EyeNet: per-eye gaze-direction + pupil-size network.

Functionally equivalent to the reference EyeNet
(``/root/reference/src/models/eye_net.py:37-150``): ResNet-18/InstanceNorm
backbone -> optional 2D head-pose concat -> 2-layer SELU MLP -> stack of
dense RNN cells (default 1x GRU-128) -> gaze head (tanh * pi/2, zero-init
final layer, no bias) and pupil head (ReLU).

TPU-first split: the backbone + ``fc_common`` (``features`` method) are
recurrence-free and run batched over (B*T*eyes) on the MXU; only
``recurrent`` (the tiny dense cells) runs inside the temporal ``lax.scan``;
``heads`` runs batched over (B*T) afterwards. The reference instead runs the
full network once per timestep in a Python loop (src/models/eve.py:91-111).
"""

import math
from typing import Any

import jax.numpy as jnp
import flax.linen as nn

from eve_tpu.models.cells import DENSE_CELLS
from eve_tpu.models.layers import TorchLinear, selu
from eve_tpu.models.resnet import ResNet18IN

HALF_PI = 0.5 * math.pi


class EyeNet(nn.Module):
    num_features: int = 128
    use_rnn: bool = True
    rnn_type: str = 'GRU'
    rnn_num_cells: int = 1
    use_head_pose_input: bool = True
    compute_dtype: Any = jnp.float32
    stem: str = 'reference'  # 'patchify' = tpu_native_arch (see resnet.py)

    def setup(self):
        self.cnn = ResNet18IN(num_classes=self.num_features,
                              compute_dtype=self.compute_dtype,
                              stem=self.stem, name='cnn')
        # Indices mirror the reference nn.Sequential layout for conversion.
        self.fc_common_0 = TorchLinear(self.num_features, name='fc_common_0')
        self.fc_common_2 = TorchLinear(self.num_features, name='fc_common_2')
        if self.use_rnn:
            cell_cls = DENSE_CELLS[self.rnn_type]
            self.rnn_cells = [
                cell_cls(hidden_size=self.num_features, name=f'rnn_cell_{i}')
                for i in range(self.rnn_num_cells)
            ]
        else:
            self.static_fc_0 = TorchLinear(self.num_features,
                                           name='static_fc_0')
        self.fc_to_gaze_0 = TorchLinear(self.num_features, name='fc_to_gaze_0')
        self.fc_to_gaze_2 = TorchLinear(2, use_bias=False, zero_init=True,
                                        name='fc_to_gaze_2')
        self.fc_to_pupil_0 = TorchLinear(self.num_features,
                                         name='fc_to_pupil_0')
        self.fc_to_pupil_2 = TorchLinear(1, name='fc_to_pupil_2')

    def features(self, eye_patch, head_pose=None):
        """CNN + fc_common; batched over any leading dims. Recurrence-free."""
        f = self.cnn(eye_patch)
        if self.use_head_pose_input:
            assert head_pose is not None
            f = jnp.concatenate([f, head_pose.astype(f.dtype)], axis=-1)
        f = self.fc_common_0(f)
        f = selu(f)
        f = self.fc_common_2(f)
        return f

    def recurrent(self, features, states):
        """Apply the RNN cell stack for one timestep.

        Args:
          features: (B, F) output of ``features``.
          states: tuple of per-cell states (see ``init_state``).

        Returns:
          (output_features, new_states).
        """
        assert self.use_rnn
        f = features
        new_states = []
        for cell, s in zip(self.rnn_cells, states):
            f, ns = cell(f, s)
            new_states.append(ns)
        return f, tuple(new_states)

    def static_path(self, features):
        """Non-recurrent alternative to the RNN stack (Linear + SELU)."""
        return selu(self.static_fc_0(features))

    def heads(self, features):
        """Gaze (pitch/yaw, bounded by pi/2 * tanh) and pupil size (ReLU)."""
        g = self.fc_to_gaze_0(features)
        g = selu(g)
        g = self.fc_to_gaze_2(g)
        gaze = HALF_PI * jnp.tanh(g)
        p = self.fc_to_pupil_0(features)
        p = selu(p)
        p = self.fc_to_pupil_2(p)
        pupil = nn.relu(p)[..., 0]
        return gaze, pupil

    def init_state(self, batch_size, dtype=jnp.float32):
        """Zero initial states for the cell stack.

        The state structure lives in exactly one place
        (cells.zero_state, keyed by the cell class).
        """
        if not self.use_rnn:
            return ()
        from eve_tpu.models.cells import zero_state
        return tuple(
            zero_state(DENSE_CELLS[self.rnn_type], self.num_features,
                       batch_size, dtype=dtype)
            for _ in range(self.rnn_num_cells))

    def __call__(self, eye_patch, head_pose=None, states=None):
        """Single-timestep full forward (init/shape-inference convenience)."""
        f = self.features(eye_patch, head_pose)
        if self.use_rnn:
            if states is None:
                states = self.init_state(eye_patch.shape[0])
            f, states = self.recurrent(f, states)
        else:
            f = self.static_path(f)
        gaze, pupil = self.heads(f)
        return {'gaze': gaze, 'pupil': pupil, 'states': states}
