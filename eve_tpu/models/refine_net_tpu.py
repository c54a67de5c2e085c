"""RefineNetTPU: the opt-in TPU-native gaze-refinement topology.

Same CONTRACT as ``RefineNet`` (``eve_tpu/models/refine_net.py``, reference
``/root/reference/src/models/refine_net.py:179-255``): input = initial PoG
heatmap (resized to 72x128) channel-concatenated with the screen frame;
encoder pyramid -> conv-RNN bottleneck at 5x8 -> decoder with skip
connections -> (72, 128) heatmap in (0, 1) consumed by the same soft-argmax.
The recurrent-state structure (``init_state``) is identical to RefineNet's,
so streaming/serving state handling is arch-agnostic.

Different TOPOLOGY, designed for the MXU instead of translated: the
reference pyramid spends ~2/3 of end-to-end inference in 3x3 convs with
16-32 channels at 72x128/36x64 — an output-feature dim of 16 against the
MXU's 128 lanes leaves the systolic array ~1/8 occupied no matter how XLA
tiles it, and the fine-level activations dominate HBM traffic (measured:
23.5 ms / 14.3 GB per 480-frame batch, ~32% MXU — BASELINE.md "inference
phase attribution"; every parity-preserving rewrite lost). This variant:

  * **Patchify stem**: one 4x4/4 convolution takes the (72, 128, C_in)
    input straight to (18, 32, 128) — the two underfilled fine levels
    disappear; every subsequent conv has >=128 output channels (full MXU
    lanes) on activations 16x smaller than level-0's.
  * **Coarse pyramid**: (18,32,128) -> (9,16,256) -> (5,8,nf) with the same
    pre-activation InstanceNorm blocks, adaptive-max-pool downsampling,
    bilinear upsampling and skip concatenation as the reference design.
  * **Sub-pixel head**: a zero-initialized conv to 16 = 4x4 channels at
    (18, 32) followed by depth-to-space recovers the full-resolution
    (72, 128) heatmap — a learned 4x upsampler in one lane-friendly matmul
    instead of three decoder levels of low-channel convs. Zero init keeps
    the reference behavior of a flat sigmoid(0) = 0.5 heatmap at step 0.

NOT weight-compatible with the reference (``utils/torch_convert.py``
refuses both directions); train from scratch. Select with
``--tpu-native-arch yes``; the reference topology remains the default and
its parity guarantees are untouched.
"""

from typing import Any

import jax
import jax.numpy as jnp
import flax.linen as nn

from eve_tpu.models.cells import CONV_CELLS
from eve_tpu.models.layers import (
    Conv, depth_to_space, leaky_relu, resize_bilinear)
from eve_tpu.models.refine_net import PreactBlock

# Patchified pyramid: (channels, (h, w)) per level, outermost first. The
# coarse shapes deliberately match the reference pyramid's last three
# levels (refine_net.py LEVEL_SHAPES[2:]) so the ConvGRU bottleneck keeps
# its 5x8 grid and the serving state contract.
PATCH_SIZE = 4
LEVEL_SHAPES = ((18, 32), (9, 16), (5, 8))
LEVEL_CHANNELS = (128, 256)  # innermost level maps to num_features


# Gate-logit offset for the 'gated' readout: sigmoid(-4) ~= 0.018, so a
# freshly initialized (zero kernel/bias) gate head starts at final ~=
# initial — refinement must EARN its correction instead of starting from
# the heatmap readout whose ~55-80 px floor the round-4 staged study
# measured (BASELINE.md).
GATE_LOGIT_BIAS = -4.0


class RefineNetTPU(nn.Module):
    load_screen_content: bool = True
    use_skip_connections: bool = True
    use_rnn: bool = True
    rnn_type: str = 'CGRU'
    rnn_num_cells: int = 1
    num_features: int = 64
    clstm_carry_only: bool = True
    compute_dtype: Any = jnp.float32
    # 'heatmap': reference readout semantics (soft-argmax of the refined
    # heatmap IS the final PoG). 'gated': residual readout — the model
    # additionally predicts a per-frame 2-vector gate and a px-unit
    # correction from pooled decoder features, and the composite computes
    #   PoG_final = PoG_initial + gate * (soft_argmax(hm) - PoG_initial)
    #               + delta
    # (eve.py). The heatmap, its CE loss, and the state contract are
    # unchanged; only the PoG readout differs.
    readout: str = 'heatmap'

    def setup(self):
        nf = self.num_features
        c0, c1 = LEVEL_CHANNELS
        self.stem = Conv(c0, PATCH_SIZE, PATCH_SIZE, 0, name='stem')
        self.enc_blocks = [
            PreactBlock(c0, c0, 'relu', name='enc0'),     # (18, 32)
            PreactBlock(c0, c1, 'relu', name='enc1'),     # (9, 16)
            PreactBlock(c1, nf, 'relu', name='enc2'),     # (5, 8)
        ]
        sk = 2 if self.use_skip_connections else 1
        self.dec_blocks = [
            PreactBlock(sk * c0, c0, 'leaky', name='dec0'),   # (18, 32)
            PreactBlock(c1 + (c1 if sk == 2 else 0), c0, 'leaky',
                        name='dec1'),                         # (9, 16)
            PreactBlock(sk * nf, c1, 'leaky', name='dec2'),   # (5, 8)
        ]
        if self.use_rnn:
            cell_cls = CONV_CELLS[self.rnn_type]
            self.rnn_cells = [cell_cls(hidden_size=nf, name=f'rnn_cell_{i}')
                              for i in range(self.rnn_num_cells)]
        # Sub-pixel head: 4x4 output pixels per (18, 32) cell.
        self.final_0 = Conv(c0 // 2, 3, 1, 1, name='final_0')
        self.final_2 = Conv(PATCH_SIZE * PATCH_SIZE, 1, 1, 0,
                            zero_init=True, name='final_2')
        if self.readout == 'gated':
            # Residual-readout head off the pooled decoder features:
            # (gate_logit_y, gate_logit_x, delta_y_px, delta_x_px). The
            # final layer is exactly zero-initialized so the readout
            # starts at gate = sigmoid(GATE_LOGIT_BIAS) ~ 0, delta = 0.
            self.gate_fc1 = nn.Dense(32, name='gate_fc1')
            self.gate_fc2 = nn.Dense(
                4, kernel_init=nn.initializers.zeros,
                bias_init=nn.initializers.zeros, name='gate_fc2')
        elif self.readout != 'heatmap':
            raise ValueError("Unknown readout %r (expected 'heatmap' or "
                             "'gated')" % (self.readout,))

    # -- contract methods (same signatures as RefineNet) -----------------

    def assemble_input(self, heatmap_initial, screen_frame=None,
                       screen_size=(128, 72)):
        """Concatenate the (resized) initial heatmap with the screen frame.

        Identical semantics to RefineNet.assemble_input (the input contract
        is arch-independent): bf16 cast BEFORE the concat — the (B*T, h, w,
        4) stack is a real HBM copy in a bandwidth-sensitive band.
        """
        hm = heatmap_initial.astype(self.compute_dtype)[..., None]
        hm = resize_bilinear(hm, (screen_size[1], screen_size[0]))
        if self.load_screen_content:
            assert screen_frame is not None
            return jnp.concatenate(
                [screen_frame.astype(self.compute_dtype), hm], axis=-1)
        return hm

    def encode(self, x):
        """Patchify stem + coarse pyramid; batched over leading dims.

        Returns (bottleneck_input (..., 5, 8, nf), skips outer->inner).
        """
        x = x.astype(self.compute_dtype)
        x = self.stem(x)
        assert x.shape[-3:-1] == LEVEL_SHAPES[0], (
            'TPU-native RefineNet pyramid is built for 72x128 inputs '
            '(screen_size/gaze_heatmap_size = (128, 72)); got stem output '
            '%s' % (x.shape,))
        skips = []
        for k in range(3):
            x = self.enc_blocks[k](x)
            skips.append(x)
            if k < 2:
                x = _adaptive_max_pool(x, LEVEL_SHAPES[k + 1])
        return x, skips

    def bottleneck_step(self, x, states):
        """One timestep of the conv-RNN bottleneck (inside the scan)."""
        if not self.use_rnn:
            return x, states
        new_states = []
        for cell, s in zip(self.rnn_cells, states):
            out, ns = cell(x, s)
            new_states.append(ns)
            if isinstance(ns, tuple) and self.clstm_carry_only:
                # Kept for config parity with the reference quirk
                # (refine_net.py:167-176): tuple-state cells do not feed
                # their output onward.
                pass
            else:
                x = out
        return x, tuple(new_states)

    def _decode_features(self, x, skips):
        """Decoder pyramid up to the shared pre-head features (18, 32, 64)."""
        for k in range(2, -1, -1):
            if self.use_skip_connections:
                x = jnp.concatenate([x, skips[k]], axis=-1)
            x = self.dec_blocks[k](x)
            if k > 0:
                x = resize_bilinear(x, LEVEL_SHAPES[k - 1])
        x = self.final_0(x)
        return leaky_relu(x)

    def _heatmap_from_features(self, feats):
        x = self.final_2(feats)
        x = depth_to_space(x, PATCH_SIZE)
        x = x.astype(jnp.float32)
        return jax.nn.sigmoid(x)[..., 0]

    def decode(self, x, skips):
        """Decoder pyramid + sub-pixel head; batched over leading dims.

        Returns (..., 72, 128) heatmap in (0, 1).
        """
        return self._heatmap_from_features(self._decode_features(x, skips))

    def decode_readout(self, x, skips):
        """Decode + residual-readout head (``readout='gated'`` only).

        Returns (heatmap (..., 72, 128), gate (..., 2) in (0, 1),
        delta_px (..., 2)) — gate/delta components align with PoG_px's
        (x, y) actual-screen-pixel convention (eve.py applies them
        directly; the head learns in that frame).
        """
        assert self.readout == 'gated', self.readout
        feats = self._decode_features(x, skips)
        hm = self._heatmap_from_features(feats)
        pooled = feats.mean(axis=(-3, -2)).astype(jnp.float32)
        h = nn.relu(self.gate_fc1(pooled))
        out4 = self.gate_fc2(h)
        gate = jax.nn.sigmoid(out4[..., :2] + GATE_LOGIT_BIAS)
        delta = out4[..., 2:]
        return hm, gate, delta

    def init_state(self, batch_size, dtype=None):
        """Zero conv-RNN states at the 5x8 bottleneck grid.

        Same structure as RefineNet.init_state — streaming/serving state
        handling does not depend on the architecture flag.
        """
        if not self.use_rnn:
            return ()
        dtype = dtype or self.compute_dtype
        from eve_tpu.models.cells import zero_state
        return tuple(
            zero_state(CONV_CELLS[self.rnn_type], self.num_features,
                       batch_size, hw=LEVEL_SHAPES[-1], dtype=dtype)
            for _ in range(self.rnn_num_cells))

    def __call__(self, heatmap_initial, screen_frame=None, states=None,
                 screen_size=(128, 72)):
        """Single-timestep forward (init/shape-inference convenience)."""
        x = self.assemble_input(heatmap_initial, screen_frame, screen_size)
        x, skips = self.encode(x)
        if states is None:
            states = self.init_state(x.shape[0])
        x, states = self.bottleneck_step(x, states)
        if self.readout == 'gated':
            # Routed through the readout head so module init creates its
            # parameters (flax setup-defined submodules materialize only
            # when called).
            hm, gate, delta = self.decode_readout(x, skips)
            return {'heatmap_final': hm, 'gate': gate, 'delta_px': delta,
                    'states': states}
        hm = self.decode(x, skips)
        return {'heatmap_final': hm, 'states': states}


def _adaptive_max_pool(x, out_hw):
    from eve_tpu.models.layers import adaptive_max_pool
    return adaptive_max_pool(x, out_hw)
