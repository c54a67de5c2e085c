"""GazeRefineNet: conditional encoder-decoder heatmap refinement.

Functionally equivalent to the reference RefineNet
(``/root/reference/src/models/refine_net.py:35-255``): pre-activation
InstanceNorm(affine) residual blocks, a 5-level encoder-decoder pyramid
(16@72x128 -> 32@36x64 -> 64@18x32 -> 128@9x16 -> 256@5x8) with adaptive
max-pool downsampling, bilinear upsampling and optional skip concatenation,
a conv-RNN bottleneck (default CGRU-64 @ 5x8), and a zero-init sigmoid head.

TPU-first split: ``encode`` and ``decode`` are recurrence-free and run
batched over (B*T); only ``bottleneck_step`` (the tiny conv cell at 5x8)
runs inside the temporal scan. The reference's nested
``WrapEncoderDecoder`` recursion is flattened into explicit per-level lists.

Reference quirk (refine_net.py:167-176): with a tuple-state cell (CLSTM) the
cell *output* is discarded and only the state is carried; the bottleneck
passes its input through unchanged. ``clstm_carry_only`` replicates this
(default True, matching the shipped refine_net.json which uses CLSTM).
"""

from typing import Any

import jax
import jax.numpy as jnp
import flax.linen as nn

from eve_tpu.models.cells import CONV_CELLS
from eve_tpu.models.layers import (
    Conv, InstanceNorm, adaptive_max_pool, leaky_relu, resize_bilinear)

# (channels, (h, w)) per pyramid level, outermost first.
LEVEL_CHANNELS = (16, 32, 64, 128, 256)
LEVEL_SHAPES = ((72, 128), (36, 64), (18, 32), (9, 16), (5, 8))
# Encoder blocks per level (outermost has 1, reference default).
NUM_ENC_BLOCKS = (1, 2, 2, 2, 2)


class PreactBlock(nn.Module):
    """Pre-activation residual block: IN-act-conv3 / IN-act-conv3 + skip."""
    in_features: int
    out_features: int
    act: str = 'relu'  # 'relu' | 'leaky'

    @nn.compact
    def __call__(self, x):
        act = nn.relu if self.act == 'relu' else leaky_relu
        out = InstanceNorm(self.in_features, affine=True, name='in1')(x)
        out = act(out)
        out = Conv(self.out_features, 3, 1, 1, name='conv1')(out)
        out = InstanceNorm(self.out_features, affine=True, name='in2')(out)
        out = act(out)
        out = Conv(self.out_features, 3, 1, 1, name='conv2')(out)
        if self.in_features != self.out_features:
            skip = InstanceNorm(self.in_features, affine=True,
                                name='skip_in')(x)
            skip = act(skip)
            skip = Conv(self.out_features, 1, 1, 0, name='skip_conv')(skip)
        else:
            skip = x
        return out + skip


class RefineNet(nn.Module):
    load_screen_content: bool = True
    use_skip_connections: bool = True
    use_rnn: bool = True
    rnn_type: str = 'CGRU'
    rnn_num_cells: int = 1
    num_features: int = 64
    clstm_carry_only: bool = True
    compute_dtype: Any = jnp.float32

    def setup(self):
        nf = self.num_features
        enc = []
        for k in range(5):
            out_c = LEVEL_CHANNELS[k + 1] if k < 4 else nf
            blocks = [PreactBlock(LEVEL_CHANNELS[k], out_c, 'relu',
                                  name=f'enc{k}_0')]
            for i in range(1, NUM_ENC_BLOCKS[k]):
                blocks.append(PreactBlock(out_c, out_c, 'relu',
                                          name=f'enc{k}_{i}'))
            enc.append(blocks)
        self.enc_blocks = enc

        dec = []
        for k in range(5):
            # Channels entering the decoder at level k: the inner module's
            # upsampled output, optionally concatenated with the encoder
            # skip (which has the same channel count by construction).
            inner_out = LEVEL_CHANNELS[k + 1] if k < 4 else nf
            in_c = 2 * inner_out if self.use_skip_connections else inner_out
            out_c = LEVEL_CHANNELS[k] if k < 4 else LEVEL_CHANNELS[4]
            dec.append(PreactBlock(in_c, out_c, 'leaky', name=f'dec{k}_0'))
        self.dec_blocks = dec

        if self.use_rnn:
            cell_cls = CONV_CELLS[self.rnn_type]
            self.rnn_cells = [cell_cls(hidden_size=nf, name=f'rnn_cell_{i}')
                              for i in range(self.rnn_num_cells)]

        self.initial_0 = Conv(16, 3, 1, 1, name='initial_0')
        self.initial_1 = InstanceNorm(16, affine=True, name='initial_1')
        self.initial_3 = Conv(16, 3, 1, 1, name='initial_3')
        self.final_0 = Conv(16, 3, 1, 1, name='final_0')
        self.final_2 = Conv(1, 1, 1, 0, zero_init=True, name='final_2')

    def assemble_input(self, heatmap_initial, screen_frame=None,
                       screen_size=(128, 72)):
        """Concatenate (resized) initial heatmap with the screen frame.

        Args:
          heatmap_initial: (..., H, W) heatmap.
          screen_frame: (..., h, w, 3) in [0, 1] or None.

        Returns:
          (..., h, w, C) input image, C = 4 if screen content else 1.
        """
        # Cast to the compute dtype BEFORE the concat: the (B*T, h, w, 4)
        # stack is a real HBM copy and this model is bandwidth bound —
        # assembling in f32 and casting afterwards would double the traffic.
        hm = heatmap_initial.astype(self.compute_dtype)[..., None]
        hm = resize_bilinear(hm, (screen_size[1], screen_size[0]))
        if self.load_screen_content:
            assert screen_frame is not None
            return jnp.concatenate(
                [screen_frame.astype(self.compute_dtype), hm], axis=-1)
        return hm

    def encode(self, x):
        """Initial stem + encoder pyramid; batched over leading dims.

        Returns (bottleneck_input (..., 5, 8, nf), skips list outer->inner).
        """
        x = x.astype(self.compute_dtype)
        x = self.initial_0(x)
        x = self.initial_1(x)
        x = nn.relu(x)
        x = self.initial_3(x)
        skips = []
        for k in range(5):
            for block in self.enc_blocks[k]:
                x = block(x)
            skips.append(x)
            if k < 4:
                x = adaptive_max_pool(x, LEVEL_SHAPES[k + 1])
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
                # Reference quirk: tuple-state cells do not feed their
                # output onward (refine_net.py:167-176).
                pass
            else:
                x = out
        return x, tuple(new_states)

    def decode(self, x, skips):
        """Decoder pyramid + final head; batched over leading dims.

        Returns (..., 72, 128) heatmap in (0, 1).
        """
        for k in range(4, -1, -1):
            if self.use_skip_connections:
                x = jnp.concatenate([x, skips[k]], axis=-1)
            x = self.dec_blocks[k](x)
            if k > 0:
                x = resize_bilinear(x, LEVEL_SHAPES[k - 1])
        x = self.final_0(x)
        x = leaky_relu(x)
        x = self.final_2(x)
        x = x.astype(jnp.float32)
        return jax.nn.sigmoid(x)[..., 0]

    def init_state(self, batch_size, dtype=None):
        """Zero conv-RNN states; the state structure lives in exactly one
        place (cells.zero_state, keyed by the cell class)."""
        if not self.use_rnn:
            return ()
        dtype = dtype or self.compute_dtype
        from eve_tpu.models.cells import zero_state
        return tuple(
            zero_state(CONV_CELLS[self.rnn_type], self.num_features,
                       batch_size, hw=LEVEL_SHAPES[4], dtype=dtype)
            for _ in range(self.rnn_num_cells))

    def __call__(self, heatmap_initial, screen_frame=None, states=None,
                 screen_size=(128, 72)):
        """Single-timestep forward (init/shape-inference convenience)."""
        x = self.assemble_input(heatmap_initial, screen_frame, screen_size)
        x, skips = self.encode(x)
        if states is None:
            states = self.init_state(x.shape[0])
        x, states = self.bottleneck_step(x, states)
        hm = self.decode(x, skips)
        return {'heatmap_final': hm, 'states': states}
