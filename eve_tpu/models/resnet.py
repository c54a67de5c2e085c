"""ResNet-18 with instance normalization, NHWC, for the EyeNet backbone.

Topology matches ``torchvision.models.resnet.ResNet(BasicBlock, [2,2,2,2],
norm_layer=nn.InstanceNorm2d)`` as instantiated by the reference EyeNet
(``/root/reference/src/models/eye_net.py:48-50``): 7x7/2 stem + 3x3/2 maxpool,
four stages of two basic blocks (64/128/256/512, stride-2 stage entries with
1x1 downsample), global average pool, final fc. InstanceNorm here is
affine-less with no running stats (the torchvision default when passed
``nn.InstanceNorm2d``).

The whole backbone is recurrence-free, so the EVE composite runs it batched
over (B*T*2 eyes) on the MXU rather than per-timestep.
"""

from typing import Any

import jax.numpy as jnp
import flax.linen as nn

from eve_tpu.models.layers import Conv, InstanceNorm, TorchLinear


class BasicBlock(nn.Module):
    features: int
    strides: int = 1
    downsample: bool = False

    @nn.compact
    def __call__(self, x):
        identity = x
        out = Conv(self.features, 3, self.strides, 1, use_bias=False,
                   name='conv1')(x)
        out = InstanceNorm(self.features, affine=False, name='in1')(out)
        out = nn.relu(out)
        out = Conv(self.features, 3, 1, 1, use_bias=False, name='conv2')(out)
        out = InstanceNorm(self.features, affine=False, name='in2')(out)
        if self.downsample:
            identity = Conv(self.features, 1, self.strides, 0, use_bias=False,
                            name='downsample_conv')(x)
            identity = InstanceNorm(self.features, affine=False,
                                    name='downsample_in')(identity)
        return nn.relu(out + identity)


class ResNet18IN(nn.Module):
    """ResNet-18 (instance-norm) feature extractor -> ``num_classes`` vector.

    ``stem='patchify'`` (the ``tpu_native_arch`` variant) replaces the
    7x7/2 conv + 3x3/2 maxpool with ONE overlapping 8x8/4 patch-embedding
    conv straight to the layer1 resolution. Same composite stride (4), same
    receptive-field scale (8 vs ~11), but the (H/2, W/2, 64) stem output —
    the single largest activation of the whole model (~503 MB per
    960-patch batch, BASELINE.md) — is never materialized. All residual
    stages are unchanged. NOT weight-compatible with torchvision/reference
    checkpoints; the converter refuses (utils/torch_convert.py).
    """
    num_classes: int = 128
    compute_dtype: Any = jnp.float32
    stem: str = 'reference'  # 'reference' | 'patchify'

    @nn.compact
    def __call__(self, x):
        # x: (N, H, W, 3) in [-1, 1]
        # Inputs that reach layer4 at 1x1 spatial hit a degeneracy: per-
        # instance normalization maps every activation to exactly 0 — the
        # output then carries NO information about the input (verified
        # empirically; the reference always runs 128x128 eyes so never
        # hits this). The threshold scales with the stem's composite
        # stride: 33px for the stride-4 stems, 65px for the stride-8
        # 'patchify8' stem. Warn, not raise: plumbing tests legitimately
        # run tiny patches where pixel information flow is irrelevant,
        # but a real model trained this small would silently ignore its
        # input.
        min_px = 65 if self.stem == 'patchify8' else 33
        if min(x.shape[-3:-1]) < min_px:
            import logging
            logging.getLogger(__name__).warning(
                'ResNet18IN input %s is below %dpx (stem=%s): instance '
                'norm at the 1x1 layer4 resolution erases the pixel '
                'signal; the model cannot learn from these patches.',
                x.shape, min_px, self.stem)
        x = x.astype(self.compute_dtype)
        if self.stem == 'patchify':
            x = Conv(64, 8, 4, 2, use_bias=False, name='stem_conv')(x)
            x = InstanceNorm(64, affine=False, name='stem_in')(x)
            x = nn.relu(x)
        elif self.stem == 'patchify8':
            # Experimental coarser variant: composite stride 8 (16x16 grid
            # for 128px inputs) quarters every residual stage's spatial
            # work. Same kernel SHAPE as 'patchify' (8x8x3x64), different
            # stride — measured in BASELINE.md before being offered.
            x = Conv(64, 8, 8, 0, use_bias=False, name='stem_conv')(x)
            x = InstanceNorm(64, affine=False, name='stem_in')(x)
            x = nn.relu(x)
        elif self.stem == 'reference':
            x = Conv(64, 7, 2, 3, use_bias=False, name='conv1')(x)
            x = InstanceNorm(64, affine=False, name='in1')(x)
            x = nn.relu(x)
            x = nn.max_pool(x, (3, 3), strides=(2, 2),
                            padding=((1, 1), (1, 1)))
        else:
            # A typo'd stem in a config JSON must not silently train the
            # reference stem under _tpu-marked filenames.
            raise ValueError(
                "Unknown ResNet18IN stem %r (expected 'reference', "
                "'patchify' or 'patchify8')" % (self.stem,))
        plan = [(64, 1), (128, 2), (256, 2), (512, 2)]
        for stage, (feats, stride) in enumerate(plan):
            x = BasicBlock(feats, stride, downsample=(stride != 1),
                           name=f'layer{stage + 1}_0')(x)
            x = BasicBlock(feats, 1, name=f'layer{stage + 1}_1')(x)
        x = jnp.mean(x, axis=(-3, -2))  # global average pool
        x = x.astype(jnp.float32)
        return TorchLinear(self.num_classes, name='fc')(x)
