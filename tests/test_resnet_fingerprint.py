"""Fingerprint the restated ResNet-18 oracle against documented
torchvision facts (VERDICT round-1 item 3).

torchvision is genuinely absent from this image (zero egress), so the
parity suite's torch oracle (tests/torch_oracles.py) restates the
torchvision topology the reference builds
(``/root/reference/src/models/eye_net.py:48-50``:
``ResNet(BasicBlock, [2,2,2,2], num_classes=F, norm_layer=InstanceNorm2d)``).
A restatement error would previously have passed every shared-weight parity
test symmetrically. This module pins the oracle (and the flax twin) against
torchvision's DOCUMENTED construction rules, written out independently:

- conv1: Conv2d(3, 64, k=7, s=2, p=3, bias=False); maxpool k=3 s=2 p=1.
- BasicBlock (expansion 1): conv3x3(in, planes, stride) -> norm -> relu ->
  conv3x3(planes, planes) -> norm; += identity; relu. Stride rides the
  FIRST conv. No conv biases.
- downsample = Sequential(conv1x1(in, planes, stride, bias=False), norm),
  present iff stride != 1 or inplanes != planes — i.e. exactly the first
  block of layers 2, 3, 4 for resnet18.
- norm_layer=nn.InstanceNorm2d: affine=False, track_running_stats=False by
  torch default => NO learnable norm parameters anywhere.
- avgpool: AdaptiveAvgPool2d((1,1)) == spatial mean; fc: Linear(512, C)
  WITH bias.
"""

import numpy as np
import pytest

torch = pytest.importorskip('torch')

from tests.torch_oracles import TorchResNet18IN  # noqa: E402


def expected_param_shapes(num_classes=128):
    """Parameter schema derived from the documented rules above (NOT from
    the oracle): name suffix -> torch shape."""
    shapes = {'conv1.weight': (64, 3, 7, 7)}
    inplanes = 64
    for li, (planes, stride) in enumerate(
            [(64, 1), (128, 2), (256, 2), (512, 2)]):
        for b in range(2):
            s = stride if b == 0 else 1
            inp = inplanes if b == 0 else planes
            pfx = 'layer%d.%d.' % (li + 1, b)
            shapes[pfx + 'conv1.weight'] = (planes, inp, 3, 3)
            shapes[pfx + 'conv2.weight'] = (planes, planes, 3, 3)
            if s != 1 or inp != planes:
                shapes[pfx + 'downsample.0.weight'] = (planes, inp, 1, 1)
        inplanes = planes
    shapes['fc.weight'] = (num_classes, 512)
    shapes['fc.bias'] = (num_classes,)
    return shapes


def test_expected_schema_self_check():
    """The independently-derived schema has downsamples exactly at
    layer{2,3,4}.0 and sums to the known total."""
    shapes = expected_param_shapes()
    ds = sorted(k for k in shapes if 'downsample' in k)
    assert ds == ['layer2.0.downsample.0.weight',
                  'layer3.0.downsample.0.weight',
                  'layer4.0.downsample.0.weight']
    total = sum(int(np.prod(s)) for s in shapes.values())
    assert total == 11_232_576  # resnet18-IN, num_classes=128, no norm params


def test_oracle_matches_torchvision_schema():
    """Oracle parameter multiset == the documented schema (same shapes, same
    multiplicities; catches missing/extra downsamples, affine norms, conv
    biases, wrong fc width)."""
    net = TorchResNet18IN(num_classes=128)
    got = sorted(tuple(p.shape) for p in net.parameters())
    want = sorted(expected_param_shapes().values())
    assert got == want
    # And specifically: no norm parameters exist anywhere.
    for name, _ in net.named_parameters():
        assert 'in1' not in name and 'in2' not in name and \
            'downsample.1' not in name, name


def test_oracle_block_structure():
    """Downsample placement and stride placement as documented: only the
    first block of stages 2-4 has a downsample; its conv1 carries stride 2;
    the downsample conv is 1x1 stride 2 followed by a param-free norm."""
    net = TorchResNet18IN(num_classes=128)
    blocks = list(net.layers)
    assert len(blocks) == 8
    for i, blk in enumerate(blocks):
        stage, first = divmod(i, 2)
        if stage >= 1 and first == 0:
            assert blk.downsample is not None, i
            assert blk.conv1.stride == (2, 2), i
            assert blk.downsample[0].kernel_size == (1, 1)
            assert blk.downsample[0].stride == (2, 2)
            assert isinstance(blk.downsample[1], torch.nn.InstanceNorm2d)
            assert not blk.downsample[1].affine
        else:
            assert blk.downsample is None, i
            assert blk.conv1.stride == (1, 1), i
        assert blk.conv2.stride == (1, 1), i
        assert blk.conv1.bias is None and blk.conv2.bias is None


def test_oracle_stage_output_shapes():
    """Per-stage spatial resolutions for a 128x128 input match torchvision:
    conv1 64, maxpool 32, layer1 32, layer2 16, layer3 8, layer4 4."""
    net = TorchResNet18IN(num_classes=128)
    x = torch.zeros(1, 3, 128, 128)
    feats = []
    hooks = [blk.register_forward_hook(
        lambda m, i, o, feats=feats: feats.append(tuple(o.shape)))
        for blk in net.layers]
    with torch.no_grad():
        y = net(x)
    for h in hooks:
        h.remove()
    assert feats[1] == (1, 64, 32, 32)     # layer1 out
    assert feats[3] == (1, 128, 16, 16)    # layer2 out
    assert feats[5] == (1, 256, 8, 8)      # layer3 out
    assert feats[7] == (1, 512, 4, 4)      # layer4 out
    assert tuple(y.shape) == (1, 128)


def test_flax_twin_matches_schema():
    """The flax backbone's parameter multiset equals the same documented
    schema (kernels transposed to HWIO), so BOTH sides of every
    shared-weight parity test are pinned to torchvision's structure."""
    import os
    os.environ.setdefault('JAX_PLATFORMS', 'cpu')
    import jax
    import jax.numpy as jnp
    from eve_tpu.models.resnet import ResNet18IN

    fnet = ResNet18IN(num_classes=128)
    params = fnet.init(jax.random.PRNGKey(0), jnp.zeros((1, 36, 36, 3)))
    leaves = jax.tree_util.tree_leaves_with_path(params)
    got = []
    for path, leaf in leaves:
        shape = tuple(leaf.shape)
        if leaf.ndim == 4:  # HWIO -> OIHW
            shape = (shape[3], shape[2], shape[0], shape[1])
        elif leaf.ndim == 2:  # (I, O) -> (O, I)
            shape = (shape[1], shape[0])
        got.append(shape)
    want = sorted(expected_param_shapes().values())
    assert sorted(got) == want
