"""Import bridge for running the ACTUAL PyTorch reference in-process.

The parity suite (tests/test_reference_parity.py,
tests/test_e2e_reference_pipeline.py, tests/test_trajectory_parity.py) and
the north-star closure tool (tools/close_parity_gate.py) all need to import
the reference checkout (``/root/reference/src`` by default, overridable via
``$EVE_REFERENCE_SRC``) inside THIS process. The reference is 2020-era code
with dependencies this image does not carry; the shims here supply faithful
stand-ins:

- ``install_torchvision_resnet_stub``: torchvision.models.resnet.{ResNet,
  BasicBlock} topology + state-dict names, exactly as the reference EyeNet
  consumes them (reference src/models/eye_net.py:44-55). The numerical
  fidelity of the stub is pinned by tests/test_resnet_parity.py and the
  fingerprint test; only installed when the real torchvision is absent.
- ``make_ffmpeg_module``: a cv2-backed ``ffmpeg`` module that executes the
  reference's own filter strings (``select='eq(n,i)+...'`` + ``scale=w:h``,
  reference src/datasources/common.py:109-139); only installed when the
  real ffmpeg-python is absent.
- logging-dependency stubs (gspread, tensorboardX, oauth2client) so the
  reference ``core`` package imports.
- ``numpy 1.x`` alias: the reference uses ``np.int`` (removed in numpy 2).
"""

import contextlib
import os
import re
import sys
import types

import numpy as np

REF_SRC = os.environ.get('EVE_REFERENCE_SRC', '/root/reference/src')


def reference_available():
    return os.path.isdir(REF_SRC)


class _FFmpegChain:
    def __init__(self, path, **input_params):
        self.path = path
        self.input_params = input_params
        self.output_params = {}

    def output(self, target, format=None, pix_fmt=None, loglevel=None,
               **output_params):
        assert target == 'pipe:'
        assert format == 'rawvideo'
        assert pix_fmt == 'rgb24', pix_fmt  # sync path; async uses bgr24
        self.output_params = output_params
        return self

    def run(self, capture_stdout=True, quiet=True):
        import cv2
        vf = self.output_params.get('vf', '')
        wanted = [int(m) for m in re.findall(r'eq\(n,(\d+)\)', vf)]
        scale = re.search(r'scale=(\d+):(\d+)', vf)
        cap = cv2.VideoCapture(self.path)
        assert cap.isOpened(), self.path
        out = []
        index = 0
        want = set(wanted) if wanted else None
        while True:
            ok, frame_bgr = cap.read()
            if not ok:
                break
            if want is None or index in want:
                frame = cv2.cvtColor(frame_bgr, cv2.COLOR_BGR2RGB)
                if scale is not None:
                    w, h = int(scale.group(1)), int(scale.group(2))
                    if (frame.shape[1], frame.shape[0]) != (w, h):
                        frame = cv2.resize(frame, (w, h))
                out.append(frame)
            index += 1
            if want is not None and index > max(want):
                break
        cap.release()
        assert out, (self.path, vf)
        return np.concatenate([f.reshape(-1) for f in out]).tobytes(), b''


def _probe(path):
    import cv2
    cap = cv2.VideoCapture(path)
    assert cap.isOpened(), path
    w = int(cap.get(cv2.CAP_PROP_FRAME_WIDTH))
    h = int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
    cap.release()
    return {'streams': [{'codec_type': 'video', 'width': w, 'height': h}]}


def make_ffmpeg_module():
    mod = types.ModuleType('ffmpeg')
    mod.input = lambda path, **kw: _FFmpegChain(path, **kw)
    mod.probe = _probe
    return mod


def install_torchvision_resnet_stub(torch):
    """Faithful stand-in for torchvision.models.resnet.{ResNet, BasicBlock}
    (topology and state-dict names exact). No-op when the REAL torchvision
    is importable — released weights should load through the real thing
    when present."""
    try:
        import torchvision.models.resnet  # noqa: F401
        return
    except ImportError:
        pass
    import torch.nn as nn

    class BasicBlock(nn.Module):
        expansion = 1

        def __init__(self, inplanes, planes, stride=1, downsample=None,
                     groups=1, base_width=64, dilation=1, norm_layer=None):
            super().__init__()
            norm_layer = norm_layer or nn.BatchNorm2d
            self.conv1 = nn.Conv2d(inplanes, planes, 3, stride, 1,
                                   bias=False)
            self.bn1 = norm_layer(planes)
            self.relu = nn.ReLU(inplace=True)
            self.conv2 = nn.Conv2d(planes, planes, 3, 1, 1, bias=False)
            self.bn2 = norm_layer(planes)
            self.downsample = downsample
            self.stride = stride

        def forward(self, x):
            identity = x
            out = self.relu(self.bn1(self.conv1(x)))
            out = self.bn2(self.conv2(out))
            if self.downsample is not None:
                identity = self.downsample(x)
            return self.relu(out + identity)

    class ResNet(nn.Module):
        def __init__(self, block, layers, num_classes=1000,
                     zero_init_residual=False, groups=1, width_per_group=64,
                     replace_stride_with_dilation=None, norm_layer=None):
            super().__init__()
            norm_layer = norm_layer or nn.BatchNorm2d
            self._norm_layer = norm_layer
            self.inplanes = 64
            self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
            self.bn1 = norm_layer(64)
            self.relu = nn.ReLU(inplace=True)
            self.maxpool = nn.MaxPool2d(3, 2, 1)
            self.layer1 = self._make_layer(block, 64, layers[0])
            self.layer2 = self._make_layer(block, 128, layers[1], 2)
            self.layer3 = self._make_layer(block, 256, layers[2], 2)
            self.layer4 = self._make_layer(block, 512, layers[3], 2)
            self.avgpool = nn.AdaptiveAvgPool2d((1, 1))
            self.fc = nn.Linear(512 * block.expansion, num_classes)
            for m in self.modules():
                if isinstance(m, nn.Conv2d):
                    nn.init.kaiming_normal_(m.weight, mode='fan_out',
                                            nonlinearity='relu')

        def _make_layer(self, block, planes, blocks, stride=1):
            norm_layer = self._norm_layer
            downsample = None
            if stride != 1 or self.inplanes != planes * block.expansion:
                downsample = nn.Sequential(
                    nn.Conv2d(self.inplanes, planes * block.expansion, 1,
                              stride, bias=False),
                    norm_layer(planes * block.expansion))
            layers = [block(self.inplanes, planes, stride, downsample,
                            norm_layer=norm_layer)]
            self.inplanes = planes * block.expansion
            layers += [block(self.inplanes, planes, norm_layer=norm_layer)
                       for _ in range(1, blocks)]
            return nn.Sequential(*layers)

        def forward(self, x):
            x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
            x = self.layer4(self.layer3(self.layer2(self.layer1(x))))
            x = self.avgpool(x)
            x = torch.flatten(x, 1)
            return self.fc(x)

    tv = sys.modules.setdefault('torchvision',
                                types.ModuleType('torchvision'))
    tvm = types.ModuleType('torchvision.models')
    tvr = types.ModuleType('torchvision.models.resnet')
    tvr.ResNet, tvr.BasicBlock = ResNet, BasicBlock
    tvm.resnet = tvr
    tv.models = tvm
    sys.modules['torchvision.models'] = tvm
    sys.modules['torchvision.models.resnet'] = tvr


def install_logging_stubs():
    """gspread/tensorboardX/oauth2client/coloredlogs stand-ins so the
    reference ``core`` package imports without its tracking deps."""
    # The reference's core/tensorboard.py does a bare ``import torchvision``
    # at module import; an empty module satisfies it (the image utils it
    # wants are never called). The full resnet stub replaces/extends this
    # when a test needs the reference EyeNet.
    for name in ('gspread', 'tensorboardX', 'torchvision'):
        sys.modules.setdefault(name, types.ModuleType(name))
    if not hasattr(sys.modules['tensorboardX'], 'SummaryWriter'):
        sys.modules['tensorboardX'].SummaryWriter = object
    oauth_sa = types.ModuleType('oauth2client.service_account')
    oauth_sa.ServiceAccountCredentials = object
    oauth = types.ModuleType('oauth2client')
    oauth.service_account = oauth_sa
    sys.modules.setdefault('oauth2client', oauth)
    sys.modules.setdefault('oauth2client.service_account', oauth_sa)
    if 'coloredlogs' not in sys.modules:
        stub = types.ModuleType('coloredlogs')
        stub.install = lambda *a, **k: None
        sys.modules['coloredlogs'] = stub


def install_reference_shims(torch):
    """Everything the reference needs to import and run in this image:
    logging stubs, torchvision stub (if absent), ffmpeg shim (if absent),
    and the numpy 1.x ``np.int`` alias. Idempotent."""
    install_logging_stubs()
    install_torchvision_resnet_stub(torch)
    try:
        import ffmpeg  # noqa: F401
    except ImportError:
        sys.modules['ffmpeg'] = make_ffmpeg_module()
    if not hasattr(np, 'int'):
        np.int = int  # exactly what the alias was in the reference's numpy


@contextlib.contextmanager
def reference_on_path():
    """Put the reference checkout first on sys.path for the duration."""
    sys.path.insert(0, REF_SRC)
    try:
        yield REF_SRC
    finally:
        sys.path.remove(REF_SRC)
