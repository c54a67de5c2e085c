"""Torch oracle models for numerical parity tests (CPU torch, tests only).

These re-state the standard torchvision ResNet-18 topology and the EVE conv
cell formulations in plain torch so the JAX implementations can be verified
with shared weights. Used by tests only; the framework itself has no torch
dependency.
"""

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F


class TorchBasicBlockIN(nn.Module):
    def __init__(self, inplanes, planes, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 3, stride, 1, bias=False)
        self.in1 = nn.InstanceNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, 1, 1, bias=False)
        self.in2 = nn.InstanceNorm2d(planes)
        self.downsample = None
        if stride != 1 or inplanes != planes:
            self.downsample = nn.Sequential(
                nn.Conv2d(inplanes, planes, 1, stride, bias=False),
                nn.InstanceNorm2d(planes),
            )

    def forward(self, x):
        identity = x if self.downsample is None else self.downsample(x)
        out = F.relu(self.in1(self.conv1(x)))
        out = self.in2(self.conv2(out))
        return F.relu(out + identity)


class TorchResNet18IN(nn.Module):
    def __init__(self, num_classes=128):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.in1 = nn.InstanceNorm2d(64)
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        layers = []
        inplanes = 64
        for planes, stride in [(64, 1), (128, 2), (256, 2), (512, 2)]:
            layers.append(TorchBasicBlockIN(inplanes, planes, stride))
            layers.append(TorchBasicBlockIN(planes, planes, 1))
            inplanes = planes
        self.layers = nn.Sequential(*layers)
        self.fc = nn.Linear(512, num_classes)

    def forward(self, x):
        x = self.maxpool(F.relu(self.in1(self.conv1(x))))
        x = self.layers(x)
        x = x.mean(dim=(2, 3))
        return self.fc(x)


class TorchCGRUCell(nn.Module):
    def __init__(self, input_size, hidden_size):
        super().__init__()
        self.hidden_size = hidden_size
        self.gates_1 = nn.Conv2d(input_size + hidden_size, 2 * hidden_size, 3,
                                 padding=1)
        self.gate_2 = nn.Conv2d(input_size + hidden_size, hidden_size, 3,
                                padding=1)

    def forward(self, x, h):
        g1 = torch.sigmoid(self.gates_1(torch.cat([x, h], dim=1)))
        reset, update = g1.chunk(2, 1)
        out = torch.tanh(self.gate_2(torch.cat([reset * h, x], dim=1)))
        return (1.0 - update) * out + update * h


class TorchCLSTMCell(nn.Module):
    def __init__(self, input_size, hidden_size):
        super().__init__()
        self.hidden_size = hidden_size
        self.gates = nn.Conv2d(input_size + hidden_size, 4 * hidden_size, 3,
                               padding=1)

    def forward(self, x, h, c):
        gates = self.gates(torch.cat([x, h], dim=1))
        i, f, o, g = gates.chunk(4, 1)
        i, f, o, g = torch.sigmoid(i), torch.sigmoid(f), torch.sigmoid(o), \
            torch.tanh(g)
        new_c = f * c + i * g
        new_h = o * torch.tanh(new_c)
        return new_h, new_c


def nhwc(t):
    """torch NCHW tensor -> numpy NHWC array."""
    return np.transpose(t.detach().numpy(), (0, 2, 3, 1))


def conv_kernel_to_jax(w):
    """torch conv weight (O, I, KH, KW) -> flax (KH, KW, I, O)."""
    return np.transpose(w.detach().numpy(), (2, 3, 1, 0))


def linear_kernel_to_jax(w):
    """torch linear weight (O, I) -> flax (I, O)."""
    return w.detach().numpy().T
