"""Reference-equivalent torch model for bench.py's baseline measurement.

A faithful torch re-statement of the reference's execution pattern
(per-timestep Python loop over the full networks, src/models/eve.py:91-172):
ResNet-18/InstanceNorm + GRUCell EyeNet per eye, Gaussian heatmap render,
RefineNet-style encoder-decoder with ConvGRU bottleneck, soft-argmax. Used
only to measure reference-style throughput on this host's CPU (no CUDA /
torchvision in this environment); cached in ``bench_baseline.json``.
"""

import json
import os
import time

import numpy as np

BASELINE_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              'bench_baseline.json')


def measure_torch_reference_fps(batch_size=4, sequence_len=30, iters=2,
                                threads=None):
    import torch
    import torch.nn as nn
    import torch.nn.functional as F
    import sys
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from tests.torch_oracles import TorchResNet18IN, TorchCGRUCell

    if threads:
        torch.set_num_threads(threads)

    class MiniRefine(nn.Module):
        """Reference-topology refine pyramid (channels/shapes identical)."""

        def __init__(self):
            super().__init__()
            chans = [16, 32, 64, 128, 256]
            self.initial = nn.Sequential(
                nn.Conv2d(4, 16, 3, padding=1), nn.InstanceNorm2d(16, True),
                nn.ReLU(), nn.Conv2d(16, 16, 3, padding=1))
            enc = []
            for k in range(5):
                out_c = chans[k + 1] if k < 4 else 64
                enc.append(nn.Sequential(
                    nn.InstanceNorm2d(chans[k], True), nn.ReLU(),
                    nn.Conv2d(chans[k], out_c, 3, padding=1),
                    nn.InstanceNorm2d(out_c, True), nn.ReLU(),
                    nn.Conv2d(out_c, out_c, 3, padding=1)))
            self.enc = nn.ModuleList(enc)
            dec = []
            for k in range(5):
                inner = chans[k + 1] if k < 4 else 64
                in_c = 2 * inner
                out_c = chans[k] if k < 4 else chans[4]
                dec.append(nn.Sequential(
                    nn.InstanceNorm2d(in_c, True), nn.LeakyReLU(),
                    nn.Conv2d(in_c, out_c, 3, padding=1),
                    nn.InstanceNorm2d(out_c, True), nn.LeakyReLU(),
                    nn.Conv2d(out_c, out_c, 3, padding=1)))
            self.dec = nn.ModuleList(dec)
            self.cell = TorchCGRUCell(64, 64)
            self.final = nn.Sequential(
                nn.Conv2d(16, 16, 3, padding=1), nn.LeakyReLU(),
                nn.Conv2d(16, 1, 1), nn.Sigmoid())

        def forward(self, x, h):
            shapes = [(72, 128), (36, 64), (18, 32), (9, 16), (5, 8)]
            x = self.initial(x)
            skips = []
            for k in range(5):
                x = self.enc[k](x)
                skips.append(x)
                if k < 4:
                    x = F.adaptive_max_pool2d(x, shapes[k + 1])
            h = self.cell(x, h)
            x = h
            for k in range(4, -1, -1):
                x = self.dec[k](torch.cat([x, skips[k]], dim=1))
                if k > 0:
                    x = F.interpolate(x, shapes[k - 1], mode='bilinear',
                                      align_corners=False)
            return self.final(x), h

    eye_cnn = TorchResNet18IN(num_classes=128).eval()
    gru = torch.nn.GRUCell(128, 128).eval()
    fc_gaze = nn.Sequential(nn.Linear(128, 128), nn.SELU(),
                            nn.Linear(128, 2, bias=False), nn.Tanh()).eval()
    refine = MiniRefine().eval()

    B, T = batch_size, sequence_len
    eyes = torch.randn(B, T, 2, 3, 128, 128)
    screen = torch.rand(B, T, 3, 72, 128)
    xs = torch.arange(128, dtype=torch.float32)
    ys = torch.arange(72, dtype=torch.float32).view(-1, 1)

    def one_pass():
        with torch.no_grad():
            h_l = torch.zeros(B, 128)
            h_r = torch.zeros(B, 128)
            h_ref = torch.zeros(B, 64, 5, 8)
            for t in range(T):
                f_l = gru(eye_cnn(eyes[:, t, 0]), h_l)
                f_r = gru(eye_cnn(eyes[:, t, 1]), h_r)
                h_l, h_r = f_l, f_r
                g = 0.5 * np.pi * fc_gaze(0.5 * (f_l + f_r))
                cx = (torch.sigmoid(g[:, 0]) * 128).view(B, 1, 1)
                cy = (torch.sigmoid(g[:, 1]) * 72).view(B, 1, 1)
                hm = torch.exp(-0.005 * ((xs - cx) ** 2 + (ys - cy) ** 2))
                inp = torch.cat([screen[:, t], hm.unsqueeze(1)], dim=1)
                final_hm, h_ref = refine(inp, h_ref)
                flat = final_hm.view(B, -1)
                p = F.softmax(100.0 * flat, dim=-1)

    one_pass()  # warmup
    t0 = time.perf_counter()
    for _ in range(iters):
        one_pass()
    elapsed = time.perf_counter() - t0
    return (B * T * iters) / elapsed


def get_reference_fps():
    """Cached torch-CPU reference throughput for this host."""
    if os.path.isfile(BASELINE_CACHE):
        with open(BASELINE_CACHE) as f:
            return json.load(f)['torch_cpu_reference_fps']
    fps = measure_torch_reference_fps()
    with open(BASELINE_CACHE, 'w') as f:
        json.dump({'torch_cpu_reference_fps': fps,
                   'note': 'reference-style per-timestep torch loop, '
                           'CPU of the bench host'}, f, indent=2)
    return fps


if __name__ == '__main__':
    print(json.dumps({'torch_cpu_reference_fps': get_reference_fps()}))
