#!/usr/bin/env python3
"""Inference phase breakdown on one chip (BASELINE.md "inference phases").

bench.py reports the end-to-end number; this tool attributes it. Each phase
is its own jit, timed with cycled device-resident inputs and annotated with
XLA cost analysis (GFLOP, GB of HBM traffic), so the byte budget of the
HBM-bound model is visible per stage:

  eye_features   ResNet18-IN on the (2*B*T, 128, 128, 3) eye-patch stack
                 (the reference's per-eye CNN, src/models/eye_net.py:98,
                 batched over both eyes and all frames)
  eye_only       full forward with refine_net disabled (CNN + GRU + heads +
                 geometry + heatmap render)
  full           flagship forward (adds the RefineNet pyramid + ConvGRU +
                 soft-argmax; the bench.py workload)

full - eye_only isolates the RefineNet band; eye_only - eye_features
isolates the recurrence + geometry + heatmap band.

Prints one JSON line at the end with the per-phase table embedded.
"""

import argparse
import json
import time

import numpy as np


def _time(fn, args_list, iters, block):
    out = fn(*args_list[0])
    block(out)
    t0 = time.perf_counter()
    for i in range(iters):
        out = fn(*args_list[i % len(args_list)])
    block(out)
    return (time.perf_counter() - t0) / iters * 1e3  # ms


def _cost(jitted, *args):
    c = jitted.lower(*args).compile().cost_analysis()
    if isinstance(c, list):
        c = c[0]
    return (float(c.get('flops', 0.0)) / 1e9,
            float(c.get('bytes accessed', 0.0)) / 1e9)


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--batch', type=int, default=16)
    p.add_argument('--seq', type=int, default=30)
    p.add_argument('--iters', type=int, default=20)
    p.add_argument('--dtype', default='bfloat16',
                   choices=['float32', 'bfloat16'])
    p.add_argument('--tpu-native-arch', action='store_true',
                   help='attribute the opt-in TPU-native topology '
                        '(patchify stems + lane-filling refine pyramid) '
                        'instead of the reference-parity one')
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from eve_tpu.data.synthetic import make_synthetic_batch
    from eve_tpu.models import eve as eve_lib
    from eve_tpu.models.eye_net import EyeNet

    rng = np.random.RandomState(0)
    batches = []
    for _ in range(4):
        b = make_synthetic_batch(rng, batch_size=args.batch,
                                 sequence_len=args.seq, eyes_size=128,
                                 with_screen=True)
        batches.append({k: jax.device_put(jnp.asarray(v))
                        for k, v in b.items()})

    full_spec = eve_lib.EveSpec(refine_net_enabled=True,
                                load_screen_content=True,
                                compute_dtype=args.dtype,
                                tpu_native_arch=args.tpu_native_arch)
    eye_spec = eve_lib.EveSpec(refine_net_enabled=False,
                               load_screen_content=False,
                               compute_dtype=args.dtype,
                               tpu_native_arch=args.tpu_native_arch)
    params = eve_lib.init_params(full_spec, jax.random.PRNGKey(0))
    eye_params = {'eye_net': params['eye_net']}

    B, T = args.batch, args.seq
    cdt = jnp.bfloat16 if args.dtype == 'bfloat16' else jnp.float32
    eye_net = full_spec.build_eye_net()

    @jax.jit
    def eye_features(params, batch):
        l = batch['left_eye_patch'].astype(cdt)
        r = batch['right_eye_patch'].astype(cdt)
        patches = jnp.concatenate([
            l.reshape((B * T,) + l.shape[2:]),
            r.reshape((B * T,) + r.shape[2:])], axis=0)
        head = jnp.concatenate([batch['left_h'].reshape(B * T, 2),
                                batch['right_h'].reshape(B * T, 2)], axis=0)
        return eye_net.apply({'params': params['eye_net']}, patches, head,
                             method=EyeNet.features)

    @jax.jit
    def eye_only(params, batch):
        out = eve_lib.forward(eye_spec, params, batch, training=False,
                              output_predictions=True)
        return (out['PoG_px_initial'], out['left_pupil_size'],
                out['right_pupil_size'])

    @jax.jit
    def full(params, batch):
        out = eve_lib.forward(full_spec, params, batch, training=False,
                              output_predictions=True)
        return (out['PoG_px_initial'], out['PoG_px_final'],
                out['left_pupil_size'], out['right_pupil_size'])

    frames = B * T
    rows = []
    for name, fn, prm in (('eye_features', eye_features, eye_params),
                          ('eye_only', eye_only, eye_params),
                          ('full', full, params)):
        ms = _time(lambda b, f=fn, p=prm: f(p, b),
                   [(b,) for b in batches], args.iters,
                   jax.block_until_ready)
        gflop, gb = _cost(fn, prm, batches[0])
        rows.append({'phase': name, 'ms': round(ms, 2),
                     'gflop': round(gflop, 1), 'gb': round(gb, 2),
                     'gb_per_s': round(gb / (ms / 1e3), 1)})
        print('%-14s %7.2f ms  %8.1f GFLOP  %7.2f GB  %7.1f GB/s'
              % (name, ms, gflop, gb, gb / (ms / 1e3)))

    full_row = rows[-1]
    print(json.dumps({
        'metric': 'eve_inference_phase_breakdown',
        'value': full_row['ms'],
        'unit': 'ms/batch',
        'frames': frames,
        'tpu_native_arch': args.tpu_native_arch,
        'phases': rows,
    }))


if __name__ == '__main__':
    main()
