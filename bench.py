#!/usr/bin/env python3
"""Benchmark: end-to-end EVE inference throughput on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "frames/s", "vs_baseline": N}

The workload is the flagship configuration (EyeNet GRU + RefineNet CGRU with
screen content, T=30 clips, 2x128x128 eye patches + 72x128 screen frames —
the reference's operational defaults, BASELINE.md "workload definition"),
with device-resident inputs so the number isolates the compute path.

``vs_baseline`` compares against the reference-style per-timestep torch
implementation measured on this host's CPU (see bench_baseline.py; cached in
bench_baseline.json). The reference publishes no benchmark numbers and no
A100 is available here (BASELINE.md).
"""

import argparse
import json
import sys
import time

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--batch', type=int, default=16)
    parser.add_argument('--seq', type=int, default=30)
    parser.add_argument('--iters', type=int, default=20)
    parser.add_argument('--pallas', action='store_true',
                        help='enable the Pallas heatmap kernels (off by '
                             'default: XLA formulations are at the HBM '
                             'roofline and the pallas_call boundaries break '
                             'fusion — 12.1k vs 13.4k frames/s end-to-end, '
                             'BASELINE.md; both kernels compile and run on '
                             'the live Mosaic toolchain)')
    parser.add_argument('--no-pallas', action='store_true',
                        help='(deprecated, now the default)')
    parser.add_argument('--no-baseline', action='store_true')
    parser.add_argument('--dtype', default='bfloat16',
                        choices=['float32', 'bfloat16'])
    parser.add_argument('--input-dtype', default='uint8',
                        choices=['float32', 'uint8'],
                        help='uint8 = on-device normalization '
                             '(tpu_on_device_preprocess path)')
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    from eve_tpu.data.synthetic import make_synthetic_batch
    from eve_tpu.models import eve as eve_lib

    spec = eve_lib.EveSpec(
        refine_net_enabled=True, load_screen_content=True,
        compute_dtype=args.dtype,
        use_pallas=args.pallas)
    params = eve_lib.init_params(spec, jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    # Several distinct device-resident batches, cycled in the timing loop so
    # every dispatch has fresh inputs (guards against any result memoization
    # between identical executions in the serving stack).
    n_variants = 4
    batches = []
    for _ in range(n_variants):
        batch = make_synthetic_batch(
            rng, batch_size=args.batch, sequence_len=args.seq, eyes_size=128,
            frame_dtype=np.uint8 if args.input_dtype == 'uint8' else np.float32)
        batches.append(
            {k: jax.device_put(jnp.asarray(v)) for k, v in batch.items()})

    @jax.jit
    def infer(params, batch):
        out = eve_lib.forward(spec, params, batch, training=False,
                              output_predictions=True)
        return (out['PoG_px_initial'], out['PoG_px_final'],
                out['left_pupil_size'], out['right_pupil_size'])

    # Warmup / compile
    for batch in batches:
        out = infer(params, batch)
    jax.block_until_ready(out)

    t0 = time.perf_counter()
    for i in range(args.iters):
        out = infer(params, batches[i % n_variants])
    jax.block_until_ready(out)
    elapsed = time.perf_counter() - t0
    fps = args.batch * args.seq * args.iters / elapsed

    vs_baseline = 0.0
    if not args.no_baseline:
        try:
            from bench_baseline import get_reference_fps
            ref_fps = get_reference_fps()
            vs_baseline = fps / ref_fps
        except Exception as e:  # noqa: BLE001
            print('baseline measurement failed: %s' % e, file=sys.stderr)

    print(json.dumps({
        'metric': 'eve_full_inference_frames_per_sec_per_chip',
        'value': round(fps, 2),
        'unit': 'frames/s',
        'vs_baseline': round(vs_baseline, 2),
    }))


if __name__ == '__main__':
    main()
