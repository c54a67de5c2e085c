#!/usr/bin/env python3
"""Dispatch-free device timing: K inference steps inside ONE jit.

``bench.py`` times jitted dispatches from the host; through the axon relay
each dispatch carries ~2 ms of enqueue/queueing overhead, and for sub-ms
workloads the relay's deep async window makes host-side loops meaningless
(``jax.block_until_ready`` returns before short chains actually execute —
measured: a 12-dispatch loop over 1.75 GB/step stage benches "finished" at
65 TB/s apparent bandwidth). This tool removes the host from the
measurement entirely:

  * the step runs K times inside one ``lax.fori_loop`` under a single jit;
  * each iteration's input is perturbed by a scalar derived from the
    PREVIOUS iteration's output, so XLA can neither hoist the (otherwise
    loop-invariant) model out of the loop nor overlap iterations;
  * the result is fetched to the host (a real sync), and
    ``(T[K2] - T[K1]) / (K2 - K1)`` cancels compile-cache lookup, dispatch,
    relay round-trip, and sync costs in one subtraction.

This is the number a TPU VM's serving loop approaches as dispatch overhead
goes to zero; bench.py's dispatched number is the conservative headline.
Measured 2026-08-20 on the v5e (B=16, T=30 flagship workload):
reference topology 33.45 ms/batch (14,349 frames/s), --tpu-native-arch
14.42 ms/batch (33,290 frames/s) — vs dispatched 35.3 / 16.2 ms.

Prints one JSON line:
  {"metric": "eve_inference_device_ms_per_batch", "value": ..., ...}
"""

import argparse
import json
import sys
import time

import numpy as np


def chained_ms(step_fn, k1, k2):
    """Device ms per step of ``step_fn(carry_scalar) -> scalar``."""
    import jax
    import jax.numpy as jnp

    def chain(K, seed):
        def body(i, s):
            return step_fn(s + seed * 1e-20)
        return jax.lax.fori_loop(0, K, body, jnp.float32(0.0))

    f = jax.jit(chain, static_argnums=0)
    for K in (k1, k2):  # compile both variants
        np.asarray(f(K, jnp.float32(1.0)))
    ts = {}
    for K in (k1, k2):
        t0 = time.perf_counter()
        np.asarray(f(K, jnp.float32(2.0)))
        ts[K] = time.perf_counter() - t0
    return (ts[k2] - ts[k1]) / (k2 - k1) * 1e3


def measure_device_ms(batch_size=16, seq=30, dtype='bfloat16',
                      tpu_native=False, stem='patchify', k1=2, k2=12):
    """Chained device ms/batch of the flagship inference step.

    The reusable form of this bench (also driving the perf gate's
    device-time metrics, bench.py --check): builds the spec/batch, chains
    K steps in one jit with every compute band's inputs perturbed by the
    carry, returns device ms per step.
    """
    import jax
    import jax.numpy as jnp
    from eve_tpu.data.synthetic import make_synthetic_batch
    from eve_tpu.models import eve as eve_lib

    spec = eve_lib.EveSpec(refine_net_enabled=True, load_screen_content=True,
                           compute_dtype=dtype,
                           tpu_native_arch=tpu_native,
                           tpu_native_stem=stem)
    params = eve_lib.init_params(spec, jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    b = make_synthetic_batch(rng, batch_size=batch_size,
                             sequence_len=seq, eyes_size=128,
                             frame_dtype=np.uint8)
    batch = {k: jax.device_put(jnp.asarray(v)) for k, v in b.items()}

    def step(s):
        bb = dict(batch)
        # The carry must feed EVERY major compute band, or XLA hoists the
        # loop-invariant part out of the fori_loop and the bench measures
        # only the remainder (caught in the act: with only the head-pose
        # perturbed, B=1 read 0.30 ms/step — the whole conv stack had
        # been hoisted). Frames are uint8 (on-device preprocess path):
        # add a data-dependent 0/1 so the CNN inputs change every step.
        delta = (s.astype(jnp.int32) & 1).astype(jnp.uint8)
        for k in ('left_eye_patch', 'right_eye_patch', 'screen_frame'):
            if k in bb:
                bb[k] = batch[k] + delta
        bb['left_h'] = batch['left_h'] + s
        out = eve_lib.forward(spec, params, bb, training=False,
                              output_predictions=True)
        return jnp.float32(jnp.mean(out['PoG_px_final']))

    return chained_ms(step, k1, k2)


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--batch', type=int, default=16)
    p.add_argument('--seq', type=int, default=30)
    p.add_argument('--k1', type=int, default=2)
    p.add_argument('--k2', type=int, default=12)
    p.add_argument('--dtype', default='bfloat16',
                   choices=['float32', 'bfloat16'])
    p.add_argument('--tpu-native-arch', action='store_true')
    p.add_argument('--tpu-native-stem', default='patchify',
                   choices=['patchify', 'patchify8'])
    args = p.parse_args()

    ms = measure_device_ms(batch_size=args.batch, seq=args.seq,
                           dtype=args.dtype,
                           tpu_native=args.tpu_native_arch,
                           stem=args.tpu_native_stem,
                           k1=args.k1, k2=args.k2)
    frames = args.batch * args.seq
    fps = frames / ms * 1e3
    print('device time: %.2f ms/batch (%d frames -> %.0f frames/s/chip)'
          % (ms, frames, fps), file=sys.stderr)
    print(json.dumps({
        'metric': 'eve_inference_device_ms_per_batch',
        'value': round(ms, 2),
        'unit': 'ms',
        'frames_per_sec': round(fps, 1),
        'batch': args.batch, 'seq': args.seq,
        'tpu_native_arch': args.tpu_native_arch,
        'vs_baseline': 0,
    }))


if __name__ == '__main__':
    main()
