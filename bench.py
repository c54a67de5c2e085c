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

``--tpu-native-arch`` benchmarks the opt-in lane-filling topology
(models/refine_net_tpu.py) instead of the reference-parity one. The
default run ALSO measures it and appends the result to the JSON line as
``tpu_native_arch_frames_per_sec`` (``--no-tpu-native`` skips that), so
the per-round bench records carry both topologies.

Perf regression gate (VERDICT r3 item 6):
  bench.py --check    re-measure every metric in bench_bands.json and exit
                      non-zero if any falls outside its recorded band. The
                      band width (rel_tol) absorbs axon-relay variance —
                      the 13,419-vs-13,585 frames/s episode (BASELINE.md
                      post-packaging re-measurement) bounds it at ~1.2%,
                      so the default band is +-6%: wide enough for relay
                      noise, far tighter than any real regression seen.
  bench.py --record   re-measure and (over)write bench_bands.json.
"""

import argparse
import json
import sys
import time

import numpy as np

BANDS_FILE = 'bench_bands.json'
REL_TOL = 0.06
# Per-metric tolerance overrides (see the bands-file note):
#  - train_step_ms* showed an 8.5% compile-to-compile spread in round 4
#    (26.91-29.21 ms across same-day processes) — wider than the relay's
#    ~1.2% dispatch variance the default band absorbs;
#  - serve_host_batcher_ms is pure host threading/scheduling timing on a
#    shared 1-core box — gate only gross regressions.
PER_METRIC_TOL = {
    'train_step_ms': 0.10,
    'train_step_ms_tpu_native': 0.10,
    'train_step_ms_patchify8': 0.10,
    'serve_host_batcher_ms': 0.30,
}


def measure_inference(batch_size=16, seq=30, iters=20, dtype='bfloat16',
                      input_dtype='uint8', pallas=False, tpu_native=False,
                      stem='patchify'):
    """Measure end-to-end inference frames/s with device-resident inputs."""
    import jax
    import jax.numpy as jnp
    from eve_tpu.data.synthetic import make_synthetic_batch
    from eve_tpu.models import eve as eve_lib

    spec = eve_lib.EveSpec(
        refine_net_enabled=True, load_screen_content=True,
        compute_dtype=dtype, use_pallas=pallas,
        tpu_native_arch=tpu_native, tpu_native_stem=stem)
    params = eve_lib.init_params(spec, jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    # Several distinct device-resident batches, cycled in the timing loop so
    # every dispatch has fresh inputs (guards against any result memoization
    # between identical executions in the serving stack).
    n_variants = 4
    batches = []
    for _ in range(n_variants):
        b = make_synthetic_batch(
            rng, batch_size=batch_size, sequence_len=seq, eyes_size=128,
            frame_dtype=np.uint8 if input_dtype == 'uint8' else np.float32)
        batches.append({k: jax.device_put(jnp.asarray(v))
                        for k, v in b.items()})

    @jax.jit
    def infer(params, batch):
        out = eve_lib.forward(spec, params, batch, training=False,
                              output_predictions=True)
        return (out['PoG_px_initial'], out['PoG_px_final'],
                out['left_pupil_size'], out['right_pupil_size'])

    for b in batches:  # warmup / compile
        out = infer(params, b)
    jax.block_until_ready(out)

    t0 = time.perf_counter()
    for i in range(iters):
        out = infer(params, batches[i % n_variants])
    jax.block_until_ready(out)
    elapsed = time.perf_counter() - t0
    return batch_size * seq * iters / elapsed


def measure_train_step_ms(batch_size=8, seq=30, iters=10, dtype='bfloat16',
                          tpu_native=False, stem='patchify'):
    """Measure the fused train step (fwd+bwd+clip+Adam) in ms — the
    refine_net.json workload (BASELINE.md "training-step roofline")."""
    import jax
    import jax.numpy as jnp
    from eve_tpu.config import DefaultConfig
    from eve_tpu.data.synthetic import make_synthetic_batch
    from eve_tpu.models import eve as eve_lib
    from eve_tpu.train import optim as optim_lib
    from eve_tpu.train import step as step_lib

    DefaultConfig._reset_instance_for_testing()
    config = DefaultConfig()
    config.import_dict({'refine_net_enabled': True,
                        'load_screen_content': True,
                        'batch_size': batch_size,
                        'tpu_compute_dtype': dtype,
                        'tpu_native_arch': tpu_native,
                        'tpu_native_stem': stem})
    spec = eve_lib.EveSpec.from_config(config)
    tx, _ = optim_lib.build_optimizer(config, steps_per_epoch=1000)
    state = step_lib.create_train_state(spec, tx, jax.random.PRNGKey(0))
    train_step = step_lib.make_train_step(spec, tx, donate=True)

    rng = np.random.RandomState(0)
    batches = []
    for _ in range(2):
        b = make_synthetic_batch(rng, batch_size=batch_size,
                                 sequence_len=seq, eyes_size=128,
                                 frame_dtype=np.uint8)
        batches.append({k: jax.device_put(jnp.asarray(v))
                        for k, v in b.items()})
    keys = [jax.random.PRNGKey(i) for i in range(3 * iters + 2)]
    for i in range(2):  # warmup/compile
        state, m = train_step(state, batches[i % 2], keys[i])
    jax.block_until_ready(m['full_loss'])
    # Median of 3 timed repeats (ADVICE r4): the dispatched train metric
    # carries more run-to-run spread than the inference metrics.
    samples = []
    ki = 2
    for _ in range(3):
        t0 = time.perf_counter()
        for i in range(iters):
            state, m = train_step(state, batches[i % 2], keys[ki])
            ki += 1
        jax.block_until_ready(m['full_loss'])
        samples.append((time.perf_counter() - t0) / iters * 1e3)
    return float(np.median(samples))


def _device_ms(**kw):
    from bench_chain import measure_device_ms
    return measure_device_ms(**kw)


def _host_batcher_ms():
    from bench_serve import measure_host_batcher_ms
    return measure_host_batcher_ms()


# Checked metrics: name -> (measure_fn, unit, higher_is_better).
#
# Two timing regimes (VERDICT r4 item 5): the *_frames_per_sec /
# *_train_step_ms metrics are DISPATCHED host-loop timings (kept — same
# methodology across all rounds, conservative headline); the *_device_ms
# metrics are chained in-jit device timings (bench_chain.py), which on the
# axon link are ~5x more stable (~1.2% spread) and are what a TPU VM
# sustains. Every number BASELINE.md/README headline-quotes has a band
# here: flagship + tpu-native + patchify8, inference + train + B=1
# latency, plus the serving engine's host-batcher floor.
CHECKS = {
    'inference_frames_per_sec': (
        lambda: measure_inference(), 'frames/s', True),
    'inference_frames_per_sec_tpu_native': (
        lambda: measure_inference(tpu_native=True), 'frames/s', True),
    'train_step_ms': (
        lambda: measure_train_step_ms(), 'ms', False),
    'train_step_ms_tpu_native': (
        lambda: measure_train_step_ms(tpu_native=True), 'ms', False),
    'train_step_ms_patchify8': (
        lambda: measure_train_step_ms(tpu_native=True, stem='patchify8'),
        'ms', False),
    'inference_device_ms': (
        lambda: _device_ms(), 'ms', False),
    'inference_device_ms_tpu_native': (
        lambda: _device_ms(tpu_native=True), 'ms', False),
    'inference_device_ms_patchify8': (
        lambda: _device_ms(tpu_native=True, stem='patchify8'), 'ms', False),
    'latency_b1_device_ms': (
        lambda: _device_ms(batch_size=1, k1=4, k2=44), 'ms', False),
    'latency_b1_device_ms_tpu_native': (
        lambda: _device_ms(batch_size=1, k1=4, k2=44, tpu_native=True),
        'ms', False),
    'serve_host_batcher_ms': (
        lambda: _host_batcher_ms(), 'ms', False),
}


def run_check(record=False):
    import os
    bands_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              BANDS_FILE)
    results = {}
    for name, (fn, unit, _) in CHECKS.items():
        v = fn()
        results[name] = round(v, 2)
        print('%-42s %10.2f %s' % (name, v, unit), file=sys.stderr)

    if record:
        with open(bands_path, 'w') as f:
            json.dump({'rel_tol': REL_TOL, 'per_metric_tol': PER_METRIC_TOL,
                       'recorded': results,
                       'note': 'bench.py --check bands; +-rel_tol absorbs '
                               'axon relay variance (~1.2 percent observed, '
                               'BASELINE.md); per_metric_tol widens the '
                               'dispatched train metrics (8.5 percent '
                               'compile-to-compile spread, r4) and the '
                               'host-threading serve metric. Update with '
                               'bench.py --record after intentional perf '
                               'changes.'},
                      f, indent=1)
        print('recorded bands -> %s' % bands_path, file=sys.stderr)
        print(json.dumps({'metric': 'bench_check', 'value': 1,
                          'unit': 'recorded', 'vs_baseline': 0}))
        return 0

    with open(bands_path) as f:
        bands = json.load(f)
    default_tol = bands.get('rel_tol', REL_TOL)
    per_metric = bands.get('per_metric_tol', {})
    # Metrics added to CHECKS but not yet recorded on real hardware may be
    # listed as pending_record (with a dated note) instead of recorded —
    # they are measured and reported but do not gate until first recorded.
    # An unlisted missing band is still a hard failure.
    pending = set(bands.get('pending_record', []))
    failures = []
    for name, v in results.items():
        rec = bands['recorded'].get(name)
        if rec is None:
            if name in pending:
                print('%-42s %10.2f (pending first --record)' % (name, v),
                      file=sys.stderr)
                continue
            failures.append('%s: no recorded band' % name)
            continue
        tol = per_metric.get(name, default_tol)
        lo, hi = rec * (1 - tol), rec * (1 + tol)
        _, unit, higher_better = CHECKS[name]
        # Only breaches in the BAD direction fail (faster is never a
        # regression — but do re-record so the band tracks the new level).
        bad = v < lo if higher_better else v > hi
        status = 'FAIL' if bad else 'ok'
        print('%-42s %10.2f vs [%.2f, %.2f] %s  %s'
              % (name, v, lo, hi, unit, status), file=sys.stderr)
        if bad:
            failures.append('%s: %.2f outside [%.2f, %.2f] %s'
                            % (name, v, lo, hi, unit))
    print(json.dumps({'metric': 'bench_check',
                      'value': 0 if failures else 1,
                      'unit': 'pass', 'vs_baseline': 0}))
    if failures:
        print('PERF REGRESSION: %s' % '; '.join(failures), file=sys.stderr)
        return 1
    return 0


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
    parser.add_argument('--tpu-native-stem', default='patchify',
                        choices=['patchify', 'patchify8'],
                        help='TPU-native EyeNet stem variant (patchify8 = '
                             'stride-8 coarse stem, BASELINE.md)')
    parser.add_argument('--tpu-native-arch', action='store_true',
                        help='benchmark the opt-in TPU-native topology '
                             '(patchify stems + lane-filling refine '
                             'pyramid, models/refine_net_tpu.py) instead '
                             'of the reference-parity topology')
    parser.add_argument('--check', action='store_true',
                        help='perf regression gate: measure all metrics in '
                             'bench_bands.json, exit non-zero on breach')
    parser.add_argument('--record', action='store_true',
                        help='measure and (over)write bench_bands.json')
    parser.add_argument('--no-baseline', action='store_true')
    parser.add_argument('--no-tpu-native', action='store_true',
                        help='skip the extra opt-in-topology measurement '
                             'appended to the default JSON line')
    parser.add_argument('--dtype', default='bfloat16',
                        choices=['float32', 'bfloat16'])
    parser.add_argument('--input-dtype', default='uint8',
                        choices=['float32', 'uint8'],
                        help='uint8 = on-device normalization '
                             '(tpu_on_device_preprocess path)')
    args = parser.parse_args()

    if args.check or args.record:
        sys.exit(run_check(record=args.record))

    fps = measure_inference(
        batch_size=args.batch, seq=args.seq, iters=args.iters,
        dtype=args.dtype, input_dtype=args.input_dtype,
        pallas=args.pallas, tpu_native=args.tpu_native_arch,
        stem=args.tpu_native_stem)

    # The headline stays the reference-parity topology (apples-to-apples
    # with the reference model); the opt-in TPU-native topology's number
    # rides along as an extra field so round records carry both. Skipped
    # when the main measurement already used it, or on explicit opt-out.
    tpu_native_fps = None
    if args.tpu_native_arch:
        tpu_native_fps = fps
    elif not args.no_tpu_native:
        try:
            tpu_native_fps = measure_inference(
                batch_size=args.batch, seq=args.seq, iters=args.iters,
                dtype=args.dtype, input_dtype=args.input_dtype,
                pallas=args.pallas, tpu_native=True)
        except Exception as e:  # noqa: BLE001
            print('tpu-native measurement failed: %s' % e, file=sys.stderr)

    vs_baseline = 0.0
    if not args.no_baseline:
        try:
            from bench_baseline import get_reference_fps
            ref_fps = get_reference_fps()
            vs_baseline = fps / ref_fps
        except Exception as e:  # noqa: BLE001
            print('baseline measurement failed: %s' % e, file=sys.stderr)

    line = {
        'metric': 'eve_full_inference_frames_per_sec_per_chip',
        'value': round(fps, 2),
        'unit': 'frames/s',
        'vs_baseline': round(vs_baseline, 2),
    }
    if args.tpu_native_arch:
        line['metric'] = 'eve_full_inference_frames_per_sec_per_chip_tpu_native'
    elif tpu_native_fps is not None:
        line['tpu_native_arch_frames_per_sec'] = round(tpu_native_fps, 2)
    print(json.dumps(line))


if __name__ == '__main__':
    main()
