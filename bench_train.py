#!/usr/bin/env python3
"""Train-step roofline analysis on one chip (BASELINE.md "training step").

Breaks the fused training step (forward + backward + clip + Adam) into
measurable phases and prints XLA cost analysis (FLOPs, HBM bytes) for each,
plus a rematerialization-granularity sweep — the training-side counterpart
of bench.py's inference analysis.

Phases measured (each its own jit, timed with cycled device-resident
batches so the relay cannot memoize):
  fwd        eval-mode forward returning the scalar loss
  fwd_bwd    jax.value_and_grad of the training loss (no optimizer)
  full_step  grad + global-norm clip + Adam update (production step)

Prints one JSON line at the end:
  {"metric": "eve_train_step_ms", "value": ..., "unit": "ms", ...}
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
    p.add_argument('--batch', type=int, default=8)
    p.add_argument('--seq', type=int, default=30)
    p.add_argument('--iters', type=int, default=10)
    p.add_argument('--dtype', default='bfloat16',
                   choices=['float32', 'bfloat16'])
    p.add_argument('--no-refine', action='store_true')
    p.add_argument('--remat-sweep', action='store_true',
                   help='measure full_step under each remat granularity')
    p.add_argument('--tpu-native-arch', action='store_true',
                   help='measure the opt-in TPU-native topology instead '
                        'of the reference-parity one')
    p.add_argument('--tpu-native-stem', default='patchify',
                   choices=['patchify', 'patchify8'])
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import optax
    from eve_tpu.data.synthetic import make_synthetic_batch
    from eve_tpu.models import eve as eve_lib

    refine = not args.no_refine
    rng = np.random.RandomState(0)
    batches = []
    for _ in range(4):
        b = make_synthetic_batch(rng, batch_size=args.batch,
                                 sequence_len=args.seq, eyes_size=128,
                                 with_screen=refine)
        batches.append({k: jax.device_put(jnp.asarray(v))
                        for k, v in b.items()})
    key = jax.random.PRNGKey(0)

    def build(remat):
        spec = eve_lib.EveSpec(
            refine_net_enabled=refine, load_screen_content=refine,
            compute_dtype=args.dtype, remat=remat,
            tpu_native_arch=args.tpu_native_arch,
            tpu_native_stem=args.tpu_native_stem)
        params = eve_lib.init_params(spec, jax.random.PRNGKey(0))
        tx = optax.chain(optax.clip_by_global_norm(5.0),
                         optax.scale_by_adam(),
                         optax.scale_by_learning_rate(1e-3))
        opt_state = tx.init(params)
        return spec, params, tx, opt_state

    spec, params, tx, opt_state = build('none')

    def loss_fn(params, batch, key):
        out = eve_lib.forward(spec, params, batch, rng=key, training=True)
        return out['full_loss']

    fwd = jax.jit(loss_fn)
    fwd_bwd = jax.jit(lambda p, b, k: jax.value_and_grad(loss_fn)(p, b, k))

    def full_step(params, opt_state, batch, key):
        loss, grads = jax.value_and_grad(loss_fn)(params, batch, key)
        updates, new_opt = tx.update(grads, opt_state, params)
        new_params = jax.tree_util.tree_map(lambda a, u: a + u,
                                            params, updates)
        return loss, new_params, new_opt

    step = jax.jit(full_step)

    block = jax.block_until_ready
    rows = []
    t_fwd = _time(fwd, [(params, b, key) for b in batches],
                  args.iters, block)
    f, by = _cost(fwd, params, batches[0], key)
    rows.append(('fwd', t_fwd, f, by))
    t_fb = _time(fwd_bwd, [(params, b, key) for b in batches],
                 args.iters, block)
    f, by = _cost(fwd_bwd, params, batches[0], key)
    rows.append(('fwd_bwd', t_fb, f, by))
    t_full = _time(step, [(params, opt_state, b, key) for b in batches],
                   args.iters, block)
    f, by = _cost(step, params, opt_state, batches[0], key)
    rows.append(('full_step', t_full, f, by))

    print('# phase            ms      GFLOP   GB_accessed')
    for name, ms, fl, byg in rows:
        print('%-12s %8.2f %10.1f %10.2f' % (name, ms, fl, byg))
    print('# bwd-only ~ %.2f ms; optimizer+clip ~ %.2f ms'
          % (t_fb - t_fwd, t_full - t_fb))

    if args.remat_sweep:
        print('# remat sweep (full_step ms):')
        for mode in ('none', 'eye', 'refine', 'all'):
            spec, params, tx, opt_state = build(mode)

            def loss_m(params, batch, key, spec=spec):
                out = eve_lib.forward(spec, params, batch, rng=key,
                                      training=True)
                return out['full_loss']

            def full_m(params, opt_state, batch, key, tx=tx, loss_m=loss_m):
                loss, grads = jax.value_and_grad(loss_m)(params, batch, key)
                updates, new_opt = tx.update(grads, opt_state, params)
                return loss, jax.tree_util.tree_map(
                    lambda a, u: a + u, params, updates), new_opt

            stepm = jax.jit(full_m)
            ms = _time(stepm, [(params, opt_state, b, key) for b in batches],
                       args.iters, block)
            f, byg = _cost(stepm, params, opt_state, batches[0], key)
            print('%-12s %8.2f %10.1f %10.2f' % ('remat=' + mode, ms, f, byg))

    fps = args.batch * args.seq / (t_full / 1e3)
    print(json.dumps({
        'metric': 'eve_train_step_ms',
        'value': round(t_full, 2), 'unit': 'ms',
        'frames_per_sec': round(fps, 1),
        'batch': args.batch, 'seq': args.seq, 'dtype': args.dtype,
        'refine': refine, 'tpu_native_arch': args.tpu_native_arch,
        'tpu_native_stem': args.tpu_native_stem,
    }))


if __name__ == '__main__':
    main()
