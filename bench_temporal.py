#!/usr/bin/env python3
"""Temporal-sharding (sharded_scan) overhead measurement.

``eve_tpu/parallel/temporal.py`` distributes a recurrence's T axis over a
``seq`` mesh axis: each of the n shards owns T/n timesteps and the carry
hops shard-to-shard via ``ppermute`` over n round-robin rounds. The win is
MEMORY (each device stores T/n activations for the backward) and the
ability to put otherwise-idle chips to work on the batched stages; the
cost is n rounds of mostly-idle compute plus carry transfers.

Real multi-chip hardware is unavailable here, so this measures the
OVERHEAD STRUCTURE on the virtual CPU mesh (a proxy: collective latency
differs on ICI, but the round-robin idle fraction and XLA overhead shape
are visible) — plain `lax.scan` vs `sharded_scan` at n = 2/4/8 shards on a
GRU-sized carry at realistic T.

Usage: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
       python bench_temporal.py --T 64
"""

import argparse
import json
import time

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--T', type=int, default=64)
    p.add_argument('--batch', type=int, default=8)
    p.add_argument('--features', type=int, default=128)
    p.add_argument('--iters', type=int, default=30)
    p.add_argument('--shards', type=int, nargs='+', default=[2, 4, 8])
    args = p.parse_args()

    import jax
    # The axon sitecustomize pins JAX_PLATFORMS to the single real TPU;
    # this proxy needs the virtual CPU mesh (see module docstring).
    try:
        jax.config.update('jax_num_cpu_devices', max(args.shards))
        jax.config.update('jax_platforms', 'cpu')
    except Exception:  # noqa: BLE001 - backend already initialized
        pass
    import jax.numpy as jnp
    from eve_tpu.parallel import mesh as mesh_lib
    from eve_tpu.parallel.temporal import sharded_scan

    T, B, F = args.T, args.batch, args.features
    rng = np.random.RandomState(0)
    W = jnp.asarray(rng.randn(F, F) * 0.1, jnp.float32)
    xs_host = rng.randn(T, B, F).astype(np.float32)
    carry0 = jnp.zeros((B, F), jnp.float32)

    def cell(carry, x):
        h = jnp.tanh(carry @ W + x)
        return h, h

    def plain(xs):
        _, ys = jax.lax.scan(cell, carry0, xs)
        return jnp.sum(ys)

    results = {}

    def timeit(fn, xs_list):
        out = fn(xs_list[0])
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for i in range(args.iters):
            out = fn(xs_list[i % len(xs_list)])
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / args.iters * 1e3

    xs_variants = [jnp.asarray(xs_host + i) for i in range(3)]
    t_plain = timeit(jax.jit(plain), xs_variants)
    results['plain_scan_ms'] = round(t_plain, 3)

    for n in args.shards:
        if len(jax.devices()) < n or T % n:
            continue
        mesh = mesh_lib.make_mesh(num_devices=n, axis_name='seq')

        def sharded(xs, mesh=mesh):
            _, ys = sharded_scan(cell, carry0, xs, mesh, axis_name='seq')
            return jnp.sum(ys)

        t = timeit(jax.jit(sharded), xs_variants)
        results['sharded_scan_%d_ms' % n] = round(t, 3)
        results['overhead_%dx' % n] = round(t / t_plain, 2)

    results['metric'] = 'sharded_scan_overhead_proxy'
    results['T'] = T
    print(json.dumps(results))


if __name__ == '__main__':
    main()
