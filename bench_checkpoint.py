#!/usr/bin/env python3
"""Benchmark: checkpoint save cost for the flagship train state.

Measures how long the TRAINING THREAD is blocked per save (the number
that taxes training wall-clock at the reference's 100-step save cadence,
src/core/config_default.py:147) in three modes:

  sync      — save_at_step(wait=True): snapshot + serialize + write inline
  async     — save_at_step(wait=False): only the owned-memory host
              snapshot blocks; serialization/disk run on the background
              writer (eve_tpu/train/checkpoint.py)
  bg_write  — how long the background write itself takes (the budget it
              must fit inside the save interval to never back up)

Results recorded in BASELINE.md "Checkpoint save cost".
"""

import argparse
import json
import tempfile
import time


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--reps', type=int, default=3)
    parser.add_argument('--refine', default='yes',
                        help='flagship refine+screen state (no = eye only)')
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    from eve_tpu.config import DefaultConfig
    from eve_tpu.models import eve as eve_lib
    from eve_tpu.train import optim as optim_lib
    from eve_tpu.train.checkpoint import CheckpointManager
    from eve_tpu.train.step import TrainState

    refine = args.refine.lower() in ('yes', 'true', '1')
    cfg = DefaultConfig()
    spec = eve_lib.EveSpec(refine_net_enabled=refine,
                           load_screen_content=refine)
    params = eve_lib.init_params(spec, jax.random.PRNGKey(0))
    tx, _ = optim_lib.build_optimizer(cfg, steps_per_epoch=100)
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       opt_state=tx.init(params))
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))

    sync_s, blocked_s, bg_s = [], [], []
    with tempfile.TemporaryDirectory() as d:
        mgr = CheckpointManager(d, keep_n=3)
        mgr.save_at_step(0, state)  # warm (lazy imports, fs metadata)
        step = 1
        for _ in range(args.reps):
            t0 = time.perf_counter()
            mgr.save_at_step(step, state)
            sync_s.append(time.perf_counter() - t0)
            step += 1
        for _ in range(args.reps):
            t0 = time.perf_counter()
            mgr.save_at_step(step, state, wait=False)
            t1 = time.perf_counter()
            mgr.wait_for_writes()
            blocked_s.append(t1 - t0)
            bg_s.append(time.perf_counter() - t1)
            step += 1

    med = lambda xs: sorted(xs)[len(xs) // 2]
    print(json.dumps({
        'metric': 'checkpoint_save_blocked_seconds',
        'value': round(med(blocked_s), 4), 'unit': 's',
        'sync_blocked_s': round(med(sync_s), 4),
        'async_blocked_s': round(med(blocked_s), 4),
        'async_bg_write_s': round(med(bg_s), 4),
        'params': n_params, 'refine': refine,
    }))


if __name__ == '__main__':
    main()
