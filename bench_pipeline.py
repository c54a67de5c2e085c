#!/usr/bin/env python3
"""Host data-pipeline scaling: decode -> pack -> H2D -> device step.

Measures the full input pipeline (ffmpeg/cv2 video decode, eye-strip
packing, device transfer via DevicePrefetcher) feeding the real jitted
inference step, at several worker counts, against the pure-compute ceiling
(device-resident inputs). Writes an EVE-layout synthetic dataset if the
given --datasrc does not exist.

Run on a TPU VM:  PYTHONPATH=. python bench_pipeline.py --workers 1 2 4 8
Prints one JSON line per worker count plus a compute-ceiling line.

NOTE this benchmark host has ONE CPU core: worker threads add overlap with
the device step but cannot scale decode throughput beyond one core's
~1.6k frames/s (BASELINE.md "host decode+pack"); the curve is the honest
artifact either way and becomes meaningful on many-core TPU VMs.
"""

import argparse
import json
import os
import time

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--datasrc', default='/tmp/eve_pipeline_bench_data')
    p.add_argument('--workers', type=int, nargs='+', default=[0, 1, 2, 4])
    p.add_argument('--batch', type=int, default=4)
    p.add_argument('--seq', type=int, default=6)
    p.add_argument('--eyes', type=int, default=128)
    p.add_argument('--steps', type=int, default=16)
    p.add_argument('--uint8', action='store_true',
                   help='on-device preprocessing path '
                        '(tpu_on_device_preprocess)')
    p.add_argument('--frame-cache', default='',
                   help='enable the decode-once disk cache at this path; '
                        'adds a warm (epoch>=2) measurement per worker '
                        'count after one populating pass')
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from eve_tpu.config import DefaultConfig
    from eve_tpu.data.dataset import EVESequencesBase
    from eve_tpu.data.loader import DataLoader, DevicePrefetcher
    from eve_tpu.data.synthetic import write_synthetic_dataset
    from eve_tpu.models import eve as eve_lib

    if not os.path.isdir(args.datasrc):
        write_synthetic_dataset(args.datasrc,
                                participants=('train01', 'train02'),
                                num_frames=240, eyes_size=args.eyes)

    cfg = DefaultConfig()
    cfg.import_dict({
        'datasrc_eve': args.datasrc, 'max_sequence_len': args.seq,
        'assumed_frame_rate': 10, 'eyes_size': [args.eyes, args.eyes],
        'load_screen_content': False, 'refine_net_enabled': False,
        'tpu_on_device_preprocess': bool(args.uint8),
        'frame_cache_dir': args.frame_cache,
    })
    spec = eve_lib.EveSpec.from_config(cfg)
    params = eve_lib.init_params(spec, jax.random.PRNGKey(0))

    @jax.jit
    def infer(params, batch):
        out = eve_lib.forward(spec, params, batch, training=False)
        return out['full_loss']

    def make_loader(workers):
        # Dataset-local segmentation cache: the pkl is keyed by Hz/seqlen
        # only, so a cwd-shared ./segmentation_cache built against a
        # DIFFERENT dataset would serve stale window indices here.
        ds = EVESequencesBase(args.datasrc, config=cfg,
                              participants_to_use=['train01', 'train02'],
                              cameras_to_use=['webcam_c'],
                              types_of_stimuli=['image'],
                              cache_dir=os.path.join(args.datasrc,
                                                     '.segcache'))
        return ds, DataLoader(ds, batch_size=args.batch, shuffle=True,
                              drop_last=True, num_workers=workers, seed=0)

    # Compute ceiling: device-resident inputs, cycled.
    ds, loader = make_loader(0)
    host_batches = []
    it = iter(loader)
    for _ in range(2):
        try:
            b = next(it)
        except StopIteration:
            it = iter(loader)
            b = next(it)
        host_batches.append({k: jnp.asarray(v) for k, v in b.items()
                             if isinstance(v, np.ndarray)})
    out = None
    for b in host_batches:
        out = infer(params, b)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(args.steps):
        out = infer(params, host_batches[i % 2])
    jax.block_until_ready(out)
    ceiling = args.batch * args.seq * args.steps / (time.perf_counter() - t0)
    print(json.dumps({'metric': 'pipeline_compute_ceiling_fps',
                      'value': round(ceiling, 1), 'unit': 'frames/s'}))

    def device_put(batch):
        return jax.device_put(batch)

    for workers in args.workers:
        ds, loader = make_loader(workers)
        if args.frame_cache:
            # Populating pass (epoch 1): decode everything once so the
            # measured loop below is the warm epoch >= 2 regime.
            for _ in loader:
                pass
        n = 0
        t0 = time.perf_counter()
        steps_done = 0
        while steps_done < args.steps:
            for dev, _extras in DevicePrefetcher(loader, device_put):
                out = infer(params, dev)
                n += args.batch * args.seq
                steps_done += 1
                if steps_done >= args.steps:
                    break
        jax.block_until_ready(out)
        fps = n / (time.perf_counter() - t0)
        print(json.dumps({
            'metric': ('pipeline_end_to_end_fps_warm_cache'
                       if args.frame_cache else 'pipeline_end_to_end_fps'),
            'workers': workers,
            'value': round(fps, 1), 'unit': 'frames/s',
            'pct_of_ceiling': round(100.0 * fps / ceiling, 1)}))


if __name__ == '__main__':
    main()
