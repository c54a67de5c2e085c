#!/usr/bin/env python3
"""Close the accuracy north star: PoG parity vs the reference, one command.

BASELINE.md's open gate — "bit-comparable PoG error vs the PyTorch
reference with its released weights on real EVE data" — cannot close in an
environment without the dataset and weights. This tool packages the
closure so it is ONE command the day they appear:

    EVE_PRETRAINED_DIR=/path/to/released_weights \\
    python tools/close_parity_gate.py --datasrc-eve /path/to/eve \\
        --write-baseline

It then:
 1. converts the released ``.pt`` weights (reference release-asset naming,
    src/utils/load_model.py:35-55) to eve_tpu params
    (eve_tpu/utils/torch_convert.py);
 2. runs the eve_tpu stack (datasource -> EVE forward with
    output_predictions) over the selected clips;
 3. runs the ACTUAL reference (its own datasource + model, imported from
    the checkout via eve_tpu/utils/reference_bridge.py) over the same
    clips with the same weights;
 4. prints the comparison table — per-frame cross-stack PoG deltas and the
    validity-masked accuracy metrics both stacks compute — and appends it
    to BASELINE.md with ``--write-baseline``.

Weights: place the GitHub release files (eve_eyenet_GRU.pt,
eve_refinenet_CGRU_oa_skip.pt, ... from
https://github.com/swook/EVE/releases/download/v0.0/) in
``$EVE_PRETRAINED_DIR`` or pass ``--pretrained-dir``.

Exit codes: 0 = ran (gate verdict printed), 2 = missing inputs (runbook
printed). The end-to-end mechanics of this tool are themselves tested
in-env on the synthetic dataset (tests/test_close_parity_gate.py), so the
only unknowns on closure day are the data and weights.
"""

import argparse
import contextlib
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

BASELINE_MD = os.path.join(REPO, 'BASELINE.md')


def parse_args(argv=None):
    ap = argparse.ArgumentParser(
        description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter)
    ap.add_argument('--datasrc-eve', required=True,
                    help='EVE dataset root (real or synthetic layout)')
    ap.add_argument('--pretrained-dir',
                    default=os.environ.get('EVE_PRETRAINED_DIR'),
                    help='directory holding the released .pt weights '
                         '(default: $EVE_PRETRAINED_DIR)')
    ap.add_argument('--participants', default='val01',
                    help='comma-separated participant ids (default val01; '
                         'the test split has no public labels)')
    ap.add_argument('--cameras', default='webcam_c',
                    help='comma-separated camera names')
    ap.add_argument('--stimuli', default='image',
                    help='comma-separated stimulus types')
    ap.add_argument('--max-clips', type=int, default=4,
                    help='number of clip windows to compare (default 4)')
    ap.add_argument('--max-sequence-len', type=int, default=None,
                    help='override window length (default: config 30)')
    ap.add_argument('--skip-reference', action='store_true',
                    help='only run eve_tpu (no cross-stack deltas)')
    ap.add_argument('--write-baseline', action='store_true',
                    help='append the table to BASELINE.md')
    return ap.parse_args(argv)


def _fail_runbook(msg):
    sys.stderr.write('PARITY GATE NOT RUN: %s\n\n' % msg)
    sys.stderr.write(
        'Runbook:\n'
        '  1. Obtain the EVE dataset (https://ait.ethz.ch/eve) and point\n'
        '     --datasrc-eve at its root (participant dirs train01..test10).\n'
        '  2. Download the released weights from\n'
        '     https://github.com/swook/EVE/releases/download/v0.0/ into a\n'
        '     directory and export EVE_PRETRAINED_DIR=<that dir>.\n'
        '  3. Re-run: python tools/close_parity_gate.py '
        '--datasrc-eve <root> --write-baseline\n')
    return 2


def _weighted(totals, counts, outputs, rows):
    for k, v in outputs.items():
        if hasattr(v, 'ndim') and v.ndim == 0 and np.isfinite(float(v)):
            totals[k] = totals.get(k, 0.0) + float(v) * rows
            counts[k] = counts.get(k, 0) + rows


def run_eve_tpu(config, params, dataset, max_clips):
    """Per-clip forward with output_predictions over dataset[0:max_clips]."""
    import jax.numpy as jnp
    from eve_tpu.models import eve as eve_lib
    spec = eve_lib.EveSpec.from_config(config)
    totals, counts = {}, {}
    clips = []
    n = min(len(dataset), max_clips)
    for idx in range(n):
        item = dataset[idx]
        batch = {k: jnp.asarray(np.asarray(v)[None])
                 for k, v in item.items() if not isinstance(v, str)}
        out = eve_lib.forward(spec, params, batch, training=False,
                              output_predictions=True)
        _weighted(totals, counts, out, 1)
        clips.append({
            'meta': (item.get('participant'), item.get('subfolder'),
                     item.get('camera')),
            'PoG_px_initial': np.asarray(out['PoG_px_initial'],
                                         np.float32)[0],
            'PoG_px_final': np.asarray(out['PoG_px_final'], np.float32)[0],
            'validity': np.asarray(
                item.get('left_PoG_tobii_validity')).astype(bool)
            & np.asarray(item.get('right_PoG_tobii_validity')).astype(bool),
        })
    metrics = {k: totals[k] / counts[k] for k in totals}
    return clips, metrics


def run_reference(args, pretrained_dir, overrides, max_clips, workdir):
    """The reference's own datasource + model over the same clips."""
    import torch
    from eve_tpu.utils import reference_bridge as bridge
    bridge.install_reference_shims(torch)
    if not hasattr(np, 'int'):
        np.int = int
    with bridge.reference_on_path(), contextlib.chdir(workdir):
        os.makedirs('segmentation_cache', exist_ok=True)
        import datasources.eve_sequences as ref_ds_mod
        import models.eve as ref_eve_mod
        from core import DefaultConfig as RefConfig
        ref_ds_mod.sequence_segmentations = None
        config = RefConfig()
        for k, v in overrides.items():
            config.override(k, v)
        try:
            dataset = ref_ds_mod.EVESequencesBase(
                args.datasrc_eve,
                participants_to_use=args.participants.split(','),
                cameras_to_use=args.cameras.split(','),
                types_of_stimuli=args.stimuli.split(','))
            model = ref_eve_mod.EVE(output_predictions=True)
            from eve_tpu.utils.load_model import pretrained_filename
            for which, module in (('eye_net', model.eye_net),
                                  ('refine_net', model.refine_net)):
                path = os.path.join(pretrained_dir,
                                    pretrained_filename(config, which))
                module.load_state_dict(
                    torch.load(path, map_location='cpu'))
            model.eval()

            totals, counts = {}, {}
            clips = []
            n = min(len(dataset), max_clips)
            for idx in range(n):
                item = dataset[idx]
                batch = {k: (v.unsqueeze(0) if hasattr(v, 'unsqueeze')
                             else [v]) for k, v in item.items()}
                with torch.no_grad():
                    out = model(batch)
                _weighted(totals, counts,
                          {k: v.detach().numpy() if hasattr(v, 'detach')
                           else v for k, v in out.items()}, 1)
                clips.append({
                    'meta': (item.get('participant'), item.get('subfolder'),
                             item.get('camera')),
                    'PoG_px_initial':
                        out['PoG_px_initial'].detach().numpy()[0],
                    'PoG_px_final':
                        out['PoG_px_final'].detach().numpy()[0],
                })
        finally:
            for k in overrides:
                config.override(k, getattr(type(config), k))
    metrics = {k: totals[k] / counts[k] for k in totals}
    return clips, metrics


def build_report(our_clips, our_metrics, ref_clips, ref_metrics):
    lines = []
    lines.append('## Parity gate run (%s, tools/close_parity_gate.py)'
                 % time.strftime('%Y-%m-%d'))
    lines.append('')
    keys = sorted(k for k in our_metrics
                  if k.startswith(('metric_', 'loss_')))
    if ref_metrics:
        lines.append('| quantity | reference | eve_tpu | rel delta |')
        lines.append('|---|---|---|---|')
        for k in keys:
            if k not in ref_metrics:
                continue
            r, o = ref_metrics[k], our_metrics[k]
            rel = abs(o - r) / (abs(r) + 1e-12)
            lines.append('| `%s` | %.6g | %.6g | %.3g |' % (k, r, o, rel))
    else:
        lines.append('| quantity | eve_tpu |')
        lines.append('|---|---|')
        for k in keys:
            lines.append('| `%s` | %.6g |' % (k, our_metrics[k]))
    lines.append('')

    verdict = None
    if ref_clips is not None:
        max_d_init = max_d_final = 0.0
        for a, b in zip(our_clips, ref_clips):
            assert a['meta'] == b['meta'], (
                'clip order diverged between stacks: %s vs %s'
                % (a['meta'], b['meta']))
            v = a['validity'].astype(bool)
            if not v.any():
                continue
            d_init = np.abs(a['PoG_px_initial'] - b['PoG_px_initial'])[v]
            d_final = np.abs(a['PoG_px_final'] - b['PoG_px_final'])[v]
            max_d_init = max(max_d_init, float(d_init.max()))
            max_d_final = max(max_d_final, float(d_final.max()))
        lines.append('Cross-stack per-frame PoG deltas over %d clips '
                     '(valid frames, 1920x1080 px): initial max %.4f px, '
                     'final max %.4f px.' % (len(our_clips), max_d_init,
                                             max_d_final))
        # "Bit-comparable" operationalized: within 1px on the 1920-wide
        # screen (<0.06% of the axis) AND every shared accuracy metric
        # within 1% relative.
        metric_rel = max(
            (abs(our_metrics[k] - ref_metrics[k])
             / (abs(ref_metrics[k]) + 1e-12)
             for k in keys if k in ref_metrics and k.startswith('metric_')),
            default=0.0)
        closed = max_d_final < 1.0 and max_d_init < 1.0 and metric_rel < 0.01
        verdict = ('**GATE CLOSED**: PoG bit-comparable (<1 px) and all '
                   'accuracy metrics within 1%% relative.' if closed else
                   '**GATE OPEN**: deltas exceed the closure thresholds '
                   '(PoG <1 px, metrics <1%% rel) — investigate before '
                   'claiming parity.')
        lines.append('')
        lines.append(verdict)
    else:
        lines.append('(reference run skipped: eve_tpu-only accuracy '
                     'snapshot, no cross-stack verdict)')
    lines.append('')
    return '\n'.join(lines), verdict


def main(argv=None):
    args = parse_args(argv)
    if not os.path.isdir(args.datasrc_eve):
        return _fail_runbook('dataset root %r does not exist'
                             % args.datasrc_eve)
    if not args.pretrained_dir or not os.path.isdir(args.pretrained_dir):
        return _fail_runbook('released weights not found '
                             '(--pretrained-dir/$EVE_PRETRAINED_DIR = %r)'
                             % args.pretrained_dir)

    from eve_tpu.config import DefaultConfig
    from eve_tpu.data.dataset import EVESequencesBase
    from eve_tpu.utils.load_model import (load_pretrained_params,
                                          pretrained_filename)
    config = DefaultConfig()
    overrides = {'refine_net_enabled': True, 'load_screen_content': True,
                 'load_full_frame_for_visualization': False,
                 'fully_reproducible': True}
    if args.max_sequence_len:
        overrides['max_sequence_len'] = args.max_sequence_len
    config.import_dict(overrides, strict=False)

    params = {}
    for which in ('eye_net', 'refine_net'):
        loaded = load_pretrained_params(config, which, args.pretrained_dir)
        if loaded is None:
            return _fail_runbook(
                '%s not found in %r' % (pretrained_filename(config, which),
                                        args.pretrained_dir))
        params[which] = loaded
    print('Converted released weights from %s' % args.pretrained_dir)

    import tempfile
    with tempfile.TemporaryDirectory() as cache_dir:
        dataset = EVESequencesBase(
            args.datasrc_eve, config=config,
            participants_to_use=args.participants.split(','),
            cameras_to_use=args.cameras.split(','),
            types_of_stimuli=args.stimuli.split(','),
            cache_dir=os.path.join(cache_dir, 'segcache'))
        if len(dataset) == 0:
            return _fail_runbook(
                'no clips matched (participants=%s cameras=%s stimuli=%s)'
                % (args.participants, args.cameras, args.stimuli))
        n = min(len(dataset), args.max_clips)
        print('Evaluating %d clip windows (eve_tpu)...' % n)
        our_clips, our_metrics = run_eve_tpu(config, params, dataset,
                                             args.max_clips)

        ref_clips = ref_metrics = None
        if not args.skip_reference:
            from eve_tpu.utils.reference_bridge import reference_available
            if not reference_available():
                print('WARNING: reference checkout not available; '
                      'cross-stack deltas skipped', file=sys.stderr)
            else:
                print('Evaluating %d clip windows (reference)...' % n)
                ref_clips, ref_metrics = run_reference(
                    args, args.pretrained_dir, overrides, args.max_clips,
                    cache_dir)

    report, verdict = build_report(our_clips, our_metrics,
                                   ref_clips, ref_metrics)
    print()
    print(report)
    if args.write_baseline:
        with open(BASELINE_MD, 'a') as f:
            f.write('\n' + report)
        print('Appended to %s' % BASELINE_MD)
    return 0


if __name__ == '__main__':
    sys.exit(main())
