#!/usr/bin/env python3
"""Export a trained EVE model as a self-contained AOT artifact (.eve).

Usage:
    python export_model.py [config.json ...] [--flags] \
        --resume-from <run_dir> --export-path model.eve \
        [--export-batch-size 1] [--export-streaming yes]

The artifact (see eve_tpu/export.py) bakes the weights in and fixes the
input signature at (batch, T, ...) for the configured eyes/screen sizes;
deployment deserializes it with ``eve_tpu.export.load_exported`` and
calls it — no model code or checkpoint needed at serving time.
"""

import logging

import numpy as np

logger = logging.getLogger(__name__)


def main(argv=None):
    from eve_tpu.config import DefaultConfig
    from eve_tpu.train import harness

    config = DefaultConfig()
    config.override('fully_reproducible', True)
    config.override('refine_net_enabled', True)
    config.override('load_screen_content', True)
    harness.script_init_common(argv=argv,
                               description='Export EVE as an AOT artifact.')
    assert config.export_path > '', '--export-path is required'

    from eve_tpu import infer as infer_lib
    from eve_tpu.data.synthetic import make_synthetic_batch
    from eve_tpu.export import export_inference

    spec, params = infer_lib.model_setup(config, require_weights=True)
    rng = np.random.RandomState(0)
    assert config.eyes_size[0] == config.eyes_size[1], config.eyes_size
    example = make_synthetic_batch(
        rng, batch_size=config.export_batch_size,
        sequence_len=config.max_sequence_len,
        eyes_size=config.eyes_size[0],
        screen_size=tuple(config.screen_size),
        with_screen=spec.load_screen_content, with_gt=False,
        frame_dtype=(np.uint8 if config.tpu_on_device_preprocess
                     else np.float32))
    streaming = config.export_streaming
    blob = export_inference(spec, params, example, streaming=streaming)
    with open(config.export_path, 'wb') as f:
        f.write(blob)
    logger.info('Wrote %s (%.1f MB, streaming=%s, B=%d, T=%d)',
                config.export_path, len(blob) / 1e6, streaming,
                config.export_batch_size, config.max_sequence_len)


if __name__ == '__main__':
    main()
