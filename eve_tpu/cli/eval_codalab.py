#!/usr/bin/env python3
"""Produce a Codalab submission archive from the test split.

Usage mirrors the reference (src/eval_codalab.py):

    python eval_codalab.py --resume-from <run_dir>

Writes ``for_codalab_<ts>.pkl.gz`` + ``.zip`` with per
(participant, subfolder, camera) concatenated arrays of
timestamps / pupil sizes / PoG_px_{initial,final}
(reference src/eval_codalab.py:45-104).
"""

import gzip
import logging
import os
import pickle
import time
import zipfile

import numpy as np

from eve_tpu import infer
from eve_tpu.config import DefaultConfig
from eve_tpu.data.dataset import EVESequences_test
from eve_tpu.data.loader import DataLoader
from eve_tpu.train import harness

logger = logging.getLogger(__name__)

KEYS_TO_STORE = ['timestamps', 'left_pupil_size', 'right_pupil_size',
                 'PoG_px_initial', 'PoG_px_final']


def script_init_common(argv=None):
    config = DefaultConfig()
    config.override('fully_reproducible', True)
    config.override('refine_net_enabled', True)
    config.override('load_screen_content', True)
    config.override('load_full_frame_for_visualization', False)
    harness.script_init_common(argv=argv,
                               description='Codalab evaluation for EVE.')
    return config


def init_dataset(config):
    dataset = EVESequences_test(config.datasrc_eve, config=config,
                                is_final_test=True)
    dataloader = DataLoader(dataset,
                            batch_size=config.codalab_eval_batch_size,
                            shuffle=False, drop_last=False,
                            num_workers=config.codalab_eval_data_workers)
    return dataset, dataloader


def _eval_mesh(config, batch_size):
    """Data-parallel eval mesh (``--tpu-num-devices``, 0 = all available).

    Same device-selection rule as the training harness
    (eve_tpu/train/harness.py): use the largest device count that divides
    the batch so every chip takes an equal clip share; 1 device = no mesh.
    """
    import jax
    from eve_tpu.parallel import mesh as mesh_lib
    n_avail = (config.tpu_num_devices if config.tpu_num_devices > 0
               else len(jax.devices()))
    n_use = max(d for d in range(1, n_avail + 1) if batch_size % d == 0)
    if n_use < n_avail:
        logger.warning(
            'codalab_eval_batch_size=%d not divisible by %d devices; '
            'evaluating on %d.', batch_size, n_avail, n_use)
    if n_use <= 1:
        return None
    logger.info('evaluating data-parallel over %d devices', n_use)
    return mesh_lib.make_mesh(n_use)


def main():
    config = script_init_common()
    dataset, dataloader = init_dataset(config)
    assert config.resume_from, '--resume-from is required'
    spec, params = infer.model_setup(config)
    mesh = _eval_mesh(config, config.codalab_eval_batch_size)

    processed_so_far = set()
    outputs_to_write = {}
    # materialize_inputs=False: only the host-side string metadata is read
    # below; copying the eye/screen tensors back would cost ~2 GB per
    # 128-clip batch of pure device->host transfer.
    for step, inputs, outputs in infer.iterator(spec, params, dataloader,
                                                create_images=False,
                                                materialize_inputs=False,
                                                mesh=mesh):
        batch_size = outputs['PoG_px_initial'].shape[0]
        for i in range(batch_size):
            participant = inputs['participant'][i]
            subfolder = inputs['subfolder'][i]
            camera = inputs['camera'][i]
            sub_dict = outputs_to_write.setdefault(
                participant, {}).setdefault(subfolder, {})
            if camera in sub_dict:
                for key in KEYS_TO_STORE:
                    sub_dict[camera][key] = np.concatenate(
                        [sub_dict[camera][key], outputs[key][i]], axis=0)
            else:
                sub_dict[camera] = {key: outputs[key][i]
                                    for key in KEYS_TO_STORE}
            sequence_key = (participant, subfolder, camera)
            if sequence_key not in processed_so_far:
                print('Handling %s/%s/%s' % sequence_key)
                processed_so_far.add(sequence_key)

    output_fname = 'for_codalab_%s.pkl.gz' % time.strftime('%y%m%d_%H%M%S')
    final_output_path = os.path.join(config.resume_from, output_fname)
    with gzip.open(final_output_path, 'wb') as f:
        pickle.dump(outputs_to_write, f, protocol=3)
    zip_output_path = final_output_path.replace('.pkl.gz', '.zip')
    with zipfile.ZipFile(zip_output_path, 'w') as zf:
        zf.write(final_output_path, arcname=output_fname)
    print('> Wrote %s' % zip_output_path)


if __name__ == '__main__':
    main()
