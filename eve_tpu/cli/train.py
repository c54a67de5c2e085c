#!/usr/bin/env python3
"""Train the EVE gaze-estimation model (TPU-native).

Usage mirrors the reference (README.md:41-46):

    python train.py [config1.json config2.json ...] [--flag value ...]

e.g. ``python train.py configs/eye_net.json`` or
``python train.py configs/refine_net.json --datasrc-eve /data/eve``.
"""

import logging

from eve_tpu.data.dataset import EVESequences_train, EVESequences_val
from eve_tpu.train import harness

logger = logging.getLogger(__name__)


def main():
    config = harness.script_init_common()

    train_dataset_paths = [
        ('eve_train', EVESequences_train, config.datasrc_eve,
         config.train_stimuli, config.train_cameras),
    ]
    validation_dataset_paths = [
        ('eve_val', EVESequences_val, config.datasrc_eve,
         config.test_stimuli, config.test_cameras),
    ]
    train_data, test_data = harness.init_datasets(
        config, train_dataset_paths, validation_dataset_paths)

    exp = harness.Experiment(config)

    for current_step, metrics, images in harness.main_loop_iterator(
            exp, train_data, test_data):
        # Composite images (screen+history overlays, heatmap grids) arrive
        # every tensorboard_images_every_n_steps; cadence is harness-side.
        for tag, img in images.items():
            exp.tensorboard.add_image(tag, img)

    harness.do_final_full_test(exp, test_data)
    harness.cleanup_and_quit(exp, train_data, test_data)


if __name__ == '__main__':
    main()
