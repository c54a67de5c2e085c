"""Pretrained-weight resolution for EyeNet / RefineNet.

Mirrors the reference's release-asset naming scheme
(src/utils/load_model.py:32-55): ``eve_eyenet_<RNN|static>.pt`` and
``eve_refinenet_<RNN|static>[_oa][_skip].pt``. This environment has no
network egress, so weights are resolved from a local directory (the
``EVE_PRETRAINED_DIR`` env var or an explicit argument) and converted from
the torch layout on load.
"""

import logging
import os

logger = logging.getLogger(__name__)

MODEL_URL_PRE = 'https://github.com/swook/EVE/releases/download/v0.0/'


def pretrained_filename(config, which):
    """Release filename for the configured architecture."""
    if which == 'eye_net':
        name = 'eve_eyenet_'
        name += config.eye_net_rnn_type if config.eye_net_use_rnn else 'static'
        return name + '.pt'
    if which == 'refine_net':
        name = 'eve_refinenet_'
        name += (config.refine_net_rnn_type if config.refine_net_use_rnn
                 else 'static')
        name += '_oa' if config.refine_net_do_offset_augmentation else ''
        name += '_skip' if config.refine_net_use_skip_connections else ''
        return name + '.pt'
    raise ValueError('Unknown component: %s' % which)


def load_pretrained_params(config, which, pretrained_dir=None):
    """Locate + convert released reference weights, or return None.

    Searches ``pretrained_dir`` or ``$EVE_PRETRAINED_DIR`` for the release
    filename. Download is impossible here (zero egress); users place the
    files from ``MODEL_URL_PRE`` there manually.
    """
    from eve_tpu.utils.torch_convert import load_reference_checkpoint
    fname = pretrained_filename(config, which)
    search = [d for d in (pretrained_dir, os.environ.get('EVE_PRETRAINED_DIR'))
              if d]
    for d in search:
        path = os.path.join(d, fname)
        if os.path.isfile(path):
            logger.info('Loading pretrained %s from %s', which, path)
            return load_reference_checkpoint(path, which)
    logger.warning('Pretrained weights %s not found locally (looked in %s); '
                   'fetch from %s%s', fname, search or '[]',
                   MODEL_URL_PRE, fname)
    return None
