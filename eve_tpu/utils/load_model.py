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


def _tree_shapes(tree, prefix=''):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_tree_shapes(v, prefix + k + '/'))
        else:
            out[prefix + k] = tuple(v.shape)
    return out


def bootstrap_pretrained(config, params, pretrained_dir=None):
    """Construction-time pretrained bootstrap for the TRAINING path.

    The reference loads released EyeNet/RefineNet weights at model
    construction when ``eye_net_load_pretrained`` /
    ``refine_net_load_pretrained`` are set (src/models/eve.py:55-67 via
    src/utils/load_model.py:35-55), so ``train.py configs/refine_net.json``
    trains a RefineNet on top of the released frozen EyeNet. Mutates
    ``params`` in place and returns the list of components loaded.

    Raises FileNotFoundError when a flag is set but the weights are absent:
    the reference fails at download time, and silently training against a
    frozen *random* EyeNet would corrupt the two-stage workflow.
    """
    wanted = []
    if getattr(config, 'tpu_native_arch', False) and (
            config.eye_net_load_pretrained or
            (config.refine_net_enabled and
             config.refine_net_load_pretrained)):
        raise ValueError(
            'tpu_native_arch is enabled but *_load_pretrained is set: the '
            'TPU-native topology (patchify stems, lane-filling refine '
            'pyramid) is NOT weight-compatible with the reference release '
            'checkpoints. Train from scratch, or disable tpu_native_arch.')
    if config.eye_net_load_pretrained:
        wanted.append('eye_net')
    if config.refine_net_enabled and config.refine_net_load_pretrained:
        wanted.append('refine_net')
    loaded = []
    for which in wanted:
        new = load_pretrained_params(config, which, pretrained_dir)
        if new is None:
            fname = pretrained_filename(config, which)
            search = [d for d in (pretrained_dir,
                                  os.environ.get('EVE_PRETRAINED_DIR')) if d]
            raise FileNotFoundError(
                'config.%s_load_pretrained is set but %s was not found '
                '(searched: %s). Download it from %s%s and place it under '
                '$EVE_PRETRAINED_DIR; refusing to train against a randomly '
                'initialized %s.' % (which, fname, search or ['<unset>'],
                                     MODEL_URL_PRE, fname, which))
        want_shapes = _tree_shapes(params[which])
        got_shapes = _tree_shapes(new)
        if want_shapes != got_shapes:
            diff = sorted(set(want_shapes.items())
                          ^ set(got_shapes.items()))
            raise ValueError(
                'Pretrained %s does not match the configured architecture; '
                'mismatched entries: %s' % (which, diff[:10]))
        params[which] = new
        loaded.append(which)
    return loaded
