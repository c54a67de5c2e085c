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


def pretrained_filename(config, which, fmt='pt'):
    """Release-style filename for the configured architecture.

    ``fmt='pt'`` is the reference's torch release scheme. ``fmt='npz'``
    is this framework's NATIVE pretrained format: the same architecture
    encoding plus a ``_tpu`` marker when ``tpu_native_arch`` is set (the
    TPU-native topology is not weight-compatible with the reference one,
    so the two must never share a filename). The EyeNet marker also
    encodes the patch-embedding stem variant (``_tpu`` = stride-4
    ``patchify``, ``_tpu8`` = stride-8 ``patchify8``): the two stems have
    byte-identical parameter trees (same 8x8x3x64 kernel — the stride is
    architecture, not weights), so a shape guard alone cannot stop a
    stride-4 export from silently bootstrapping a stride-8 model. A
    native file is simply a checkpoint submodule file — copy
    ``<run>/checkpoints/<N>.ckpt/eye_net.npz`` to
    ``$EVE_PRETRAINED_DIR/<this name>`` to export a trained stage.
    """
    if which == 'eye_net':
        name = 'eve_eyenet_'
        name += config.eye_net_rnn_type if config.eye_net_use_rnn else 'static'
    elif which == 'refine_net':
        name = 'eve_refinenet_'
        name += (config.refine_net_rnn_type if config.refine_net_use_rnn
                 else 'static')
        name += '_oa' if config.refine_net_do_offset_augmentation else ''
        name += '_skip' if config.refine_net_use_skip_connections else ''
    else:
        raise ValueError('Unknown component: %s' % which)
    if fmt == 'npz':
        if getattr(config, 'tpu_native_arch', False):
            stem = getattr(config, 'tpu_native_stem', 'patchify')
            if which == 'eye_net' and stem != 'patchify':
                # Stems are weight-shape-identical but stride-incompatible;
                # the filename is the only guard (see docstring).
                name += {'patchify8': '_tpu8'}.get(stem, '_tpu_' + stem)
            else:
                name += '_tpu'
        return name + '.npz'
    return name + '.pt'


def _load_native_npz(path):
    import numpy as np
    from eve_tpu.train.checkpoint import unflatten_tree
    with np.load(path) as data:
        flat = {k: data[k] for k in data.files}
    return unflatten_tree(flat)


def load_pretrained_params(config, which, pretrained_dir=None):
    """Locate pretrained weights, or return None.

    Searches ``pretrained_dir`` or ``$EVE_PRETRAINED_DIR``, preferring the
    NATIVE ``.npz`` format (a checkpoint submodule file, see
    ``pretrained_filename``) and falling back to the reference's released
    ``.pt`` (converted from the torch layout on load). With
    ``tpu_native_arch`` only the native format is eligible — the released
    torch weights cannot express the patchify topology. Download is
    impossible here (zero egress); users place release files from
    ``MODEL_URL_PRE`` there manually.
    """
    tpu_native = getattr(config, 'tpu_native_arch', False)
    search = [d for d in (pretrained_dir, os.environ.get('EVE_PRETRAINED_DIR'))
              if d]
    fname_npz = pretrained_filename(config, which, fmt='npz')
    fnames = [fname_npz]
    if not tpu_native:
        fnames.append(pretrained_filename(config, which, fmt='pt'))
    for d in search:
        for fname in fnames:
            path = os.path.join(d, fname)
            if not os.path.isfile(path):
                continue
            logger.info('Loading pretrained %s from %s', which, path)
            if fname.endswith('.npz'):
                return _load_native_npz(path)
            from eve_tpu.utils.torch_convert import load_reference_checkpoint
            return load_reference_checkpoint(path, which)
    logger.warning('Pretrained weights %s not found locally (looked in %s)%s',
                   ' or '.join(fnames), search or '[]',
                   '' if tpu_native else '; fetch from %s%s' % (
                       MODEL_URL_PRE, fnames[-1]))
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
    if config.eye_net_load_pretrained:
        wanted.append('eye_net')
    if config.refine_net_enabled and config.refine_net_load_pretrained:
        wanted.append('refine_net')
    loaded = []
    tpu_native = getattr(config, 'tpu_native_arch', False)
    for which in wanted:
        new = load_pretrained_params(config, which, pretrained_dir)
        if new is None:
            fname = pretrained_filename(
                config, which, fmt='npz' if tpu_native else 'pt')
            search = [d for d in (pretrained_dir,
                                  os.environ.get('EVE_PRETRAINED_DIR')) if d]
            if tpu_native:
                raise FileNotFoundError(
                    'config.%s_load_pretrained is set with tpu_native_arch '
                    'but %s was not found (searched: %s). The TPU-native '
                    'topology is NOT weight-compatible with the reference '
                    'release .pt checkpoints — export a native stage '
                    'instead (copy <run>/checkpoints/<N>.ckpt/%s.npz to '
                    '$EVE_PRETRAINED_DIR/%s); refusing to train against a '
                    'randomly initialized %s.'
                    % (which, fname, search or ['<unset>'], which, fname,
                       which))
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
