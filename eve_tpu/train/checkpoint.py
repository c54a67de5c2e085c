"""Checkpoint manager with the reference's on-disk layout semantics.

Reference behavior (src/core/checkpoint_manager.py:37-149): checkpoints are
*directories* named ``%07d.pt`` under ``<output_dir>/checkpoints``; model
parameters are split into one file per top-level prefix (``eye_net``,
``refine_net``) enabling partial loads; optimizer state saved as
``optimizer_<i>``; newest ``checkpoints_keep_n`` retained; the step number is
recovered from the directory name.

TPU-native adaptations: parameters stored as ``.npz`` of '/'-flattened
pytrees; writes are atomic (tmp dir + rename) for preemption safety
(SURVEY.md section 5.3); loads merge all non-optimizer ``.npz`` files found.
"""

import glob
import logging
import os
import shutil

import jax
import numpy as np

import flax.serialization

logger = logging.getLogger(__name__)

_SUFFIX = '.ckpt'


def flatten_tree(tree, prefix=''):
    """Pytree of arrays -> {'a/b/c': array} with string keys."""
    out = {}
    state = flax.serialization.to_state_dict(tree)

    def rec(node, path):
        if isinstance(node, dict):
            for k, v in node.items():
                rec(v, path + (str(k),))
        else:
            out['/'.join(path)] = np.asarray(node)

    rec(state, () if not prefix else (prefix,))
    return out


def unflatten_tree(flat):
    """Inverse of flatten_tree (returns nested dicts of arrays)."""
    root = {}
    for key, value in flat.items():
        parts = key.split('/')
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value
    return root


class CheckpointManager:
    """Save/load/prune checkpoints for a TrainState."""

    def __init__(self, output_dir, keep_n=3):
        self.output_dir = output_dir
        self.keep_n = keep_n

    @property
    def checkpoint_dir(self):
        return os.path.join(self.output_dir, 'checkpoints')

    def _step_dir(self, step):
        return os.path.join(self.checkpoint_dir, ('%07d' % step) + _SUFFIX)

    def save_at_step(self, step, state):
        """Atomically write params (per top-level prefix) + optimizer state."""
        final_dir = self._step_dir(step)
        tmp_dir = final_dir + '.tmp'
        if os.path.isdir(tmp_dir):
            shutil.rmtree(tmp_dir)
        os.makedirs(tmp_dir)

        params = jax.device_get(state.params)
        for prefix, subtree in params.items():
            flat = flatten_tree(subtree)
            np.savez(os.path.join(tmp_dir, prefix + '.npz'), **flat)

        # Optimizer state uses msgpack: optax states contain empty nodes
        # that a flat npz cannot represent.
        with open(os.path.join(tmp_dir, 'optimizer_0.msgpack'), 'wb') as f:
            f.write(flax.serialization.to_bytes(
                jax.device_get(state.opt_state)))

        if os.path.isdir(final_dir):
            shutil.rmtree(final_dir)
        os.rename(tmp_dir, final_dir)
        logger.info('> Saved parameters to: %s', final_dir)
        self._prune()
        return final_dir

    def _available(self):
        entries = []
        for path in glob.glob(os.path.join(self.checkpoint_dir,
                                           '*' + _SUFFIX)):
            if not os.path.isdir(path):
                continue
            name = os.path.basename(path)
            try:
                step = int(name[:-len(_SUFFIX)])
            except ValueError:
                continue
            entries.append((step, path))
        return sorted(entries)

    def _prune(self):
        available = self._available()
        if len(available) > self.keep_n:
            for _, path in available[:-self.keep_n]:
                shutil.rmtree(path)
                logger.info('> Removed checkpoint: %s', path)

    def load(self, path, state, load_optimizer=True):
        """Load a checkpoint directory into a TrainState (template-shaped)."""
        params = dict(jax.device_get(state.params))
        for npz_path in glob.glob(os.path.join(path, '*.npz')):
            name = os.path.basename(npz_path)[:-len('.npz')]
            if name.startswith('optimizer_'):
                continue
            with np.load(npz_path) as data:
                flat = {k: data[k] for k in data.files}
            loaded = unflatten_tree(flat)
            template = params.get(name)
            if template is not None:
                params[name] = flax.serialization.from_state_dict(
                    template, loaded)
            else:
                params[name] = loaded
            logger.info('> Loaded model parameters from: %s', npz_path)

        opt_state = state.opt_state
        opt_path = os.path.join(path, 'optimizer_0.msgpack')
        if load_optimizer and os.path.isfile(opt_path):
            with open(opt_path, 'rb') as f:
                opt_state = flax.serialization.from_bytes(
                    state.opt_state, f.read())
            logger.info('> Loaded optimizer state from: %s', opt_path)

        step = int(os.path.basename(path)[:-len(_SUFFIX)])
        import jax.numpy as jnp
        return state.replace(step=jnp.asarray(step, jnp.int32),
                             params=params, opt_state=opt_state), step

    def load_last_checkpoint(self, state, load_optimizer=True):
        """Load the newest checkpoint; returns (state, step) or (state, 0)."""
        available = self._available()
        if not available:
            return state, 0
        return self.load(available[-1][1], state,
                         load_optimizer=load_optimizer)
