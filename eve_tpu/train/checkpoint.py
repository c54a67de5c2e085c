"""Checkpoint manager with the reference's on-disk layout semantics.

Reference behavior (src/core/checkpoint_manager.py:37-149): checkpoints are
*directories* named ``%07d.pt`` under ``<output_dir>/checkpoints``; model
parameters are split into one file per top-level prefix (``eye_net``,
``refine_net``) enabling partial loads; optimizer state saved as
``optimizer_<i>``; newest ``checkpoints_keep_n`` retained; the step number is
recovered from the directory name.

TPU-native adaptations: parameters AND optimizer state stored as ``.npz``
of '/'-flattened pytrees (empty optax nodes ride an ``__empty__``
sentinel; ``optimizer_0.msgpack`` from older runs still loads); writes are
atomic (tmp dir + rename) for preemption safety (SURVEY.md section 5.3)
and can run on a background writer thread (``save_at_step(wait=False)``)
after a synchronous owned-memory snapshot, so training never blocks on
serialization/disk; loads merge all non-optimizer ``.npz`` files found.
"""

import glob
import logging
import os
import shutil
from concurrent.futures import ThreadPoolExecutor

import jax
import numpy as np

import flax.serialization

logger = logging.getLogger(__name__)

_SUFFIX = '.ckpt'

# Sentinel npz key marking an EMPTY dict node (e.g. optax's EmptyState
# inside a chain): flatten_tree would otherwise emit no key for it and
# from_state_dict on load would report the node as missing.
_EMPTY = '__empty__'

# One process-wide writer thread: async checkpoint writes from any
# manager serialize through it (single disk; bounded memory — at most
# one snapshot in flight per manager). Created on the first ASYNC save
# only (blocking saves write inline on the caller thread); Python joins
# the non-daemon worker at interpreter exit, so an in-flight write
# always completes even if the caller exits without waiting.
_writer = None


def _writer_executor():
    global _writer
    if _writer is None:
        _writer = ThreadPoolExecutor(max_workers=1,
                                     thread_name_prefix='ckpt-writer')
    return _writer


def flatten_tree(tree, prefix=''):
    """Pytree of arrays -> {'a/b/c': array} with string keys.

    Empty dict nodes are recorded as ``path/__empty__`` sentinels so the
    structure round-trips through unflatten_tree + from_state_dict.
    """
    out = {}
    state = flax.serialization.to_state_dict(tree)

    def rec(node, path):
        if isinstance(node, dict):
            if not node and path:
                out['/'.join(path + (_EMPTY,))] = np.zeros(0, np.uint8)
                return
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
        if parts[-1] == _EMPTY:
            continue  # the setdefault walk above already created the dict
        node[parts[-1]] = value
    return root


def _host_snapshot(tree):
    """Fetch a pytree to host memory the caller OWNS.

    ``jax.device_get`` on the CPU backend can return zero-copy views of
    the device buffers; the fused train step DONATES its state buffers,
    so a view would be overwritten mid-write by the next step. Copying
    decouples the snapshot (cheap: host memcpy) from the device arrays.
    """
    host = jax.device_get(tree)
    return jax.tree_util.tree_map(
        lambda x: np.array(x, copy=True) if isinstance(x, np.ndarray)
        else x, host)


class CheckpointManager:
    """Save/load/prune checkpoints for a TrainState."""

    def __init__(self, output_dir, keep_n=3):
        self.output_dir = output_dir
        self.keep_n = keep_n
        self._pending = None  # outstanding async write (at most one)

    @property
    def checkpoint_dir(self):
        return os.path.join(self.output_dir, 'checkpoints')

    def _step_dir(self, step):
        return os.path.join(self.checkpoint_dir, ('%07d' % step) + _SUFFIX)

    def save_at_step(self, step, state, wait=True):
        """Atomically write params (per top-level prefix) + optimizer state.

        ``wait=False`` returns after snapshotting the state to host memory
        and hands the file write to a background thread — a blocking save
        of the flagship state costs seconds (dominated by serialization,
        BASELINE.md "Checkpoint save cost"), which at the reference's
        100-step cadence is a double-digit percentage of training
        wall-clock. The snapshot is synchronous, so the written bytes are
        exactly the state at this step regardless of later updates. Any
        error surfaces on the next save/load/wait_for_writes call; an
        in-flight write also completes at interpreter exit.
        """
        # Serialize with the previous write (and surface its error) BEFORE
        # snapshotting, so at most one snapshot (~2x model size of host
        # memory) is alive at a time.
        self.wait_for_writes()
        if wait:
            # Blocking save: write inline — the caller blocks until the
            # write completes, so no later (buffer-donating) train step
            # can overwrite the fetched arrays mid-write; the defensive
            # snapshot copy is unnecessary and sync-only use never spawns
            # the writer thread.
            return self._write(step, jax.device_get(state.params),
                               jax.device_get(state.opt_state))
        params = _host_snapshot(state.params)
        opt_state = _host_snapshot(state.opt_state)
        self._pending = _writer_executor().submit(
            self._write, step, params, opt_state)
        return self._step_dir(step)

    def wait_for_writes(self):
        """Join the outstanding async write, re-raising its error (if any)."""
        if self._pending is not None:
            pending, self._pending = self._pending, None
            pending.result()

    def _write(self, step, params, opt_state):
        final_dir = self._step_dir(step)
        tmp_dir = final_dir + '.tmp'
        if os.path.isdir(tmp_dir):
            shutil.rmtree(tmp_dir)
        os.makedirs(tmp_dir)

        for prefix, subtree in params.items():
            flat = flatten_tree(subtree)
            np.savez(os.path.join(tmp_dir, prefix + '.npz'), **flat)

        # Optimizer state as flattened npz like the params (empty optax
        # nodes ride the __empty__ sentinel). npz writes the raw array
        # bytes (~25x faster than flax's msgpack encoding for this state,
        # BASELINE.md); .msgpack checkpoints from older runs still load.
        np.savez(os.path.join(tmp_dir, 'optimizer_0.npz'),
                 **flatten_tree(opt_state))

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
        self.wait_for_writes()  # never read around an in-flight write
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
        opt_npz = os.path.join(path, 'optimizer_0.npz')
        opt_msgpack = os.path.join(path, 'optimizer_0.msgpack')
        if load_optimizer and os.path.isfile(opt_npz):
            with np.load(opt_npz) as data:
                flat = {k: data[k] for k in data.files}
            opt_state = flax.serialization.from_state_dict(
                state.opt_state, unflatten_tree(flat))
            logger.info('> Loaded optimizer state from: %s', opt_npz)
        elif load_optimizer and os.path.isfile(opt_msgpack):
            # Checkpoints written before the npz optimizer format.
            with open(opt_msgpack, 'rb') as f:
                opt_state = flax.serialization.from_bytes(
                    state.opt_state, f.read())
            logger.info('> Loaded optimizer state from: %s', opt_msgpack)

        step = int(os.path.basename(path)[:-len(_SUFFIX)])
        import jax.numpy as jnp
        return state.replace(step=jnp.asarray(step, jnp.int32),
                             params=params, opt_state=opt_state), step

    def load_last_checkpoint(self, state, load_optimizer=True):
        """Load the newest checkpoint; returns (state, step) or (state, 0)."""
        # Join BEFORE scanning the directory, not just before reading
        # (load() also joins): an in-flight async write means the newest
        # checkpoint may not be renamed into place yet, and the writer's
        # prune may remove a dir between the glob and the read.
        self.wait_for_writes()
        available = self._available()
        if not available:
            return state, 0
        return self.load(available[-1][1], state,
                         load_optimizer=load_optimizer)
