"""Training harness: CLI/config init, datasets, run setup, main loop.

Mirrors the reference harness surface (src/core/training.py:61-638):
auto-generated ``--flag`` CLI from config attributes, JSON-then-CLI
precedence, run identifier ``<Model><suffix>/<timestamp>.<md5(cfg)[:6]>``,
output-dir provenance, live-validation subsets, periodic checkpoint/test,
NaN abort, final full test. The per-step backward/clip/step sequence is
fused into one jitted XLA computation (see train/step.py); batches are
sharded over the ``data`` mesh axis (see parallel/mesh.py).
"""

import argparse
import hashlib
import logging
import os
import signal
import sys
import threading
import time

import numpy as np

import jax

from eve_tpu.config import DefaultConfig
from eve_tpu.data.dataset import (
    EVESequences_train, EVESequences_val, EVESequences_test)
from eve_tpu.data.loader import DataLoader, DevicePrefetcher, to_device_arrays
from eve_tpu.models import eve as eve_lib
from eve_tpu.parallel import mesh as mesh_lib
from eve_tpu.train import optim as optim_lib
from eve_tpu.train import step as step_lib
from eve_tpu.train.checkpoint import CheckpointManager
from eve_tpu.train.gsheet import GoogleSheetLogger
from eve_tpu.train.logging_utils import Tensorboard

logger = logging.getLogger(__name__)

_file_handler = None  # per-process messages.log handler (see Experiment)


def _convert_cli_arg_type(config, key, value):
    config_type = type(getattr(config, key))
    if config_type == bool:
        if value.lower() in ('true', 'yes', 'y') or value == '1':
            return True
        if value.lower() in ('false', 'no', 'n') or value == '0':
            return False
        raise ValueError('Invalid input for bool config "%s": %s'
                         % (key, value))
    if config_type == list:
        import json as json_lib
        return json_lib.loads(value)
    return config_type(value)


def script_init_common(argv=None, description='Train a gaze estimation model.'):
    """Parse CLI (auto --flags from config attrs), load JSONs, seed."""
    config = DefaultConfig()
    parser = argparse.ArgumentParser(description=description)
    parser.add_argument('-v', type=str, default='info',
                        choices=['debug', 'info', 'warning', 'error',
                                 'critical'])
    parser.add_argument('config_json', type=str, nargs='*',
                        help='Path(s) to JSON config, parsed in order.')
    for key in dir(config):
        if key.startswith('_') or key.startswith('__'):
            continue
        if isinstance(getattr(DefaultConfig, key, None), property):
            continue
        value = getattr(config, key)
        if callable(value):
            continue
        arg_type = str if isinstance(value, (bool, list)) else type(value)
        parser.add_argument('--' + key.replace('_', '-'), type=arg_type,
                            metavar=str(value),
                            help='Expected type is `%s`.'
                                 % type(value).__name__)
    args = parser.parse_args(argv)

    logging.basicConfig(
        level=args.v.upper(),
        format='%(asctime)s %(levelname)s %(message)s',
        datefmt='%d/%m %H:%M:%S')
    # basicConfig silently skips the level when handlers already exist
    # (embedding hosts, pytest); the reference's coloredlogs.install sets
    # it unconditionally (src/core/training.py:89-93) — match that, or
    # messages.log misses every INFO line in embedded runs.
    logging.getLogger().setLevel(args.v.upper())

    for json_path in args.config_json:
        config.import_json(json_path)

    config.import_dict({
        key: _convert_cli_arg_type(config, key, value)
        for key, value in vars(args).items()
        if value is not None and key not in ('v', 'config_json')
        and hasattr(config, key)
    })

    # The reference always seeds np/torch with 0 and gates only cudnn
    # determinism on fully_reproducible (training.py:106-112). XLA-on-TPU
    # has no cudnn-style nondeterministic kernels, so here the flag instead
    # gates the run-varying RNG streams (data shuffle order, kappa
    # augmentation): fully_reproducible=True pins them to seed 0 (two runs
    # are bit-identical — tested), False draws them from entropy so
    # independent runs see different training noise, the analog of the
    # reference's run-to-run variation. Parameter INIT stays seed-0 either
    # way, like the reference's unconditional torch.manual_seed(0).
    np.random.seed(0)
    global _training_seed
    _training_seed = None

    if config.tpu_compile_cache_dir:
        # Persistent XLA compilation cache: restarted jobs (preemption
        # auto-resume especially — SIGTERM/143 cycles restart the process
        # over and over) skip the multi-10s model compile instead of
        # re-paying it every time. Keyed by XLA on hardware+version; keep
        # the directory per-fleet (identical machines), not shared across
        # heterogeneous hosts.
        jax.config.update('jax_compilation_cache_dir',
                          config.tpu_compile_cache_dir)
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
        logger.info('> Persistent compilation cache: %s',
                    config.tpu_compile_cache_dir)

    if config.tpu_multihost:
        mesh_lib.initialize_multihost(
            config.tpu_coordinator_address or None,
            config.tpu_num_processes or None,
            config.tpu_process_id)
        logger.info('> Multi-host initialized: process %d/%d, %d devices',
                    jax.process_index(), jax.process_count(),
                    len(jax.devices()))
    return config


DATASET_CLASSES = {
    'train': EVESequences_train,
    'val': EVESequences_val,
    'test': EVESequences_test,
}

_training_seed = None


def training_seed(config):
    """Seed for the run-varying RNG streams (shuffle order, kappa draws).

    0 when ``config.fully_reproducible`` (bit-identical reruns), else a
    process-stable entropy draw (each run trains on a different shuffle /
    augmentation stream). Cached so the loader and the train-loop PRNGKey
    agree within one process. In multi-host runs every host must shuffle
    identically, so process 0's draw is broadcast to all hosts (a
    clock-derived seed would silently diverge for jobs straddling the
    derivation quantum).
    """
    global _training_seed
    if _training_seed is None:
        if config.fully_reproducible:
            _training_seed = 0
        else:
            import os as os_lib
            seed = int.from_bytes(os_lib.urandom(4), 'little')
            if jax.process_count() > 1:
                from jax.experimental import multihost_utils
                seed = int(multihost_utils.broadcast_one_to_all(
                    jax.numpy.asarray(seed, jax.numpy.uint32)))
            _training_seed = seed
        logger.info('Training seed: %d (fully_reproducible=%s)',
                    _training_seed, config.fully_reproducible)
    return _training_seed


def init_datasets(config, train_specs, test_specs):
    """Build training and live-validation datasets + loaders.

    Spec tuples: (tag, dataset_class, path, stimuli, cameras) — identical
    to the reference (src/train.py:35-41).

    Arms the preemption SIGTERM handler FIRST: dataset + model build can
    take minutes, and with SIG_DFL still in place a platform preemption
    notice landing in that window would kill the process outright. The
    flag it sets survives until the first step check honors it. (This is
    train-path-only on purpose — inference/serving CLIs must keep normal
    SIGTERM kill semantics.)
    """
    _install_preemption_handler()
    train_data = {}
    accum = max(int(config.gradient_accumulation_steps), 1)
    assert config.batch_size % accum == 0, (
        'batch_size %d must divide by gradient_accumulation_steps %d'
        % (config.batch_size, accum))
    for tag, dataset_class, path, stimuli, cameras in train_specs:
        dataset = dataset_class(path, config=config, cameras_to_use=cameras,
                                types_of_stimuli=stimuli)
        # The loader yields micro-batches; every `accum` of them makes one
        # optimizer update of effective size config.batch_size.
        local_batch = config.batch_size // accum
        if jax.process_count() > 1:
            # Multi-host: each host loads an equal-size deterministic slice
            # of the clip list (wrap-around remainder) so every host sees
            # the same steps_per_epoch and the collective step stays in
            # lockstep (SURVEY.md section 2.4). The per-host loader yields
            # batch_size / process_count samples; device_put_batch
            # assembles them into the global batch.
            assert local_batch % jax.process_count() == 0, (
                'batch_size %d must divide by %d hosts x %d accumulation'
                % (config.batch_size, jax.process_count(), accum))
            local_batch = local_batch // jax.process_count()
            idx = mesh_lib.local_data_slice(len(dataset))
            dataset.all_subfolders = [dataset.all_subfolders[i] for i in idx]
            logger.info('> Host %d/%d takes %d clips of %s',
                        jax.process_index(), jax.process_count(),
                        len(idx), tag)
        loader = DataLoader(dataset, batch_size=local_batch,
                            shuffle=True, drop_last=True,
                            num_workers=config.train_data_workers,
                            seed=training_seed(config))
        train_data[tag] = {'dataset': dataset, 'dataloader': loader}
        logger.info('> Ready to use training dataset: %s (%d videos)',
                    tag, len(dataset))

    test_data = {}
    for tag, dataset_class, path, stimuli, cameras in test_specs:
        dataset = dataset_class(path, config=config, cameras_to_use=cameras,
                                types_of_stimuli=stimuli,
                                live_validation=True)
        indices = None
        if len(dataset) > config.test_num_samples:
            indices = sorted(np.random.permutation(
                len(dataset))[:config.test_num_samples].tolist())
        loader = SubsetLoader(dataset, indices,
                              batch_size=config.test_batch_size,
                              num_workers=config.test_data_workers)
        test_data[tag] = {
            'dataset': dataset, 'dataset_class': dataset_class,
            'dataset_path': path, 'stimuli': stimuli, 'cameras': cameras,
            'dataloader': loader,
        }
        logger.info('> Ready to use evaluation dataset: %s (%d entries%s)',
                    tag, len(dataset),
                    '' if indices is None else ', eval on %d' % len(indices))
    return train_data, test_data


def SubsetLoader(dataset, indices, batch_size, num_workers=0):
    """DataLoader over an optional index subset (live validation / full
    test). Worker threads are honored — the final full test decodes every
    video and was previously forced single-threaded."""
    return DataLoader(dataset, batch_size=batch_size, shuffle=False,
                      drop_last=False, num_workers=num_workers,
                      indices=indices)


def _config_identity_hash(config):
    """md5[:6] of the config, excluding keys that don't define the
    EXPERIMENT: resume_from / auto_resume describe how this process was
    launched (the reference's flow is restart-with---resume-from, so its
    hash-stability never mattered; ours must match across 'same argv plus
    --auto-resume yes', README), and the per-host distributed-wiring keys
    differ between hosts of ONE run (explicit --tpu-process-id would give
    every host a different hash).
    """
    import json as json_mod
    values = json_mod.loads(config.get_full_json())
    for key in ('resume_from', 'auto_resume',
                'tpu_process_id', 'tpu_coordinator_address'):
        values.pop(key, None)
    return hashlib.md5(json_mod.dumps(
        values, sort_keys=True).encode()).hexdigest()[:6]


def _latest_resumable_run(family_dir, cfg_hash):
    """Newest run dir named ``<ts>.<cfg_hash>`` that has checkpoints.

    Timestamps are ``%y%m%d_%H%M%S``, so lexicographic order IS
    chronological order. Directories without a saved checkpoint are
    skipped: resuming one would silently restart from step 0 while
    reusing its tensorboard/log files.
    """
    import glob as glob_mod
    candidates = sorted(
        d for d in glob_mod.glob(os.path.join(family_dir, '*.' + cfg_hash))
        if os.path.isdir(d)
        and glob_mod.glob(os.path.join(d, 'checkpoints', '*.ckpt')))
    return candidates[-1] if candidates else None


class Experiment:
    """Holds all run state: config, spec, mesh, train state, IO managers."""

    def __init__(self, config, output_dir_base='./outputs'):
        self.config = config
        self.spec = eve_lib.EveSpec.from_config(config)

        cfg_hash = _config_identity_hash(config)
        identifier = ('EVE' + config.identifier_suffix + '/' +
                      time.strftime('%y%m%d_%H%M%S') + '.' + cfg_hash)
        if config.auto_resume and not config.resume_from:
            # Preemption loop closure: a restarted job with identical argv
            # hashes identically, finds its own previous run directory, and
            # continues from the SIGTERM checkpoint (config.py:auto_resume).
            # The DECISION is the primary's alone, broadcast to every host:
            # checkpoints exist only on the primary's (possibly host-local)
            # filesystem, and hosts deciding independently would diverge —
            # the resume branch in build_training runs a collective, so a
            # split decision deadlocks it.
            found = None
            if mesh_lib.is_primary_process():
                found = _latest_resumable_run(
                    os.path.join(output_dir_base,
                                 'EVE' + config.identifier_suffix), cfg_hash)
            if jax.process_count() > 1:
                found = mesh_lib.broadcast_string(found or '') or None
            if found:
                logger.info('auto_resume: continuing %s', found)
                config.override('resume_from', found)
            else:
                logger.info('auto_resume: no prior run with config hash '
                            '%s; starting fresh', cfg_hash)
        if config.resume_from:
            identifier = '/'.join(config.resume_from.split('/')[-2:])
            output_dir = config.resume_from
        else:
            if jax.process_count() > 1:
                # Host clocks can straddle a second boundary: take the
                # primary's timestamped identifier everywhere so all hosts
                # agree on the run's identity.
                identifier = mesh_lib.broadcast_string(identifier)
            output_dir = os.path.join(output_dir_base, identifier)
        self.identifier = identifier
        self.output_dir = output_dir
        os.makedirs(output_dir, exist_ok=True)

        self.tensorboard = Tensorboard(output_dir)
        if not config.resume_from and mesh_lib.is_primary_process():
            config.write_file_contents(output_dir)

        # File logging (reference training.py:199-205). Replace any handler
        # from a previous Experiment in this process so log lines are not
        # duplicated into stale messages.log files.
        global _file_handler
        if _file_handler is not None:
            logging.getLogger().removeHandler(_file_handler)
            _file_handler.close()
        _file_handler = logging.FileHandler(
            os.path.join(output_dir, 'messages.log'))
        _file_handler.setFormatter(logging.Formatter(
            '%(asctime)s %(levelname)s %(message)s', '%d/%m %H:%M:%S'))
        logging.getLogger().addHandler(_file_handler)

        # Mesh size must divide the PER-STEP batch so clips shard evenly
        # over the data axis; with gradient accumulation each step carries
        # batch_size / accumulation clips (keying on config.batch_size here
        # would silently push every training step into device_put_batch's
        # replicated single-device fallback). Fall back to the largest
        # divisor. The 'model' (tensor-parallel) and 'seq' (temporal
        # sharding) axes claim their devices first; the data axis divides
        # what remains.
        step_batch = config.batch_size // max(
            int(config.gradient_accumulation_steps), 1)
        n_avail = (config.tpu_num_devices if config.tpu_num_devices > 0
                   else len(jax.devices()))
        mp = max(int(config.tpu_model_parallelism), 1)
        sp = max(int(config.tpu_sequence_shards), 1)
        if mp * sp > n_avail:
            raise ValueError(
                'tpu_model_parallelism=%d x tpu_sequence_shards=%d needs '
                '%d devices, have %d' % (mp, sp, mp * sp, n_avail))
        if n_avail % (mp * sp) != 0:
            # Flooring here would silently idle devices the user paid for
            # (e.g. 8 devices with model=3 would use 6 and strand 2).
            raise ValueError(
                'tpu_model_parallelism=%d x tpu_sequence_shards=%d must '
                'divide the %d available devices (a non-divisor would '
                'leave %d devices idle)'
                % (mp, sp, n_avail, n_avail % (mp * sp)))
        if config.max_sequence_len % sp != 0:
            raise ValueError(
                'tpu_sequence_shards=%d must divide max_sequence_len=%d '
                '(the distributed scan splits the T axis evenly)'
                % (sp, config.max_sequence_len))
        data_avail = n_avail // (mp * sp)
        n_use = max(d for d in range(1, data_avail + 1)
                    if step_batch % d == 0)
        if n_use != data_avail:
            logger.warning(
                'per-step batch %d not divisible by the %d devices left '
                'for the data axis (%d total / model=%d / seq=%d); using '
                'a %d-wide data axis.', step_batch, data_avail, n_avail,
                mp, sp, n_use)
        if mp == 1 and sp == 1:
            self.mesh = mesh_lib.make_mesh(n_use)
        else:
            axes = {'data': n_use}
            if mp > 1:
                axes['model'] = mp
            if sp > 1:
                axes['seq'] = sp
            self.mesh = mesh_lib.make_mesh_nd(axes)
            logger.info('mesh axes: %s', dict(self.mesh.shape))
        # seq_mesh applies to the TRAIN step only: eval runs data-parallel
        # (its ragged final batches fall back to replicated placement,
        # which the distributed scan's batch-divisibility check rejects,
        # and eval holds no optimizer/gradient memory to shard away).
        self.seq_mesh = self.mesh if sp > 1 else None
        self.gsheet_logger = GoogleSheetLogger(
            config, identifier, resuming=bool(config.resume_from))
        self.checkpoint_manager = CheckpointManager(
            output_dir, keep_n=config.checkpoints_keep_n)
        self.last_step = 0
        self.last_epoch = 0.0

    def build_training(self, steps_per_epoch):
        cfg = self.config
        self.tx, self.schedule = optim_lib.build_optimizer(
            cfg, steps_per_epoch)
        self.state = step_lib.create_train_state(
            self.spec, self.tx, jax.random.PRNGKey(0))
        num_params = sum(x.size for x in
                         jax.tree_util.tree_leaves(self.state.params))
        logger.info('There are %d parameters.', num_params)
        # Construction-time pretrained bootstrap (reference
        # src/models/eve.py:55-67): configs/refine_net.json trains a
        # RefineNet on top of the released FROZEN EyeNet, so the frozen
        # weights must be the released ones, not the random init. Applied
        # before resume so checkpoints of this run take precedence.
        if (cfg.eye_net_load_pretrained or
                (cfg.refine_net_enabled and cfg.refine_net_load_pretrained)):
            from eve_tpu.utils.load_model import bootstrap_pretrained
            loaded = bootstrap_pretrained(cfg, self.state.params)
            logger.info('Loaded pretrained components: %s', loaded)
        # Resume BEFORE replication: the checkpoint loader returns host
        # arrays, which would silently drop the mesh placement if loaded
        # afterwards. In multi-host runs only the primary saved checkpoints
        # (the filesystem may be host-local), so broadcast its state.
        if cfg.resume_from:
            self.state, self.last_step = \
                self.checkpoint_manager.load_last_checkpoint(self.state)
            if jax.process_count() > 1:
                from jax.experimental import multihost_utils
                self.state = multihost_utils.broadcast_one_to_all(self.state)
                self.last_step = int(multihost_utils.broadcast_one_to_all(
                    jax.numpy.asarray(self.last_step)))
        if len(self.mesh.devices.flatten()) > 1:
            if 'model' in self.mesh.axis_names:
                # Tensor parallelism: large output-feature dims (and the
                # shape-congruent Adam moments) shard over 'model';
                # everything else replicates (shard_model_tree handles
                # both). Cross-host model sharding is checkpointable:
                # save_checkpoint gathers via mesh_lib.gather_to_host on
                # every process before the primary writes.
                self.state = self.state.replace(
                    params=mesh_lib.shard_model_tree(
                        self.mesh, self.state.params),
                    opt_state=mesh_lib.shard_model_tree(
                        self.mesh, self.state.opt_state))
                n_sharded = sum(
                    1 for leaf in jax.tree_util.tree_leaves(
                        self.state.params)
                    if 'model' in str(leaf.sharding.spec))
                if n_sharded == 0:
                    # Devices are reserved for the model axis but every
                    # leaf stayed replicated (last dims not divisible by
                    # the axis, or all below min_size) — the user asked
                    # for TP and is silently not getting it.
                    logger.warning(
                        'tpu_model_parallelism=%d sharded ZERO parameter '
                        'leaves (no last dim divisible/large enough); the '
                        'model axis only costs devices',
                        self.mesh.shape['model'])
                else:
                    logger.info('model axis shards %d parameter leaves',
                                n_sharded)
            else:
                self.state = self.state.replace(
                    params=mesh_lib.replicate(self.mesh, self.state.params),
                    opt_state=mesh_lib.replicate(self.mesh,
                                                 self.state.opt_state))
        self.train_step = step_lib.make_train_step(self.spec, self.tx,
                                                   seq_mesh=self.seq_mesh)
        self.eval_step = step_lib.make_eval_step(self.spec)
        if cfg.profile_dir:
            # Dump the model graph (jaxpr + HLO) alongside profile traces.
            # The reference's Tensorboard exposes the same API but training
            # never invokes it (src/core/tensorboard.py:41-45).
            import jax.numpy as jnp
            from eve_tpu.data.synthetic import make_synthetic_batch
            example = make_synthetic_batch(
                np.random.RandomState(0), batch_size=1, sequence_len=2,
                eyes_size=cfg.eyes_size[0],
                with_screen=cfg.load_screen_content)
            example = {k: jnp.asarray(v) for k, v in example.items()}
            self.tensorboard.add_graph(
                lambda b: step_lib.make_eval_step(self.spec)(
                    self.state.params, b), example)
        return self

    def device_put_batch(self, device_batch):
        n = len(self.mesh.devices.flatten())
        if jax.process_count() > 1:
            # Each host holds a DIFFERENT local slice of the global batch;
            # a plain device_put with a global sharding would alias every
            # host's array as the same global rows. Assemble properly.
            from jax.sharding import NamedSharding, PartitionSpec as P
            sharding = NamedSharding(self.mesh, P('data'))
            return jax.tree_util.tree_map(
                lambda x: jax.make_array_from_process_local_data(
                    sharding, np.asarray(x)), device_batch)
        if n > 1:
            batch_dim = next(iter(device_batch.values())).shape[0]
            # Clips split over the DATA axis only (model/seq axes see the
            # whole batch), so divisibility keys on that axis's extent.
            data_extent = dict(self.mesh.shape).get('data', n)
            if batch_dim % data_extent == 0:
                return mesh_lib.shard_batch(self.mesh, device_batch)
            # Ragged final eval batches: run replicated on one device.
        return jax.device_put(device_batch)


def step_modulo(current, interval_size):
    return current % interval_size == (interval_size - 1)


# Preemption handling (SURVEY.md section 5.3: the reference's only recovery
# is restart + --resume-from, losing up to checkpoints_save_every_n_steps-1
# steps; TPU VMs are preemptible, so losing work to SIGTERM is routine).
# The flag is checked once per training step: on SIGTERM the loop saves a
# checkpoint at the CURRENT step and exits with code 143 (128+SIGTERM), so
# a restarted run resumes exactly where the signal landed.
_PREEMPTION = threading.Event()


def request_preemption_checkpoint(signum=None, frame=None):
    """Signal-handler-compatible: ask the main loop to checkpoint + exit."""
    _PREEMPTION.set()


def _install_preemption_handler():
    """Install the SIGTERM handler when it is safe and polite to do so.

    Only from the main thread (signal.signal raises elsewhere). A default
    (SIG_DFL) or ignored (SIG_IGN) disposition is replaced — SIG_IGN is
    almost always accidentally inherited from a daemon-style launcher, and
    honoring it would silently void the no-steps-lost guarantee. An
    embedding application's own custom handler is never replaced (it can
    call ``request_preemption_checkpoint`` itself); that case is logged so
    the operator knows preemption checkpointing is not armed.

    ``_PREEMPTION`` is deliberately NOT cleared here: a preemption notice
    that arrives while datasets/Experiment are still being built (before
    the loop reaches this installer) must survive installation — clearing
    would discard it and train on until SIGKILL with nothing saved.
    """
    if threading.current_thread() is not threading.main_thread():
        logger.info('not on the main thread; preemption checkpointing on '
                    'SIGTERM is not armed')
        return
    current = signal.getsignal(signal.SIGTERM)
    if current in (signal.SIG_DFL, signal.SIG_IGN):
        signal.signal(signal.SIGTERM, request_preemption_checkpoint)
        if current == signal.SIG_IGN:
            logger.warning('SIGTERM was inherited as SIG_IGN; replaced '
                           'with the preemption-checkpoint handler')
    elif current is not request_preemption_checkpoint:
        logger.info('SIGTERM already has a custom handler; preemption '
                    'checkpointing is not armed (the handler may call '
                    'request_preemption_checkpoint itself)')


# Multi-host preemption agreement runs every N steps / eval batches, not
# every one: the allgather BLOCKS the host, and a per-step barrier would
# defeat async dispatch (steps are otherwise fetched only at log/checkpoint
# intervals). Platforms send the preemption notice tens of seconds before
# SIGKILL, so an up-to-8-step agreement delay is immaterial.
_PREEMPTION_SYNC = 8


def _preemption_agreed(sync=True):
    """Whether to act on preemption NOW — agreed across hosts.

    Single-process: the local flag (checking it is free, so ``sync`` is
    ignored). Multi-host: hosts can observe SIGTERM around different step
    boundaries, and a host exiting one step before its peers would leave
    them hanging in the next step's collectives — so agreement points run
    a tiny allgather and ANY host's flag preempts all of them at the same
    boundary. Callers pass ``sync=True`` only on a cadence that is a pure
    function of the (host-identical) step/batch index, so every host
    reaches the same agreement points; between them this returns False
    even if the LOCAL flag is set (exiting unilaterally would hang peers).
    """
    if jax.process_count() == 1:
        return _PREEMPTION.is_set()
    if not sync:
        return False
    from jax.experimental import multihost_utils
    local = np.float32(1.0 if _PREEMPTION.is_set() else 0.0)
    agreed = float(multihost_utils.process_allgather(local).max()) > 0.0
    if agreed:
        _PREEMPTION.set()  # hosts whose signal is still in flight adopt it
    return agreed


def save_checkpoint(exp, step, wait=True):
    """Checkpoint ``exp.state`` at ``step`` (multi-host correct).

    ``wait=False`` hands the file write to the checkpoint manager's
    background writer after a synchronous host snapshot (the gather below
    is a collective and must stay on the caller thread on every host).

    The host fetch happens on EVERY process — for cross-host
    model-sharded parameters it is a collective gather
    (``mesh_lib.gather_to_host``), so gating the whole save behind
    ``is_primary_process`` would deadlock the primary against peers that
    never entered the collective. Only the primary then writes.
    """
    state = exp.state
    if jax.process_count() > 1:
        # Non-primaries join only the collective leaves; their plain
        # replicated leaves stay on device (nobody reads them, and a full
        # D2H of params + both Adam moments per save would stall dispatch
        # on every host for the primary's benefit alone).
        skip_local = not mesh_lib.is_primary_process()
        state = state.replace(
            params=mesh_lib.gather_to_host(state.params,
                                           skip_local=skip_local),
            opt_state=mesh_lib.gather_to_host(state.opt_state,
                                              skip_local=skip_local))
    if mesh_lib.is_primary_process():
        exp.checkpoint_manager.save_at_step(step, state, wait=wait)


def _exit_for_preemption(exp, train_data, test_data):
    """Checkpoint + exit 143 after an agreed preemption.

    Reached once per training step AND once per eval batch, so preemption
    during live validation or the final full test also terminates
    promptly instead of being silently swallowed until SIGKILL.
    ``exp.last_step`` counts completed steps, matching the periodic
    saves' numbering; saving is atomic (tmp+rename), so re-saving a step
    that already has a checkpoint is harmless.
    """
    if hasattr(exp, 'state'):
        # All processes join the (possibly collective) host fetch — the
        # preemption agreement already put them at the same boundary.
        save_checkpoint(exp, exp.last_step + 1)
        logger.warning(
            'Preemption signal received: checkpoint saved at step %d; '
            'resume with --resume-from %s', exp.last_step + 1,
            exp.output_dir)
    else:
        logger.warning(
            'Preemption signal received: exiting (no training state '
            'built yet, nothing to save)')
    cleanup_and_quit(exp, train_data, test_data, exit_code=143)


def main_loop_iterator(exp, train_data, test_data):
    """Generator over training steps; yields (step, metrics, images).

    Deviation from the reference generator (training.py:425-592): the
    backward pass runs inside the jitted step before the yield, so the
    caller receives finished metrics instead of appending loss terms.
    """
    config = exp.config
    # The reference fetches one batch from EVERY training source per step
    # (training.py:240-264); with several sources we train on the summed
    # loss in one fused step (see step.make_multi_source_train_step). NOTE:
    # the reference EVE model itself asserts a single source
    # (src/models/eve.py:71-73) — multi-source is harness capability there
    # too, never exercised by a shipped config.
    if config.skip_training:
        # Eval-only: still need model state + checkpoint for the final test.
        exp.build_training(1)
        return

    tag0, data0 = next(iter(train_data.items()))
    multi_source = len(train_data) > 1
    local_batch = data0['dataloader'].batch_size  # micro-batch (see init)
    echo = max(int(config.train_batch_echoing), 1)
    accum = max(int(config.gradient_accumulation_steps), 1)
    max_dataset_len = max(len(d['dataset']) for d in train_data.values())
    steps_per_epoch = int(max_dataset_len / local_batch)
    # Loop steps are MICRO-steps: one loaded batch yields `echo` of them,
    # and `accum` of them make one optimizer update. The LR schedule's
    # domain is optimizer updates.
    num_training_steps = int(config.num_epochs * max(steps_per_epoch, 1)
                             * echo)
    updates_per_epoch = max(1, (max(steps_per_epoch, 1) * echo) // accum)
    exp.build_training(updates_per_epoch)
    if multi_source:
        exp.train_step = step_lib.make_multi_source_train_step(
            exp.spec, exp.tx, tags=sorted(train_data),
            seq_mesh=exp.seq_mesh)

    # Kappa-augmentation stream: keyed per STEP (fold_in) rather than a
    # serially split chain, so a resumed run draws exactly the kappas the
    # uninterrupted run would have drawn at each step.
    base_rng = jax.random.PRNGKey(training_seed(config))
    iterators = {}

    if exp.last_step > 0:
        # Exact resume: continue the data stream where the interrupted run
        # stood instead of replaying from epoch 0. One batch is loaded per
        # `echo` micro-steps, so the stream position is last_step // echo
        # (a partial echo group reloads its batch). With
        # fully_reproducible, interrupted+resumed training is then
        # bit-identical to an uninterrupted run.
        for data_dict in train_data.values():
            loader = data_dict['dataloader']
            if hasattr(loader, 'fast_forward'):
                loader.fast_forward(exp.last_step // echo)

    def next_batch(tag, data_dict):
        for attempt in range(2):
            it = iterators.get(tag)
            if it is None:
                it = iter(DevicePrefetcher(data_dict['dataloader'],
                                           exp.device_put_batch))
                iterators[tag] = it
            try:
                return next(it)
            except StopIteration:
                iterators.pop(tag, None)
        raise RuntimeError(
            'Training dataloader %r yielded no batches (dataset of %d '
            'entries with batch_size=%d, drop_last).'
            % (tag, len(data_dict['dataset']), config.batch_size))

    def abort_if_nan(metrics):
        """NaN watchdog (reference training.py:536-542); exits non-zero so
        wrappers don't mistake the aborted run for success, and runs before
        checkpoint saves so NaN parameters are never persisted."""
        if bool(metrics['nan_flag']):
            logger.error('NaN encountered during training; aborting.')
            cleanup_and_quit(exp, train_data, test_data, exit_code=1)

    _install_preemption_handler()
    profiling = False
    # exp.last_step mutates every iteration; anchor the profiler window to
    # the loop's start so start/stop actually trigger (steps +5 .. +10,
    # past the compile step).
    profile_anchor = exp.last_step
    echo_cache = None
    # Pipeline-stall diagnostics: fraction of wall-clock the loop spends
    # BLOCKED waiting for host data (decode/pack/H2D) vs dispatching steps.
    # A high data_wait_pct means the host pipeline is the bottleneck —
    # raise train_data_workers or train_batch_echoing (BASELINE.md
    # "Host-pipeline scaling").
    perf_t0 = time.perf_counter()
    perf_steps = 0
    perf_wait = 0.0
    try:
        for current_step in range(exp.last_step, num_training_steps):
            current_epoch = ((current_step // echo) * local_batch) \
                / max_dataset_len
            exp.tensorboard.update_current_step(current_step + 1)

            if config.profile_dir and current_step == profile_anchor + 5:
                jax.profiler.start_trace(config.profile_dir)
                profiling = True

            # Data echoing: reuse each loaded batch `echo` times (the kappa
            # augmentation stream still differs per step: `sub` below is
            # fold_in(base_rng, current_step)) — a
            # device-utilization lever when the host pipeline is the
            # bottleneck (BASELINE.md "Host-pipeline scaling").
            if echo == 1 or echo_cache is None or current_step % echo == 0:
                wait_start = time.perf_counter()
                if multi_source:
                    device_batch = {tag: next_batch(tag, d)[0]
                                    for tag, d in train_data.items()}
                    first_batch = device_batch[tag0]
                else:
                    device_batch, _ = next_batch(tag0, data0)
                    first_batch = device_batch
                perf_wait += time.perf_counter() - wait_start
                echo_cache = (device_batch, first_batch)
            else:
                device_batch, first_batch = echo_cache

            sub = jax.random.fold_in(base_rng, current_step)
            exp.state, metrics = exp.train_step(exp.state, device_batch, sub)
            # exp.state now holds step current_step's update, so record it
            # HERE, not at the end of the iteration: live validation (and
            # its preemption exit) runs later in this same iteration, and a
            # stale last_step would number the preemption checkpoint one
            # step low — the resumed run would re-apply an optimizer update
            # to post-update state.
            exp.last_epoch = current_epoch
            exp.last_step = current_step

            if profiling and current_step == profile_anchor + 10:
                jax.profiler.stop_trace()
                profiling = False

            images = {}
            if config.load_screen_content and step_modulo(
                    current_step, config.tensorboard_images_every_n_steps):
                if not hasattr(exp, 'image_step'):
                    exp.image_step = step_lib.make_eval_step(
                        exp.spec, create_images=True)
                from eve_tpu.train.logging_utils import compose_training_images
                # EVERY process runs the jitted eval step (it participates
                # in the mesh collectives; gating it per-host would desync
                # SPMD execution), but only the primary does the host-side
                # composition — compose fetches local shards of the
                # globally-sharded outputs.
                img_out = exp.image_step(exp.state.params, first_batch)
                if mesh_lib.is_primary_process():
                    images = compose_training_images(
                        img_out, screen_size=tuple(config.screen_size))
            yield current_step, metrics, images

            if _preemption_agreed(sync=current_step % _PREEMPTION_SYNC == 0):
                # SIGTERM (preemption) landed during this step: persist the
                # exact step and exit 143 so the supervisor distinguishes
                # "interrupted, resumable" from success (0) / NaN abort (1).
                # Every process exits; only the primary writes.
                abort_if_nan(metrics)  # never persist NaN parameters
                _exit_for_preemption(exp, train_data, test_data)

            # The three logging intervals and the NaN watchdog are independent
            # (nesting them under the console-log gate would silently disable
            # scalars and delay the NaN abort when log_every_n_steps is raised).
            log_console = step_modulo(current_step, config.log_every_n_steps)
            log_scalars = step_modulo(current_step,
                                      config.tensorboard_scalars_every_n_steps)
            perf_steps += 1
            if log_console or log_scalars:
                host_metrics = {k: float(v) for k, v in metrics.items()
                                if k != 'nan_flag'}
                # Interval-level pipeline stats (metric fetch above synced the
                # device, so the wall-clock window is honest).
                dt = time.perf_counter() - perf_t0
                steps_per_sec = perf_steps / max(dt, 1e-9)
                data_wait_pct = 100.0 * perf_wait / max(dt, 1e-9)
                perf_t0 = time.perf_counter()
                perf_steps = 0
                perf_wait = 0.0
            if log_console:
                logger.info('Step %d, Epoch %.2f [%.2f steps/s, '
                            '%.0f%% data-wait]> %s', current_step + 1,
                            current_epoch, steps_per_sec, data_wait_pct,
                            ', '.join('%s: %.4g' % (k, host_metrics[k])
                                      for k in sorted(host_metrics)))
            if log_scalars:
                for key, metric in host_metrics.items():
                    if key.startswith('loss_'):
                        exp.tensorboard.add_scalar(
                            'train_losses/%s' % key[len('loss_'):], metric)
                    elif key.startswith('metric_'):
                        exp.tensorboard.add_scalar(
                            'train_metrics/%s' % key[len('metric_'):], metric)
                    else:
                        exp.tensorboard.add_scalar('train/%s' % key, metric)
                exp.tensorboard.add_scalar('lr/epoch', current_epoch)
                exp.tensorboard.add_scalar('perf/steps_per_sec', steps_per_sec)
                exp.tensorboard.add_scalar('perf/data_wait_pct', data_wait_pct)
            if step_modulo(current_step,
                           config.tensorboard_learning_rate_every_n_steps):
                # The schedule's domain is OPTIMIZER UPDATES; with gradient
                # accumulation the optimizer has only applied
                # current_step // accum of them (optax MultiSteps counts inner
                # updates), so log the LR actually in effect.
                exp.tensorboard.add_scalar(
                    'lr/optim_0', float(exp.schedule(current_step // accum)))
            if log_console or log_scalars:
                abort_if_nan(metrics)

            if step_modulo(current_step, config.checkpoints_save_every_n_steps):
                abort_if_nan(metrics)  # never persist NaN parameters
                # The save interval is a pure function of the step, so
                # every host enters save_checkpoint's collective together.
                # Periodic saves overlap training via the background
                # writer (a blocking save costs seconds — BASELINE.md
                # "Checkpoint save cost"); preemption/final saves and all
                # loads join it.
                save_checkpoint(exp, current_step + 1,
                                wait=not config.tpu_async_checkpoint)

            if step_modulo(current_step, config.test_every_n_steps):
                abort_if_nan(metrics)
                _, for_gsheet = test_model_on_all(exp, test_data,
                                                  current_step + 1)
                if for_gsheet is not None:
                    for_gsheet['Step'] = current_step + 1
                    for_gsheet['Epoch'] = current_epoch
                    exp.gsheet_logger.update_or_append_row(for_gsheet)
    finally:
        # Stop an open trace on EVERY exit path - normal end, a run
        # shorter than the profile window, NaN abort (SystemExit from
        # cleanup_and_quit), or the consumer closing the generator -
        # else the trace file is left empty/corrupt.
        if profiling:
            jax.profiler.stop_trace()
            profiling = False

    if hasattr(exp, 'state'):
        # Same completed-step numbering as the periodic saves
        # (current_step + 1), so resume continues at the right step.
        save_checkpoint(exp, exp.last_step + 1)


def _pad_eval_batch(batch, full_size):
    """Pad a ragged eval batch to ``full_size`` rows with ZERO-validity
    copies of the last row (mirrors ``infer.iterator``'s padding,
    eve_tpu/infer.py). Every loss/metric scalar is a validity-masked
    batch mean (``losses.masked_mean``), so an all-invalid item
    contributes exactly 0 to each 0-dim output; the caller recovers the
    real-row sum by weighting the scalar by the PADDED size. Keeps the
    eval step's compiled shape and the full mesh sharding on the final
    batch of every eval (vs the prior one-device replicated fallback)."""
    out = {}
    for k, v in batch.items():
        if not isinstance(v, np.ndarray):
            out[k] = v
            continue
        pad = full_size - v.shape[0]
        fill = np.repeat(v[-1:], pad, axis=0)
        if k.endswith('_validity'):
            fill = np.zeros_like(fill)
        out[k] = np.concatenate([v, fill], axis=0)
    return out


def test_model_on_all(exp, test_data, current_step, log_key_prefix='test'):
    """Evaluate on all test loaders; weighted mean of 0-dim outputs.

    The 0-dim outputs are validity-masked batch means (the reference's
    ``test_model_on_all`` likewise re-weights per-batch means by
    batch_size/num_entries, src/core/training.py:308-314); the padded
    final batch keeps that exact because padded rows carry zero validity.
    """
    data_extent = dict(exp.mesh.shape).get('data', 1) if exp.mesh else 1
    final_out = {}
    for tag, data_dict in test_data.items():
        loader = data_dict['dataloader']
        num_entries = getattr(loader, 'num_entries', None) or \
            len(data_dict['dataset'])
        full_size = getattr(loader, 'batch_size', None)
        totals = {}
        for batch_index, batch in enumerate(loader):
            # Preemption can land during live validation or the final
            # full test (minutes-long); exit promptly with the resumable
            # code instead of ignoring SIGTERM until the platform's
            # SIGKILL (train steps completed so far are already saved).
            # The agreement cadence keys on the batch index — identical
            # on every host, so all hosts reach the same sync points.
            if _preemption_agreed(
                    sync=batch_index % _PREEMPTION_SYNC == 0):
                _exit_for_preemption(exp, None, test_data)
            batch_size = next(iter(
                v for v in batch.values()
                if isinstance(v, np.ndarray))).shape[0]
            weight_rows = batch_size
            if data_extent > 1 and full_size and batch_size < full_size:
                # Ragged final batch on a multi-device mesh: pad with
                # zero-validity rows so the batch keeps its compiled shape
                # and full sharding; the scalar outputs then average over
                # full_size rows of which the pads contribute 0.
                # Multi-host included: every host evaluates the full test
                # set (loaders are not host-sliced, duplicate rows cancel
                # in the batch mean), so padding to the loader's batch
                # size yields identical per-host shapes by construction —
                # make_array_from_process_local_data then assembles a
                # full-shape global batch instead of receiving ragged
                # per-host arrays nothing validates. The weighted mean
                # stays exact: the global scalar averages hosts*full_size
                # rows whose pads contribute 0, weighted here by
                # full_size/num_entries (tests/test_multihost.py pins a
                # non-divisible final batch against the single-process
                # metrics).
                batch = _pad_eval_batch(batch, full_size)
                weight_rows = full_size
            # Shard eval batches over the mesh like training batches
            # (device_put_batch falls back to replicated placement for
            # ragged final batches that don't divide the device count).
            device_batch, _ = to_device_arrays(
                batch, device_put=exp.device_put_batch)
            out = exp.eval_step(exp.state.params, device_batch)
            for k, v in out.items():
                if hasattr(v, 'ndim') and v.ndim == 0:
                    totals[k] = totals.get(k, 0.0) + \
                        float(v) * (weight_rows / num_entries)
        final_out[tag] = totals
        logger.info('%10s test: %s', '[%s]' % tag,
                    ', '.join('%s: %.4g' % (k, totals[k])
                              for k in sorted(totals)))
        exp.tensorboard.update_current_step(current_step)
        for k, v in totals.items():
            exp.tensorboard.add_scalar(
                '%s_%s/%s' % (log_key_prefix, tag, k), v)

    for_gsheet = None
    if exp.gsheet_logger.ready:
        for_gsheet = {}
        for tag, out in final_out.items():
            for k, v in out.items():
                for_gsheet['%s/%s/%s' % (log_key_prefix, tag, k)] = v
    return final_out, for_gsheet


def do_final_full_test(exp, test_data):
    """Re-instantiate full test datasets (is_final_test) and evaluate."""
    config = exp.config
    for tag, v in test_data.items():
        new_dataset = v['dataset_class'](
            v['dataset_path'], config=config, cameras_to_use=v['cameras'],
            types_of_stimuli=v['stimuli'], is_final_test=True)
        v['full_dataset'] = new_dataset
        v['dataloader'] = SubsetLoader(
            new_dataset, None, batch_size=config.full_test_batch_size,
            num_workers=config.full_test_data_workers)
        v['dataset'] = new_dataset
        logger.info('> Full test on dataset %s: %d sequences',
                    tag, len(new_dataset))
    _, for_gsheet = test_model_on_all(exp, test_data, exp.last_step + 1,
                                      log_key_prefix='full_test')
    if for_gsheet is not None:
        exp.gsheet_logger.update_or_append_row(for_gsheet)


def cleanup_and_quit(exp, train_data, test_data, exit_code=0):
    # A preemption request that was never (or just) honored must not leak
    # into a later run in the same process (tests, notebooks) — it would
    # spuriously exit that fresh run 143 at its first step check.
    _PREEMPTION.clear()
    exp.tensorboard.close()
    sys.exit(exit_code)
