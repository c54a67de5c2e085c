"""Train-step, optimizer and checkpoint tests on synthetic batches."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from eve_tpu.config import DefaultConfig
from eve_tpu.data.synthetic import make_synthetic_batch
from eve_tpu.models import eve as eve_lib
from eve_tpu.train import checkpoint as ckpt_lib
from eve_tpu.train import optim as optim_lib
from eve_tpu.train import step as step_lib


@pytest.fixture
def config():
    DefaultConfig._reset_instance_for_testing()
    cfg = DefaultConfig()
    yield cfg
    DefaultConfig._reset_instance_for_testing()


def small_setup(config, refine=False):
    spec = eve_lib.EveSpec(refine_net_enabled=refine,
                           load_screen_content=refine)
    tx, schedule = optim_lib.build_optimizer(config, steps_per_epoch=10)
    state = step_lib.create_train_state(spec, tx, jax.random.PRNGKey(0))
    batch = {k: jnp.asarray(v) for k, v in
             make_synthetic_batch(np.random.RandomState(0), 2, 3,
                                  with_screen=refine).items()}
    return spec, tx, state, batch


@pytest.mark.slow
def test_train_step_decreases_loss(config):
    # Small LR and a fixed rng (fixed kappa) make the objective
    # deterministic so Adam must make progress.
    config.import_dict({'base_learning_rate': 0.0001, 'batch_size': 2})
    spec, tx, state, batch = small_setup(config)
    train_step = step_lib.make_train_step(spec, tx, donate=False)
    losses = []
    sub = jax.random.PRNGKey(1)
    for i in range(10):
        state, metrics = train_step(state, batch, sub)
        losses.append(float(metrics['full_loss']))
        assert not bool(metrics['nan_flag'])
    assert losses[-1] < losses[0], losses
    assert int(state.step) == 10


def test_schedule_semantics(config):
    config.import_dict({'num_warmup_epochs': 1.0,
                        'lr_decay_strategy': 'exponential',
                        'lr_decay_factor': 0.5,
                        'lr_decay_epoch_interval': 1.0})
    schedule = optim_lib.make_schedule(config, steps_per_epoch=100)
    target = config.learning_rate
    base = target / config.batch_size
    np.testing.assert_allclose(float(schedule(0)), base, rtol=1e-6)
    np.testing.assert_allclose(float(schedule(50)),
                               base + (target - base) * 0.5, rtol=1e-6)
    np.testing.assert_allclose(float(schedule(100)), target, rtol=1e-6)
    np.testing.assert_allclose(float(schedule(250)), target * 0.5, rtol=1e-6)
    np.testing.assert_allclose(float(schedule(350)), target * 0.25, rtol=1e-6)


def test_schedule_reference_compat_quirk(config):
    config.import_dict({'lr_decay_strategy': 'none'})
    config.override('reference_compat_lr_schedule', True)
    schedule = optim_lib.make_schedule(config, steps_per_epoch=10)
    target = config.learning_rate
    np.testing.assert_allclose(float(schedule(5)), target * target, rtol=1e-6)


def test_adam_matches_torch_semantics(config):
    """Coupled weight decay: one optax step == one torch Adam step."""
    torch = pytest.importorskip('torch')
    import optax
    w0 = np.array([1.0, -2.0, 3.0], np.float32)
    g = np.array([0.1, 0.2, -0.3], np.float32)
    lr, wd = 1e-3, 0.01

    p = torch.nn.Parameter(torch.tensor(w0.copy()))
    opt = torch.optim.Adam([p], lr=lr, weight_decay=wd)
    p.grad = torch.tensor(g.copy())
    opt.step()
    expected = p.detach().numpy()

    tx = optax.chain(optax.add_decayed_weights(wd),
                     optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
                     optax.scale_by_learning_rate(lambda s: lr))
    params = jnp.asarray(w0)
    opt_state = tx.init(params)
    updates, _ = tx.update(jnp.asarray(g), opt_state, params)
    ours = np.asarray(params + updates)
    np.testing.assert_allclose(ours, expected, atol=1e-6)


def test_frozen_eye_net_gets_no_updates(config):
    config.override('eye_net_frozen', True)
    spec = eve_lib.EveSpec(refine_net_enabled=True, load_screen_content=True,
                           eye_net_frozen=True)
    tx, _ = optim_lib.build_optimizer(config, steps_per_epoch=10)
    state = step_lib.create_train_state(spec, tx, jax.random.PRNGKey(0))
    batch = {k: jnp.asarray(v) for k, v in
             make_synthetic_batch(np.random.RandomState(0), 1, 2,
                                  with_screen=True).items()}
    train_step = step_lib.make_train_step(spec, tx, donate=False)
    before = jax.device_get(state.params['eye_net'])
    rn_before = jax.device_get(state.params['refine_net'])
    state, _ = train_step(state, batch, jax.random.PRNGKey(3))
    after = jax.device_get(state.params['eye_net'])
    rn_after = jax.device_get(state.params['refine_net'])
    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_leaves_with_path(before),
            jax.tree_util.tree_leaves_with_path(after)):
        np.testing.assert_array_equal(a, b, err_msg=str(pa))
    # RefineNet does get updates
    diffs = [np.abs(a - b).max() for a, b in zip(
        jax.tree_util.tree_leaves(rn_before),
        jax.tree_util.tree_leaves(rn_after))]
    assert max(diffs) > 0


@pytest.mark.slow
def test_checkpoint_roundtrip(config, tmp_path):
    spec, tx, state, batch = small_setup(config)
    train_step = step_lib.make_train_step(spec, tx, donate=False)
    state, _ = train_step(state, batch, jax.random.PRNGKey(2))

    mgr = ckpt_lib.CheckpointManager(str(tmp_path), keep_n=3)
    mgr.save_at_step(1, state)
    # Layout: per-prefix npz + optimizer file inside a %07d.ckpt dir
    d = tmp_path / 'checkpoints' / '0000001.ckpt'
    assert (d / 'eye_net.npz').is_file()
    assert (d / 'optimizer_0.npz').is_file()

    fresh = step_lib.create_train_state(spec, tx, jax.random.PRNGKey(9))
    restored, step = mgr.load_last_checkpoint(fresh)
    assert step == 1
    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_leaves_with_path(jax.device_get(state.params)),
            jax.tree_util.tree_leaves_with_path(
                jax.device_get(restored.params))):
        np.testing.assert_array_equal(a, b, err_msg=str(pa))

    # Training continues identically from the restored state
    s1, m1 = train_step(state, batch, jax.random.PRNGKey(5))
    s2, m2 = train_step(restored, batch, jax.random.PRNGKey(5))
    np.testing.assert_allclose(float(m1['full_loss']),
                               float(m2['full_loss']), rtol=1e-6)


def test_checkpoint_async_save_matches_sync(config, tmp_path):
    """save_at_step(wait=False) snapshots synchronously and writes in the
    background: after wait_for_writes the checkpoint is byte-equivalent
    to a blocking save of the same state, and further device updates
    between submit and write completion cannot leak into it (the snapshot
    owns its memory — the train step donates the state buffers)."""
    spec, tx, state, batch = small_setup(config)
    train_step = step_lib.make_train_step(spec, tx, donate=False)
    state, _ = train_step(state, batch, jax.random.PRNGKey(2))

    sync_mgr = ckpt_lib.CheckpointManager(str(tmp_path / 'sync'), keep_n=3)
    sync_mgr.save_at_step(1, state)
    async_mgr = ckpt_lib.CheckpointManager(str(tmp_path / 'async'), keep_n=3)
    async_mgr.save_at_step(1, state, wait=False)
    # Keep training while the write is (possibly) still in flight.
    state2, _ = train_step(state, batch, jax.random.PRNGKey(3))
    async_mgr.wait_for_writes()

    fresh = step_lib.create_train_state(spec, tx, jax.random.PRNGKey(9))
    restored_sync, s1 = sync_mgr.load_last_checkpoint(fresh)
    restored_async, s2 = async_mgr.load_last_checkpoint(fresh)
    assert (s1, s2) == (1, 1)
    for tree_a, tree_b in ((restored_sync.params, restored_async.params),
                           (restored_sync.opt_state,
                            restored_async.opt_state)):
        for (pa, a), (pb, b) in zip(
                jax.tree_util.tree_leaves_with_path(jax.device_get(tree_a)),
                jax.tree_util.tree_leaves_with_path(jax.device_get(tree_b))):
            np.testing.assert_array_equal(a, b, err_msg=str(pa))


def test_checkpoint_async_write_error_surfaces(config, tmp_path):
    """A failed background write must not be silent: the error re-raises
    on the next wait_for_writes / save / load instead of the run
    continuing under the belief that checkpoints exist."""
    import shutil
    spec, tx, state, batch = small_setup(config)
    mgr = ckpt_lib.CheckpointManager(str(tmp_path), keep_n=3)
    mgr.save_at_step(1, state)
    # Make the writer fail: a FILE squatting on the checkpoints dir path
    # (chmod tricks don't work — the suite runs as root, which bypasses
    # permission bits).
    shutil.rmtree(tmp_path / 'checkpoints')
    (tmp_path / 'checkpoints').write_bytes(b'squatter')
    try:
        mgr.save_at_step(2, state, wait=False)
        with pytest.raises(OSError):
            mgr.wait_for_writes()
        mgr.wait_for_writes()  # error is consumed, not re-raised forever
    finally:
        os.remove(tmp_path / 'checkpoints')


def test_checkpoint_loads_legacy_msgpack_optimizer(config, tmp_path):
    """Checkpoints written before the npz optimizer format (a
    flax-msgpack optimizer_0.msgpack) still restore optimizer state."""
    import flax.serialization
    spec, tx, state, batch = small_setup(config)
    train_step = step_lib.make_train_step(spec, tx, donate=False)
    state, _ = train_step(state, batch, jax.random.PRNGKey(2))

    mgr = ckpt_lib.CheckpointManager(str(tmp_path), keep_n=3)
    mgr.save_at_step(1, state)
    d = tmp_path / 'checkpoints' / '0000001.ckpt'
    with open(d / 'optimizer_0.msgpack', 'wb') as f:
        f.write(flax.serialization.to_bytes(jax.device_get(state.opt_state)))
    os.remove(d / 'optimizer_0.npz')

    fresh = step_lib.create_train_state(spec, tx, jax.random.PRNGKey(9))
    restored, step = mgr.load_last_checkpoint(fresh)
    assert step == 1
    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_leaves_with_path(
                jax.device_get(state.opt_state)),
            jax.tree_util.tree_leaves_with_path(
                jax.device_get(restored.opt_state))):
        np.testing.assert_array_equal(a, b, err_msg=str(pa))


def test_checkpoint_pruning(config, tmp_path):
    spec, tx, state, batch = small_setup(config)
    mgr = ckpt_lib.CheckpointManager(str(tmp_path), keep_n=2)
    for step in (1, 2, 3, 4):
        mgr.save_at_step(step, state)
    names = sorted(os.listdir(tmp_path / 'checkpoints'))
    assert names == ['0000003.ckpt', '0000004.ckpt']


def test_checkpoint_ignores_interrupted_tmp_dir(config, tmp_path):
    """Preemption mid-save leaves a .tmp dir; load must skip it and a later
    save at the same step must recover (atomic write semantics)."""
    spec, tx, state, batch = small_setup(config)
    mgr = ckpt_lib.CheckpointManager(str(tmp_path), keep_n=3)
    mgr.save_at_step(1, state)

    # Simulate a preempted save of step 2: partial tmp dir, no rename.
    tmp_dir = os.path.join(str(tmp_path), 'checkpoints', '0000002.ckpt.tmp')
    os.makedirs(tmp_dir)
    with open(os.path.join(tmp_dir, 'eye_net.npz'), 'wb') as f:
        f.write(b'garbage')

    fresh = step_lib.create_train_state(spec, tx, jax.random.PRNGKey(9))
    restored, step = mgr.load_last_checkpoint(fresh)
    assert step == 1  # the torn step-2 write is invisible

    # A retried save at step 2 succeeds despite the stale tmp dir.
    mgr.save_at_step(2, state)
    restored2, step2 = mgr.load_last_checkpoint(fresh)
    assert step2 == 2


def test_schedule_cyclic_matches_host_reference(config):
    """The jit-able cyclic schedule equals the host-side formulation."""
    config.import_dict({'num_warmup_epochs': 0.5,
                        'lr_decay_strategy': 'cyclic',
                        'lr_decay_factor': 0.5,
                        'lr_decay_epoch_interval': 2.0})
    steps_per_epoch = 20
    schedule = optim_lib.make_schedule(config, steps_per_epoch)
    target = config.learning_rate
    base = target / config.batch_size
    for step in (0, 5, 10, 17, 25, 40, 63, 90, 120):
        expected = optim_lib.learning_rate_schedule(
            step, base_lr=base, target_lr=target,
            steps_per_epoch=steps_per_epoch,
            num_warmup_epochs=0.5, strategy='cyclic',
            decay_factor=0.5, decay_epoch_interval=2.0)
        np.testing.assert_allclose(float(schedule(step)), expected,
                                   rtol=1e-5, err_msg='step %d' % step)


@pytest.mark.slow
def test_remat_matches_no_remat(config):
    """jax.checkpoint rematerialization changes memory, not numerics."""
    import dataclasses
    spec, tx, state, batch = small_setup(config)
    rng = jax.random.PRNGKey(3)
    step_plain = step_lib.make_train_step(spec, tx, donate=False)
    _, m_plain = step_plain(state, batch, rng)

    spec_remat = dataclasses.replace(spec, remat=True)
    step_remat = step_lib.make_train_step(spec_remat, tx, donate=False)
    _, m_remat = step_remat(state, batch, rng)

    for k in m_plain:
        if k == 'nan_flag':
            continue
        np.testing.assert_allclose(float(m_plain[k]), float(m_remat[k]),
                                   rtol=1e-5, err_msg=k)
