"""Mesh / sharding tests on the 8-device virtual CPU mesh.

Covers the data-parallel layout the framework trains with (SURVEY.md
section 2.3): batch sharded over the ``data`` axis, state replicated,
gradients all-reduced by GSPMD — verified numerically against a
single-device step — plus the multi-host input-sharding helper.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from eve_tpu.config import DefaultConfig
from eve_tpu.data.synthetic import make_synthetic_batch
from eve_tpu.models import eve as eve_lib
from eve_tpu.parallel import mesh as mesh_lib
from eve_tpu.train import optim as optim_lib
from eve_tpu.train import step as step_lib


def test_make_mesh_sizes():
    mesh = mesh_lib.make_mesh()
    assert len(mesh.devices.flatten()) == len(jax.devices())
    mesh2 = mesh_lib.make_mesh(num_devices=2)
    assert len(mesh2.devices.flatten()) == 2
    assert mesh2.axis_names == ('data',)


def test_shard_batch_layout():
    mesh = mesh_lib.make_mesh(num_devices=4)
    batch = {'x': jnp.zeros((8, 3, 5)), 'y': jnp.zeros((8,))}
    sharded = mesh_lib.shard_batch(mesh, batch)
    for v in sharded.values():
        assert len(v.sharding.device_set) == 4
        # Batch axis split: each shard holds B/4 rows.
        shard_shapes = {s.data.shape for s in v.addressable_shards}
        assert all(shape[0] == 2 for shape in shard_shapes)

    params = {'w': jnp.ones((3, 3))}
    rep = mesh_lib.replicate(mesh, params)
    assert len(rep['w'].sharding.device_set) == 4
    assert all(s.data.shape == (3, 3) for s in rep['w'].addressable_shards)


def test_local_data_slice_partitions_everything():
    n = 103
    seen = []
    lengths = set()
    for pi in range(8):
        idx = mesh_lib.local_data_slice(n, process_index=pi, process_count=8)
        lengths.add(len(idx))
        seen.extend(idx)
    # Equal per-host lengths (lockstep step counts) covering every item;
    # the remainder wraps around, so duplicates are allowed.
    assert lengths == {13}
    assert set(seen) == set(range(n))


@pytest.fixture
def tiny_spec():
    DefaultConfig._reset_instance_for_testing()
    cfg = DefaultConfig()
    cfg.import_dict({'refine_net_enabled': False,
                     'load_screen_content': False})
    yield eve_lib.EveSpec.from_config(cfg), cfg
    DefaultConfig._reset_instance_for_testing()


@pytest.mark.slow
def test_sharded_step_matches_single_device(tiny_spec):
    """One DP step over 4 devices == the same step on one device."""
    spec, cfg = tiny_spec
    tx, _ = optim_lib.build_optimizer(cfg, steps_per_epoch=10)
    state = step_lib.create_train_state(spec, tx, jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    batch = make_synthetic_batch(rng, batch_size=4, sequence_len=2,
                                 eyes_size=32, with_screen=False)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    step_rng = jax.random.PRNGKey(1)

    train_step = step_lib.make_train_step(spec, tx, donate=False)
    _, metrics_single = train_step(state, batch, step_rng)

    mesh = mesh_lib.make_mesh(num_devices=4)
    sharded_state = state.replace(
        params=mesh_lib.replicate(mesh, state.params),
        opt_state=mesh_lib.replicate(mesh, state.opt_state))
    sharded_batch = mesh_lib.shard_batch(mesh, batch)
    new_state, metrics_sharded = train_step(sharded_state, sharded_batch,
                                            step_rng)

    # Loss and gradient statistics agree across layouts (CPU float32;
    # reduction-order differences stay tiny at these sizes).
    np.testing.assert_allclose(float(metrics_single['full_loss']),
                               float(metrics_sharded['full_loss']),
                               rtol=1e-5)
    for k in metrics_single:
        if k == 'nan_flag':
            continue
        np.testing.assert_allclose(float(metrics_single[k]),
                                   float(metrics_sharded[k]), rtol=1e-4,
                                   err_msg=k)
    assert not bool(metrics_sharded['nan_flag'])
    # Updated params stay replicated (GSPMD all-reduced the grads).
    leaf = jax.tree_util.tree_leaves(new_state.params)[0]
    assert len(leaf.sharding.device_set) == 4


@pytest.mark.slow
def test_sharded_scan_matches_lax_scan():
    """sharded_scan over a 4-way seq mesh == lax.scan, GRU-like recurrence."""
    from eve_tpu.parallel.temporal import sharded_scan

    rng = np.random.RandomState(0)
    T, B, F = 16, 3, 8
    W = jnp.asarray(rng.randn(F, F) * 0.1, jnp.float32)
    xs = {'u': jnp.asarray(rng.randn(T, B, F), jnp.float32),
          'gate': jnp.asarray(rng.rand(T, B, 1), jnp.float32)}
    carry0 = {'h': jnp.zeros((B, F), jnp.float32),
              'count': jnp.zeros((), jnp.float32)}

    def step(carry, x):
        h = jnp.tanh(carry['h'] @ W + x['u']) * x['gate'] \
            + carry['h'] * (1 - x['gate'])
        new = {'h': h, 'count': carry['count'] + 1.0}
        return new, {'out': h * 2.0, 'norm': jnp.sum(h ** 2, axis=-1)}

    ref_carry, ref_ys = jax.lax.scan(step, carry0, xs)

    mesh = mesh_lib.make_mesh(num_devices=4, axis_name='seq')
    got_carry, got_ys = sharded_scan(step, carry0, xs, mesh,
                                     axis_name='seq')

    np.testing.assert_allclose(np.asarray(got_carry['h']),
                               np.asarray(ref_carry['h']), rtol=1e-5)
    assert float(got_carry['count']) == T
    for k in ref_ys:
        np.testing.assert_allclose(np.asarray(got_ys[k]),
                                   np.asarray(ref_ys[k]), rtol=1e-5,
                                   err_msg=k)


@pytest.mark.parametrize('n_shards', [2, 4])
@pytest.mark.slow
def test_sharded_scan_under_jit_and_grad(n_shards):
    from eve_tpu.parallel.temporal import sharded_scan

    rng = np.random.RandomState(1)
    T, F = 8, 4
    xs = jnp.asarray(rng.randn(T, F), jnp.float32)
    mesh = mesh_lib.make_mesh(num_devices=n_shards, axis_name='seq')

    def step(c, x):
        h = jnp.tanh(c + x)
        return h, h

    def total(xs):
        _, ys = sharded_scan(step, jnp.zeros((F,), jnp.float32), xs, mesh,
                             axis_name='seq')
        return jnp.sum(ys)

    def total_ref(xs):
        _, ys = jax.lax.scan(step, jnp.zeros((F,), jnp.float32), xs)
        return jnp.sum(ys)

    v = jax.jit(total)(xs)
    np.testing.assert_allclose(float(v), float(total_ref(xs)), rtol=1e-5)
    g = jax.grad(total)(xs)
    g_ref = jax.grad(total_ref)(xs)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), rtol=1e-4)


@pytest.mark.slow
def test_multi_step_trajectory_parity_2d_mesh(tiny_spec):
    """TEN training steps on the 2D (data x seq) mesh track the
    single-device trajectory (params AND per-step metrics), and the EVAL
    step runs sharded on the same mesh — single-step agreement does not
    rule out accumulating divergence (donation, optimizer state layout,
    collective reduction order), so pin the whole trajectory.

    36px eyes: the smallest size where the conv backward is real (below
    33px instance norm erases the pixel signal and XLA dead-code-eliminates
    the conv gradients, which would make the gradient all-reduce vacuous).
    """
    spec, cfg = tiny_spec
    tx, _ = optim_lib.build_optimizer(cfg, steps_per_epoch=10)
    state0 = step_lib.create_train_state(spec, tx, jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    batches = []
    for _ in range(3):
        b = make_synthetic_batch(rng, batch_size=4, sequence_len=4,
                                 eyes_size=36, with_screen=False)
        batches.append({k: jnp.asarray(v) for k, v in b.items()})

    N = 10
    step_keys = [jax.random.PRNGKey(100 + i) for i in range(N)]

    single_step = step_lib.make_train_step(spec, tx, donate=False)
    state = state0
    single_metrics = []
    for i in range(N):
        state, m = single_step(state, batches[i % 3], step_keys[i])
        single_metrics.append({k: float(v) for k, v in m.items()
                               if k != 'nan_flag'})
    single_params = jax.tree_util.tree_map(np.asarray, state.params)

    mesh = mesh_lib.make_mesh_nd({'data': 2, 'seq': 2})
    sh_state = state0.replace(
        params=mesh_lib.replicate(mesh, state0.params),
        opt_state=mesh_lib.replicate(mesh, state0.opt_state))
    sp_step = step_lib.make_train_step(spec, tx, donate=True, seq_mesh=mesh)
    for i in range(N):
        sh_batch = mesh_lib.shard_batch(mesh, batches[i % 3])
        sh_state, m = sp_step(sh_state, sh_batch, step_keys[i])
        for k, want in single_metrics[i].items():
            np.testing.assert_allclose(float(m[k]), want, rtol=5e-3,
                                       err_msg='step %d %s' % (i, k))
    sh_params = jax.tree_util.tree_map(np.asarray, sh_state.params)

    flat_a = jax.tree_util.tree_leaves_with_path(single_params)
    flat_b = dict(jax.tree_util.tree_leaves_with_path(sh_params))
    assert len(flat_a) == len(flat_b)
    for path, a in flat_a:
        b = flat_b[path]
        # Per-leaf relative L2: elementwise rtol is hopeless after 10 Adam
        # steps (float32 reduction-order noise on near-zero grads gets
        # amplified by the per-element adaptive LR); the trajectory is
        # identical iff the aggregate deviation stays tiny.
        rel = float(np.linalg.norm(a - b) /
                    (np.linalg.norm(a) + 1e-12))
        assert rel < 2e-3, (jax.tree_util.keystr(path), rel)
        assert float(np.abs(a - b).max()) < 5e-4, \
            (jax.tree_util.keystr(path), float(np.abs(a - b).max()))

    # Sharded eval on the SAME mesh/batch layout agrees with single-device.
    eval_single = step_lib.make_eval_step(spec)
    eval_sharded = step_lib.make_eval_step(spec, seq_mesh=mesh)
    out_a = eval_single(single_params, batches[0])
    out_b = eval_sharded(mesh_lib.replicate(mesh, sh_params),
                         mesh_lib.shard_batch(mesh, batches[0]))
    np.testing.assert_allclose(float(out_b['full_loss']),
                               float(out_a['full_loss']), rtol=5e-3)


@pytest.mark.slow
def test_data_and_sequence_parallel_train_step(tiny_spec):
    """2D (data x seq) mesh train step == single-device step.

    Clips shard over 'data'; the GRU recurrence runs via sharded_scan over
    'seq'; gradients all-reduce over both axes by GSPMD.
    """
    spec, cfg = tiny_spec
    tx, _ = optim_lib.build_optimizer(cfg, steps_per_epoch=10)
    state = step_lib.create_train_state(spec, tx, jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    batch = make_synthetic_batch(rng, batch_size=4, sequence_len=4,
                                 eyes_size=32, with_screen=False)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    step_rng = jax.random.PRNGKey(1)

    train_step = step_lib.make_train_step(spec, tx, donate=False)
    _, metrics_single = train_step(state, batch, step_rng)

    mesh = mesh_lib.make_mesh_nd({'data': 2, 'seq': 2})
    sharded_state = state.replace(
        params=mesh_lib.replicate(mesh, state.params),
        opt_state=mesh_lib.replicate(mesh, state.opt_state))
    sharded_batch = mesh_lib.shard_batch(mesh, batch)
    sp_step = step_lib.make_train_step(spec, tx, donate=False,
                                       seq_mesh=mesh)
    new_state, metrics_sp = sp_step(sharded_state, sharded_batch, step_rng)

    np.testing.assert_allclose(float(metrics_single['full_loss']),
                               float(metrics_sp['full_loss']), rtol=1e-5)
    for k in metrics_single:
        if k == 'nan_flag':
            continue
        np.testing.assert_allclose(float(metrics_single[k]),
                                   float(metrics_sp[k]), rtol=1e-4,
                                   err_msg=k)
    assert not bool(metrics_sp['nan_flag'])


def test_make_mesh_too_many_devices_raises():
    with pytest.raises(AssertionError, match='need 99 devices'):
        mesh_lib.make_mesh(num_devices=99)


def test_gather_to_host_single_process():
    """gather_to_host returns exact global numpy values for every layout.

    Single-process arrays are always fully addressable, so this pins the
    device_get path (model-sharded, batch-sharded, replicated, plain
    numpy); the cross-host collective path is pinned by the REAL
    2-process run in tests/test_multihost.py.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = mesh_lib.make_mesh_nd({'data': 2, 'model': 2})
    w = jnp.arange(32.0, dtype=jnp.float32).reshape(4, 8)
    tree = {
        'model_sharded': jax.device_put(
            w, NamedSharding(mesh, P(None, 'model'))),
        'batch_sharded': jax.device_put(w, NamedSharding(mesh, P('data'))),
        'replicated': jax.device_put(w, NamedSharding(mesh, P())),
        'plain': np.asarray(w),
        'scalar': jnp.float32(3.0),
    }
    hosted = mesh_lib.gather_to_host(tree)
    for key, value in hosted.items():
        assert isinstance(value, np.ndarray), key
        if key != 'scalar':
            np.testing.assert_array_equal(value, np.asarray(w), err_msg=key)
    assert float(hosted['scalar']) == 3.0


def test_sharded_scan_rejects_inconsistent_batch_leaves():
    """With batch_axis set, mixed batch sizes / rank-0 carries must raise:
    a silent fall-back to 'replicated' would let a carry that depends on
    batch-sharded inputs diverge across data shards (check_vma is off)."""
    from eve_tpu.parallel.temporal import sharded_scan

    mesh = mesh_lib.make_mesh_nd({'data': 2, 'seq': 2})
    T, B, F = 4, 4, 3
    xs = {'a': jnp.ones((T, B, F)), 'b': jnp.ones((T, 3, F))}  # mixed B

    def step(c, x):
        return c, c

    with pytest.raises(ValueError, match='uniform batch size'):
        sharded_scan(step, jnp.zeros((B, F)), xs, mesh,
                     axis_name='seq', batch_axis='data')

    with pytest.raises(ValueError, match='rank-0 carry'):
        sharded_scan(step, jnp.zeros(()), {'a': jnp.ones((T, B, F))},
                     mesh, axis_name='seq', batch_axis='data')

    with pytest.raises(ValueError, match='not divisible'):
        sharded_scan(step, jnp.zeros((3, F)), {'a': jnp.ones((T, 3, F))},
                     mesh, axis_name='seq', batch_axis='data')


@pytest.mark.slow
def test_data_model_and_sequence_parallel_train_step(tiny_spec):
    """3D (data x model x seq) mesh train step == single-device step.

    Clips shard over 'data', large parameter output-feature dims (and the
    shape-congruent Adam moments) shard over 'model' (tensor parallelism
    - SURVEY.md section 2.3's plumbed model axis made concrete), and the
    GRU recurrence runs via sharded_scan over 'seq'. GSPMD inserts the
    resharding collectives; the metrics must match the single-device step
    and the updated params must keep their model-axis sharding.
    """
    spec, cfg = tiny_spec
    tx, _ = optim_lib.build_optimizer(cfg, steps_per_epoch=10)
    state = step_lib.create_train_state(spec, tx, jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    batch = make_synthetic_batch(rng, batch_size=4, sequence_len=4,
                                 eyes_size=32, with_screen=False)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    step_rng = jax.random.PRNGKey(1)

    train_step = step_lib.make_train_step(spec, tx, donate=False)
    _, metrics_single = train_step(state, batch, step_rng)

    mesh = mesh_lib.make_mesh_nd({'data': 2, 'model': 2, 'seq': 2})
    # min_size=0: the tiny test spec's kernels are all below the
    # production 4096 threshold; shard every divisible last dim so the TP
    # path is actually exercised.
    sharded_state = state.replace(
        params=mesh_lib.shard_model_tree(mesh, state.params, min_size=0),
        opt_state=mesh_lib.shard_model_tree(mesh, state.opt_state,
                                            min_size=0))
    n_sharded = sum(
        1 for leaf in jax.tree_util.tree_leaves(sharded_state.params)
        if 'model' in str(leaf.sharding.spec))
    assert n_sharded > 10, 'TP placement sharded almost nothing: %d' \
        % n_sharded
    sharded_batch = mesh_lib.shard_batch(mesh, batch)
    sp_step = step_lib.make_train_step(spec, tx, donate=False,
                                       seq_mesh=mesh)
    new_state, metrics_sp = sp_step(sharded_state, sharded_batch, step_rng)

    for k in metrics_single:
        if k == 'nan_flag':
            continue
        np.testing.assert_allclose(float(metrics_single[k]),
                                   float(metrics_sp[k]), rtol=1e-4,
                                   err_msg=k)
    assert not bool(metrics_sp['nan_flag'])
    # Updated params keep the model-axis placement (no silent gather to
    # replicated). GSPMD may shard MORE leaves on output than we placed
    # (propagation picks model-sharded layouts for borderline leaves).
    n_after = sum(
        1 for leaf in jax.tree_util.tree_leaves(new_state.params)
        if 'model' in str(leaf.sharding.spec))
    assert n_after >= n_sharded, (n_after, n_sharded)
