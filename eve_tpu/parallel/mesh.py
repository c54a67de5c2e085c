"""Mesh / sharding layer: data-parallel training over ICI.

The reference is strictly single-device (``cuda:0`` hard-coded in 11 files,
no torch.distributed — SURVEY.md section 2.3/2.4). The TPU-native equivalent
scales by sharding the clip batch over a 1-D ``data`` mesh axis under
``jax.jit`` (GSPMD): gradients are all-reduced by XLA collectives over ICI,
parameters and optimizer state stay replicated. EVE's models are ~11M
parameters, so data parallelism is the correct (and sufficient) strategy.
Two further axes are implemented and parity-tested rather than merely
plumbed: ``seq`` (temporal sharding of the recurrences,
eve_tpu/parallel/temporal.py) and ``model`` (tensor parallelism —
``shard_model_tree`` places output-feature dims of large kernels and their
Adam moments over the axis; GSPMD inserts the resharding collectives).

Multi-host: ``jax.distributed.initialize`` + per-host slicing of the clip
list (``local_data_slice``) + ``is_primary_process`` gating for
checkpoint/log writes.
"""

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_multihost(coordinator_address=None, num_processes=None,
                         process_id=None):
    """Initialize the JAX distributed runtime for a multi-host run.

    On TPU pods every argument auto-detects from the TPU metadata
    (``jax.distributed.initialize()`` with no args); for CPU/GPU clusters
    and the two-process CPU test (tests/test_multihost.py) pass the
    coordinator address / world size / rank explicitly. Idempotent: a
    second call is a no-op.

    This is the replacement for the communication backends the reference
    never had (SURVEY.md section 2.4): after this call, ``jax.devices()``
    is the global device set, collectives compile over ICI/DCN, and the
    harness's per-host data slicing + ``make_array_from_process_local_data``
    assembly become active (eve_tpu/train/harness.py).
    """
    if jax.distributed.is_initialized():
        return  # already initialized
    kwargs = {}
    if coordinator_address:
        kwargs['coordinator_address'] = coordinator_address
    if num_processes:
        kwargs['num_processes'] = int(num_processes)
    if process_id is not None and process_id >= 0:
        kwargs['process_id'] = int(process_id)
    jax.distributed.initialize(**kwargs)


def make_mesh(num_devices=0, axis_name='data', devices=None):
    """1-D mesh over the first ``num_devices`` devices (0 = all).

    Asking for more devices than exist is a loud error (like
    ``make_mesh_nd``), not a silent truncation — a config that expects 8
    data shards must not quietly train on 4 with doubled per-device batch.
    """
    if devices is None:
        devices = jax.devices()
    if num_devices and num_devices > 0:
        assert len(devices) >= num_devices, (
            'need %d devices, have %d' % (num_devices, len(devices)))
        devices = devices[:num_devices]
    return Mesh(np.array(devices), (axis_name,))


def make_mesh_nd(axis_sizes, devices=None):
    """Mesh with multiple named axes, e.g. {'data': 4, 'seq': 2}.

    Used for combined data + sequence parallelism: clips shard over
    ``data`` while the temporal recurrences shard over ``seq``
    (eve_tpu/parallel/temporal.py).
    """
    if devices is None:
        devices = jax.devices()
    names = tuple(axis_sizes)
    sizes = tuple(axis_sizes[n] for n in names)
    total = int(np.prod(sizes))
    assert len(devices) >= total, (
        'need %d devices for mesh %r, have %d'
        % (total, axis_sizes, len(devices)))
    return Mesh(np.array(devices[:total]).reshape(sizes), names)


def batch_sharding(mesh, axis_name='data'):
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh):
    return NamedSharding(mesh, P())


def shard_batch(mesh, batch, axis_name='data'):
    """Place each (B, ...) array with its batch dim split over the mesh."""
    sharding = batch_sharding(mesh, axis_name)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch)


def replicate(mesh, tree):
    """Fully replicate a pytree (params / optimizer state) over the mesh."""
    sharding = replicated(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), tree)


def model_sharding_spec(x, n, axis_name='model', min_size=4096):
    """PartitionSpec sharding a tensor's OUTPUT-feature (last) dim.

    The tensor-parallel placement rule (SURVEY.md section 2.3's plumbed
    ``model`` axis): conv kernels are HWIO and dense kernels (in, out),
    so splitting the LAST dim shards output features — each output
    element is still computed entirely on one device (no contraction-dim
    partial sums, hence bit-stable reduction order) and GSPMD inserts the
    collectives where a following layer needs resharding. Leaves smaller
    than ``min_size`` elements or with a last dim not divisible by the
    axis stay replicated (EVE's models are ~11M params; TP is a
    capability demonstration here, not a memory necessity —
    tests/test_parallel.py pins 3D dp x tp x sp parity).
    """
    if x.ndim >= 1 and x.shape[-1] % n == 0 and x.size >= min_size:
        return P(*([None] * (x.ndim - 1) + [axis_name]))
    return P()


def shard_model_tree(mesh, tree, axis_name='model', min_size=4096):
    """Place params (or the shape-congruent optimizer moments) with large
    last dims sharded over ``axis_name``, everything else replicated.

    The rule is shape-based, so applying it to ``opt_state`` gives Adam's
    mu/nu exactly their parameter's placement (scalars/counts replicate).
    """
    n = mesh.shape[axis_name]

    def put(x):
        spec = model_sharding_spec(x, n, axis_name, min_size)
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(put, tree)


def gather_to_host(tree, skip_local=False):
    """Host-numpy copy of a pytree, correct for cross-host sharded arrays.

    Leaves that are neither fully addressable from this process nor fully
    replicated (e.g. parameters sharded over a ``model`` axis spanning
    hosts) are gathered to their full global value via
    ``process_allgather`` — a COLLECTIVE: every process must call this,
    even though only the primary writes the resulting checkpoint.
    Everything else is a plain ``device_get`` (fully-replicated multi-host
    arrays convert locally, no collective) — unless ``skip_local``, which
    returns such leaves UNCHANGED: non-primary processes only join the
    collectives and skip the D2H copies whose result nobody reads (the
    common all-replicated case then costs them nothing).
    """
    from jax.experimental import multihost_utils

    def get(x):
        if (isinstance(x, jax.Array) and not x.is_fully_addressable
                and not x.is_fully_replicated):
            # tiled=True is required (and a no-op reshape) for global
            # non-fully-addressable inputs: the result is the full global
            # value, not a stack of per-process copies.
            return np.asarray(multihost_utils.process_allgather(
                x, tiled=True))
        if skip_local:
            return x
        return np.asarray(jax.device_get(x))

    return jax.tree_util.tree_map(get, tree)


def broadcast_string(s, max_bytes=4096):
    """Process 0's string, on every process (COLLECTIVE; all must call).

    Used for host-identical run identity (run-dir path, identifier):
    letting each host derive these independently diverges on host-local
    filesystems or per-host clocks, and a later collective guarded by the
    divergent value deadlocks.
    """
    from jax.experimental import multihost_utils
    data = s.encode('utf-8')
    if len(data) > max_bytes:
        raise ValueError('string exceeds %d utf-8 bytes' % max_bytes)
    buf = np.zeros(max_bytes, np.uint8)
    buf[:len(data)] = np.frombuffer(data, np.uint8)
    out = multihost_utils.broadcast_one_to_all(buf)
    return bytes(np.asarray(out)).rstrip(b'\x00').decode('utf-8')


def is_primary_process():
    return jax.process_index() == 0


def local_data_slice(num_items, process_index=None, process_count=None):
    """Deterministic per-host indices of a clip list (multi-host input).

    Every host receives the SAME number of items (ceil(n / hosts)), with the
    tail hosts wrapping around to the start of the list — unequal per-host
    dataset lengths would give each host a different steps_per_epoch /
    num_training_steps and deadlock the collective train step when the
    short host exits the loop first.
    """
    if process_index is None:
        process_index = jax.process_index()
    if process_count is None:
        process_count = jax.process_count()
    per_host = -(-num_items // process_count)
    start = process_index * per_host
    return [(start + i) % num_items for i in range(per_host)]
