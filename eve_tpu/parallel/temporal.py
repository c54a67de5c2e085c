"""Temporal (sequence) sharding: a distributed ``lax.scan`` over a mesh axis.

The reference processes the T axis with a serial Python loop on one GPU
(src/models/eve.py:91). The TPU build expresses recurrence as ``lax.scan``;
for clips longer than one chip's HBM the scan itself can be distributed:
shard the T axis over a ``seq`` mesh axis, run each shard's local scan in
turn, and hand the carry to the next shard over ICI (``ppermute``). The
carry is tiny — per sample a 128-float GRU vector per eye plus a 5x8x64
ConvGRU state (SURVEY.md section 5.7) — so the handoff is latency-, not
bandwidth-, bound.

The recurrent chain itself stays sequential (a GRU admits no associative
reformulation), so ``sharded_scan`` is a *memory/feed-forward* scaling tool:
everything outside the scan (CNN features, heatmap rendering, the refine
pyramid — the bulk of the FLOPs) shards freely over the same axis, and only
the millisecond-scale cell chain serializes across shards.
"""

import jax
import jax.numpy as jnp
from jax import lax
from jax import shard_map
from jax.sharding import PartitionSpec as P


def sharded_scan(step_fn, init_carry, xs, mesh, axis_name='seq',
                 batch_axis=None):
    """Distributed equivalent of ``lax.scan(step_fn, init_carry, xs)``.

    Args:
      step_fn: (carry, x_t) -> (carry, y_t), same contract as ``lax.scan``.
      init_carry: carry pytree (replicated across the mesh).
      xs: pytree of (T, ...) arrays; T must divide by the mesh axis size.
      mesh: ``jax.sharding.Mesh`` containing ``axis_name``.
      axis_name: mesh axis to shard T over.
      batch_axis: optional second mesh axis carrying data parallelism. When
        given, xs/ys leaves are assumed (T, B, ...) and carry leaves
        (B, ...): the B dim shards over ``batch_axis`` inside the shard_map
        too, so data shards scan only their own samples instead of an
        all-gathered global batch. This is enforced strictly: every
        xs leaf of rank >= 2 and every carry leaf must share ONE batch size
        divisible by the ``batch_axis`` extent, else ValueError. (A laxer
        per-leaf fallback to replication would be silently WRONG: with
        ``check_vma=False`` below, a carry claimed replicated while its
        value depends on batch-sharded inputs diverges across data shards
        with no error. Callers with batch-free carries should pass
        ``batch_axis=None``.) Rank-<2 xs leaves (no batch dim) stay
        replicated over the batch axis — they cannot carry per-sample data.

    Returns:
      (final_carry, ys) — identical values to the single-device scan, with
      ys sharded over T on ``axis_name`` and the final carry replicated
      over ``axis_name``.
    """
    n = mesh.shape[axis_name]
    T = jax.tree_util.tree_leaves(xs)[0].shape[0]
    assert T % n == 0, 'sequence length %d not divisible by %d shards' % (T, n)

    nb = mesh.shape[batch_axis] if batch_axis is not None else 1

    if batch_axis is not None:
        batch_sizes = set()
        for x in jax.tree_util.tree_leaves(xs):
            if x.ndim >= 2:
                batch_sizes.add(x.shape[1])
        for c in jax.tree_util.tree_leaves(init_carry):
            if c.ndim < 1:
                raise ValueError(
                    'batch_axis=%r requires every carry leaf to have a '
                    'leading batch dim (got a rank-0 carry); pass '
                    'batch_axis=None for batch-free carries' % batch_axis)
            batch_sizes.add(c.shape[0])
        if len(batch_sizes) > 1:
            raise ValueError(
                'batch_axis=%r requires one uniform batch size across all '
                'xs (dim 1) and carry (dim 0) leaves; got %s'
                % (batch_axis, sorted(batch_sizes)))
        if batch_sizes and next(iter(batch_sizes)) % nb != 0:
            raise ValueError(
                'batch size %d not divisible by the %r mesh axis (%d)'
                % (next(iter(batch_sizes)), batch_axis, nb))

    def _xs_batch_sharded(x):
        return batch_axis is not None and x.ndim >= 2

    def _carry_batch_sharded(c):
        return batch_axis is not None

    # step_fn typically closes over parameters; arrays captured by a
    # closure keep their (auto-mesh) shardings and clash with the manual
    # shard_map context. closure_convert lifts them into explicit inputs
    # that we pass through shard_map as replicated operands. Conversion is
    # shape-specializing, so use the *local* (per-shard) shapes.
    def _local_carry_struct(c):
        shape = ((c.shape[0] // nb,) + c.shape[1:]
                 if _carry_batch_sharded(c) else c.shape)
        return jax.ShapeDtypeStruct(shape, c.dtype)

    def _local_x_struct(x):
        shape = ((x.shape[1] // nb,) + x.shape[2:]
                 if _xs_batch_sharded(x) else x.shape[1:])
        return jax.ShapeDtypeStruct(shape, x.dtype)

    converted_step, consts = jax.closure_convert(
        step_fn,
        jax.tree_util.tree_map(_local_carry_struct, init_carry),
        jax.tree_util.tree_map(_local_x_struct, xs))

    # Output types of the reference scan (global shapes).
    carry_shapes, ys_shapes = jax.eval_shape(
        lambda c, x: lax.scan(step_fn, c, x), init_carry, xs)
    del carry_shapes

    def seq_spec(x):
        if _xs_batch_sharded(x):
            return P(axis_name, batch_axis, *([None] * (x.ndim - 2)))
        return P(axis_name, *([None] * (x.ndim - 1)))

    def c_spec(c):
        if _carry_batch_sharded(c):
            return P(batch_axis, *([None] * (c.ndim - 1)))
        return P()

    xs_spec = jax.tree_util.tree_map(seq_spec, xs)
    ys_spec = jax.tree_util.tree_map(seq_spec, ys_shapes)
    carry_spec = jax.tree_util.tree_map(c_spec, init_carry)
    fwd_perm = [(i, (i + 1) % n) for i in range(n)]

    def local_fn(carry0, xs_local, *consts_in):
        idx = lax.axis_index(axis_name)

        def local_step(c, x):
            return converted_step(c, x, *consts_in)

        local_ys_shapes = jax.eval_shape(
            lambda c, x: lax.scan(local_step, c, x), carry0, xs_local)[1]
        ys = jax.tree_util.tree_map(
            lambda s: jnp.zeros(s.shape, s.dtype), local_ys_shapes)

        def run(operand):
            c, _ = operand
            return lax.scan(local_step, c, xs_local)

        def skip(operand):
            return operand

        carry = carry0
        for r in range(n):
            carry, ys = lax.cond(idx == r, run, skip, (carry, ys))
            if r < n - 1:
                # Shift carries one shard forward: shard r+1 receives the
                # carry shard r just produced (other shards forward stale
                # values that no later round reads).
                carry = jax.tree_util.tree_map(
                    lambda c: lax.ppermute(c, axis_name, fwd_perm), carry)

        # The true final carry lives on the last shard; make it replicated
        # by masking everyone else to zero and all-reducing.
        last = (idx == n - 1)

        def replicate_from_last(c):
            mask = last.astype(c.dtype)
            shape = (1,) * c.ndim
            return lax.psum(c * mask.reshape(shape), axis_name)

        carry = jax.tree_util.tree_map(replicate_from_last, carry)
        return carry, ys

    consts_spec = tuple(P() for _ in consts)
    mapped = shard_map(
        local_fn, mesh=mesh,
        in_specs=(carry_spec, xs_spec) + consts_spec,
        out_specs=(carry_spec, ys_spec),
        check_vma=False)
    return mapped(init_carry, xs, *consts)
