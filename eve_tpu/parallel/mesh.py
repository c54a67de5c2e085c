"""Mesh / sharding layer: data-parallel training over ICI.

The reference is strictly single-device (``cuda:0`` hard-coded in 11 files,
no torch.distributed — SURVEY.md section 2.3/2.4). The TPU-native equivalent
scales by sharding the clip batch over a 1-D ``data`` mesh axis under
``jax.jit`` (GSPMD): gradients are all-reduced by XLA collectives over ICI,
parameters and optimizer state stay replicated. EVE's models are ~11M
parameters, so data parallelism is the correct (and sufficient) strategy;
the mesh helper accepts extra axes for future tensor/sequence sharding.

Multi-host: ``jax.distributed.initialize`` + per-host slicing of the clip
list (``local_data_slice``) + ``is_primary_process`` gating for
checkpoint/log writes.
"""

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_devices=0, axis_name='data', devices=None):
    """1-D mesh over the first ``num_devices`` devices (0 = all)."""
    if devices is None:
        devices = jax.devices()
    if num_devices and num_devices > 0:
        devices = devices[:num_devices]
    return Mesh(np.array(devices), (axis_name,))


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


def make_sharded_train_step(spec, tx, mesh, axis_name='data', donate=True):
    """Data-parallel jitted train step.

    The step function itself is identical to the single-chip one — XLA GSPMD
    inserts the gradient all-reduce over ICI given batch inputs sharded on
    the ``data`` axis and replicated state.
    """
    from eve_tpu.train.step import TrainState, make_train_step
    import jax.numpy as jnp
    from eve_tpu.models import eve as eve_lib

    def loss_fn(params, batch, rng):
        out = eve_lib.forward(spec, params, batch, rng=rng, training=True)
        scalars = {k: v for k, v in out.items()
                   if hasattr(v, 'ndim') and v.ndim == 0}
        return out['full_loss'], scalars

    def step_fn(state, batch, rng):
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, scalars), grads = grad_fn(state.params, batch, rng)
        updates, new_opt_state = tx.update(grads, state.opt_state,
                                           state.params)
        new_params = jax.tree_util.tree_map(
            lambda p, u: p + u, state.params, updates)
        metrics = dict(scalars)
        metrics['nan_flag'] = jnp.any(jnp.stack(
            [jnp.any(jnp.isnan(v)) for v in scalars.values()]))
        return TrainState(step=state.step + 1, params=new_params,
                          opt_state=new_opt_state), metrics

    rep = replicated(mesh)
    data = batch_sharding(mesh, axis_name)

    def batch_shardings(batch_example):
        return jax.tree_util.tree_map(lambda _: data, batch_example)

    jitted = jax.jit(
        step_fn,
        donate_argnums=(0,) if donate else (),
    )
    return jitted


def is_primary_process():
    return jax.process_index() == 0


def local_data_slice(num_items, process_index=None, process_count=None):
    """Deterministic per-host shard of a clip list (multi-host input)."""
    if process_index is None:
        process_index = jax.process_index()
    if process_count is None:
        process_count = jax.process_count()
    per_host = -(-num_items // process_count)
    start = process_index * per_host
    return slice(start, min(start + per_host, num_items))
