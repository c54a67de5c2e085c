"""Jitted train/eval steps and the TrainState pytree.

One fused XLA computation per training step: forward (see models/eve.py),
loss, backward, clip, Adam update — replacing the reference's Python-side
``loss.backward(); clip; optimizer.step()`` sequence
(src/core/training.py:485-502). The NaN watchdog
(src/core/training.py:536-542) is computed on-device as a scalar flag.
"""

import functools
from typing import Any

import flax.struct
import jax
import jax.numpy as jnp

from eve_tpu.models import eve as eve_lib


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    opt_state: Any


def create_train_state(spec, tx, rng):
    params = eve_lib.init_params(spec, rng)
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      opt_state=tx.init(params))


def make_train_step(spec, tx, donate=True, seq_mesh=None):
    """Build the jitted train step.

    Returns fn(state, batch, rng) -> (new_state, metrics) where metrics
    contains every 0-dim output (losses + metrics, reference naming), plus
    ``full_loss`` and ``nan_flag``. ``seq_mesh`` enables temporal sharding
    of the recurrences (see eve_tpu/parallel/temporal.py).
    """

    def loss_fn(params, batch, rng):
        out = eve_lib.forward(spec, params, batch, rng=rng, training=True,
                              seq_mesh=seq_mesh)
        scalars = {k: v for k, v in out.items()
                   if hasattr(v, 'ndim') and v.ndim == 0}
        return out['full_loss'], scalars

    def step_fn(state, batch, rng):
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (loss, scalars), grads = grad_fn(state.params, batch, rng)
        updates, new_opt_state = tx.update(grads, state.opt_state,
                                           state.params)
        new_params = jax.tree_util.tree_map(
            lambda p, u: p + u, state.params, updates)
        metrics = dict(scalars)
        metrics['nan_flag'] = jnp.any(jnp.stack(
            [jnp.any(jnp.isnan(v)) for v in scalars.values()]))
        new_state = TrainState(step=state.step + 1, params=new_params,
                               opt_state=new_opt_state)
        return new_state, metrics

    donate_argnums = (0,) if donate else ()
    return jax.jit(step_fn, donate_argnums=donate_argnums)


def make_multi_source_train_step(spec, tx, tags, donate=True, seq_mesh=None):
    """Train step over SEVERAL data sources in one fused computation.

    The reference fetches one batch per training source each step
    (src/core/training.py:240-264) and accumulates a backward pass per loss
    term before stepping (src/core/training.py:474-502); with a shared
    parameter set that equals one step on the SUM of the losses, which is
    what this computes (single XLA graph, no retain_graph bookkeeping).
    ``batches`` is a dict {tag: batch}; scalar outputs come back prefixed
    ``<tag>/`` so multi-source metrics stay distinguishable.
    """
    tags = tuple(tags)

    def loss_fn(params, batches, rng):
        rngs = jax.random.split(rng, len(tags))
        total = 0.0
        scalars = {}
        for tag, r in zip(tags, rngs):
            out = eve_lib.forward(spec, params, batches[tag], rng=r,
                                  training=True, seq_mesh=seq_mesh)
            for k, v in out.items():
                if hasattr(v, 'ndim') and v.ndim == 0:
                    scalars['%s/%s' % (tag, k)] = v
            total = total + out['full_loss']
        return total, scalars

    def step_fn(state, batches, rng):
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (loss, scalars), grads = grad_fn(state.params, batches, rng)
        updates, new_opt_state = tx.update(grads, state.opt_state,
                                           state.params)
        new_params = jax.tree_util.tree_map(
            lambda p, u: p + u, state.params, updates)
        metrics = dict(scalars)
        metrics['full_loss'] = loss
        metrics['nan_flag'] = jnp.any(jnp.stack(
            [jnp.any(jnp.isnan(v)) for v in scalars.values()]))
        new_state = TrainState(step=state.step + 1, params=new_params,
                               opt_state=new_opt_state)
        return new_state, metrics

    donate_argnums = (0,) if donate else ()
    return jax.jit(step_fn, donate_argnums=donate_argnums)


def make_eval_step(spec, output_predictions=False, create_images=False,
                   seq_mesh=None):
    """Build the jitted eval step: fn(params, batch) -> output dict."""

    def eval_fn(params, batch):
        return eve_lib.forward(spec, params, batch, training=False,
                               output_predictions=output_predictions,
                               create_images=create_images,
                               seq_mesh=seq_mesh)

    return jax.jit(eval_fn)
