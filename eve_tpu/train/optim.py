"""Optimizer and LR schedule with reference-equivalent semantics.

Reference training uses ``torch.optim.Adam(lr=batch_size*base_lr,
weight_decay=wd)`` (src/train.py:49-55) with gradient clipping applied to raw
gradients before the step (src/core/training.py:492-498), and a
warmup/decay schedule (src/core/training.py:382-418).

torch-Adam weight decay is *coupled* (L2 added to the gradient before the
moment updates), not AdamW — reproduced here with ``add_decayed_weights``
before ``scale_by_adam``.

Reference quirk (SURVEY.md section 3.1): the schedule function returns an
absolute LR but is installed as a multiplicative LambdaLR factor, so the
effective LR is ``initial_lr * schedule(step)``. The intended semantics are
implemented by default; ``reference_compat_lr_schedule`` reproduces the quirk.
"""

import numpy as np
import optax


def learning_rate_schedule(step, *, base_lr, target_lr, steps_per_epoch,
                           num_warmup_epochs, strategy, decay_factor,
                           decay_epoch_interval):
    """Absolute LR at ``step`` (host-side; mirrors training.py:382-418).

    Not called by training (the jit-able ``_schedule_array`` via
    ``make_schedule`` is the live path) — this is the independently-written
    oracle that ``test_schedule_cyclic_matches_host_reference`` pins the
    live schedule against. Any decay-strategy change must be made in BOTH
    or the parity test fails (by design)."""
    num_warmup_steps = int(steps_per_epoch * num_warmup_epochs)
    if step < num_warmup_steps:
        a = (target_lr - base_lr) / float(num_warmup_steps)
        return a * step + base_lr
    new_step = step - num_warmup_steps
    epoch = new_step / float(steps_per_epoch)
    interval = int(epoch / decay_epoch_interval)
    if strategy == 'exponential':
        return target_lr * (decay_factor ** interval)
    if strategy == 'cyclic':
        peak_a = target_lr * (decay_factor ** interval)
        peak_b = peak_a * decay_factor
        half = 0.5 * decay_epoch_interval
        start = interval * decay_epoch_interval
        mid = start + half
        if epoch < mid:
            slope = -(peak_a - base_lr) / half
        else:
            slope = (peak_b - base_lr) / half
        return slope * (epoch - mid) + base_lr
    return target_lr


def make_schedule(config, steps_per_epoch):
    """optax-compatible schedule closure from a DefaultConfig."""
    target_lr = config.learning_rate
    base_lr = target_lr / config.batch_size
    compat = getattr(config, 'reference_compat_lr_schedule', False)

    def schedule(step):
        import jax.numpy as jnp
        # The schedule shape is step-function-like; compute via pure ops so
        # it can live inside jit. We evaluate on host values when possible.
        return _schedule_array(step, base_lr, target_lr, steps_per_epoch,
                               config.num_warmup_epochs,
                               config.lr_decay_strategy,
                               config.lr_decay_factor,
                               config.lr_decay_epoch_interval,
                               compat)

    return schedule


def _schedule_array(step, base_lr, target_lr, steps_per_epoch,
                    num_warmup_epochs, strategy, decay_factor,
                    decay_epoch_interval, compat):
    import jax.numpy as jnp
    step = jnp.asarray(step, jnp.float32)
    num_warmup_steps = float(int(steps_per_epoch * num_warmup_epochs))
    if num_warmup_steps > 0:
        warm = base_lr + (target_lr - base_lr) * step / num_warmup_steps
    else:
        warm = jnp.full_like(step, target_lr)
    new_step = jnp.maximum(step - num_warmup_steps, 0.0)
    epoch = new_step / float(steps_per_epoch)
    interval = jnp.floor(epoch / decay_epoch_interval)
    if strategy == 'exponential':
        after = target_lr * jnp.power(decay_factor, interval)
    elif strategy == 'cyclic':
        peak_a = target_lr * jnp.power(decay_factor, interval)
        peak_b = peak_a * decay_factor
        half = 0.5 * decay_epoch_interval
        start = interval * decay_epoch_interval
        mid = start + half
        down = -(peak_a - base_lr) / half * (epoch - mid) + base_lr
        up = (peak_b - base_lr) / half * (epoch - mid) + base_lr
        after = jnp.where(epoch < mid, down, up)
    else:
        after = jnp.full_like(step, target_lr)
    lr = jnp.where(step < num_warmup_steps, warm, after)
    if compat:
        # LambdaLR quirk: effective = initial_lr * schedule(step)
        lr = lr * target_lr
    return lr


def build_optimizer(config, steps_per_epoch, frozen_eye_net=None):
    """optax chain: clip -> (torch-style) Adam with coupled weight decay.

    Args:
      frozen_eye_net: overrides ``config.eye_net_frozen`` if given. When
        frozen, the ``eye_net`` top-level subtree receives zero updates
        (reference freezes via requires_grad=False, src/models/eve.py:58-60).
    """
    schedule = make_schedule(config, steps_per_epoch)
    chain = []
    if config.do_gradient_clipping:
        if config.gradient_clip_by == 'norm':
            chain.append(optax.clip_by_global_norm(config.gradient_clip_amount))
        elif config.gradient_clip_by == 'value':
            chain.append(optax.clip(config.gradient_clip_amount))
    if config.weight_decay:
        chain.append(optax.add_decayed_weights(config.weight_decay))
    chain.append(optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8))
    chain.append(optax.scale_by_learning_rate(schedule))
    tx = optax.chain(*chain)

    frozen = (config.eye_net_frozen if frozen_eye_net is None
              else frozen_eye_net)
    if frozen:
        def label_fn(params):
            return {k: ('frozen' if k == 'eye_net' else 'train')
                    for k in params}
        tx = optax.multi_transform(
            {'train': tx, 'frozen': optax.set_to_zero()}, label_fn)

    accum = int(getattr(config, 'gradient_accumulation_steps', 1))
    if accum > 1:
        # Each optimizer update averages the gradients of `accum`
        # sequential micro-batches (the harness shrinks the loader batch by
        # the same factor): effective batch = config.batch_size with ~1/N
        # the activation memory. The inner chain (and thus the LR schedule)
        # counts real updates, not micro-steps.
        tx = optax.MultiSteps(tx, every_k_schedule=accum)
    return tx, schedule
