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

    Per-submodule learning rates (``eye_net_learning_rate_multiplier`` /
    ``refine_net_learning_rate_multiplier``) express the reference's
    multi-optimizer list (src/core/training.py:474-502) for disjoint
    parameter subtrees: gradient clipping stays GLOBAL (the reference
    clips ``model.parameters()`` once, src/core/training.py:491-498),
    then each top-level subtree runs its own wd->Adam->LR chain. Since
    Adam state and coupled weight decay are elementwise, this equals the
    reference's ``[Adam(eye_params, lr1), Adam(refine_params, lr2)]``
    exactly (pinned by tests/test_trajectory_parity.py).

    Args:
      frozen_eye_net: overrides ``config.eye_net_frozen`` if given. When
        frozen, the ``eye_net`` top-level subtree receives zero updates
        (reference freezes via requires_grad=False, src/models/eve.py:58-60)
        and is excluded from the clip norm (its params carry no grads in
        the reference).
    """
    schedule = make_schedule(config, steps_per_epoch)
    multipliers = {
        'eye_net': float(getattr(config, 'eye_net_learning_rate_multiplier',
                                 1.0)),
        'refine_net': float(getattr(config,
                                    'refine_net_learning_rate_multiplier',
                                    1.0)),
    }

    def clip_transform():
        if not config.do_gradient_clipping:
            return None
        if config.gradient_clip_by == 'norm':
            return optax.clip_by_global_norm(config.gradient_clip_amount)
        if config.gradient_clip_by == 'value':
            return optax.clip(config.gradient_clip_amount)
        return None

    def inner_chain(lr_scale):
        chain = []
        if config.weight_decay:
            chain.append(optax.add_decayed_weights(config.weight_decay))
        chain.append(optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8))
        if lr_scale == 1.0:
            chain.append(optax.scale_by_learning_rate(schedule))
        else:
            chain.append(optax.scale_by_learning_rate(
                lambda count: lr_scale * schedule(count)))
        return chain

    frozen = (config.eye_net_frozen if frozen_eye_net is None
              else frozen_eye_net)
    custom_lr = any(m != 1.0 for m in multipliers.values())

    if not custom_lr:
        # Uniform LR: keep the historical flat chain (and the historical
        # frozen wrapping) so optimizer-state checkpoints stay loadable.
        chain = []
        clip = clip_transform()
        if clip is not None:
            chain.append(clip)
        chain.extend(inner_chain(1.0))
        tx = optax.chain(*chain)
        if frozen:
            def label_fn(params):
                return {k: ('frozen' if k == 'eye_net' else 'train')
                        for k in params}
            tx = optax.multi_transform(
                {'train': tx, 'frozen': optax.set_to_zero()}, label_fn)
    else:
        def label_fn(params):
            labels = {}
            for k in params:
                if frozen and k == 'eye_net':
                    labels[k] = 'frozen'
                elif k in multipliers and multipliers[k] != 1.0:
                    labels[k] = k
                else:
                    labels[k] = 'train'
            return labels

        transforms = {'train': optax.chain(*inner_chain(1.0)),
                      'frozen': optax.set_to_zero()}
        for k, m in multipliers.items():
            if m != 1.0:
                transforms[k] = optax.chain(*inner_chain(m))

        parts = []
        clip = clip_transform()
        if clip is not None:
            if frozen:
                # Exclude the frozen subtree from the global norm: in the
                # reference its params have requires_grad=False and never
                # enter clip_grad_norm_.
                parts.append(optax.masked(
                    clip, lambda params: {k: k != 'eye_net'
                                          for k in params}))
            else:
                parts.append(clip)
        parts.append(optax.multi_transform(transforms, label_fn))
        tx = optax.chain(*parts)

    accum = int(getattr(config, 'gradient_accumulation_steps', 1))
    if accum > 1:
        # Each optimizer update averages the gradients of `accum`
        # sequential micro-batches (the harness shrinks the loader batch by
        # the same factor): effective batch = config.batch_size with ~1/N
        # the activation memory. The inner chain (and thus the LR schedule)
        # counts real updates, not micro-steps.
        tx = optax.MultiSteps(tx, every_k_schedule=accum)
    return tx, schedule
