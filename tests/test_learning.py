"""End-to-end LEARNING tests: the model must actually learn from pixels.

The synthetic fixture renders eye patches whose pupil position encodes the
GT gaze (eve_tpu/data/synthetic.py:render_gaze_patches), so EyeNet can
genuinely learn pixels->gaze — the reference's headline behavior
(README.md:7) — rather than only the RefineNet screen-prior path.

Full convergence is proven on real TPU hardware (BASELINE.md "EyeNet
learning demo": 27 deg -> 1.7 deg held-out in 2000 steps at effective LR
1e-3); a 1-core CPU host cannot afford that many ResNet18 fwd+bwd steps, so
the default-suite test here asserts the necessary conditions cheaply:
pixel information actually flows (no InstanceNorm collapse) and a short
real training run moves the angular loss sharply down. Set EVE_SLOW_TESTS=1
to run the longer CPU convergence check.
"""

import os

import numpy as np
import pytest

import jax

from eve_tpu.config import DefaultConfig
from eve_tpu.data.synthetic import make_synthetic_batch
from eve_tpu.models import eve as eve_lib
from eve_tpu.train import optim as optim_lib
from eve_tpu.train import step as step_lib

# 36px is the smallest size where ResNet18IN's layer4 keeps >= 2x2 spatial
# resolution; below that instance norm erases the pixel signal entirely
# (see the guard in eve_tpu/models/resnet.py).
EYES = 36


@pytest.fixture
def config():
    DefaultConfig._reset_instance_for_testing()
    cfg = DefaultConfig()
    cfg.import_dict({
        'eyes_size': [EYES, EYES], 'max_sequence_len': 2,
        # Effective Adam LR = base * batch = 1e-3: the measured sweet spot
        # (the config-default effective 8e-3 oscillates at the mean-gaze
        # floor on this task; BASELINE.md).
        'batch_size': 8, 'base_learning_rate': 0.000125,
        'num_warmup_epochs': 0.0, 'lr_decay_strategy': 'none',
        'load_screen_content': False, 'refine_net_enabled': False,
        'weight_decay': 0.0, 'refine_net_do_offset_augmentation': False,
    })
    yield cfg
    DefaultConfig._reset_instance_for_testing()


def test_backbone_passes_pixel_information():
    """The CNN output must depend on its input at the test size (it
    provably does NOT at 32px — InstanceNorm collapse)."""
    import jax.numpy as jnp
    from eve_tpu.models.resnet import ResNet18IN
    net = ResNet18IN(num_classes=16)
    rng = np.random.RandomState(0)
    x1 = jnp.asarray(rng.uniform(-1, 1, (2, EYES, EYES, 3)).astype(np.float32))
    x2 = jnp.asarray(rng.uniform(-1, 1, (2, EYES, EYES, 3)).astype(np.float32))
    params = net.init(jax.random.PRNGKey(0), x1)
    y1, y2 = net.apply(params, x1), net.apply(params, x2)
    assert float(jnp.abs(y1 - y2).mean()) > 1e-3


def test_patches_drive_the_angular_loss(config):
    """Gradient of the angular loss w.r.t. the eye patches is nonzero after
    warmup steps: the supervision signal reaches the pixels (it would be
    exactly 0 under the 32px InstanceNorm collapse, or if the forward
    ignored the patches).

    At STEP 0 this gradient is legitimately zero — the gaze head's final
    linear is zero-initialized like the reference's
    (src/models/eye_net.py:96), so d(gaze)/d(upstream) = W = 0 until the
    first update — hence the two warmup optimizer steps."""
    import jax.numpy as jnp
    spec = eve_lib.EveSpec.from_config(config)
    tx, _ = optim_lib.build_optimizer(config, steps_per_epoch=10 ** 6)
    state = step_lib.create_train_state(spec, tx, jax.random.PRNGKey(0))
    train_step = step_lib.make_train_step(spec, tx, donate=False)
    batch = {k: jnp.asarray(v) for k, v in make_synthetic_batch(
        np.random.RandomState(0), batch_size=2, sequence_len=2,
        eyes_size=EYES, with_screen=False).items()}
    rng = jax.random.PRNGKey(1)
    for _ in range(2):
        rng, sub = jax.random.split(rng)
        state, _ = train_step(state, batch, sub)
    params = state.params

    def loss_wrt_patch(patch):
        b = dict(batch)
        b['left_eye_patch'] = patch
        out = eve_lib.forward(spec, params, b, training=False)
        return out['loss_ang_left_g_initial']

    g = jax.grad(loss_wrt_patch)(batch['left_eye_patch'])
    assert float(jnp.abs(g).max()) > 0.0


def test_short_training_reduces_loss(config):
    """~25 real optimizer steps cut the full loss roughly in half (the TPU
    curve reaches 1.7 deg held-out by step 2000; this pins the same
    trajectory's head at CPU-affordable cost)."""
    import jax.numpy as jnp
    spec = eve_lib.EveSpec.from_config(config)
    tx, _ = optim_lib.build_optimizer(config, steps_per_epoch=10 ** 6)
    state = step_lib.create_train_state(spec, tx, jax.random.PRNGKey(0))
    train_step = step_lib.make_train_step(spec, tx, donate=False)
    rng_np = np.random.RandomState(0)
    batches = [{k: jnp.asarray(v) for k, v in make_synthetic_batch(
        rng_np, batch_size=8, sequence_len=2, eyes_size=EYES,
        with_screen=False).items()} for _ in range(4)]
    rng = jax.random.PRNGKey(1)
    first = last = None
    for i in range(25):
        rng, sub = jax.random.split(rng)
        state, m = train_step(state, batches[i % 4], sub)
        if first is None:
            first = float(m['full_loss'])
        last = float(m['full_loss'])
    assert np.isfinite(last)
    assert last < 0.6 * first, (first, last)


@pytest.mark.skipif(not os.environ.get('EVE_SLOW_TESTS'),
                    reason='set EVE_SLOW_TESTS=1 (about 25 min on 1 CPU core)')
def test_eye_net_converges_on_cpu(config):
    """Longer CPU run: angular error falls well below the ~13 deg mean-gaze
    floor, proving pixels->gaze learning without TPU access."""
    import jax.numpy as jnp
    spec = eve_lib.EveSpec.from_config(config)
    tx, _ = optim_lib.build_optimizer(config, steps_per_epoch=10 ** 6)
    state = step_lib.create_train_state(spec, tx, jax.random.PRNGKey(0))
    train_step = step_lib.make_train_step(spec, tx, donate=False)
    rng_np = np.random.RandomState(0)
    batches = [{k: jnp.asarray(v) for k, v in make_synthetic_batch(
        rng_np, batch_size=8, sequence_len=2, eyes_size=EYES,
        with_screen=False).items()} for _ in range(8)]
    rng = jax.random.PRNGKey(1)
    ang = None
    for i in range(300):
        rng, sub = jax.random.split(rng)
        state, m = train_step(state, batches[i % 8], sub)
        ang = float(m['metric_ang_g_initial'])
    assert ang < 8.0, ang
