"""End-to-end EVE forward tests on synthetic geometry-consistent batches."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from eve_tpu.data.synthetic import make_synthetic_batch
from eve_tpu.models import eve as eve_lib
from eve_tpu.models.eye_net import EyeNet


def small_spec(**kw):
    defaults = dict(refine_net_enabled=True, load_screen_content=True)
    defaults.update(kw)
    return eve_lib.EveSpec(**defaults)


@pytest.fixture(scope='module')
def setup():
    spec = small_spec()
    rng = jax.random.PRNGKey(0)
    params = eve_lib.init_params(spec, rng)
    np_rng = np.random.RandomState(1)
    batch = {k: jnp.asarray(v) for k, v in
             make_synthetic_batch(np_rng, batch_size=2, sequence_len=4).items()}
    return spec, params, batch


@pytest.mark.slow
def test_forward_eval_outputs(setup):
    spec, params, batch = setup
    out = eve_lib.forward(spec, params, batch, training=False,
                          output_predictions=True)
    assert np.isfinite(float(out['full_loss']))
    # Core predictions with expected shapes
    assert out['PoG_px_initial'].shape == (2, 4, 2)
    assert out['PoG_px_final'].shape == (2, 4, 2)
    assert out['g_final'].shape == (2, 4, 2)
    assert out['left_pupil_size'].shape == (2, 4)
    # Metric/loss keys follow the reference naming
    for key in ('loss_ang_left_g_initial', 'loss_ang_right_g_initial',
                'loss_l1_left_pupil_size', 'metric_euc_PoG_px_initial',
                'metric_euc_PoG_cm_final', 'metric_ang_g_initial',
                'metric_ang_g_final', 'loss_ce_heatmap_final',
                'loss_mse_lr_consistency'):
        assert key in out, key
        assert np.isfinite(float(out[key])), key
    # PoG predictions land on the screen
    pog = np.asarray(out['PoG_px_final'])
    assert pog[..., 0].min() >= 0 and pog[..., 0].max() <= 1920
    assert pog[..., 1].min() >= 0 and pog[..., 1].max() <= 1080


def test_forward_training_offset_augmentation(setup):
    spec, params, batch = setup
    out = eve_lib.forward(spec, params, batch, rng=jax.random.PRNGKey(7),
                          training=True)
    for key in ('metric_euc_PoG_px_initial_unaugmented',
                'metric_ang_g_initial_unaugmented',
                'loss_ce_heatmap_final'):
        assert key in out, key
    assert np.isfinite(float(out['full_loss']))


def test_offset_augmentation_zero_prob(setup):
    """zero_prob mixes clean samples into the kappa offset augmentation.

    At 1.0 every kappa is exactly zero (training sees the true initial);
    at 0.0 the stream is bit-identical to the pre-knob default (2-way key
    split preserved); at 0.5 both regimes appear, and the keep/zero draw
    is shared by the two eyes (a clip is clean or augmented, never half).
    No reference counterpart (ref eve.py:462-476 always augments) — this
    trains the gated readout's estimate-quality awareness (BASELINE.md
    round-5 staged study)."""
    spec, params, batch = setup
    rng = jax.random.PRNGKey(11)

    def kappas(zp):
        s = small_spec(refine_net_offset_augmentation_zero_prob=zp)
        labels = eve_lib.calculate_additional_labels(
            s, batch, rng, training=True)
        return (np.asarray(labels['left_kappa_fake']),
                np.asarray(labels['right_kappa_fake']))

    l0, r0 = kappas(0.0)
    l1, r1 = kappas(1.0)
    assert np.all(l1 == 0.0) and np.all(r1 == 0.0)
    assert np.any(l0 != 0.0) and np.any(r0 != 0.0)

    # Default stream unchanged: same rng, zp=0 twice -> identical.
    l0b, _ = kappas(0.0)
    np.testing.assert_array_equal(l0, l0b)

    # Mixed regime: per-sample zeroing, shared across eyes. With B=2 and
    # a fixed key this is deterministic; scan a few keys so the test does
    # not depend on one key's draw.
    saw_clean = saw_aug = False
    for seed in range(8):
        s = small_spec(refine_net_offset_augmentation_zero_prob=0.5)
        labels = eve_lib.calculate_additional_labels(
            s, batch, jax.random.PRNGKey(seed), training=True)
        lk = np.asarray(labels['left_kappa_fake'])[:, 0, :]
        rk = np.asarray(labels['right_kappa_fake'])[:, 0, :]
        for b in range(lk.shape[0]):
            lz, rz = np.all(lk[b] == 0.0), np.all(rk[b] == 0.0)
            assert lz == rz, 'keep/zero draw must be shared across eyes'
            saw_clean |= lz
            saw_aug |= not lz
    assert saw_clean and saw_aug


@pytest.mark.slow
def test_forward_no_refine():
    spec = small_spec(refine_net_enabled=False, load_screen_content=False)
    params = eve_lib.init_params(spec, jax.random.PRNGKey(0))
    batch = {k: jnp.asarray(v) for k, v in
             make_synthetic_batch(np.random.RandomState(2), 2, 3,
                                  with_screen=False).items()}
    out = eve_lib.forward(spec, params, batch, training=False)
    assert 'PoG_px_final' not in out or out.get('PoG_px_final') is None
    assert 'loss_ang_left_g_initial' in out
    assert np.isfinite(float(out['full_loss']))


def test_forward_static_eye_net():
    spec = small_spec(refine_net_enabled=False, load_screen_content=False,
                      eye_net_use_rnn=False)
    params = eve_lib.init_params(spec, jax.random.PRNGKey(0))
    batch = {k: jnp.asarray(v) for k, v in
             make_synthetic_batch(np.random.RandomState(3), 2, 3,
                                  with_screen=False).items()}
    out = eve_lib.forward(spec, params, batch, training=False)
    assert np.isfinite(float(out['full_loss']))


@pytest.mark.slow
def test_gru_scan_matches_per_step_loop(setup):
    """The batched-CNN + scanned-GRU split must equal a per-t loop."""
    spec, params, batch = setup
    eye_net = spec.build_eye_net()
    eye_params = {'params': params['eye_net']}
    left = batch['left_eye_patch']
    B, T = left.shape[:2]
    nf = spec.eye_net_num_features

    # Per-timestep loop (reference-style)
    states = eye_net.init_state(B)
    loop_outputs = []
    for t in range(T):
        f = eye_net.apply(eye_params, left[:, t], batch['left_h'][:, t],
                          method=EyeNet.features)
        f, states = eye_net.apply(eye_params, f, states,
                                  method=EyeNet.recurrent)
        loop_outputs.append(f)
    loop_out = np.stack([np.asarray(x) for x in loop_outputs], axis=1)

    # Batched + scanned path
    feats = eye_net.apply(
        eye_params, left.reshape((B * T,) + left.shape[2:]),
        batch['left_h'].reshape(B * T, 2), method=EyeNet.features
    ).reshape(B, T, nf)

    def step(carry, f):
        f, ns = eye_net.apply(eye_params, f, carry, method=EyeNet.recurrent)
        return ns, f

    _, scanned = jax.lax.scan(step, eye_net.init_state(B),
                              jnp.moveaxis(feats, 1, 0))
    scanned = np.asarray(jnp.moveaxis(scanned, 0, 1))
    np.testing.assert_allclose(scanned, loop_out, atol=2e-5)


def test_forward_jit_compiles(setup):
    spec, params, batch = setup
    fwd = jax.jit(lambda p, b: eve_lib.forward(spec, p, b, training=False))
    out1 = fwd(params, batch)
    out2 = fwd(params, batch)
    np.testing.assert_allclose(float(out1['full_loss']),
                               float(out2['full_loss']), rtol=1e-6)


def test_gt_gaze_projects_back_to_gt_pog(setup):
    """Synthetic GT gazes fed through the projection recover the GT PoG."""
    spec, params, batch = setup
    out = eve_lib.forward(
        spec, params,
        dict(batch), training=False, output_predictions=True)
    # The *labels* derived inside forward must be self-consistent: combined
    # g (from GT PoG) re-projected through to_screen_coordinates lands on
    # the GT PoG. Exercise via g_to_pog on GT per-eye gazes.
    full = dict(batch)
    full.update(eve_lib.calculate_additional_labels(spec, batch, None, False))
    res = eve_lib.g_to_pog(spec, full, batch['left_g_tobii'],
                           batch['right_g_tobii'])
    np.testing.assert_allclose(np.asarray(res['PoG_px']),
                               np.asarray(batch['left_PoG_tobii']),
                               atol=1.5)


@pytest.mark.slow
def test_uint8_on_device_preprocess_matches_host_path():
    """uint8 inputs + on-device normalize == host-normalized f32 inputs."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from eve_tpu.data.synthetic import make_synthetic_batch
    from eve_tpu.models import eve as eve_lib

    spec = eve_lib.EveSpec(refine_net_enabled=True, load_screen_content=True)
    params = eve_lib.init_params(spec, jax.random.PRNGKey(0))

    rng = np.random.RandomState(3)
    b_u8 = make_synthetic_batch(rng, batch_size=2, sequence_len=2,
                                eyes_size=32, frame_dtype=np.uint8)
    b_f32 = dict(b_u8)
    for k in ('left_eye_patch', 'right_eye_patch'):
        b_f32[k] = b_u8[k].astype(np.float32) * (2.0 / 255.0) - 1.0
    b_f32['screen_frame'] = b_u8['screen_frame'].astype(np.float32) / 255.0

    out_u8 = eve_lib.forward(spec, params,
                             {k: jnp.asarray(v) for k, v in b_u8.items()},
                             training=False, output_predictions=True)
    out_f32 = eve_lib.forward(spec, params,
                              {k: jnp.asarray(v) for k, v in b_f32.items()},
                              training=False, output_predictions=True)
    for key in ('PoG_px_initial', 'PoG_px_final', 'left_pupil_size'):
        np.testing.assert_allclose(np.asarray(out_u8[key]),
                                   np.asarray(out_f32[key]),
                                   rtol=1e-4, atol=1e-3, err_msg=key)


@pytest.mark.parametrize('eye_rnn,refine_rnn,carry_only', [
    ('LSTM', 'CLSTM', True),    # shipped refine_net.json configuration
    ('LSTM', 'CLSTM', False),   # intended (non-quirk) CLSTM behavior
    ('RNN', 'CRNN', True),
])
@pytest.mark.slow
def test_forward_rnn_variants(eye_rnn, refine_rnn, carry_only):
    """All cell-type combinations run and produce finite train gradients."""
    import jax
    from eve_tpu.data.synthetic import make_synthetic_batch

    spec = eve_lib.EveSpec(
        eye_net_rnn_type=eye_rnn, refine_net_rnn_type=refine_rnn,
        clstm_carry_only=carry_only,
        refine_net_enabled=True, load_screen_content=True)
    params = eve_lib.init_params(spec, jax.random.PRNGKey(0))
    rng_np = np.random.RandomState(0)
    batch = make_synthetic_batch(rng_np, batch_size=2, sequence_len=3,
                                 eyes_size=32)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}

    def loss(p):
        out = eve_lib.forward(spec, p, batch, rng=jax.random.PRNGKey(1),
                              training=True)
        return out['full_loss']

    val, grads = jax.value_and_grad(loss)(params)
    assert np.isfinite(float(val))
    finite = all(np.all(np.isfinite(np.asarray(g)))
                 for g in jax.tree_util.tree_leaves(grads))
    assert finite


@pytest.mark.slow
def test_streaming_chunked_inference_matches_full_clip():
    """Two T/2 chunks with carried states == one full-T forward (serving)."""
    import jax

    spec = eve_lib.EveSpec(refine_net_enabled=True, load_screen_content=True)
    params = eve_lib.init_params(spec, jax.random.PRNGKey(0))
    rng_np = np.random.RandomState(5)
    B, T = 2, 4
    batch = make_synthetic_batch(rng_np, batch_size=B, sequence_len=T,
                                 eyes_size=32)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}

    full = eve_lib.forward(spec, params, batch, training=False,
                           output_predictions=True)

    states = eve_lib.init_stream_state(spec, B)
    outs = []
    for t0 in (0, T // 2):
        chunk = {k: (v[:, t0:t0 + T // 2] if v.ndim >= 2 and
                     v.shape[1] == T else v)
                 for k, v in batch.items()}
        out = eve_lib.forward(spec, params, chunk, training=False,
                              output_predictions=True,
                              initial_states=states, return_states=True)
        states = out['states']
        outs.append(out)

    for key in ('PoG_px_initial', 'PoG_px_final', 'left_pupil_size'):
        streamed = np.concatenate(
            [np.asarray(o[key]) for o in outs], axis=1)
        np.testing.assert_allclose(streamed, np.asarray(full[key]),
                                   rtol=1e-4, atol=1e-3, err_msg=key)


@pytest.mark.slow
def test_forward_without_camera_geometry():
    """GazeCapture/MPIIGaze-style pretraining input: eye patches + head pose
    + gaze/pupil GT but NO camera extrinsics or screen geometry (reference
    eve.py:550 guards only the PoG branch). Training must fall back to the
    angular + pupil objective, with offset augmentation skipped (it needs
    head_R), and gradients must flow."""
    rng = np.random.RandomState(0)
    batch = make_synthetic_batch(rng, batch_size=2, sequence_len=3,
                                 eyes_size=32, with_screen=False)
    keep = {'left_eye_patch', 'right_eye_patch', 'left_h', 'right_h',
            'left_g_tobii', 'left_g_tobii_validity',
            'right_g_tobii', 'right_g_tobii_validity',
            'left_p', 'left_p_validity', 'right_p', 'right_p_validity',
            'timestamps'}
    batch = {k: jnp.asarray(v) for k, v in batch.items() if k in keep}
    spec = eve_lib.EveSpec(refine_net_enabled=False)
    params = eve_lib.init_params(spec, jax.random.PRNGKey(0))

    out = eve_lib.forward(spec, params, batch, rng=jax.random.PRNGKey(1),
                          training=True)
    scalars = sorted(k for k, v in out.items()
                     if hasattr(v, 'ndim') and v.ndim == 0)
    assert scalars == ['full_loss', 'loss_ang_left_g_initial',
                       'loss_ang_right_g_initial',
                       'loss_l1_left_pupil_size',
                       'loss_l1_right_pupil_size']
    assert np.isfinite(float(out['full_loss']))

    grads = jax.grad(lambda p: eve_lib.forward(
        spec, p, batch, rng=jax.random.PRNGKey(1),
        training=True)['full_loss'])(params)
    total = float(jax.tree_util.tree_reduce(
        lambda a, x: a + jnp.abs(x).sum(), grads, 0.0))
    assert np.isfinite(total) and total > 0.0
