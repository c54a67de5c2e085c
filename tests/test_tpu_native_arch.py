"""TPU-native architecture variant (``tpu_native_arch``).

The opt-in lane-filling topology (eve_tpu/models/refine_net_tpu.py +
patchify EyeNet stem, resnet.py): same external contract as the reference
topology — input assembly, ConvGRU bottleneck state structure, (72, 128)
heatmap into the same soft-argmax — different internals, NOT
weight-compatible. These tests pin the contract: shapes, finiteness of
value and gradient, the train step, streaming-state equivalence across
chunk boundaries, and the converter/bootstrap refusals.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from eve_tpu.data.synthetic import make_synthetic_batch
from eve_tpu.models import eve as eve_lib
from eve_tpu.models.layers import depth_to_space
from eve_tpu.models.refine_net import RefineNet
from eve_tpu.models.refine_net_tpu import RefineNetTPU


def _spec(**kw):
    kw.setdefault('refine_net_enabled', True)
    kw.setdefault('load_screen_content', True)
    kw.setdefault('tpu_native_arch', True)
    return eve_lib.EveSpec(**kw)


def _batch(rng, B=2, T=2, eyes=64):
    batch = make_synthetic_batch(rng, batch_size=B, sequence_len=T,
                                 eyes_size=eyes, with_screen=True)
    return {k: jnp.asarray(v) for k, v in batch.items()}


def test_depth_to_space_layout():
    # Each (h, w) feature vector paints a contiguous block x block tile,
    # channel axis interpreted as (bh, bw, c).
    x = jnp.arange(2 * 1 * 2 * 8, dtype=jnp.float32).reshape(2, 1, 2, 8)
    y = depth_to_space(x, 2)
    assert y.shape == (2, 2, 4, 2)
    # Tile (0, 0) of batch 0: channels [0..8) as (bh=2, bw=2, c=2).
    np.testing.assert_array_equal(np.asarray(y[0, :, :2, :]),
                                  np.arange(8, dtype=np.float32).reshape(2, 2, 2))
    # Tile (0, 1): channels [8..16).
    np.testing.assert_array_equal(np.asarray(y[0, :, 2:, :]),
                                  np.arange(8, 16, dtype=np.float32).reshape(2, 2, 2))


def test_refine_net_tpu_single_step_shapes(rng):
    net = RefineNetTPU(load_screen_content=True)
    hm = jnp.asarray(rng.uniform(0, 1, (3, 72, 128)).astype(np.float32))
    screen = jnp.asarray(rng.uniform(0, 1, (3, 72, 128, 3)).astype(np.float32))
    params = net.init(jax.random.PRNGKey(0), hm, screen)['params']
    out = net.apply({'params': params}, hm, screen)
    assert out['heatmap_final'].shape == (3, 72, 128)
    v = np.asarray(out['heatmap_final'])
    assert np.all((v > 0.0) & (v < 1.0))
    # Zero-init sub-pixel head: flat sigmoid(0) = 0.5 heatmap at init,
    # matching the reference's zero-init final conv behavior.
    np.testing.assert_allclose(v, 0.5, atol=1e-6)
    # State structure identical to the reference topology's (the serving /
    # streaming contract): one (B, 5, 8, 64) CGRU state.
    ref_state = RefineNet().init_state(3, dtype=jnp.float32)
    tpu_state = net.init_state(3, dtype=jnp.float32)
    assert jax.tree_util.tree_structure(ref_state) == \
        jax.tree_util.tree_structure(tpu_state)
    for a, b in zip(jax.tree_util.tree_leaves(ref_state),
                    jax.tree_util.tree_leaves(tpu_state)):
        assert a.shape == b.shape


def test_refine_net_tpu_rejects_wrong_grid(rng):
    net = RefineNetTPU(load_screen_content=False)
    hm = jnp.zeros((1, 36, 64), jnp.float32)
    with pytest.raises(AssertionError, match='72x128'):
        net.init(jax.random.PRNGKey(0), hm, None, screen_size=(64, 36))


def test_eve_forward_tpu_native(rng):
    spec = _spec()
    params = eve_lib.init_params(spec, jax.random.PRNGKey(0))
    batch = _batch(rng)
    out = eve_lib.forward(spec, params, batch, training=False,
                          output_predictions=True)
    B, T = batch['left_eye_patch'].shape[:2]
    assert out['PoG_px_final'].shape == (B, T, 2)
    for k in ('full_loss', 'PoG_px_final', 'PoG_px_initial',
              'left_pupil_size', 'metric_euc_PoG_px_final'):
        assert k in out, k
        assert bool(jnp.all(jnp.isfinite(out[k]))), k


@pytest.mark.slow
def test_eve_grad_tpu_native_finite(rng):
    spec = _spec(compute_dtype='bfloat16')
    params = eve_lib.init_params(spec, jax.random.PRNGKey(0))
    # The zero-init heads block upstream gradients at exactly step 0 (same
    # property as the reference's zero-init heads; the pupil head's ReLU
    # can also clip to zero at init). Perturb them so this test sees the
    # steady-state gradient flow instead of the step-0 special case.
    for path in (('refine_net', 'final_2'), ('eye_net', 'fc_to_gaze_2')):
        node = params
        for p in path[:-1]:
            node = node[p]
        k = node[path[-1]]['kernel']
        node[path[-1]]['kernel'] = 0.01 * jax.random.normal(
            jax.random.PRNGKey(7), k.shape, k.dtype)
    batch = _batch(rng)

    def loss_fn(p):
        out = eve_lib.forward(spec, p, batch, rng=jax.random.PRNGKey(1),
                              training=True)
        return out['full_loss']

    g = jax.jit(jax.grad(loss_fn))(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert leaves
    assert all(bool(jnp.all(jnp.isfinite(x))) for x in leaves)
    # The patchify stems must receive gradient (pixel information flows).
    assert float(jnp.abs(g['eye_net']['cnn']['stem_conv']['kernel']).max()) > 0
    assert float(jnp.abs(g['refine_net']['stem']['kernel']).max()) > 0


@pytest.mark.slow
def test_train_step_tpu_native(rng):
    from eve_tpu.config import DefaultConfig
    from eve_tpu.train import optim as optim_lib
    from eve_tpu.train import step as step_lib
    DefaultConfig._reset_instance_for_testing()
    config = DefaultConfig()
    config.import_dict({'refine_net_enabled': True,
                        'load_screen_content': True,
                        'tpu_native_arch': True,
                        'batch_size': 2})
    spec = eve_lib.EveSpec.from_config(config)
    assert spec.tpu_native_arch
    tx, _ = optim_lib.build_optimizer(config, steps_per_epoch=10)
    state = step_lib.create_train_state(spec, tx, jax.random.PRNGKey(0))
    train_step = step_lib.make_train_step(spec, tx, donate=False)
    batch = _batch(rng)
    p0 = jax.tree_util.tree_map(np.asarray, state.params)
    losses = []
    for i in range(2):
        state, metrics = train_step(state, batch, jax.random.PRNGKey(i))
        losses.append(float(metrics['full_loss']))
    assert all(np.isfinite(losses)), losses
    moved = any(
        not np.allclose(a, np.asarray(b))
        for a, b in zip(jax.tree_util.tree_leaves(p0),
                        jax.tree_util.tree_leaves(state.params)))
    assert moved


@pytest.mark.slow
def test_streaming_chunks_match_full_clip(rng):
    """Two T/2 chunks with carried state == one full-T run (the serving
    engine's streaming contract holds for the TPU-native state too)."""
    spec = _spec()
    params = eve_lib.init_params(spec, jax.random.PRNGKey(0))
    batch = _batch(rng, B=1, T=4)
    full = eve_lib.forward(spec, params, batch, training=False,
                           output_predictions=True)

    state = eve_lib.init_stream_state(spec, 1)
    outs = []
    for t0 in (0, 2):
        chunk = {k: v[:, t0:t0 + 2] if v.ndim >= 2 and v.shape[1] == 4 else v
                 for k, v in batch.items()}
        out = eve_lib.forward(spec, params, chunk, training=False,
                              output_predictions=True,
                              initial_states=state, return_states=True)
        state = out['states']
        outs.append(np.asarray(out['PoG_px_final']))
    chunked = np.concatenate(outs, axis=1)
    np.testing.assert_allclose(chunked, np.asarray(full['PoG_px_final']),
                               rtol=1e-4, atol=0.5)


def test_gated_readout_init_identity(rng):
    """tpu_native_refine_head='gated': at init the residual readout is
    algebraically final = initial + sigmoid(-4) * (heatmap_argmax -
    initial) — i.e. ~98% of the way to 'refinement cannot hurt a good
    initial estimate', the property the heatmap readout provably lacks
    (the ~55-80 px floor, BASELINE.md staged study)."""
    spec = _spec(tpu_native_refine_head='gated')
    params = eve_lib.init_params(spec, jax.random.PRNGKey(0))
    assert 'gate_fc1' in params['refine_net']
    assert 'gate_fc2' in params['refine_net']
    batch = _batch(rng)
    out = eve_lib.forward(spec, params, batch, training=False,
                          output_predictions=True)

    # Reference-semantics readout of the SAME heatmap: drop the gate head
    # params and run the 'heatmap' readout spec.
    params_hm = dict(params)
    params_hm['refine_net'] = {k: v for k, v in params['refine_net'].items()
                               if not k.startswith('gate_')}
    out_hm = eve_lib.forward(_spec(), params_hm, batch, training=False,
                             output_predictions=True)
    sig = 1.0 / (1.0 + np.exp(4.0))
    pi = np.asarray(out['PoG_px_initial'])
    want = pi + sig * (np.asarray(out_hm['PoG_px_final']) - pi)
    np.testing.assert_allclose(np.asarray(out['PoG_px_final']), want,
                               rtol=1e-4, atol=0.05)
    # Gate diagnostic metrics exist and read the init value.
    assert abs(float(out['metric_mean_refine_gate']) - sig) < 1e-4
    assert 'metric_euc_PoG_px_heatmap_final' in out


def test_gated_readout_grad_flow(rng):
    """The PoG-final loss trains the gate head (fc2; fc1 is behind the
    zero-init fc2 kernel at exactly step 0, like every zero-init head in
    the model family)."""
    spec = _spec(tpu_native_refine_head='gated',
                 loss_coeff_PoG_cm_final=0.1)
    params = eve_lib.init_params(spec, jax.random.PRNGKey(0))
    batch = _batch(rng)

    def loss_fn(p):
        out = eve_lib.forward(spec, p, batch, rng=jax.random.PRNGKey(1),
                              training=True)
        return out['full_loss']

    g = jax.grad(loss_fn)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(bool(jnp.all(jnp.isfinite(x))) for x in leaves)
    fc2 = g['refine_net']['gate_fc2']
    assert float(jnp.abs(fc2['kernel']).max()) > 0
    assert float(jnp.abs(fc2['bias']).max()) > 0


@pytest.mark.slow
def test_gated_streaming_chunks_match_full_clip(rng):
    """The streaming contract holds under the gated readout (gate/delta
    are per-frame, stateless)."""
    spec = _spec(tpu_native_refine_head='gated')
    params = eve_lib.init_params(spec, jax.random.PRNGKey(0))
    batch = _batch(rng, B=1, T=4)
    full = eve_lib.forward(spec, params, batch, training=False,
                           output_predictions=True)
    state = eve_lib.init_stream_state(spec, 1)
    outs = []
    for t0 in (0, 2):
        chunk = {k: v[:, t0:t0 + 2] if v.ndim >= 2 and v.shape[1] == 4 else v
                 for k, v in batch.items()}
        out = eve_lib.forward(spec, params, chunk, training=False,
                              output_predictions=True,
                              initial_states=state, return_states=True)
        state = out['states']
        outs.append(np.asarray(out['PoG_px_final']))
    chunked = np.concatenate(outs, axis=1)
    np.testing.assert_allclose(chunked, np.asarray(full['PoG_px_final']),
                               rtol=1e-4, atol=0.5)


def test_gated_readout_requires_tpu_native():
    with pytest.raises(ValueError, match='requires tpu_native_arch'):
        eve_lib.EveSpec(refine_net_enabled=True,
                        tpu_native_refine_head='gated').build_refine_net()
    with pytest.raises(ValueError, match='Unknown tpu_native_refine_head'):
        eve_lib.EveSpec(refine_net_enabled=True, tpu_native_arch=True,
                        tpu_native_refine_head='resnet').build_refine_net()


def test_converters_refuse_tpu_native():
    from eve_tpu.utils import torch_convert as tc
    spec = _spec()
    params = eve_lib.init_params(spec, jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match='patchify'):
        tc.eye_net_params_to_torch(params['eye_net'])
    with pytest.raises(ValueError, match='TPU-native'):
        tc.refine_net_params_to_torch(params['refine_net'])


def test_bootstrap_pretrained_tpu_native_needs_native_weights(tmp_path):
    """tpu_native + *_load_pretrained must refuse the torch release format
    (even if present) and demand the native .npz export instead."""
    from eve_tpu.config import DefaultConfig
    from eve_tpu.utils.load_model import bootstrap_pretrained
    DefaultConfig._reset_instance_for_testing()
    config = DefaultConfig()
    config.import_dict({'tpu_native_arch': True,
                        'eye_net_load_pretrained': True})
    # A torch release file present in the search dir must NOT be eligible.
    (tmp_path / 'eve_eyenet_GRU.pt').write_bytes(b'not-a-real-checkpoint')
    with pytest.raises(FileNotFoundError, match='NOT weight-compatible'):
        bootstrap_pretrained(config, params={},
                             pretrained_dir=str(tmp_path))
    DefaultConfig._reset_instance_for_testing()


def test_bootstrap_pretrained_tpu_native_npz_roundtrip(tmp_path):
    """The native pretrained path: checkpoint submodule .npz files exported
    as eve_eyenet_GRU_tpu.npz / eve_refinenet_CGRU_oa_skip_tpu.npz
    bootstrap a fresh tpu-native model exactly (the staged training
    workflow on the TPU-native topology), for BOTH components."""
    import numpy as np
    from eve_tpu.config import DefaultConfig
    from eve_tpu.train.checkpoint import flatten_tree
    from eve_tpu.utils.load_model import (bootstrap_pretrained,
                                          pretrained_filename)
    spec = _spec()
    params = eve_lib.init_params(spec, jax.random.PRNGKey(7))
    trained = {which: jax.tree.map(lambda x: np.asarray(x) + 1.0,
                                   params[which])
               for which in ('eye_net', 'refine_net')}

    DefaultConfig._reset_instance_for_testing()
    config = DefaultConfig()
    config.import_dict({'tpu_native_arch': True,
                        'refine_net_enabled': True,
                        'eye_net_load_pretrained': True,
                        'refine_net_load_pretrained': True})
    for which in trained:
        fname = pretrained_filename(config, which, fmt='npz')
        assert fname.endswith('_tpu.npz'), fname
        np.savez(tmp_path / fname, **flatten_tree(trained[which]))

    fresh = dict(eve_lib.init_params(spec, jax.random.PRNGKey(8)))
    loaded = bootstrap_pretrained(config, fresh,
                                  pretrained_dir=str(tmp_path))
    assert sorted(loaded) == ['eye_net', 'refine_net']
    for which in trained:
        got = flatten_tree(fresh[which])
        want = flatten_tree(trained[which])
        assert set(got) == set(want)
        for k in want:
            np.testing.assert_array_equal(np.asarray(got[k]),
                                          np.asarray(want[k]),
                                          err_msg='%s/%s' % (which, k))
    DefaultConfig._reset_instance_for_testing()


def test_pretrained_filename_encodes_stem_variant():
    """patchify and patchify8 EyeNets have byte-identical parameter trees
    (only the stride differs), so the shape guard in bootstrap_pretrained
    cannot tell them apart — the FILENAME must (a stride-4 export loading
    into a stride-8 config would be the exact silent-wrong-weights failure
    the refusal machinery exists to prevent). RefineNet has no stem, so
    its filename stays stem-independent."""
    from eve_tpu.config import DefaultConfig
    from eve_tpu.utils.load_model import pretrained_filename
    DefaultConfig._reset_instance_for_testing()
    config = DefaultConfig()
    config.import_dict({'tpu_native_arch': True, 'refine_net_enabled': True})
    assert pretrained_filename(config, 'eye_net', fmt='npz') == \
        'eve_eyenet_GRU_tpu.npz'
    config.import_dict({'tpu_native_stem': 'patchify8'})
    assert pretrained_filename(config, 'eye_net', fmt='npz') == \
        'eve_eyenet_GRU_tpu8.npz'
    assert pretrained_filename(config, 'refine_net', fmt='npz').endswith(
        '_tpu.npz')
    DefaultConfig._reset_instance_for_testing()


def test_bootstrap_refuses_wrong_stem_variant(tmp_path):
    """An eye_net npz exported from a stride-4 ('_tpu') run must NOT load
    into a --tpu-native-stem patchify8 config: the patchify8 lookup name is
    '_tpu8', so the '_tpu' file is simply not found and bootstrap raises."""
    import numpy as np
    import pytest
    from eve_tpu.config import DefaultConfig
    from eve_tpu.train.checkpoint import flatten_tree
    from eve_tpu.utils.load_model import bootstrap_pretrained
    spec = _spec()
    params = eve_lib.init_params(spec, jax.random.PRNGKey(7))
    DefaultConfig._reset_instance_for_testing()
    config = DefaultConfig()
    config.import_dict({'tpu_native_arch': True,
                        'tpu_native_stem': 'patchify8',
                        'eye_net_load_pretrained': True})
    np.savez(tmp_path / 'eve_eyenet_GRU_tpu.npz',
             **flatten_tree(params['eye_net']))
    with pytest.raises(FileNotFoundError, match='eve_eyenet_GRU_tpu8.npz'):
        bootstrap_pretrained(config, dict(params),
                             pretrained_dir=str(tmp_path))
    DefaultConfig._reset_instance_for_testing()


def test_unknown_stem_raises(rng):
    """A typo'd stem value must raise at trace time, not silently build
    the reference stem under _tpu-marked filenames (ADVICE r4)."""
    import pytest
    from eve_tpu.models.resnet import ResNet18IN
    model = ResNet18IN(num_classes=8, stem='patchify4')
    x = jnp.zeros((1, 48, 48, 3), jnp.float32)
    with pytest.raises(ValueError, match='Unknown ResNet18IN stem'):
        model.init(jax.random.PRNGKey(0), x)


def test_default_arch_unchanged():
    spec = eve_lib.EveSpec(refine_net_enabled=True)
    assert isinstance(spec.build_refine_net(), RefineNet)
    assert spec.build_eye_net().stem == 'reference'
    spec_tpu = _spec()
    assert isinstance(spec_tpu.build_refine_net(), RefineNetTPU)
    assert spec_tpu.build_eye_net().stem == 'patchify'


def test_patchify8_stem_variant(rng):
    """tpu_native_stem='patchify8' (8x8/8 coarse stem): same param
    STRUCTURE as 'patchify' (only the stride differs), working forward +
    finite loss gradient, and the config key plumbs through EveSpec."""
    from eve_tpu.config import DefaultConfig
    spec8 = _spec(tpu_native_stem='patchify8', compute_dtype='float32')
    spec4 = _spec(compute_dtype='float32')
    assert spec8.build_eye_net().stem == 'patchify8'

    p8 = eve_lib.init_params(spec8, jax.random.PRNGKey(0))
    p4 = eve_lib.init_params(spec4, jax.random.PRNGKey(0))
    s8 = jax.tree_util.tree_structure(p8)
    s4 = jax.tree_util.tree_structure(p4)
    assert s8 == s4  # stride-only change: identical parameter trees

    # Zero-init heads block upstream gradients at exactly step 0 (the
    # reference's own property); perturb them so the stem-gradient check
    # below sees steady-state flow.
    for path in (('refine_net', 'final_2'), ('eye_net', 'fc_to_gaze_2')):
        node = p8
        for p in path[:-1]:
            node = node[p]
        k = node[path[-1]]['kernel']
        node[path[-1]]['kernel'] = 0.01 * jax.random.normal(
            jax.random.PRNGKey(7), k.shape, k.dtype)

    # 128px eyes: the stride-8 stem reaches layer4 at 2x2 — below 65px it
    # would be 1x1, where instance norm erases the pixel signal (the
    # stem-aware warning threshold in resnet.py).
    batch = _batch(rng, eyes=128)

    def loss(params):
        out = eve_lib.forward(spec8, params, batch, training=False,
                              output_predictions=True)
        return jnp.mean(out['PoG_px_final']), out

    (val, out), grads = jax.value_and_grad(loss, has_aux=True)(p8)
    assert np.isfinite(float(val))
    assert out['PoG_px_final'].shape == (2, 2, 2)
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in leaves)
    # The stem conv itself receives gradient (pixels -> gaze path alive).
    g_stem = np.asarray(grads['eye_net']['cnn']['stem_conv']['kernel'])
    assert np.any(g_stem != 0)

    DefaultConfig._reset_instance_for_testing()
    config = DefaultConfig()
    config.import_dict({'tpu_native_arch': True,
                        'tpu_native_stem': 'patchify8'})
    assert eve_lib.EveSpec.from_config(config).tpu_native_stem == 'patchify8'
    DefaultConfig._reset_instance_for_testing()
