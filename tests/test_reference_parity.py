"""Numerical parity against the ACTUAL reference implementation.

These tests import the read-only reference checkout at /root/reference/src
(torch-only modules: models/common.py and models/refine_net.py — EyeNet
needs torchvision, which this image lacks; its topology is covered by the
restated oracle in torch_oracles.py + tests/test_resnet_parity.py) and
compare outputs value-for-value with the eve_tpu ops/modules, removing any
"oracle restates the reference wrong" risk from the parity story.

Skipped automatically when the reference checkout is absent.
"""

import os
import sys
import types

import numpy as np
import pytest

from eve_tpu.utils.reference_bridge import (
    REF_SRC, install_logging_stubs,
    install_torchvision_resnet_stub as _install_torchvision_resnet_stub_impl)

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_SRC), reason='reference checkout not available')


@pytest.fixture(scope='module')
def ref():
    """Import the reference model modules (with stubs for the third-party
    logging deps its ``core`` package pulls in at import time)."""
    torch = pytest.importorskip('torch')
    install_logging_stubs()

    sys.path.insert(0, REF_SRC)
    try:
        import models.common as ref_common
        import models.refine_net as ref_refine
        from core import DefaultConfig as RefConfig
        ns = types.SimpleNamespace(
            torch=torch, common=ref_common, refine=ref_refine,
            config=RefConfig())
        yield ns
    finally:
        sys.path.remove(REF_SRC)


def _to_torch_batch(torch, batch_np):
    """NHWC numpy batch -> the reference's NCHW torch batch (image keys
    permuted, validity flags bool-cast as the real dataset ships them)."""
    torch_batch = {}
    for k, v in batch_np.items():
        t = _t(torch, v)
        if k.endswith('eye_patch') or k == 'screen_frame':
            t = t.permute(0, 1, 4, 2, 3).contiguous()
        elif k.endswith('_validity'):
            t = t.bool()
        torch_batch[k] = t
    return torch_batch


def _t(torch, a):
    return torch.tensor(np.asarray(a, np.float32))


@pytest.fixture
def geom_batch():
    rng = np.random.RandomState(7)
    N = 16
    pitchyaw = rng.uniform(-0.7, 0.7, (N, 2)).astype(np.float32)
    origin = np.stack([rng.uniform(-60, 60, N), rng.uniform(-40, 40, N),
                       rng.uniform(450, 700, N)], -1).astype(np.float32)
    R = np.stack([_rotation(rng.uniform(-0.3, 0.3, 2)) for _ in range(N)])
    cam_T = np.tile(np.eye(4, dtype=np.float32), (N, 1, 1))
    cam_T[:, :3, 3] = rng.uniform(-25, 25, (N, 3))
    for i in range(N):
        cam_T[i, :3, :3] = _rotation(rng.uniform(-0.15, 0.15, 2))
    inv_cam_T = np.linalg.inv(cam_T).astype(np.float32)
    ppm = np.tile(np.array([[1920 / 530.0, 1080 / 300.0]], np.float32),
                  (N, 1))
    return dict(pitchyaw=pitchyaw, origin=origin, R=R, cam_T=cam_T,
                inv_cam_T=inv_cam_T, ppm=ppm, rng=rng, N=N)


def _rotation(pitchyaw):
    from eve_tpu.ops import geometry as geo
    import jax.numpy as jnp
    return np.asarray(geo.pitchyaw_to_rotation(jnp.asarray(
        np.asarray(pitchyaw, np.float32))))


def test_pitchyaw_vector_rotation_vs_reference(ref, geom_batch):
    from eve_tpu.ops import geometry as geo
    import jax.numpy as jnp
    torch = ref.torch
    py = geom_batch['pitchyaw']

    v_ref = ref.common.pitchyaw_to_vector(_t(torch, py)).numpy()
    v_ours = np.asarray(geo.pitchyaw_to_vector(jnp.asarray(py)))
    np.testing.assert_allclose(v_ours, v_ref, atol=1e-6)

    back_ref = ref.common.vector_to_pitchyaw(_t(torch, v_ref)).numpy()
    back_ours = np.asarray(geo.vector_to_pitchyaw(jnp.asarray(v_ours)))
    np.testing.assert_allclose(back_ours, back_ref, atol=1e-5)

    R_ref = ref.common.pitchyaw_to_rotation(_t(torch, py)).numpy()
    R_ours = np.asarray(geo.pitchyaw_to_rotation(jnp.asarray(py)))
    np.testing.assert_allclose(R_ours, R_ref, atol=1e-6)

    g_ref = ref.common.rotation_to_vector(_t(torch, R_ref)).numpy()
    g_ours = np.asarray(geo.rotation_to_vector(jnp.asarray(R_ours)))
    np.testing.assert_allclose(g_ours, g_ref, atol=1e-5)


def test_to_screen_coordinates_vs_reference(ref, geom_batch):
    from eve_tpu.ops import geometry as geo
    import jax.numpy as jnp
    torch = ref.torch
    b = geom_batch

    ref_dict = {
        'inv_camera_transformation': _t(torch, b['inv_cam_T']),
        'pixels_per_millimeter': _t(torch, b['ppm']),
    }
    mm_ref, px_ref = ref.common.to_screen_coordinates(
        _t(torch, b['origin']), _t(torch, b['pitchyaw']),
        _t(torch, b['R']), ref_dict)
    mm_ours, px_ours = geo.to_screen_coordinates(
        jnp.asarray(b['origin']), jnp.asarray(b['pitchyaw']),
        jnp.asarray(b['R']),
        {'inv_camera_transformation': jnp.asarray(b['inv_cam_T']),
         'pixels_per_millimeter': jnp.asarray(b['ppm'])})
    np.testing.assert_allclose(np.asarray(mm_ours), mm_ref.numpy(),
                               rtol=1e-4, atol=2e-3)
    np.testing.assert_allclose(np.asarray(px_ours), px_ref.numpy(),
                               rtol=1e-4, atol=2e-2)


def test_combined_gaze_and_offset_augmentation_vs_reference(ref, geom_batch):
    from eve_tpu.ops import geometry as geo
    import jax.numpy as jnp
    torch = ref.torch
    b = geom_batch
    PoG_mm = np.stack([b['rng'].uniform(50, 480, b['N']),
                       b['rng'].uniform(30, 270, b['N'])],
                      -1).astype(np.float32)

    g_ref = ref.common.calculate_combined_gaze_direction(
        _t(torch, b['origin']), _t(torch, PoG_mm), _t(torch, b['R']),
        _t(torch, b['cam_T'])).numpy()
    g_ours = np.asarray(geo.calculate_combined_gaze_direction(
        jnp.asarray(b['origin']), jnp.asarray(PoG_mm), jnp.asarray(b['R']),
        jnp.asarray(b['cam_T'])))
    np.testing.assert_allclose(g_ours, g_ref, atol=1e-5)

    kappa = b['rng'].normal(0, 0.05, (b['N'], 2)).astype(np.float32)
    for inverse in (False, True):
        aug_ref = ref.common.apply_offset_augmentation(
            _t(torch, b['pitchyaw']), _t(torch, b['R']), _t(torch, kappa),
            inverse_kappa=inverse).numpy()
        aug_ours = np.asarray(geo.apply_offset_augmentation(
            jnp.asarray(b['pitchyaw']), jnp.asarray(b['R']),
            jnp.asarray(kappa), inverse_kappa=inverse))
        np.testing.assert_allclose(aug_ours, aug_ref, atol=1e-5,
                                   err_msg='inverse=%s' % inverse)


def test_heatmap_and_soft_argmax_vs_reference(ref):
    from eve_tpu.ops import heatmap as hm_ops
    import jax.numpy as jnp
    torch = ref.torch
    rng = np.random.RandomState(3)
    N = 8
    centres = np.stack([rng.uniform(-50, 1970, N),
                        rng.uniform(-50, 1130, N)], -1).astype(np.float32)

    for sigma in (10.0, 3.0, 5.0):
        hm_ref = ref.common.batch_make_heatmaps(
            _t(torch, centres), sigma).numpy()          # (N, 1, H, W)
        hm_ours = np.asarray(hm_ops.make_heatmaps(
            jnp.asarray(centres), sigma))                # (N, H, W)
        np.testing.assert_allclose(hm_ours, hm_ref[:, 0], atol=1e-6,
                                   err_msg='sigma=%s' % sigma)

    heat = ref.common.batch_make_heatmaps(_t(torch, centres), 10.0)
    px_ref = ref.common.soft_argmax(heat).numpy()
    px_ours = np.asarray(hm_ops.soft_argmax(
        jnp.asarray(heat.numpy()[:, 0])))
    np.testing.assert_allclose(px_ours, px_ref, rtol=1e-5, atol=5e-2)


def test_gaze_history_map_vs_reference(ref):
    """Our O(T) scan recurrence vs the reference's per-step O(T^2)
    re-reduction, including a zero-timestamp (padded) frame."""
    from eve_tpu.ops import heatmap as hm_ops
    import jax.numpy as jnp
    torch = ref.torch
    rng = np.random.RandomState(11)
    B, T = 2, 5
    centres = np.stack([rng.uniform(100, 1800, (B, T)),
                        rng.uniform(100, 1000, (B, T))],
                       -1).astype(np.float32)
    # ~30 ms apart; frame 3 of item 1 is padded (timestamp 0, validity 0).
    ts = np.arange(1, T + 1, dtype=np.float32)[None, :] * 3.3e7 \
        + np.array([[0.0], [7e6]], np.float32)
    validity = np.ones((B, T), np.float32)
    ts[1, 3] = 0.0
    validity[1, 3] = 0.0

    hms = np.asarray(hm_ops.make_heatmaps(jnp.asarray(centres), 3.0))
    ours = np.asarray(hm_ops.decayed_history_scan(
        jnp.asarray(hms), jnp.asarray(ts), jnp.asarray(validity)))

    heat_list = [_t(torch, hms[:, t:t + 1]) for t in range(T)]
    for t in range(T):
        got_ref = ref.common.batch_make_gaze_history_maps(
            _t(torch, ts), heat_list[:t + 1], _t(torch, validity)).numpy()
        np.testing.assert_allclose(ours[:, t], got_ref[:, 0],
                                   rtol=1e-4, atol=1e-5,
                                   err_msg='t=%d' % t)


@pytest.mark.parametrize('rnn_type', ['CGRU', 'CLSTM', 'CRNN'])
def test_refine_net_full_vs_reference(ref, rnn_type):
    """Full RefineNet (enc-dec pyramid + conv-RNN bottleneck + skips, screen
    content on) with the REFERENCE's own weights converted through
    torch_convert: per-timestep reference loop vs our batched encoder /
    scanned cell / batched decoder. CLSTM pins the reference's carry-only
    quirk (the cell output is discarded; only state advances —
    refine_net.py:167-176)."""
    import jax
    import jax.numpy as jnp
    from eve_tpu.models.refine_net import RefineNet
    from eve_tpu.utils import torch_convert
    torch = ref.torch

    ref.config.override('load_screen_content', True)
    ref.config.override('refine_net_rnn_type', rnn_type)
    try:
        net = ref.refine.RefineNet()
        # The final conv is zero-initialized (sigmoid -> 0.5 everywhere);
        # randomize it so the comparison is non-trivial.
        with torch.no_grad():
            torch.nn.init.normal_(net.final[-2].weight, std=0.5)
        net.eval()

        sd = torch_convert.torch_state_dict_to_numpy(net.state_dict())
        params = torch_convert.convert_refine_net(sd)

        rng = np.random.RandomState(5)
        B, T, h, w = 2, 3, 72, 128
        from eve_tpu.ops import heatmap as hm_ops
        centres = np.stack([rng.uniform(100, 1800, (B, T)),
                            rng.uniform(100, 1000, (B, T))],
                           -1).astype(np.float32)
        heatmap = np.asarray(hm_ops.make_heatmaps(
            jnp.asarray(centres), 10.0), np.float32)     # (B, T, h, w)
        screen = rng.uniform(0, 1, (B, T, h, w, 3)).astype(np.float32)

        # Reference: python loop over t with dict-threaded CGRU state.
        outs_ref = []
        prev = None
        with torch.no_grad():
            for t in range(T):
                out_dict = {'heatmap_initial':
                            _t(torch, heatmap[:, t][:, None])}
                in_dict = {'screen_frame':
                           _t(torch, screen[:, t].transpose(0, 3, 1, 2))}
                net(in_dict, out_dict, prev)
                outs_ref.append(out_dict['heatmap_final'].numpy()[:, 0])
                prev = out_dict
        ref_final = np.stack(outs_ref, 1)                # (B, T, h, w)

        # Ours: batched encoder -> scanned bottleneck -> batched decoder
        # (the same staging eve.forward uses).
        ours = RefineNet(load_screen_content=True, use_skip_connections=True,
                         use_rnn=True, rnn_type=rnn_type, num_features=64,
                         clstm_carry_only=True)
        rnp = {'params': params}
        net_in = ours.apply(rnp, jnp.asarray(heatmap), jnp.asarray(screen),
                            screen_size=(128, 72),
                            method=RefineNet.assemble_input)
        flat = net_in.reshape((B * T,) + net_in.shape[2:])
        bottleneck_in, skips = ours.apply(rnp, flat, method=RefineNet.encode)
        bt = bottleneck_in.reshape((B, T) + bottleneck_in.shape[1:])

        def cell_step(carry, x):
            out, new_carry = ours.apply(rnp, x, carry,
                                        method=RefineNet.bottleneck_step)
            return new_carry, out

        _, scanned = jax.lax.scan(cell_step, ours.init_state(B),
                                  jnp.moveaxis(bt, 1, 0))
        bottleneck_out = jnp.moveaxis(scanned, 0, 1).reshape(
            (B * T,) + bottleneck_in.shape[1:])
        final = ours.apply(rnp, bottleneck_out, skips,
                           method=RefineNet.decode)
        ours_final = np.asarray(final).reshape(B, T, h, w)

        np.testing.assert_allclose(ours_final, ref_final,
                                   rtol=1e-3, atol=2e-4)
    finally:
        ref.config.override('load_screen_content', False)
        ref.config.override('refine_net_rnn_type', 'CGRU')


def test_losses_vs_reference(ref):
    """All five loss classes against the reference implementations,
    including the validity edge cases (all-invalid row: contributes 0;
    exactly one valid frame: NOT normalized; several valid: mean)."""
    sys.path.insert(0, REF_SRC)
    try:
        from losses.angular import AngularLoss
        from losses.cross_entropy import CrossEntropyLoss
        from losses.euclidean import EuclideanLoss
        from losses.l1 import L1Loss
        from losses.mse import MSELoss
    finally:
        sys.path.remove(REF_SRC)
    import jax.numpy as jnp
    from eve_tpu import losses as losses_lib
    torch = ref.torch
    rng = np.random.RandomState(13)
    B, T = 4, 5
    validity = np.ones((B, T), np.float32)
    validity[1] = 0.0                     # all-invalid item
    validity[2, 1:] = 0.0                 # exactly one valid frame
    validity[3, ::2] = 0.0                # mixed

    def compare(name, ref_loss, ours_fn, pred, gt):
        ref_dict = {'k': _t(torch, gt), 'k_validity': _t(torch, validity)}
        want = float(ref_loss(_t(torch, pred), 'k', ref_dict))
        got = float(ours_fn(jnp.asarray(pred), jnp.asarray(gt),
                            jnp.asarray(validity)))
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-5,
                                   err_msg=name)

    pred2 = rng.uniform(-0.6, 0.6, (B, T, 2)).astype(np.float32)
    gt2 = rng.uniform(-0.6, 0.6, (B, T, 2)).astype(np.float32)
    compare('angular', AngularLoss(), losses_lib.angular_loss, pred2, gt2)
    compare('mse', MSELoss(), losses_lib.mse_loss, pred2, gt2)
    compare('euclidean', EuclideanLoss(), losses_lib.euclidean_loss,
            pred2, gt2)

    pred1 = rng.uniform(1, 5, (B, T)).astype(np.float32)
    gt1 = rng.uniform(1, 5, (B, T)).astype(np.float32)
    compare('l1', L1Loss(), losses_lib.l1_loss, pred1, gt1)

    pred_hm = rng.uniform(0.02, 0.98, (B, T, 9, 16)).astype(np.float32)
    gt_hm = rng.uniform(0.0, 1.0, (B, T, 9, 16)).astype(np.float32)
    compare('bce', CrossEntropyLoss(), losses_lib.cross_entropy_loss,
            pred_hm, gt_hm)


def test_numpy_gaze_utils_vs_reference(ref):
    """core/gaze.py numpy twins (distinct sign convention from the torch
    ops — SURVEY.md section 2.1 'Numpy gaze utils')."""
    sys.path.insert(0, REF_SRC)
    try:
        from core import gaze as ref_gaze
    finally:
        sys.path.remove(REF_SRC)
    from eve_tpu.utils import gaze_np
    rng = np.random.RandomState(17)
    py_a = rng.uniform(-0.6, 0.6, (12, 2)).astype(np.float32)
    py_b = rng.uniform(-0.6, 0.6, (12, 2)).astype(np.float32)
    np.testing.assert_allclose(
        gaze_np.pitchyaw_to_vector(py_a),
        ref_gaze.pitchyaw_to_vector(py_a), atol=1e-6)
    np.testing.assert_allclose(
        gaze_np.angular_error(py_a, py_b),
        ref_gaze.angular_error(py_a, py_b), atol=1e-4)


def _install_torchvision_resnet_stub(torch):
    """Shared shim (eve_tpu/utils/reference_bridge.py): faithful
    torchvision.models.resnet stand-in, numerics pinned by
    tests/test_resnet_parity.py + the fingerprint test."""
    _install_torchvision_resnet_stub_impl(torch)


@pytest.mark.parametrize('eye_rnn', ['GRU', 'LSTM', 'RNN'])
def test_full_eve_composite_vs_reference(ref, eye_rnn):
    """The whole EVE composite — label derivation, per-eye EyeNet (each
    dense RNN cell type), gaze->screen projection, heatmap render,
    RefineNet (ConvGRU + screen), soft-argmax, all ~20 losses/metrics —
    against the reference's own eve.py forward with shared (converted)
    weights, eval mode."""
    import jax
    import jax.numpy as jnp
    from eve_tpu.models import eve as eve_lib
    from eve_tpu.utils import torch_convert
    torch = ref.torch
    _install_torchvision_resnet_stub(torch)

    overrides = {'refine_net_enabled': True, 'load_screen_content': True,
                 'eye_net_rnn_type': eye_rnn}
    for k, v in overrides.items():
        ref.config.override(k, v)
    sys.path.insert(0, REF_SRC)
    try:
        import models.eve as ref_eve_mod
        ref_model = ref_eve_mod.EVE(output_predictions=True)
        ref_model.eval()

        eye_sd = torch_convert.torch_state_dict_to_numpy(
            ref_model.eye_net.state_dict())
        refine_sd = torch_convert.torch_state_dict_to_numpy(
            ref_model.refine_net.state_dict())
        params = {'eye_net': torch_convert.convert_eye_net(eye_sd),
                  'refine_net': torch_convert.convert_refine_net(refine_sd)}

        rng = np.random.RandomState(23)
        B, T = 2, 3
        from eve_tpu.data.synthetic import make_synthetic_batch
        batch_np = make_synthetic_batch(rng, batch_size=B, sequence_len=T,
                                        eyes_size=128)

        torch_batch = _to_torch_batch(torch, batch_np)
        with torch.no_grad():
            out_ref = ref_model(torch_batch)

        spec = eve_lib.EveSpec(refine_net_enabled=True,
                               load_screen_content=True,
                               eye_net_rnn_type=eye_rnn)
        batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
        out = eve_lib.forward(spec, params, batch, training=False,
                              output_predictions=True)

        def cmp(key, rtol, atol):
            assert key in out_ref, 'reference lacks %s' % key
            assert key in out, 'ours lacks %s' % key
            np.testing.assert_allclose(
                np.asarray(out[key], np.float32),
                out_ref[key].detach().numpy().astype(np.float32),
                rtol=rtol, atol=atol, err_msg=key)

        cmp('left_pupil_size', 1e-3, 1e-3)
        cmp('right_pupil_size', 1e-3, 1e-3)
        cmp('g_initial', 1e-3, 2e-4)
        cmp('PoG_px_initial', 1e-3, 0.5)
        cmp('PoG_px_final', 1e-3, 1.0)
        cmp('PoG_cm_final', 1e-3, 0.05)
        cmp('g_final', 1e-3, 2e-4)
        # Scalar losses/metrics (the full reference naming scheme).
        scalar_keys = [k for k, v in out_ref.items()
                       if hasattr(v, 'ndim') and v.ndim == 0]
        assert 'metric_euc_PoG_px_final' in scalar_keys
        assert 'loss_ce_heatmap_final' in scalar_keys
        for k in scalar_keys:
            if k not in out:
                continue
            want = float(out_ref[k])
            got = float(out[k])
            np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3,
                                       err_msg=k)
        compared = [k for k in scalar_keys if k in out]
        assert len(compared) >= 10, compared
    finally:
        sys.path.remove(REF_SRC)
        for k in overrides:
            ref.config.override(k, getattr(type(ref.config), k))


def test_full_eve_composite_training_mode_vs_reference(ref):
    """Training-mode composite parity: the kappa offset-augmentation
    branches (augmented predictions + *_unaugmented loss inputs) and the
    training loss/metric wiring, with identical kappas on both sides (the
    reference draws from the global np.random stream; ours accepts
    caller-supplied kappas)."""
    import jax.numpy as jnp
    from eve_tpu.models import eve as eve_lib
    from eve_tpu.utils import torch_convert
    torch = ref.torch
    _install_torchvision_resnet_stub(torch)

    overrides = {'refine_net_enabled': True, 'load_screen_content': True}
    for k, v in overrides.items():
        ref.config.override(k, v)
    sys.path.insert(0, REF_SRC)
    try:
        import models.eve as ref_eve_mod
        ref_model = ref_eve_mod.EVE(output_predictions=True)
        ref_model.train()

        params = {
            'eye_net': torch_convert.convert_eye_net(
                torch_convert.torch_state_dict_to_numpy(
                    ref_model.eye_net.state_dict())),
            'refine_net': torch_convert.convert_refine_net(
                torch_convert.torch_state_dict_to_numpy(
                    ref_model.refine_net.state_dict())),
        }

        rng = np.random.RandomState(29)
        B, T = 2, 3
        from eve_tpu.data.synthetic import make_synthetic_batch
        batch_np = make_synthetic_batch(rng, batch_size=B, sequence_len=T,
                                        eyes_size=128)

        # Pin the kappas: the reference consumes the global np.random
        # stream (left draw, then right — eve.py:468); replicate it.
        std = np.radians(float(ref.config.refine_net_offset_augmentation_sigma))
        np.random.seed(1234)
        twin = np.random.RandomState(1234)
        kappa_l = twin.normal(size=(B, 2), loc=0.0, scale=std)
        kappa_r = twin.normal(size=(B, 2), loc=0.0, scale=std)

        torch_batch = _to_torch_batch(torch, batch_np)
        with torch.no_grad():
            out_ref = ref_model({'eve': torch_batch}, current_epoch=0.0)

        spec = eve_lib.EveSpec(refine_net_enabled=True,
                               load_screen_content=True)
        batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
        batch['left_kappa_fake'] = jnp.asarray(np.repeat(
            kappa_l[:, None].astype(np.float32), T, axis=1))
        batch['right_kappa_fake'] = jnp.asarray(np.repeat(
            kappa_r[:, None].astype(np.float32), T, axis=1))
        out = eve_lib.forward(spec, params, batch, training=True,
                              output_predictions=True)

        scalar_keys = [k for k, v in out_ref.items()
                       if hasattr(v, 'ndim') and v.ndim == 0]
        # The augmentation-specific branches must be present on both sides.
        assert 'metric_euc_PoG_px_initial_unaugmented' in scalar_keys
        assert 'metric_euc_PoG_px_initial_unaugmented' in out
        compared = 0
        for k in scalar_keys:
            if k not in out:
                continue
            np.testing.assert_allclose(float(out[k]), float(out_ref[k]),
                                       rtol=2e-3, atol=2e-3, err_msg=k)
            compared += 1
        assert compared >= 12, compared
    finally:
        sys.path.remove(REF_SRC)
        for k in overrides:
            ref.config.override(k, getattr(type(ref.config), k))


def test_create_images_outputs_vs_reference(ref):
    """The visualization outputs (gaze-history maps, heatmap snapshots)
    match the reference with shared weights — in particular the REFINED
    history, which accumulates the raw refined heatmaps themselves
    (reference eve.py:150-155), not re-rendered Gaussians."""
    import jax.numpy as jnp
    from eve_tpu.models import eve as eve_lib
    from eve_tpu.utils import torch_convert
    torch = ref.torch
    _install_torchvision_resnet_stub(torch)

    overrides = {'refine_net_enabled': True, 'load_screen_content': True}
    for k, v in overrides.items():
        ref.config.override(k, v)
    sys.path.insert(0, REF_SRC)
    try:
        import models.eve as ref_eve_mod
        ref_model = ref_eve_mod.EVE(output_predictions=True)
        ref_model.eval()
        eye_sd = torch_convert.torch_state_dict_to_numpy(
            ref_model.eye_net.state_dict())
        refine_sd = torch_convert.torch_state_dict_to_numpy(
            ref_model.refine_net.state_dict())
        params = {'eye_net': torch_convert.convert_eye_net(eye_sd),
                  'refine_net': torch_convert.convert_refine_net(refine_sd)}

        rng = np.random.RandomState(29)
        from eve_tpu.data.synthetic import make_synthetic_batch
        batch_np = make_synthetic_batch(rng, batch_size=2, sequence_len=3,
                                        eyes_size=128)
        torch_batch = _to_torch_batch(torch, batch_np)
        with torch.no_grad():
            out_ref = ref_model(torch_batch, create_images=True)

        spec = eve_lib.EveSpec(refine_net_enabled=True,
                               load_screen_content=True)
        batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
        out = eve_lib.forward(spec, params, batch, training=False,
                              output_predictions=True, create_images=True)

        for key, atol in (('initial_gaze_history', 2e-3),
                          ('refined_gaze_history', 2e-3),
                          ('initial_heatmap', 2e-3),
                          ('final_heatmap', 2e-3)):
            assert key in out_ref, key
            assert key in out, key
            want = out_ref[key].detach().numpy().astype(np.float32)
            if want.ndim == 4 and want.shape[1] == 1:
                want = want[:, 0]  # reference keeps the NCHW channel axis
            np.testing.assert_allclose(
                np.asarray(out[key], np.float32), want,
                rtol=1e-3, atol=atol, err_msg=key)
    finally:
        sys.path.remove(REF_SRC)
        for k in overrides:
            ref.config.override(k, getattr(type(ref.config), k))


@pytest.mark.slow
def test_full_loss_gradients_vs_reference(ref):
    """End-to-end GRADIENT parity: d full_loss / d params matches the
    reference's torch autograd with shared weights — pins the whole
    backward chain (losses -> soft-argmax -> RefineNet -> projection ->
    heatmaps -> EyeNet -> ResNet) in one assertion set."""
    import jax
    import jax.numpy as jnp
    from eve_tpu.models import eve as eve_lib
    from eve_tpu.utils import torch_convert
    torch = ref.torch
    _install_torchvision_resnet_stub(torch)

    overrides = {'refine_net_enabled': True, 'load_screen_content': True}
    for k, v in overrides.items():
        ref.config.override(k, v)
    sys.path.insert(0, REF_SRC)
    try:
        import models.eve as ref_eve_mod
        ref_model = ref_eve_mod.EVE(output_predictions=True)
        ref_model.eval()  # eval mode: no offset-augmentation randomness
        # The zero-initialized head layers (gaze fc, refine final conv)
        # mathematically zero the gradients of everything upstream of
        # them; perturb them so gradient flow reaches the backbones.
        with torch.no_grad():
            gen = torch.Generator().manual_seed(17)
            for w in (ref_model.eye_net.fc_to_gaze[-2].weight,
                      ref_model.refine_net.final[2].weight):
                w.copy_(torch.empty_like(w).uniform_(-0.01, 0.01,
                                                     generator=gen))
        eye_sd = torch_convert.torch_state_dict_to_numpy(
            ref_model.eye_net.state_dict())
        refine_sd = torch_convert.torch_state_dict_to_numpy(
            ref_model.refine_net.state_dict())
        params = {'eye_net': torch_convert.convert_eye_net(eye_sd),
                  'refine_net': torch_convert.convert_refine_net(refine_sd)}

        rng = np.random.RandomState(31)
        from eve_tpu.data.synthetic import make_synthetic_batch
        batch_np = make_synthetic_batch(rng, batch_size=2, sequence_len=3,
                                        eyes_size=128)
        torch_batch = _to_torch_batch(torch, batch_np)

        out_ref = ref_model(torch_batch)  # NOT no_grad: we backward below
        ref_model.zero_grad()
        out_ref['full_loss'].backward()

        spec = eve_lib.EveSpec(refine_net_enabled=True,
                               load_screen_content=True)
        batch = {k: jnp.asarray(v) for k, v in batch_np.items()}

        def loss_fn(p):
            return eve_lib.forward(spec, p, batch, training=False,
                                   output_predictions=True)['full_loss']

        grads = jax.grad(loss_fn)(params)

        # (ours path, torch param, transform torch grad -> our layout)
        def lin(g):  # torch Linear (O, I) -> (I, O)
            return g.T

        def conv(g):  # torch conv (O, I, kh, kw) -> HWIO
            return np.transpose(g, (2, 3, 1, 0))

        # Shallow heads compare element-wise; the two backbone-entry
        # tensors sit at the end of the longest backward chains (through
        # the beta=100 soft-argmax backward, which amplifies f32
        # reordering noise quadratically), so they compare by direction
        # (cosine) and magnitude (norm ratio) instead.
        checks = [
            (('eye_net', 'fc_to_gaze_0', 'kernel'),
             ref_model.eye_net.fc_to_gaze[0].weight.grad, lin, False),
            (('eye_net', 'fc_common_0', 'kernel'),
             ref_model.eye_net.fc_common[0].weight.grad, lin, False),
            (('eye_net', 'cnn', 'conv1', 'kernel'),
             ref_model.eye_net.cnn_layers.conv1.weight.grad, conv, True),
            (('refine_net', 'final_2', 'kernel'),
             ref_model.refine_net.final[2].weight.grad, conv, False),
            (('refine_net', 'initial_0', 'kernel'),
             ref_model.refine_net.initial[0].weight.grad, conv, True),
        ]
        for path, torch_grad, tf, deep in checks:
            node = grads
            for part in path:
                node = node[part]
            ours = np.asarray(node, np.float32).ravel()
            want = tf(torch_grad.detach().numpy().astype(np.float32)).ravel()
            name = '/'.join(path)
            if deep:
                cos = float(np.dot(ours, want) /
                            (np.linalg.norm(ours) * np.linalg.norm(want)
                             + 1e-12))
                ratio = float(np.linalg.norm(ours) /
                              (np.linalg.norm(want) + 1e-12))
                assert cos > 0.999, (name, cos)
                assert abs(ratio - 1.0) < 1e-2, (name, ratio)
            else:
                scale = max(np.abs(want).max(), 1e-8)
                np.testing.assert_allclose(
                    ours / scale, want / scale, rtol=5e-3, atol=2e-3,
                    err_msg=name)
            assert np.abs(want).max() > 0, 'zero reference grad at %s' % (
                '/'.join(path),)
    finally:
        sys.path.remove(REF_SRC)
        for k in overrides:
            ref.config.override(k, getattr(type(ref.config), k))
