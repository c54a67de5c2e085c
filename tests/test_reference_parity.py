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

REF_SRC = '/root/reference/src'

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_SRC), reason='reference checkout not available')


@pytest.fixture(scope='module')
def ref():
    """Import the reference model modules (with stubs for the third-party
    logging deps its ``core`` package pulls in at import time)."""
    torch = pytest.importorskip('torch')
    for name in ('gspread', 'tensorboardX', 'torchvision'):
        sys.modules.setdefault(name, types.ModuleType(name))
    if not hasattr(sys.modules['tensorboardX'], 'SummaryWriter'):
        sys.modules['tensorboardX'].SummaryWriter = object
    oauth_sa = types.ModuleType('oauth2client.service_account')
    oauth_sa.ServiceAccountCredentials = object
    oauth = types.ModuleType('oauth2client')
    oauth.service_account = oauth_sa
    sys.modules.setdefault('oauth2client', oauth)
    sys.modules.setdefault('oauth2client.service_account', oauth_sa)

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


def test_refine_net_full_vs_reference(ref):
    """Full RefineNet (enc-dec pyramid + ConvGRU bottleneck + skips, screen
    content on) with the REFERENCE's own weights converted through
    torch_convert: per-timestep reference loop vs our batched encoder /
    scanned cell / batched decoder."""
    import jax
    import jax.numpy as jnp
    from eve_tpu.models.refine_net import RefineNet
    from eve_tpu.utils import torch_convert
    torch = ref.torch

    ref.config.override('load_screen_content', True)
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
                         use_rnn=True, rnn_type='CGRU', num_features=64)
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
