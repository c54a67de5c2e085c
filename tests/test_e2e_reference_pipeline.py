"""Whole-PIPELINE parity against the ACTUAL reference implementation.

test_reference_parity.py pins ops/models on in-memory batches; this module
closes the remaining integration seam: the reference's own DATASOURCE
(``datasources/eve_sequences.py`` — segmentation windows, h5 label slicing,
Rodrigues, frame preprocessing/eye split, zero-padding) and its own EVE
model are driven end-to-end over the same on-disk synthetic EVE-layout clip
as the eve_tpu stack, with shared (converted) weights, and the two stacks
must agree item-for-item on every batch tensor and on the final PoG.

The image has no ffmpeg binary or ffmpeg-python package, so ``ffmpeg`` is
shimmed with a cv2-backed module that executes the reference's OWN filter
strings (``select='eq(n,i)+...'`` frame picking + ``scale=w:h``,
reference ``src/datasources/common.py:109-139``): the reference's command
construction and all downstream semantics run unmodified; only the raw
mp4->RGB decode is shared (both stacks decode through OpenCV, whose
frame-exactness is pinned separately in test_data_layer.py).

numpy 2.x removed the ``np.int`` alias the 2020 reference uses; it is
restored for the duration of these tests (``np.int = int`` is exactly what
the alias was in the reference's numpy 1.18; ``np.bool`` exists again in
numpy 2.x and must NOT be touched).
"""

import os
import sys
import types

import numpy as np
import pytest

REF_SRC = '/root/reference/src'

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_SRC), reason='reference checkout not available')


# ---------------------------------------------------------------------------
# cv2-backed ffmpeg shim executing the reference's own filter strings
# (shared with tools/close_parity_gate.py via eve_tpu/utils/reference_bridge).
# ---------------------------------------------------------------------------

from eve_tpu.utils.reference_bridge import make_ffmpeg_module \
    as _make_ffmpeg_module  # noqa: E402


# ---------------------------------------------------------------------------
# Fixtures: reference import (with shims), synthetic on-disk dataset.
# ---------------------------------------------------------------------------

@pytest.fixture(scope='module')
def dataset_root(tmp_path_factory):
    import shutil
    from eve_tpu.data.synthetic import write_synthetic_dataset
    root = tmp_path_factory.mktemp('eve_synth_e2e')
    write_synthetic_dataset(str(root), participants=('train01',),
                            num_frames=40)
    # The reference's segmentation builder asserts timestamps for ALL five
    # sources exist (eve_sequences.py:125-128) even when only webcam_c is
    # selected; give the unused cameras timestamp files (their windows are
    # built but never read — cameras_to_use filters them out).
    stim = os.path.join(str(root), 'train01', 'step008_image_test')
    src = os.path.join(stim, 'webcam_c.timestamps.txt')
    for cam in ('basler', 'webcam_l', 'webcam_r'):
        shutil.copyfile(src, os.path.join(stim, '%s.timestamps.txt' % cam))
    return str(root)


@pytest.fixture()
def ref_pipeline(tmp_path, monkeypatch):
    """Import the reference datasource + model packages with the ffmpeg
    shim, numpy 1.x aliases, and third-party logging stubs installed."""
    torch = pytest.importorskip('torch')
    from tests.test_reference_parity import _install_torchvision_resnet_stub

    # numpy 2.x reintroduced np.bool (as np.bool_); only np.int is gone.
    # Patching np.bool to the python builtin would break numpy.testing.
    monkeypatch.setattr(np, 'int', int, raising=False)
    monkeypatch.setitem(sys.modules, 'ffmpeg', _make_ffmpeg_module())
    for name in ('gspread', 'tensorboardX'):
        sys.modules.setdefault(name, types.ModuleType(name))
    if not hasattr(sys.modules['tensorboardX'], 'SummaryWriter'):
        sys.modules['tensorboardX'].SummaryWriter = object
    oauth_sa = types.ModuleType('oauth2client.service_account')
    oauth_sa.ServiceAccountCredentials = object
    oauth = types.ModuleType('oauth2client')
    oauth.service_account = oauth_sa
    sys.modules.setdefault('oauth2client', oauth)
    sys.modules.setdefault('oauth2client.service_account', oauth_sa)
    _install_torchvision_resnet_stub(torch)

    # The reference writes ./segmentation_cache relative to cwd (and
    # expects the directory to already exist, as it does in its checkout).
    (tmp_path / 'segmentation_cache').mkdir()
    monkeypatch.chdir(tmp_path)

    overrides = {'max_sequence_len': 6, 'assumed_frame_rate': 10,
                 'load_screen_content': True, 'refine_net_enabled': True,
                 'load_full_frame_for_visualization': False}
    config = None
    sys.path.insert(0, REF_SRC)
    try:
        import datasources.eve_sequences as ref_ds_mod
        import models.eve as ref_eve_mod
        from core import DefaultConfig as RefConfig
        ref_ds_mod.sequence_segmentations = None  # fresh per test run
        config = RefConfig()
        for k, v in overrides.items():
            config.override(k, v)
        yield types.SimpleNamespace(torch=torch, ds=ref_ds_mod,
                                    eve=ref_eve_mod, config=config)
    finally:
        if config is not None:
            for k in overrides:
                config.override(k, getattr(type(config), k))
        sys.path.remove(REF_SRC)


@pytest.fixture()
def our_config():
    from eve_tpu.config import DefaultConfig
    DefaultConfig._reset_instance_for_testing()
    cfg = DefaultConfig()
    cfg.import_dict({'max_sequence_len': 6, 'assumed_frame_rate': 10,
                     'load_screen_content': True,
                     'refine_net_enabled': True})
    yield cfg
    DefaultConfig._reset_instance_for_testing()


def _our_dataset(dataset_root, our_config, cache_dir):
    from eve_tpu.data.dataset import EVESequencesBase
    return EVESequencesBase(
        dataset_root, config=our_config, participants_to_use=['train01'],
        cameras_to_use=['webcam_c'], types_of_stimuli=['image'],
        cache_dir=cache_dir)


def _ref_dataset(ref, dataset_root):
    return ref.ds.EVESequencesBase(
        dataset_root, participants_to_use=['train01'],
        cameras_to_use=['webcam_c'], types_of_stimuli=['image'])


def _ref_item_to_nhwc_numpy(item):
    """Reference __getitem__ dict (torch, NCHW images) -> numpy NHWC."""
    out = {}
    for k, v in item.items():
        if not hasattr(v, 'numpy'):
            out[k] = v
            continue
        a = v.numpy()
        if k.endswith('eye_patch') or k in ('screen_frame', 'frame'):
            a = np.transpose(a, (0, 2, 3, 1))
        out[k] = a
    return out


# ---------------------------------------------------------------------------
# 1. Data-layer parity: same windows, same tensors, key for key.
# ---------------------------------------------------------------------------

def test_dataset_items_match_reference(ref_pipeline, dataset_root, our_config,
                                       tmp_path):
    ref = ref_pipeline
    ref_ds = _ref_dataset(ref, dataset_root)
    our_ds = _our_dataset(dataset_root, our_config,
                          str(tmp_path / 'segcache'))

    assert len(ref_ds) == len(our_ds) == 3  # 40 frames -> 3 windows of 6

    for idx in range(len(ref_ds)):
        ref_item = _ref_item_to_nhwc_numpy(ref_ds[idx])
        our_item = our_ds[idx]
        assert set(ref_item) == set(our_item), idx
        for k in sorted(ref_item):
            r, o = ref_item[k], our_item[k]
            if isinstance(r, str):
                assert r == o, k
                continue
            assert r.shape == np.asarray(o).shape, (k, r.shape,
                                                    np.asarray(o).shape)
            if k == 'head_R' or k == 'screen_head_R':
                # cv2.Rodrigues vs our pure-numpy twin.
                np.testing.assert_allclose(o, r, atol=1e-6, err_msg=k)
            elif k.endswith('_validity') or k == 'timestamps' \
                    or k == 'screen_timestamps':
                np.testing.assert_array_equal(np.asarray(o), r, err_msg=k)
            else:
                # Same cv2 decode, same normalize math, same h5 values:
                # float32 round-off only.
                np.testing.assert_allclose(np.asarray(o, np.float32),
                                           np.asarray(r, np.float32),
                                           rtol=1e-5, atol=1e-5, err_msg=k)


def test_partial_window_padding_matches_reference(ref_pipeline, dataset_root,
                                                  our_config, tmp_path):
    """The 2-frame tail window (frames 36,39) zero-pads values AND validity
    to max_sequence_len on both stacks."""
    ref = ref_pipeline
    ref_item = _ref_item_to_nhwc_numpy(_ref_dataset(ref, dataset_root)[2])
    our_item = _our_dataset(dataset_root, our_config,
                            str(tmp_path / 'segcache'))[2]
    np.testing.assert_array_equal(
        np.asarray(our_item['left_PoG_tobii_validity']),
        ref_item['left_PoG_tobii_validity'])
    assert not ref_item['left_PoG_tobii_validity'][2:].any()
    np.testing.assert_allclose(np.asarray(our_item['left_eye_patch'][2:]),
                               ref_item['left_eye_patch'][2:], atol=0)
    np.testing.assert_array_equal(np.asarray(our_item['timestamps']),
                                  ref_item['timestamps'])


# ---------------------------------------------------------------------------
# 2. Whole-stack parity: disk -> datasource -> model -> PoG, shared weights.
# ---------------------------------------------------------------------------

def test_disk_to_pog_matches_reference(ref_pipeline, dataset_root, our_config,
                                       tmp_path):
    import jax.numpy as jnp
    from eve_tpu.models import eve as eve_lib
    from eve_tpu.utils import torch_convert
    ref = ref_pipeline
    torch = ref.torch

    ref_model = ref.eve.EVE(output_predictions=True)
    ref_model.eval()
    eye_sd = torch_convert.torch_state_dict_to_numpy(
        ref_model.eye_net.state_dict())
    refine_sd = torch_convert.torch_state_dict_to_numpy(
        ref_model.refine_net.state_dict())
    params = {'eye_net': torch_convert.convert_eye_net(eye_sd),
              'refine_net': torch_convert.convert_refine_net(refine_sd)}

    ref_item = _ref_dataset(ref, dataset_root)[0]
    torch_batch = {k: (v.unsqueeze(0) if hasattr(v, 'unsqueeze') else [v])
                   for k, v in ref_item.items()}
    with torch.no_grad():
        out_ref = ref_model(torch_batch)

    our_item = _our_dataset(dataset_root, our_config,
                            str(tmp_path / 'segcache'))[0]
    batch = {k: jnp.asarray(np.asarray(v)[None])
             for k, v in our_item.items() if not isinstance(v, str)}
    spec = eve_lib.EveSpec(refine_net_enabled=True, load_screen_content=True)
    out = eve_lib.forward(spec, params, batch, training=False,
                          output_predictions=True)

    def cmp(key, rtol, atol):
        np.testing.assert_allclose(
            np.asarray(out[key], np.float32),
            out_ref[key].detach().numpy().astype(np.float32),
            rtol=rtol, atol=atol, err_msg=key)

    cmp('left_pupil_size', 1e-3, 1e-3)
    cmp('right_pupil_size', 1e-3, 1e-3)
    cmp('g_initial', 1e-3, 2e-4)
    cmp('PoG_px_initial', 1e-3, 0.5)
    cmp('PoG_px_final', 1e-3, 1.0)
    cmp('g_final', 1e-3, 2e-4)
    # Validity-masked metrics over the real (padded) tail window's labels.
    for k, v in out_ref.items():
        if hasattr(v, 'ndim') and v.ndim == 0 and k in out:
            np.testing.assert_allclose(float(out[k]), float(v), rtol=2e-3,
                                       atol=2e-3, err_msg=k)
