"""Inference and Codalab-eval pipeline tests on the synthetic dataset."""

import glob
import gzip
import os
import pickle
import sys

import numpy as np
import pytest

from eve_tpu.config import DefaultConfig
from eve_tpu.data.synthetic import write_synthetic_dataset
from eve_tpu.train.logging_utils import Tensorboard


@pytest.fixture(scope='module')
def dataset_root(tmp_path_factory):
    root = tmp_path_factory.mktemp('eve_synth_inf')
    write_synthetic_dataset(str(root), participants=('val01', 'test01'),
                            num_frames=40)
    return str(root)


@pytest.fixture
def clean_config(tmp_path, monkeypatch):
    DefaultConfig._reset_instance_for_testing()
    Tensorboard._reset_for_testing()
    monkeypatch.chdir(tmp_path)
    yield
    DefaultConfig._reset_instance_for_testing()
    Tensorboard._reset_for_testing()


COMMON_FLAGS = [
    '--max-sequence-len', '6', '--assumed-frame-rate', '10',
    '--eyes-size', '[48, 48]',
]


@pytest.mark.slow
def test_inference_pipeline(dataset_root, clean_config, tmp_path):
    from eve_tpu import infer
    from eve_tpu.utils.visualization import VideoEncoder, draw_pog_overlay
    input_path = os.path.join(dataset_root, 'val01', 'step008_image_test',
                              'webcam_c.mp4')
    out_path = str(tmp_path / 'out.mp4')
    config = infer.script_init_common(argv=COMMON_FLAGS + [
        '--datasrc-eve', dataset_root,
        '--input-path', input_path, '--output-path', out_path,
        '--load-full-frame-for-visualization', 'no',
    ])
    # Exercise the no-full-frame fallback (the overlay path upscales the
    # 128x72 screen content); the CLI test below covers the full-frame path.
    config.override('load_full_frame_for_visualization', False)
    dataset, dataloader = infer.init_dataset(config)
    assert len(dataset) == 3
    spec, params = infer.model_setup(config)

    encoder = VideoEncoder(out_path, fps=10)
    frames_written = 0
    for step, inputs, outputs in infer.iterator(spec, params, dataloader):
        assert 'PoG_px_initial' in outputs
        assert 'PoG_px_final' in outputs
        assert outputs['timestamps'].dtype == np.int64
        B, T = outputs['PoG_px_initial'].shape[:2]
        import cv2
        sf = (np.asarray(inputs['screen_frame']) * 255).astype(np.uint8)
        for b in range(B):
            for t in range(T):
                frame = cv2.resize(sf[b, t], (1920, 1080))[:, :, ::-1]
                frame = np.ascontiguousarray(frame)
                to_draw = [('Initial Estimate', outputs['PoG_px_initial'][b],
                            np.ones(T, bool), [0, 180, 180])]
                draw_pog_overlay(frame, to_draw, t=t)
                encoder.write(frame)
                frames_written += 1
    encoder.close()
    assert frames_written == 18  # 3 clips x 6 frames
    assert os.path.isfile(out_path) and os.path.getsize(out_path) > 1000


@pytest.mark.slow
def test_inference_cli_full_frame_overlay(dataset_root, clean_config,
                                          tmp_path, monkeypatch):
    """Drive inference.py's main() end to end with the full-resolution
    screen recording loaded (load_full_frame_for_visualization default):
    PoG coordinates and UI elements scale to the stand-in canvas size."""
    import inference as inference_cli
    input_path = os.path.join(dataset_root, 'val01', 'step008_image_test',
                              'webcam_c.mp4')
    out_path = str(tmp_path / 'overlay.mp4')
    monkeypatch.setattr(sys, 'argv', ['inference.py'] + COMMON_FLAGS + [
        '--datasrc-eve', dataset_root,
        '--input-path', input_path, '--output-path', out_path,
    ])
    inference_cli.main()
    assert os.path.isfile(out_path) and os.path.getsize(out_path) > 1000
    import cv2
    cap = cv2.VideoCapture(out_path)
    # Canvas must be the recording's native size, not a hardcoded 1080p.
    assert int(cap.get(cv2.CAP_PROP_FRAME_WIDTH)) == 384
    assert int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT)) == 216
    assert int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) == 18  # 3 clips x 6 frames
    cap.release()


@pytest.mark.slow
def test_eval_codalab_submission(dataset_root, clean_config, tmp_path):
    import jax
    import eval_codalab
    from eve_tpu import infer as infer_lib
    from eve_tpu.models import eve as eve_lib
    from eve_tpu.train import checkpoint as ckpt_lib
    from eve_tpu.train import step as step_lib
    import jax.numpy as jnp

    # Create a checkpointed "run" to resume from.
    run_dir = str(tmp_path / 'run')
    os.makedirs(run_dir)
    config = eval_codalab.script_init_common(argv=COMMON_FLAGS + [
        '--datasrc-eve', dataset_root, '--resume-from', run_dir,
        '--codalab-eval-batch-size', '2',
        '--codalab-eval-data-workers', '0',
    ])
    spec = eve_lib.EveSpec.from_config(config)
    params = eve_lib.init_params(spec, jax.random.PRNGKey(0))
    state = step_lib.TrainState(step=jnp.asarray(1), params=params,
                                opt_state=())
    ckpt_lib.CheckpointManager(run_dir).save_at_step(1, state)

    dataset, dataloader = eval_codalab.init_dataset(config)
    assert len(dataset) == 3
    spec2, params2 = infer_lib.model_setup(config)

    outputs_to_write = {}
    for step, inputs, outputs in infer_lib.iterator(spec2, params2,
                                                    dataloader,
                                                    create_images=False):
        B = outputs['PoG_px_initial'].shape[0]
        for i in range(B):
            key = (inputs['participant'][i], inputs['subfolder'][i],
                   inputs['camera'][i])
            sub = outputs_to_write.setdefault(key[0], {}).setdefault(
                key[1], {})
            if key[2] in sub:
                for k in eval_codalab.KEYS_TO_STORE:
                    sub[key[2]][k] = np.concatenate(
                        [sub[key[2]][k], outputs[k][i]], axis=0)
            else:
                sub[key[2]] = {k: outputs[k][i]
                               for k in eval_codalab.KEYS_TO_STORE}

    entry = outputs_to_write['test01']['step008_image_test']['webcam_c']
    assert entry['timestamps'].shape == (18,)  # 3 clips x 6 frames concat
    assert entry['PoG_px_initial'].shape == (18, 2)
    assert entry['PoG_px_final'].shape == (18, 2)
    assert entry['left_pupil_size'].shape == (18,)
    assert entry['timestamps'].dtype == np.int64


@pytest.mark.slow
def test_streaming_inference_carries_state(dataset_root, clean_config,
                                           tmp_path):
    from eve_tpu import infer
    input_path = os.path.join(dataset_root, 'val01', 'step008_image_test',
                              'webcam_c.mp4')
    config = infer.script_init_common(argv=COMMON_FLAGS + [
        '--datasrc-eve', dataset_root,
        '--input-path', input_path, '--output-path', str(tmp_path / 'o.mp4'),
        '--load-full-frame-for-visualization', 'no',
    ])
    config.override('load_full_frame_for_visualization', False)
    dataset, dataloader = infer.init_dataset(config)
    spec, params = infer.model_setup(config)

    # Freshly initialized heads are degenerate (zero-init gaze, ReLU-dead
    # pupil) — perturb all parameters so outputs respond to carried state.
    import jax
    leaves, treedef = jax.tree_util.tree_flatten(params)
    keys = jax.random.split(jax.random.PRNGKey(7), len(leaves))
    params = jax.tree_util.tree_unflatten(
        treedef, [l + 0.05 * jax.random.normal(k, l.shape, l.dtype)
                  for l, k in zip(leaves, keys)])

    plain = [o['PoG_px_initial'] for _, _, o in
             infer.iterator(spec, params, dataloader, create_images=False)]
    streamed = [o['PoG_px_initial'] for _, _, o in
                infer.iterator(spec, params, dataloader, create_images=False,
                               streaming=True)]
    assert len(plain) == len(streamed) == 3
    # First clip: zero initial state either way -> identical.
    np.testing.assert_allclose(streamed[0], plain[0], rtol=1e-3, atol=1e-2)
    # Later clips: carried state changes the trajectory.
    assert not np.allclose(streamed[1], plain[1], atol=1e-3)


def test_model_setup_require_weights_checks_all_submodules(
        clean_config, tmp_path, monkeypatch):
    """require_weights must validate EVERY enabled submodule: with only the
    eye-net release present and refine_net_enabled, serving would otherwise
    ship a randomly initialized RefineNet without a word."""
    pytest.importorskip('torch')
    import jax
    from eve_tpu import infer as infer_lib
    from eve_tpu.models import eve as eve_lib
    from eve_tpu.utils import torch_convert
    from eve_tpu.utils.load_model import pretrained_filename

    config = DefaultConfig()
    config.import_dict({'max_sequence_len': 6, 'assumed_frame_rate': 10,
                        'eyes_size': [32, 32],
                        'refine_net_enabled': True,
                        'load_screen_content': True})

    empty = tmp_path / 'empty'
    empty.mkdir()
    monkeypatch.setenv('EVE_PRETRAINED_DIR', str(empty))
    with pytest.raises(RuntimeError, match='eye_net'):
        infer_lib.model_setup(config, require_weights=True)

    # Eye-net weights alone are NOT enough while the refine net is enabled.
    pdir = tmp_path / 'pretrained'
    pdir.mkdir()
    spec = eve_lib.EveSpec.from_config(config)
    donor = eve_lib.init_params(spec, jax.random.PRNGKey(7))
    torch_convert.save_reference_checkpoint(
        str(pdir / pretrained_filename(config, 'eye_net')),
        donor['eye_net'], 'eye_net')
    monkeypatch.setenv('EVE_PRETRAINED_DIR', str(pdir))
    with pytest.raises(RuntimeError, match='refine_net'):
        infer_lib.model_setup(config, require_weights=True)

    # With the refine net disabled the same weights suffice.
    config.override('refine_net_enabled', False)
    config.override('load_screen_content', False)
    spec2, params2 = infer_lib.model_setup(config, require_weights=True)
    assert spec2 is not None and params2 is not None


@pytest.mark.slow
def test_mesh_eval_parity(dataset_root, clean_config, tmp_path):
    """Data-parallel evaluation (``infer.iterator(mesh=...)``) yields the
    same per-clip outputs as single-device evaluation, including the
    padded ragged final batch (3 clips at batch 2), and rejects a batch
    size the mesh axis cannot divide."""
    import jax
    import eval_codalab
    from eve_tpu import infer as infer_lib
    from eve_tpu.models import eve as eve_lib
    from eve_tpu.parallel.mesh import make_mesh

    config = eval_codalab.script_init_common(argv=COMMON_FLAGS + [
        '--datasrc-eve', dataset_root,
        '--codalab-eval-batch-size', '2',
        '--codalab-eval-data-workers', '0',
    ])
    spec = eve_lib.EveSpec.from_config(config)
    params = eve_lib.init_params(spec, jax.random.PRNGKey(0))

    def run(mesh):
        _, loader = eval_codalab.init_dataset(config)
        return [outputs for _, _, outputs in
                infer_lib.iterator(spec, params, loader,
                                   create_images=False, mesh=mesh)]

    ref = run(None)
    par = run(make_mesh(2))
    assert len(ref) == len(par) == 2  # 3 clips at batch 2
    for a, b in zip(ref, par):
        for key in ('PoG_px_initial', 'PoG_px_final', 'left_pupil_size',
                    'g_initial'):
            np.testing.assert_allclose(a[key], b[key], rtol=1e-5,
                                       atol=1e-4, err_msg=key)

    _, loader = eval_codalab.init_dataset(config)
    with pytest.raises(ValueError, match='must divide'):
        next(iter(infer_lib.iterator(spec, params, loader,
                                     create_images=False,
                                     mesh=make_mesh(8))))

    # A duck-typed loader without batch_size cannot be padded/validated:
    # fail fast instead of dying inside jax.device_put on a ragged batch.
    class NoBatchSize:
        def __iter__(self):
            return iter(loader)
    with pytest.raises(ValueError, match='batch_size'):
        next(iter(infer_lib.iterator(spec, params, NoBatchSize(),
                                     create_images=False,
                                     mesh=make_mesh(2))))

    # The CLI's device-selection rule: largest divisor of the batch size.
    from eve_tpu.cli import eval_codalab as cli
    assert cli._eval_mesh(config, 2) is not None
    config.override('tpu_num_devices', 1)
    assert cli._eval_mesh(config, 2) is None
    config.override('tpu_num_devices', 8)
    assert dict(cli._eval_mesh(config, 2).shape) == {'data': 2}
