"""End-to-end harness smoke test: train.py main loop on synthetic data."""

import os
import sys

import numpy as np
import pytest

from eve_tpu.config import DefaultConfig
from eve_tpu.data.synthetic import write_synthetic_dataset
from eve_tpu.train import harness
from eve_tpu.train.logging_utils import Tensorboard, make_grid


@pytest.fixture(scope='module')
def dataset_root(tmp_path_factory):
    root = tmp_path_factory.mktemp('eve_synth_harness')
    write_synthetic_dataset(str(root), participants=('train01', 'val01'),
                            num_frames=40)
    return str(root)


@pytest.fixture
def config(tmp_path, monkeypatch):
    DefaultConfig._reset_instance_for_testing()
    Tensorboard._reset_for_testing()
    monkeypatch.chdir(tmp_path)
    cfg = harness.script_init_common(argv=[])
    cfg.import_dict({
        'max_sequence_len': 6, 'assumed_frame_rate': 10,
        'eyes_size': [48, 48],  # decoder resizes; keeps CPU compiles fast
        'batch_size': 2, 'num_epochs': 2.0,
        'train_data_workers': 0, 'test_data_workers': 0,
        'test_num_samples': 2, 'test_batch_size': 2,
        'test_every_n_steps': 2, 'checkpoints_save_every_n_steps': 2,
        'base_learning_rate': 0.0001,
        'train_cameras': ['webcam_c'], 'test_cameras': ['webcam_c'],
        'train_stimuli': ['image'], 'test_stimuli': ['image'],
        # eye-net only: the refine pyramid compile is covered by other
        # tests and is too slow for this host (1 CPU core)
        'load_screen_content': False, 'refine_net_enabled': False,
        'full_test_batch_size': 3, 'full_test_data_workers': 0,
    })
    yield cfg
    DefaultConfig._reset_instance_for_testing()
    Tensorboard._reset_for_testing()


def test_script_init_common_cli(tmp_path, monkeypatch):
    DefaultConfig._reset_instance_for_testing()
    monkeypatch.chdir(tmp_path)
    cfg = harness.script_init_common(
        argv=['--batch-size', '4', '--refine-net-enabled', 'yes'])
    assert cfg.batch_size == 4
    assert cfg.refine_net_enabled is True
    DefaultConfig._reset_instance_for_testing()


@pytest.mark.slow
def test_full_training_loop(dataset_root, config):
    config.import_dict({'datasrc_eve': dataset_root})
    train_specs = [('eve_train', harness.DATASET_CLASSES['train'],
                    dataset_root, ['image'], ['webcam_c'])]
    val_specs = [('eve_val', harness.DATASET_CLASSES['train'],
                  dataset_root, ['image'], ['webcam_c'])]
    # (uses train01 for val too — synthetic set has no val participants
    #  in this fixture; the harness only cares about the loader contract)
    train_data, test_data = harness.init_datasets(
        config, train_specs, val_specs)
    exp = harness.Experiment(config, output_dir_base='./outputs')

    steps = []
    for current_step, metrics, images in harness.main_loop_iterator(
            exp, train_data, test_data):
        steps.append(current_step)
        assert np.isfinite(float(metrics['full_loss']))
    assert len(steps) >= 2

    # Checkpoints written with the reference layout
    ckpt_dir = os.path.join(exp.output_dir, 'checkpoints')
    assert os.path.isdir(ckpt_dir)
    assert any(n.endswith('.ckpt') for n in os.listdir(ckpt_dir))
    # Provenance written
    assert os.path.isfile(os.path.join(exp.output_dir, 'configs',
                                       'combined.json'))
    assert os.path.isfile(os.path.join(exp.output_dir, 'src.zip'))
    assert os.path.isfile(os.path.join(exp.output_dir, 'messages.log'))

    # Final full test runs
    harness.do_final_full_test(exp, test_data)


@pytest.mark.slow
def test_resume_from_checkpoint(dataset_root, config):
    config.import_dict({'datasrc_eve': dataset_root})
    train_specs = [('eve_train', harness.DATASET_CLASSES['train'],
                    dataset_root, ['image'], ['webcam_c'])]
    val_specs = [('eve_val', harness.DATASET_CLASSES['train'],
                  dataset_root, ['image'], ['webcam_c'])]
    train_data, test_data = harness.init_datasets(
        config, train_specs, val_specs)
    exp = harness.Experiment(config, output_dir_base='./outputs')
    first_steps = [s for s, _, _ in harness.main_loop_iterator(
        exp, train_data, test_data)]
    assert first_steps, 'fresh run executed no steps'
    first_run_dir = exp.output_dir

    DefaultConfig._reset_instance_for_testing()
    Tensorboard._reset_for_testing()
    cfg2 = harness.script_init_common(argv=[])
    cfg2.import_dict(dict(
        {k: v for k, v in config.get_all_key_values().items()
         if not isinstance(getattr(DefaultConfig, k, None), property)
         and hasattr(DefaultConfig, k)}), strict=False)
    cfg2.override('resume_from', first_run_dir)
    exp2 = harness.Experiment(cfg2, output_dir_base='./outputs')
    assert exp2.output_dir == first_run_dir
    train_data2, test_data2 = harness.init_datasets(
        cfg2, train_specs, val_specs)
    resumed_steps = [s for s, _, _ in harness.main_loop_iterator(
        exp2, train_data2, test_data2)]
    # The final checkpoint records every executed step (completed-step
    # numbering), so resuming the finished run must re-execute NOTHING —
    # this fails if restore ignores the checkpointed step and retrains.
    assert resumed_steps == [], resumed_steps
    assert exp2.last_step == len(first_steps)


@pytest.mark.slow
def test_elastic_resume_across_mesh_sizes(dataset_root, config):
    """A checkpoint saved under one mesh size resumes under another.

    Elastic recovery (SURVEY.md section 5.3): checkpoints are host numpy
    (mesh-agnostic), and Experiment re-places loaded state onto whatever
    mesh the restarted run builds. Here the fresh run trains with a
    2-device data mesh (per-step batch 2 on 8 virtual devices) and the
    resumed run grows the batch to 3 — a 3-device mesh (deliberately an
    odd, non-power-of-two size) — so the restore path must reshard, not
    merely reload. (Batch 3 also exactly divides the 3-window fixture
    dataset; batch 4 would yield zero drop_last batches.)
    """
    config.import_dict({'datasrc_eve': dataset_root, 'num_epochs': 4.0})
    train_specs = [('eve_train', harness.DATASET_CLASSES['train'],
                    dataset_root, ['image'], ['webcam_c'])]
    val_specs = [('eve_val', harness.DATASET_CLASSES['train'],
                  dataset_root, ['image'], ['webcam_c'])]
    train_data, test_data = harness.init_datasets(
        config, train_specs, val_specs)
    exp = harness.Experiment(config, output_dir_base='./outputs')
    assert len(exp.mesh.devices.flatten()) == 2
    first_steps = [s for s, _, _ in harness.main_loop_iterator(
        exp, train_data, test_data)]
    assert first_steps, 'fresh run executed no steps'
    first_run_dir = exp.output_dir

    DefaultConfig._reset_instance_for_testing()
    Tensorboard._reset_for_testing()
    cfg2 = harness.script_init_common(argv=[])
    cfg2.import_dict(dict(
        {k: v for k, v in config.get_all_key_values().items()
         if not isinstance(getattr(DefaultConfig, k, None), property)
         and hasattr(DefaultConfig, k)}), strict=False)
    cfg2.import_dict({'resume_from': first_run_dir, 'batch_size': 3,
                      'num_epochs': 8.0})
    exp2 = harness.Experiment(cfg2, output_dir_base='./outputs')
    assert len(exp2.mesh.devices.flatten()) == 3
    train_data2, test_data2 = harness.init_datasets(
        cfg2, train_specs, val_specs)
    resumed = []
    for current_step, metrics, _ in harness.main_loop_iterator(
            exp2, train_data2, test_data2):
        resumed.append(current_step)
        assert np.isfinite(float(metrics['full_loss']))
        if len(resumed) >= 2:
            break
    # Restored at the checkpointed step (nothing re-executed) and the
    # reshard onto the larger mesh actually trains.
    assert resumed and min(resumed) == len(first_steps), (resumed,
                                                          first_steps)


@pytest.mark.slow
def test_preemption_sigterm_checkpoints_and_exits(dataset_root, config):
    """SIGTERM mid-training saves the CURRENT step and exits 143.

    The reference's only recovery is restart + --resume-from the last
    periodic checkpoint (SURVEY.md section 5.3), losing up to
    checkpoints_save_every_n_steps-1 steps; on preemptible TPU VMs the
    harness instead checkpoints at the signal and a restarted run resumes
    exactly there (no step re-executed, none lost).
    """
    import signal as signal_mod

    config.import_dict({'datasrc_eve': dataset_root,
                        # periodic saves/tests out of the picture: any
                        # checkpoint present comes from the preemption path
                        'checkpoints_save_every_n_steps': 1000,
                        'test_every_n_steps': 1000,
                        # >2 total steps so the resumed run has work left
                        # after the step-2 preemption checkpoint
                        'num_epochs': 4.0})
    train_specs = [('eve_train', harness.DATASET_CLASSES['train'],
                    dataset_root, ['image'], ['webcam_c'])]
    val_specs = [('eve_val', harness.DATASET_CLASSES['train'],
                  dataset_root, ['image'], ['webcam_c'])]
    train_data, test_data = harness.init_datasets(
        config, train_specs, val_specs)
    exp = harness.Experiment(config, output_dir_base='./outputs')

    executed = []
    with pytest.raises(SystemExit) as excinfo:
        for current_step, metrics, _ in harness.main_loop_iterator(
                exp, train_data, test_data):
            executed.append(current_step)
            if current_step == 1:
                # Real signal delivery: the OS-level SIGTERM runs the
                # installed handler, which flags the loop.
                os.kill(os.getpid(), signal_mod.SIGTERM)
    assert excinfo.value.code == 143
    assert executed == [0, 1]

    ckpt_dir = os.path.join(exp.output_dir, 'checkpoints')
    assert sorted(os.listdir(ckpt_dir)) == ['0000002.ckpt'], (
        'expected exactly the preemption checkpoint at step 2')

    # A restarted run resumes from the preemption step: steps 0 and 1 are
    # NOT re-executed.
    DefaultConfig._reset_instance_for_testing()
    Tensorboard._reset_for_testing()
    cfg2 = harness.script_init_common(argv=[])
    cfg2.import_dict(dict(
        {k: v for k, v in config.get_all_key_values().items()
         if not isinstance(getattr(DefaultConfig, k, None), property)
         and hasattr(DefaultConfig, k)}), strict=False)
    cfg2.override('resume_from', exp.output_dir)
    exp2 = harness.Experiment(cfg2, output_dir_base='./outputs')
    train_data2, test_data2 = harness.init_datasets(
        cfg2, train_specs, val_specs)
    resumed = [s for s, _, _ in harness.main_loop_iterator(
        exp2, train_data2, test_data2)]
    assert resumed and min(resumed) == 2, resumed


def test_preemption_handler_respects_existing_disposition():
    """A non-default SIGTERM handler (an embedding app's) is never replaced."""
    import signal as signal_mod

    sentinel = lambda *a: None
    old = signal_mod.signal(signal_mod.SIGTERM, sentinel)
    try:
        harness._install_preemption_handler()
        assert signal_mod.getsignal(signal_mod.SIGTERM) is sentinel
        assert not harness._PREEMPTION.is_set()
    finally:
        signal_mod.signal(signal_mod.SIGTERM, old)


def test_preemption_handler_replaces_sig_ign():
    """SIG_IGN (inherited from daemon-style launchers) IS replaced.

    Honoring an accidentally inherited SIG_IGN would silently void the
    no-steps-lost guarantee: the preemption SIGTERM would be ignored
    outright and the run killed at SIGKILL with nothing saved.
    """
    import signal as signal_mod

    old = signal_mod.signal(signal_mod.SIGTERM, signal_mod.SIG_IGN)
    try:
        harness._install_preemption_handler()
        assert signal_mod.getsignal(signal_mod.SIGTERM) is \
            harness.request_preemption_checkpoint
    finally:
        signal_mod.signal(signal_mod.SIGTERM, old)


@pytest.mark.slow
def test_preemption_during_live_validation_numbers_checkpoint_correctly(
        dataset_root, config):
    """SIGTERM during MID-TRAINING live validation saves the right step.

    Live validation runs inside the same loop iteration as the train step
    it follows; the preemption checkpoint must be numbered current_step+1
    (the update is already applied to exp.state). A stale last_step from
    the previous iteration would number it one low, and the resumed run
    would re-apply an optimizer update on post-update state.
    """
    config.import_dict({'datasrc_eve': dataset_root,
                        # no periodic saves: any checkpoint present comes
                        # from the preemption path
                        'checkpoints_save_every_n_steps': 1000,
                        'test_every_n_steps': 2,  # live-val after step 2
                        'test_num_samples': 2,
                        'test_batch_size': 1,  # >=2 eval batches
                        'num_epochs': 4.0})
    train_specs = [('eve_train', harness.DATASET_CLASSES['train'],
                    dataset_root, ['image'], ['webcam_c'])]
    val_specs = [('eve_val', harness.DATASET_CLASSES['train'],
                  dataset_root, ['image'], ['webcam_c'])]
    train_data, test_data = harness.init_datasets(
        config, train_specs, val_specs)
    exp = harness.Experiment(config, output_dir_base='./outputs')

    def arm_after_first_eval_batch():
        # exp.eval_step exists only after build_training (first loop
        # iteration), so this is called from the consumer loop below.
        orig = exp.eval_step
        calls = []

        def wrapped(params, batch):
            out = orig(params, batch)
            calls.append(1)
            if len(calls) == 1:  # as the signal handler, mid-validation
                harness.request_preemption_checkpoint()
            return out

        exp.eval_step = wrapped

    executed = []
    try:
        with pytest.raises(SystemExit) as excinfo:
            for current_step, _, _ in harness.main_loop_iterator(
                    exp, train_data, test_data):
                if not executed:
                    arm_after_first_eval_batch()
                executed.append(current_step)
        assert excinfo.value.code == 143
        # test_every_n_steps=2 fires live-val inside step index 1's
        # iteration; the flag lands between its eval batches.
        assert executed == [0, 1]
        ckpt_dir = os.path.join(exp.output_dir, 'checkpoints')
        assert sorted(os.listdir(ckpt_dir)) == ['0000002.ckpt'], (
            'preemption during live-val must checkpoint the COMPLETED '
            'step (2), got %s' % os.listdir(ckpt_dir))
    finally:
        harness._PREEMPTION.clear()


def test_model_seq_axes_must_divide_device_count(dataset_root, config):
    """A model/seq factorization that strands devices is a loud error."""
    config.import_dict({'datasrc_eve': dataset_root,
                        'tpu_model_parallelism': 3})  # 8 devices % 3 != 0
    with pytest.raises(ValueError, match='divide the'):
        harness.Experiment(config, output_dir_base='./outputs')


@pytest.mark.slow
def test_auto_resume_finds_same_config_run(dataset_root, config):
    """auto_resume closes the preemption loop: a restart with identical
    argv (same config hash) resumes the newest checkpointed run; a changed
    config starts fresh (different hash = different experiment)."""
    config.import_dict({'datasrc_eve': dataset_root, 'num_epochs': 4.0})
    train_specs = [('eve_train', harness.DATASET_CLASSES['train'],
                    dataset_root, ['image'], ['webcam_c'])]
    val_specs = [('eve_val', harness.DATASET_CLASSES['train'],
                  dataset_root, ['image'], ['webcam_c'])]
    train_data, test_data = harness.init_datasets(
        config, train_specs, val_specs)

    # First launch WITHOUT the flag — the documented flow is "restart with
    # the same argv PLUS --auto-resume yes", so the flag itself (and
    # resume_from) must not participate in the identity hash.
    exp1 = harness.Experiment(config, output_dir_base='./outputs')
    assert not config.resume_from, 'nothing to resume on first launch'
    steps1 = [s for s, _, _ in harness.main_loop_iterator(
        exp1, train_data, test_data)]
    assert steps1 and min(steps1) == 0

    # "Restart with identical argv plus --auto-resume yes".
    config.override('auto_resume', True)
    exp2 = harness.Experiment(config, output_dir_base='./outputs')
    assert config.resume_from == exp1.output_dir
    assert exp2.output_dir == exp1.output_dir
    assert exp2.identifier == exp1.identifier

    # A changed config must NOT adopt the old run.
    config.override('resume_from', '')
    config.override('num_epochs', 8.0)  # different hash
    exp3 = harness.Experiment(config, output_dir_base='./outputs')
    assert not config.resume_from
    assert exp3.output_dir != exp1.output_dir


def test_init_datasets_arms_preemption_handler(dataset_root, config):
    """The SIGTERM handler is armed BEFORE the slow dataset/model build.

    With SIG_DFL still in place, a platform preemption notice landing in
    the minutes-long build window would kill the process outright instead
    of being honored at the first step check.
    """
    import signal as signal_mod

    old = signal_mod.signal(signal_mod.SIGTERM, signal_mod.SIG_DFL)
    try:
        config.import_dict({'datasrc_eve': dataset_root})
        harness.init_datasets(
            config,
            [('eve_train', harness.DATASET_CLASSES['train'],
              dataset_root, ['image'], ['webcam_c'])],
            [('eve_val', harness.DATASET_CLASSES['train'],
              dataset_root, ['image'], ['webcam_c'])])
        assert signal_mod.getsignal(signal_mod.SIGTERM) is \
            harness.request_preemption_checkpoint
    finally:
        signal_mod.signal(signal_mod.SIGTERM, old)


def test_cleanup_clears_stale_preemption_flag():
    """Normal completion resets the flag so it cannot leak into a later
    in-process run (which would spuriously exit 143 at its first step)."""
    from types import SimpleNamespace

    harness.request_preemption_checkpoint()  # landed too late to matter
    exp = SimpleNamespace(tensorboard=SimpleNamespace(close=lambda: None))
    with pytest.raises(SystemExit) as excinfo:
        harness.cleanup_and_quit(exp, None, None, exit_code=0)
    assert excinfo.value.code == 0
    assert not harness._PREEMPTION.is_set()


@pytest.mark.slow
def test_preemption_request_before_loop_survives_handler_install(
        dataset_root, config):
    """A preemption notice during dataset/Experiment build is honored.

    An embedding application's handler can fire before main_loop_iterator
    installs its own; installation must not clear the pending request, or
    the run trains on until SIGKILL with nothing saved.
    """
    config.import_dict({'datasrc_eve': dataset_root,
                        'checkpoints_save_every_n_steps': 1000,
                        'test_every_n_steps': 1000,
                        'num_epochs': 4.0})
    train_specs = [('eve_train', harness.DATASET_CLASSES['train'],
                    dataset_root, ['image'], ['webcam_c'])]
    val_specs = [('eve_val', harness.DATASET_CLASSES['train'],
                  dataset_root, ['image'], ['webcam_c'])]
    train_data, test_data = harness.init_datasets(
        config, train_specs, val_specs)
    exp = harness.Experiment(config, output_dir_base='./outputs')
    harness.request_preemption_checkpoint()  # before the loop exists
    executed = []
    try:
        with pytest.raises(SystemExit) as excinfo:
            for current_step, _, _ in harness.main_loop_iterator(
                    exp, train_data, test_data):
                executed.append(current_step)
        assert excinfo.value.code == 143
        assert executed == [0], 'should exit after the FIRST step'
    finally:
        harness._PREEMPTION.clear()


@pytest.mark.slow
def test_preemption_during_final_test_exits_143(dataset_root, config):
    """SIGTERM during the (minutes-long) final full test still exits 143.

    Without the per-eval-batch check the flag would be set but never
    read once the training loop has ended — the process would ignore
    SIGTERM and keep evaluating until the platform's SIGKILL.
    """
    config.import_dict({'datasrc_eve': dataset_root})
    train_specs = [('eve_train', harness.DATASET_CLASSES['train'],
                    dataset_root, ['image'], ['webcam_c'])]
    val_specs = [('eve_val', harness.DATASET_CLASSES['train'],
                  dataset_root, ['image'], ['webcam_c'])]
    train_data, test_data = harness.init_datasets(
        config, train_specs, val_specs)
    exp = harness.Experiment(config, output_dir_base='./outputs')
    steps = [s for s, _, _ in harness.main_loop_iterator(
        exp, train_data, test_data)]
    assert steps, 'training executed no steps'
    try:
        harness.request_preemption_checkpoint()  # as the signal handler
        with pytest.raises(SystemExit) as excinfo:
            harness.do_final_full_test(exp, test_data)
        assert excinfo.value.code == 143
    finally:
        harness._PREEMPTION.clear()


@pytest.mark.slow
def test_model_and_sequence_parallel_from_config(dataset_root, config):
    """tpu_model_parallelism / tpu_sequence_shards drive train.py itself.

    The 3D mesh (data x model x seq) is plain config — the same harness
    builds the mesh, places params/Adam moments over the model axis, and
    runs the distributed temporal scan; step-level parity of this layout
    is pinned in tests/test_parallel.py. Here: the production loop
    trains, live-validates (data-parallel eval against model-sharded
    params, incl. the ragged replicated fallback), and checkpoints.
    """
    config.import_dict({'datasrc_eve': dataset_root,
                        'tpu_model_parallelism': 2,
                        'tpu_sequence_shards': 2})
    train_specs = [('eve_train', harness.DATASET_CLASSES['train'],
                    dataset_root, ['image'], ['webcam_c'])]
    val_specs = [('eve_val', harness.DATASET_CLASSES['train'],
                  dataset_root, ['image'], ['webcam_c'])]
    train_data, test_data = harness.init_datasets(
        config, train_specs, val_specs)
    exp = harness.Experiment(config, output_dir_base='./outputs')
    assert dict(exp.mesh.shape) == {'data': 2, 'model': 2, 'seq': 2}

    steps = []
    for current_step, metrics, _ in harness.main_loop_iterator(
            exp, train_data, test_data):
        steps.append(current_step)
        assert np.isfinite(float(metrics['full_loss']))
    assert len(steps) >= 2

    import jax
    n_sharded = sum(
        1 for leaf in jax.tree_util.tree_leaves(exp.state.params)
        if 'model' in str(leaf.sharding.spec))
    assert n_sharded > 0, 'no parameter leaf is model-axis sharded'
    ckpt_dir = os.path.join(exp.output_dir, 'checkpoints')
    assert any(n.endswith('.ckpt') for n in os.listdir(ckpt_dir))
    # Eval with model-sharded params over the full (ragged-tail) test set.
    harness.do_final_full_test(exp, test_data)


def test_sequence_shards_must_divide_sequence_len(dataset_root, config):
    config.import_dict({'datasrc_eve': dataset_root,
                        'tpu_sequence_shards': 4})  # max_sequence_len=6
    with pytest.raises(ValueError, match='must divide max_sequence_len'):
        harness.Experiment(config, output_dir_base='./outputs')


@pytest.mark.slow
def test_pretrained_bootstrap_in_training(dataset_root, config, tmp_path,
                                          monkeypatch):
    """eye_net_load_pretrained must seed training from the release weights.

    Reference behavior: EVE() loads released weights at construction when
    the flags are set (src/models/eve.py:55-67), so the frozen-EyeNet
    two-stage workflow (configs/refine_net.json) starts from them. We
    generate fixture weights in the release .pt format from a
    differently-seeded init and assert the train state picks them up (and,
    frozen, keeps them bit-exact through real optimizer steps).
    """
    torch = pytest.importorskip('torch')
    import jax
    from eve_tpu.models import eve as eve_lib
    from eve_tpu.utils import torch_convert
    from eve_tpu.utils.load_model import pretrained_filename

    config.import_dict({'datasrc_eve': dataset_root,
                        'eye_net_load_pretrained': True,
                        'eye_net_frozen': True})
    spec = eve_lib.EveSpec.from_config(config)
    donor = eve_lib.init_params(spec, jax.random.PRNGKey(123))
    pdir = tmp_path / 'pretrained'
    pdir.mkdir()
    torch_convert.save_reference_checkpoint(
        str(pdir / pretrained_filename(config, 'eye_net')),
        donor['eye_net'], 'eye_net')
    monkeypatch.setenv('EVE_PRETRAINED_DIR', str(pdir))

    train_specs = [('eve_train', harness.DATASET_CLASSES['train'],
                    dataset_root, ['image'], ['webcam_c'])]
    val_specs = [('eve_val', harness.DATASET_CLASSES['train'],
                  dataset_root, ['image'], ['webcam_c'])]
    train_data, test_data = harness.init_datasets(
        config, train_specs, val_specs)
    exp = harness.Experiment(config, output_dir_base='./outputs')
    steps = [s for s, m, _ in harness.main_loop_iterator(
        exp, train_data, test_data)]
    assert len(steps) >= 2

    got = {k: np.asarray(v) for k, v in
           exp.state.params['eye_net']['fc_to_gaze_0'].items()}
    want = {k: np.asarray(v) for k, v in
            donor['eye_net']['fc_to_gaze_0'].items()}
    for k in want:
        np.testing.assert_array_equal(got[k], want[k], err_msg=k)


def test_pretrained_bootstrap_missing_weights_raises(dataset_root, config,
                                                     tmp_path, monkeypatch):
    """Absent release weights must abort loudly, never train random-frozen."""
    config.import_dict({'datasrc_eve': dataset_root,
                        'eye_net_load_pretrained': True})
    empty = tmp_path / 'empty'
    empty.mkdir()
    monkeypatch.setenv('EVE_PRETRAINED_DIR', str(empty))
    exp = harness.Experiment(config, output_dir_base='./outputs')
    with pytest.raises(FileNotFoundError, match='eye_net_load_pretrained'):
        exp.build_training(1)


@pytest.mark.slow
def test_multi_source_training(dataset_root, config):
    """Several training sources: one batch from EACH per step, trained on
    the summed loss in one fused step (reference training.py:240-264 +
    474-502 semantics), with per-source metric prefixes."""
    config.import_dict({'datasrc_eve': dataset_root, 'num_epochs': 1.0})
    train_specs = [
        ('srcA', harness.DATASET_CLASSES['train'], dataset_root,
         ['image'], ['webcam_c']),
        ('srcB', harness.DATASET_CLASSES['train'], dataset_root,
         ['image'], ['webcam_c']),
    ]
    val_specs = [('eve_val', harness.DATASET_CLASSES['train'],
                  dataset_root, ['image'], ['webcam_c'])]
    train_data, test_data = harness.init_datasets(
        config, train_specs, val_specs)
    assert len(train_data) == 2
    exp = harness.Experiment(config, output_dir_base='./outputs')
    seen = []
    for current_step, metrics, _ in harness.main_loop_iterator(
            exp, train_data, test_data):
        seen.append(current_step)
        assert np.isfinite(float(metrics['full_loss']))
        assert any(k.startswith('srcA/') for k in metrics), sorted(metrics)
        assert any(k.startswith('srcB/') for k in metrics), sorted(metrics)
        # Summed-loss semantics: total == sum of the per-source losses.
        np.testing.assert_allclose(
            float(metrics['full_loss']),
            float(metrics['srcA/full_loss']) +
            float(metrics['srcB/full_loss']), rtol=1e-5)
    assert seen, 'no steps ran'


@pytest.mark.slow
def test_gradient_accumulation_matches_full_batch(config):
    """N micro-batch updates under optax.MultiSteps == one full-batch step
    (same effective batch; grads average since the losses are per-batch
    means over equal valid counts)."""
    import jax
    import jax.numpy as jnp
    from eve_tpu.data.synthetic import make_synthetic_batch
    from eve_tpu.models import eve as eve_lib
    from eve_tpu.train import optim as optim_lib
    from eve_tpu.train import step as step_lib

    config.import_dict({'refine_net_do_offset_augmentation': False})
    spec = eve_lib.EveSpec.from_config(config)
    full = make_synthetic_batch(np.random.RandomState(0), batch_size=4,
                                sequence_len=2, eyes_size=48,
                                with_screen=False)
    full_j = {k: jnp.asarray(v) for k, v in full.items()}
    halves = [{k: jnp.asarray(v[i * 2:(i + 1) * 2]) for k, v in full.items()}
              for i in range(2)]
    rng = jax.random.PRNGKey(7)

    config.override('gradient_accumulation_steps', 1)
    tx1, _ = optim_lib.build_optimizer(config, steps_per_epoch=100)
    state1 = step_lib.create_train_state(spec, tx1, jax.random.PRNGKey(0))
    step1 = step_lib.make_train_step(spec, tx1, donate=False)
    state1, _ = step1(state1, full_j, rng)

    config.override('gradient_accumulation_steps', 2)
    tx2, _ = optim_lib.build_optimizer(config, steps_per_epoch=100)
    state2 = step_lib.create_train_state(spec, tx2, jax.random.PRNGKey(0))
    step2 = step_lib.make_train_step(spec, tx2, donate=False)
    for half in halves:
        state2, _ = step2(state2, half, rng)

    a = jax.tree_util.tree_leaves_with_path(
        jax.tree_util.tree_map(np.asarray, state1.params))
    b = dict(jax.tree_util.tree_leaves_with_path(
        jax.tree_util.tree_map(np.asarray, state2.params)))
    for path, leaf in a:
        np.testing.assert_allclose(b[path], leaf, rtol=2e-3, atol=2e-5,
                                   err_msg=jax.tree_util.keystr(path))


def test_accumulation_mesh_uses_step_batch(dataset_root, config):
    """With gradient accumulation the data mesh must be sized by the
    per-step micro-batch, not config.batch_size — otherwise every train
    step falls into the replicated single-device fallback."""
    config.import_dict({'datasrc_eve': dataset_root, 'batch_size': 4,
                        'gradient_accumulation_steps': 2})
    exp = harness.Experiment(config, output_dir_base='./outputs')
    n_mesh = len(exp.mesh.devices.flatten())
    assert n_mesh == 2, n_mesh  # largest divisor of the step batch (4/2)
    # And micro-batches actually shard (not the replicated fallback).
    import jax.numpy as jnp
    batch = {'x': jnp.zeros((2, 3))}
    placed = exp.device_put_batch(batch)
    assert len(placed['x'].sharding.device_set) == 2


@pytest.mark.slow
def test_ragged_eval_padding_is_exact(config):
    """_pad_eval_batch pads with ZERO-validity rows: every 0-dim output is
    a validity-masked batch mean (losses.masked_mean), so the padded
    scalar times the padded size must equal the unpadded scalar times the
    real size — the invariant test_model_on_all's weighting relies on when
    it keeps ragged final batches sharded over the mesh."""
    import jax
    import jax.numpy as jnp
    from eve_tpu.data.synthetic import make_synthetic_batch
    from eve_tpu.models import eve as eve_lib
    from eve_tpu.train import optim as optim_lib
    from eve_tpu.train import step as step_lib

    spec = eve_lib.EveSpec.from_config(config)
    batch = make_synthetic_batch(np.random.RandomState(3), batch_size=3,
                                 sequence_len=2, eyes_size=48,
                                 with_screen=False)
    padded = harness._pad_eval_batch(batch, 5)
    for k, v in padded.items():
        if isinstance(v, np.ndarray):
            assert v.shape[0] == 5, k
            if k.endswith('_validity'):
                assert not v[3:].any(), k

    tx, _ = optim_lib.build_optimizer(config, steps_per_epoch=10)
    state = step_lib.create_train_state(spec, tx, jax.random.PRNGKey(0))
    eval_step = step_lib.make_eval_step(spec)
    out_real = eval_step(state.params,
                         {k: jnp.asarray(v) for k, v in batch.items()})
    out_pad = eval_step(state.params,
                        {k: jnp.asarray(v) for k, v in padded.items()})
    checked = 0
    for k, v in out_real.items():
        if hasattr(v, 'ndim') and v.ndim == 0:
            np.testing.assert_allclose(
                float(out_pad[k]) * 5, float(v) * 3, rtol=1e-5, atol=1e-7,
                err_msg=k)
            checked += 1
    assert checked >= 5, checked


def test_compile_cache_dir_plumbs_to_jax(tmp_path, config):
    """--tpu-compile-cache-dir must reach jax's persistent-cache config
    (restarted preemption cycles skip the multi-10s compile); '' must
    leave the process setting alone."""
    import jax
    before = jax.config.jax_compilation_cache_dir
    try:
        cache_dir = str(tmp_path / 'xla_cache')
        cfg2 = harness.script_init_common(
            argv=['--tpu-compile-cache-dir', cache_dir])
        assert cfg2.tpu_compile_cache_dir == cache_dir
        assert jax.config.jax_compilation_cache_dir == cache_dir
        # Default ('') must not clobber whatever the process configured
        # (the test conftest points every suite run at a shared cache).
        # Reset the singleton first: without it the second call still sees
        # tpu_compile_cache_dir == cache_dir and the ''-path never runs.
        from eve_tpu.config import DefaultConfig
        DefaultConfig._reset_instance_for_testing()
        cfg3 = harness.script_init_common(argv=[])
        assert cfg3.tpu_compile_cache_dir == ''
        assert jax.config.jax_compilation_cache_dir == cache_dir
    finally:
        jax.config.update('jax_compilation_cache_dir', before)


def test_remat_value_normalization(config):
    """Old boolean tpu_remat configs keep working; typos fail loudly."""
    config.import_dict({'tpu_remat': True})
    assert config.tpu_remat == 'all'
    config.import_dict({'tpu_remat': False})
    assert config.tpu_remat == 'none'
    config.import_dict({'tpu_remat': 'refine'})
    assert config.tpu_remat == 'refine'
    cfg2 = harness.script_init_common(argv=['--tpu-remat', 'True'])
    assert cfg2.tpu_remat == 'all'
    with pytest.raises(ValueError, match='tpu_remat'):
        config.import_dict({'tpu_remat': 'eyes'})


@pytest.mark.slow
def test_data_echoing_steps_per_loaded_batch(dataset_root, config):
    """train_batch_echoing=N must run N optimizer steps per LOADED batch
    (device utilization when the host pipeline is the bottleneck)."""

    class CountingLoader:
        def __init__(self, inner):
            self.inner = inner
            self.count = 0
            self.batch_size = inner.batch_size

        def __iter__(self):
            for b in self.inner:
                self.count += 1
                yield b

    config.import_dict({'datasrc_eve': dataset_root,
                        'train_batch_echoing': 2, 'num_epochs': 1.0})
    train_specs = [('eve_train', harness.DATASET_CLASSES['train'],
                    dataset_root, ['image'], ['webcam_c'])]
    val_specs = [('eve_val', harness.DATASET_CLASSES['train'],
                  dataset_root, ['image'], ['webcam_c'])]
    train_data, test_data = harness.init_datasets(
        config, train_specs, val_specs)
    counter = CountingLoader(train_data['eve_train']['dataloader'])
    train_data['eve_train']['dataloader'] = counter
    exp = harness.Experiment(config, output_dir_base='./outputs')
    steps = [s for s, m, _ in harness.main_loop_iterator(
        exp, train_data, test_data)]
    assert steps, 'no steps ran'
    assert len(steps) == 2 * counter.count, (len(steps), counter.count)


def _run_to_completion(dataset_root, cfg):
    train_specs = [('eve_train', harness.DATASET_CLASSES['train'],
                    dataset_root, ['image'], ['webcam_c'])]
    val_specs = [('eve_val', harness.DATASET_CLASSES['train'],
                  dataset_root, ['image'], ['webcam_c'])]
    train_data, test_data = harness.init_datasets(cfg, train_specs, val_specs)
    exp = harness.Experiment(cfg, output_dir_base='./outputs')
    for _ in harness.main_loop_iterator(exp, train_data, test_data):
        pass
    import jax
    return jax.tree_util.tree_map(np.asarray, exp.state.params)


@pytest.mark.slow
def test_fully_reproducible_runs_are_bit_identical(dataset_root, config):
    """fully_reproducible=True pins shuffle order and the kappa stream to
    seed 0: two complete runs produce bit-identical parameters (the
    reference gates cudnn determinism on this flag, training.py:106-112;
    XLA-on-TPU needs no kernel knob, so the flag governs the RNG streams)."""
    config.import_dict({'datasrc_eve': dataset_root,
                        'fully_reproducible': True})
    params1 = _run_to_completion(dataset_root, config)

    DefaultConfig._reset_instance_for_testing()
    Tensorboard._reset_for_testing()
    cfg2 = harness.script_init_common(argv=[])
    cfg2.import_dict(dict(
        {k: v for k, v in config.get_all_key_values().items()
         if not isinstance(getattr(DefaultConfig, k, None), property)
         and hasattr(DefaultConfig, k)}), strict=False)
    params2 = _run_to_completion(dataset_root, cfg2)

    import jax
    flat1, _ = jax.tree_util.tree_flatten(params1)
    flat2, _ = jax.tree_util.tree_flatten(params2)
    assert len(flat1) == len(flat2)
    for a, b in zip(flat1, flat2):
        np.testing.assert_array_equal(a, b)


@pytest.mark.slow
@pytest.mark.parametrize('echo,accum', [(1, 1), (2, 1), (1, 2)])
def test_interrupted_resume_is_bit_identical(dataset_root, config, echo,
                                             accum):
    """EXACT resume: a run interrupted at the halfway checkpoint and
    resumed must be bit-identical to an uninterrupted run. This requires
    (a) the loader continuing the data stream where it stood — epoch-
    seeded shuffles + fast_forward — not replaying epoch 0, and (b) the
    kappa stream keyed per step (fold_in), not serially split from the
    loop entry. The reference restarts its DataLoader from scratch on
    --resume-from, so its resumed runs silently train on different data
    than the uninterrupted schedule.

    echo=2 pins the batch-echoing interaction: the stream position is
    counted in LOADED batches (last_step // echo), and a run resumed
    mid-echo-group must reload the group's batch before continuing.
    accum=2 interrupts mid gradient-accumulation group: the optax
    MultiSteps state (inner-step counter + gradient accumulator) must
    round-trip through the npz checkpoint for the resumed update to
    match."""
    import jax
    config.import_dict({'datasrc_eve': dataset_root,
                        'fully_reproducible': True, 'num_epochs': 4.0,
                        'train_batch_echoing': echo,
                        'gradient_accumulation_steps': accum})
    params_full = _run_to_completion(dataset_root, config)

    def clone_config(extra):
        DefaultConfig._reset_instance_for_testing()
        Tensorboard._reset_for_testing()
        cfg = harness.script_init_common(argv=[])
        cfg.import_dict(dict(
            {k: v for k, v in config.get_all_key_values().items()
             if not isinstance(getattr(DefaultConfig, k, None), property)
             and hasattr(DefaultConfig, k)}), strict=False)
        cfg.import_dict(extra)
        return cfg

    # Interrupted run: break mid-run (the way a preemption would) and
    # checkpoint the current step. With echo=2 the interrupt point is
    # forced ODD, i.e. inside an echo group, so the resumed run must
    # reload that group's batch rather than skip past it.
    cfg_half = clone_config({'num_epochs': 4.0})
    train_specs = [('eve_train', harness.DATASET_CLASSES['train'],
                    dataset_root, ['image'], ['webcam_c'])]
    val_specs = [('eve_val', harness.DATASET_CLASSES['train'],
                  dataset_root, ['image'], ['webcam_c'])]
    train_data, test_data = harness.init_datasets(cfg_half, train_specs,
                                                  val_specs)
    exp = harness.Experiment(cfg_half, output_dir_base='./outputs')
    half_steps = []
    for s, _, _ in harness.main_loop_iterator(exp, train_data, test_data):
        half_steps.append(s)
        done = len(half_steps)
        if done >= 3 and (echo == 1 or done % echo != 0):
            break
    assert half_steps, 'interrupted run executed no steps'
    harness.save_checkpoint(exp, len(half_steps))
    half_dir = exp.output_dir

    cfg_resume = clone_config({'num_epochs': 4.0, 'resume_from': half_dir})
    train_data2, test_data2 = harness.init_datasets(cfg_resume, train_specs,
                                                    val_specs)
    exp2 = harness.Experiment(cfg_resume, output_dir_base='./outputs')
    resumed_steps = [s for s, _, _ in harness.main_loop_iterator(
        exp2, train_data2, test_data2)]
    assert resumed_steps and resumed_steps[0] == len(half_steps)

    params_resumed = jax.tree_util.tree_map(np.asarray, exp2.state.params)
    flat_a = jax.tree_util.tree_leaves_with_path(params_full)
    flat_b = dict(jax.tree_util.tree_leaves_with_path(params_resumed))
    for path, leaf in flat_a:
        np.testing.assert_array_equal(
            leaf, flat_b[path],
            err_msg=jax.tree_util.keystr(path))


def test_loader_fast_forward_matches_fresh_stream():
    """fast_forward(n) reproduces exactly the index stream a fresh loader
    yields after discarding n batches, across epoch boundaries."""
    from eve_tpu.data import loader as loader_lib

    class IndexDataset:
        def __len__(self):
            return 5

        def __getitem__(self, i):
            return {'idx': np.asarray([i])}

    def stream(loader, n):
        out = []
        while len(out) < n:
            for b in loader:
                out.append(int(b['idx'][0, 0]))
                if len(out) == n:
                    break
        return out

    ref = stream(loader_lib.DataLoader(IndexDataset(), batch_size=2,
                                       shuffle=True, drop_last=True,
                                       num_workers=0, seed=7), 8)
    for skip in (1, 2, 3, 5, 7):
        ff = loader_lib.DataLoader(IndexDataset(), batch_size=2,
                                   shuffle=True, drop_last=True,
                                   num_workers=0, seed=7)
        ff.fast_forward(skip)
        assert stream(ff, 8 - skip) == ref[skip:], skip


def test_training_seed_entropy_when_not_reproducible(config):
    """With the flag off, each process draws a fresh seed (runs explore
    different shuffles), and the seed is cached within the process."""
    config.import_dict({'fully_reproducible': False})
    harness._training_seed = None
    s1 = harness.training_seed(config)
    assert harness.training_seed(config) == s1  # cached
    harness._training_seed = None
    s2 = harness.training_seed(config)
    harness._training_seed = None
    s3 = harness.training_seed(config)
    assert len({s1, s2, s3}) > 1  # 2^-64 false-failure probability

    config.import_dict({'fully_reproducible': True})
    harness._training_seed = None
    assert harness.training_seed(config) == 0
    harness._training_seed = None


def test_make_grid():
    imgs = np.random.rand(5, 8, 10, 3).astype(np.float32)
    grid = make_grid(imgs, nrow=3, padding=1)
    assert grid.shape == ((8 + 1) * 2 + 1, (10 + 1) * 3 + 1, 3)


def test_compose_training_images():
    from eve_tpu.train.logging_utils import compose_training_images
    rng = np.random.RandomState(0)
    outputs = {
        'screen_frame': rng.rand(2, 72, 128, 3).astype(np.float32),
        'initial_gaze_history': rng.rand(2, 72, 128).astype(np.float32),
        'refined_gaze_history': rng.rand(2, 72, 128).astype(np.float32),
        'initial_heatmap': rng.rand(2, 72, 128).astype(np.float32),
        'final_heatmap': rng.rand(2, 72, 128).astype(np.float32),
        'gt_heatmap': rng.rand(2, 72, 128).astype(np.float32),
    }
    images = compose_training_images(outputs, screen_size=(128, 72))
    assert set(images) == {
        'train/screen_plus_initial_history',
        'train/screen_plus_refined_history',
        'train/0_gt_heatmap', 'train/1_initial_heatmap',
        'train/2_final_heatmap'}
    # Stacked overlay: 3 rows of 72px per sample + grid padding
    grid = images['train/screen_plus_initial_history']
    assert grid.ndim == 3 and grid.shape[-1] == 3
    assert grid.shape[0] >= 3 * 72
    assert float(grid.max()) <= 1.0 + 1e-6

    # Without screen content, only heatmap grids are emitted.
    images = compose_training_images(
        {'initial_heatmap': outputs['initial_heatmap']})
    assert set(images) == {'train/1_initial_heatmap'}


def test_tensorboard_add_graph(tmp_path):
    import jax.numpy as jnp
    Tensorboard._reset_for_testing()
    tb = Tensorboard(str(tmp_path))
    tb.add_graph(lambda x: jnp.sum(x * 2.0), jnp.ones((3,)))
    assert os.path.isfile(os.path.join(str(tmp_path), 'model_jaxpr.txt'))
    tb.close()
    Tensorboard._reset_for_testing()


@pytest.mark.slow
def test_skip_training_eval_only(dataset_root, config):
    """--skip-training must still build state and run the final test.

    (Previously crashed: do_final_full_test used exp.eval_step/state that
    were never created when the main loop returned early.)
    """
    config.import_dict({'datasrc_eve': dataset_root, 'skip_training': True})
    train_specs = [('eve_train', harness.DATASET_CLASSES['train'],
                    dataset_root, ['image'], ['webcam_c'])]
    val_specs = [('eve_val', harness.DATASET_CLASSES['train'],
                  dataset_root, ['image'], ['webcam_c'])]
    train_data, test_data = harness.init_datasets(
        config, train_specs, val_specs)
    exp = harness.Experiment(config, output_dir_base='./outputs')
    steps = list(harness.main_loop_iterator(exp, train_data, test_data))
    assert steps == []
    harness.do_final_full_test(exp, test_data)  # must not raise
