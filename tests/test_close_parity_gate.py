"""End-to-end test of the north-star closure runbook
(tools/close_parity_gate.py).

The real EVE dataset and released weights are absent in this environment
(BASELINE.md), so the gate cannot CLOSE here — but the closure command
itself is fully testable: the synthetic EVE-layout dataset stands in for
the data and a reference-format checkpoint (random-init reference model,
saved exactly like the release assets) stands in for the weights. If this
test passes, closing the gate on real inputs is one command with no
untested mechanics.
"""

import os
import sys

import numpy as np
import pytest

from eve_tpu.utils.reference_bridge import REF_SRC, reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason='reference checkout not available')


@pytest.fixture(scope='module')
def dataset_root(tmp_path_factory):
    import shutil
    from eve_tpu.data.synthetic import write_synthetic_dataset
    root = tmp_path_factory.mktemp('eve_synth_gate')
    write_synthetic_dataset(str(root), participants=('train01',),
                            num_frames=40)
    # The reference's segmentation builder asserts timestamps for ALL five
    # sources exist (eve_sequences.py:125-128).
    stim = os.path.join(str(root), 'train01', 'step008_image_test')
    src = os.path.join(stim, 'webcam_c.timestamps.txt')
    for cam in ('basler', 'webcam_l', 'webcam_r'):
        shutil.copyfile(src, os.path.join(stim, '%s.timestamps.txt' % cam))
    return str(root)


@pytest.fixture(scope='module')
def weights_dir(tmp_path_factory):
    """Release-format .pt files from a random-init reference model."""
    torch = pytest.importorskip('torch')
    from eve_tpu.utils import reference_bridge as bridge
    bridge.install_reference_shims(torch)
    wdir = tmp_path_factory.mktemp('released_weights')
    with bridge.reference_on_path():
        import models.eve as ref_eve_mod
        from core import DefaultConfig as RefConfig
        config = RefConfig()
        config.override('refine_net_enabled', True)
        config.override('load_screen_content', True)
        torch.manual_seed(33)
        model = ref_eve_mod.EVE(output_predictions=False)
        # Zero-init heads make the nets constant-output; perturb so the
        # comparison exercises real signal flow.
        with torch.no_grad():
            gen = torch.Generator().manual_seed(3)
            for w in (model.eye_net.fc_to_gaze[-2].weight,
                      model.refine_net.final[2].weight):
                w.copy_(torch.empty_like(w).uniform_(-0.01, 0.01,
                                                     generator=gen))
        from eve_tpu.utils.load_model import pretrained_filename
        torch.save(model.eye_net.state_dict(),
                   os.path.join(str(wdir),
                                pretrained_filename(config, 'eye_net')))
        torch.save(model.refine_net.state_dict(),
                   os.path.join(str(wdir),
                                pretrained_filename(config, 'refine_net')))
        # RefConfig is a process-wide singleton shared with the other
        # reference-parity test modules: revert the overrides.
        for k in ('refine_net_enabled', 'load_screen_content'):
            config.override(k, getattr(type(config), k))
    return str(wdir)


@pytest.mark.slow
def test_close_parity_gate_end_to_end(dataset_root, weights_dir, tmp_path,
                                      capsys, monkeypatch):
    from eve_tpu.config import DefaultConfig
    DefaultConfig._reset_instance_for_testing()
    sys.modules.pop('tools.close_parity_gate', None)
    monkeypatch.syspath_prepend('/root/repo')
    from tools import close_parity_gate
    # Don't touch the repo's BASELINE.md from a test.
    monkeypatch.setattr(close_parity_gate, 'BASELINE_MD',
                        str(tmp_path / 'BASELINE.md'))
    try:
        rc = close_parity_gate.main([
            '--datasrc-eve', dataset_root,
            '--pretrained-dir', weights_dir,
            '--participants', 'train01',
            '--cameras', 'webcam_c',
            '--stimuli', 'image',
            '--max-clips', '2',
            '--max-sequence-len', '6',
            '--write-baseline',
        ])
    finally:
        DefaultConfig._reset_instance_for_testing()
    out = capsys.readouterr().out
    assert rc == 0, out
    # Same weights, same clips, both stacks -> the gate must CLOSE.
    assert 'GATE CLOSED' in out, out
    assert 'Cross-stack per-frame PoG deltas' in out
    written = (tmp_path / 'BASELINE.md').read_text()
    assert 'Parity gate run' in written
    assert '| `metric_euc_PoG_px_final` |' in written


def test_close_parity_gate_runbook_on_missing_inputs(tmp_path, capsys,
                                                     monkeypatch):
    from eve_tpu.config import DefaultConfig
    DefaultConfig._reset_instance_for_testing()
    monkeypatch.syspath_prepend('/root/repo')
    monkeypatch.delenv('EVE_PRETRAINED_DIR', raising=False)
    from tools import close_parity_gate
    try:
        rc = close_parity_gate.main(['--datasrc-eve', str(tmp_path)])
    finally:
        DefaultConfig._reset_instance_for_testing()
    err = capsys.readouterr().err
    assert rc == 2
    assert 'Runbook' in err and 'EVE_PRETRAINED_DIR' in err
