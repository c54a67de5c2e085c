"""Tests for the config system (reference key names, precedence, immutability)."""

import json
import os

import pytest

from eve_tpu.config import DefaultConfig


@pytest.fixture
def config():
    DefaultConfig._reset_instance_for_testing()
    yield DefaultConfig()
    DefaultConfig._reset_instance_for_testing()


def test_singleton(config):
    assert DefaultConfig() is config


def test_reference_key_names_present(config):
    # Spot-check keys the reference JSON configs rely on.
    for key in ('batch_size', 'eye_net_rnn_type', 'refine_net_rnn_type',
                'gaze_heatmap_sigma_initial', 'loss_coeff_g_ang_initial',
                'assumed_frame_rate', 'max_sequence_len', 'datasrc_eve',
                'checkpoints_keep_n', 'gaze_history_map_decay_per_ms'):
        assert hasattr(config, key), key


def test_learning_rate_property(config):
    assert config.learning_rate == config.batch_size * config.base_learning_rate
    config.override('batch_size', 32)
    assert config.learning_rate == 32 * config.base_learning_rate


def test_immutability(config):
    with pytest.raises(AttributeError):
        config.batch_size = 99
    config.override('batch_size', 99)
    assert config.batch_size == 99


def test_import_dict_type_checks(config):
    config.import_dict({'num_epochs': 3})  # int -> float coercion
    assert config.num_epochs == 3.0
    with pytest.raises(TypeError):
        config.import_dict({'batch_size': 'huge'})
    with pytest.raises(ValueError):
        config.import_dict({'nonexistent_key': 1})
    config.import_dict({'nonexistent_key': 1}, strict=False)  # ignored


def test_reference_json_configs_import(config):
    """The reference's shipped JSON configs must import unmodified."""
    ref_dir = '/root/reference/src/configs'
    if not os.path.isdir(ref_dir):
        pytest.skip('reference configs not available')
    config.import_json(os.path.join(ref_dir, 'eye_net.json'))
    assert config.batch_size == 16
    assert config.eye_net_rnn_type == 'GRU'
    config.import_json(os.path.join(ref_dir, 'refine_net.json'))
    assert config.refine_net_enabled is True
    assert config.refine_net_rnn_type == 'CLSTM'
    assert config.load_screen_content is True


def test_video_decoder_codec_warns_on_nvdec(config, caplog):
    """The reference honors nvdec/h264_cuvid hardware decode
    (src/datasources/common.py:112-117); TPU hosts have no NVDEC, so the
    key is accepted for config compatibility but must WARN instead of
    silently doing nothing."""
    import logging
    with caplog.at_level(logging.WARNING, logger='eve_tpu.config'):
        config.override('video_decoder_codec', 'nvdec')
    assert any('not supported on TPU hosts' in r.getMessage()
               for r in caplog.records), caplog.records
    caplog.clear()
    with caplog.at_level(logging.WARNING, logger='eve_tpu.config'):
        config.override('video_decoder_codec', 'libx264')
    assert not caplog.records


def test_full_json_and_provenance(config, tmp_path):
    full = json.loads(config.get_full_json())
    assert full['batch_size'] == config.batch_size
    assert 'learning_rate' in full  # property included in dump
    config.write_file_contents(str(tmp_path))
    assert (tmp_path / 'configs' / 'combined.json').is_file()
    assert (tmp_path / 'src.zip').is_file()


def test_config_docs_in_sync(config):
    """docs/CONFIG.md is generated from eve_tpu/config.py and must (a) be
    regeneration-stable against the current source and (b) document every
    public config key."""
    import re
    import sys
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, os.path.join(repo, 'tools'))
    try:
        import gen_config_docs
    finally:
        sys.path.pop(0)
    text = gen_config_docs.render(gen_config_docs.parse_class_body())
    with open(os.path.join(repo, 'docs', 'CONFIG.md')) as f:
        assert f.read() == text, (
            'docs/CONFIG.md is stale; run python tools/gen_config_docs.py')
    documented = set(re.findall(r'^\| `(\w+)`', text, re.MULTILINE))
    documented |= set(re.findall(r'\*\*`(\w+)`\*\* \(derived property',
                                 text))
    public = {k for k in vars(DefaultConfig)
              if not k.startswith('_') and
              not callable(getattr(DefaultConfig, k))}
    missing = public - documented
    assert not missing, 'undocumented config keys: %s' % sorted(missing)
