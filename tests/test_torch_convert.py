"""Round-trip tests for the torch<->flax weight converters.

``convert_eye_net``/``convert_refine_net`` map the reference's release
checkpoints (src/utils/load_model.py:35-55) onto eve_tpu trees; the
``*_params_to_torch`` inverses export back. Round-tripping a random init
through torch layout pins both directions against each other — a layout
mistake on either side breaks equality.
"""

import numpy as np
import pytest

import jax

from eve_tpu.config import DefaultConfig
from eve_tpu.models import eve as eve_lib
from eve_tpu.utils import torch_convert


@pytest.fixture
def tiny_config():
    DefaultConfig._reset_instance_for_testing()
    cfg = DefaultConfig()
    cfg.import_dict({
        'eyes_size': [48, 48], 'max_sequence_len': 4,
        'load_screen_content': True, 'refine_net_enabled': True,
        'refine_net_use_skip_connections': True,
    })
    yield cfg
    DefaultConfig._reset_instance_for_testing()


def _tree_paths(tree, prefix=''):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_tree_paths(v, prefix + k + '/'))
        else:
            out[prefix + k] = np.asarray(v)
    return out


def _assert_trees_equal(a, b):
    fa, fb = _tree_paths(a), _tree_paths(b)
    assert set(fa) == set(fb), (
        'paths differ: only-a=%s only-b=%s'
        % (sorted(set(fa) - set(fb))[:5], sorted(set(fb) - set(fa))[:5]))
    for k in fa:
        np.testing.assert_array_equal(fa[k], fb[k], err_msg=k)


def test_eye_net_roundtrip(tiny_config):
    spec = eve_lib.EveSpec.from_config(tiny_config)
    params = eve_lib.init_params(spec, jax.random.PRNGKey(3))
    sd = torch_convert.eye_net_params_to_torch(params['eye_net'])
    # torch layout invariants: conv OIHW, linear (out, in)
    assert sd['cnn_layers.conv1.weight'].shape[:2] == (64, 3)
    back = torch_convert.convert_eye_net(sd)
    _assert_trees_equal(params['eye_net'], back)


def test_refine_net_roundtrip(tiny_config):
    spec = eve_lib.EveSpec.from_config(tiny_config)
    params = eve_lib.init_params(spec, jax.random.PRNGKey(4))
    sd = torch_convert.refine_net_params_to_torch(params['refine_net'])
    assert 'initial.0.weight' in sd and 'final.2.weight' in sd
    back = torch_convert.convert_refine_net(sd)
    _assert_trees_equal(params['refine_net'], back)


def test_save_reference_checkpoint_loads_back(tiny_config, tmp_path):
    pytest.importorskip('torch')
    spec = eve_lib.EveSpec.from_config(tiny_config)
    params = eve_lib.init_params(spec, jax.random.PRNGKey(5))
    path = str(tmp_path / 'eve_eyenet_GRU.pt')
    torch_convert.save_reference_checkpoint(path, params['eye_net'],
                                            'eye_net')
    back = torch_convert.load_reference_checkpoint(path, 'eye_net')
    _assert_trees_equal(params['eye_net'], back)
