"""Full-backbone parity: flax ResNet18-IN vs torch oracle, shared weights."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip('torch')

from eve_tpu.models.resnet import ResNet18IN  # noqa: E402
from eve_tpu.utils.torch_convert import (  # noqa: E402
    convert_eye_net, torch_state_dict_to_numpy)
from tests.torch_oracles import TorchResNet18IN  # noqa: E402


def test_resnet18_in_matches_torch(rng):
    tm = TorchResNet18IN(num_classes=16)
    tm.eval()
    # The converter expects reference EyeNet naming: cnn_layers.<...> with
    # torchvision layer names (layer1.0.conv1 etc.). Rename the oracle keys.
    sd = torch_state_dict_to_numpy(tm.state_dict())
    renamed = {}
    for k, v in sd.items():
        if k.startswith('layers.'):
            idx = int(k.split('.')[1])
            stage, block = idx // 2 + 1, idx % 2
            rest = k.split('.', 2)[2]
            renamed[f'cnn_layers.layer{stage}.{block}.{rest}'] = v
        else:
            renamed['cnn_layers.' + k] = v
    params = convert_eye_net(renamed)['cnn']

    x = rng.randn(2, 128, 128, 3).astype(np.float32) * 0.5
    model = ResNet18IN(num_classes=16)
    ours = np.asarray(model.apply({'params': params}, jnp.asarray(x)))
    with torch.no_grad():
        expected = tm(torch.tensor(np.transpose(x, (0, 3, 1, 2)))).numpy()
    np.testing.assert_allclose(ours, expected, atol=2e-4)
