"""Parity tests: layers and cells vs torch oracles with shared weights."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip('torch')
import torch.nn.functional as F  # noqa: E402

from eve_tpu.models import layers as L  # noqa: E402
from eve_tpu.models import cells as C  # noqa: E402
from tests.torch_oracles import conv_kernel_to_jax, nhwc  # noqa: E402


def test_instance_norm_matches_torch(rng):
    x = rng.randn(4, 9, 13, 8).astype(np.float32)
    xt = torch.tensor(np.transpose(x, (0, 3, 1, 2)))
    # affine-less
    expected = nhwc(torch.nn.InstanceNorm2d(8)(xt))
    ours = np.asarray(L.instance_norm(jnp.asarray(x)))
    np.testing.assert_allclose(ours, expected, atol=1e-5)
    # affine
    w = rng.randn(8).astype(np.float32)
    b = rng.randn(8).astype(np.float32)
    m = torch.nn.InstanceNorm2d(8, affine=True)
    with torch.no_grad():
        m.weight.copy_(torch.tensor(w))
        m.bias.copy_(torch.tensor(b))
    expected = nhwc(m(xt))
    ours = np.asarray(L.instance_norm(jnp.asarray(x), jnp.asarray(w),
                                      jnp.asarray(b)))
    np.testing.assert_allclose(ours, expected, atol=1e-5)


def test_conv_matches_torch(rng):
    x = rng.randn(2, 16, 20, 5).astype(np.float32)
    w = (rng.randn(7, 5, 3, 3) * 0.2).astype(np.float32)  # (O, I, KH, KW)
    b = rng.randn(7).astype(np.float32)
    conv = L.Conv(7, 3, 2, 1)
    params = {'params': {'kernel': jnp.asarray(np.transpose(w, (2, 3, 1, 0))),
                         'bias': jnp.asarray(b)}}
    ours = np.asarray(conv.apply(params, jnp.asarray(x)))
    xt = torch.tensor(np.transpose(x, (0, 3, 1, 2)))
    expected = nhwc(F.conv2d(xt, torch.tensor(w), torch.tensor(b),
                             stride=2, padding=1))
    np.testing.assert_allclose(ours, expected, atol=1e-4)


def test_adaptive_max_pool_matches_torch(rng):
    for in_hw, out_hw in [((72, 128), (36, 64)), ((9, 16), (5, 8)),
                          ((18, 32), (9, 16)), ((7, 11), (3, 5))]:
        x = rng.randn(2, *in_hw, 4).astype(np.float32)
        ours = np.asarray(L.adaptive_max_pool(jnp.asarray(x), out_hw))
        xt = torch.tensor(np.transpose(x, (0, 3, 1, 2)))
        expected = nhwc(F.adaptive_max_pool2d(xt, out_hw))
        np.testing.assert_allclose(ours, expected, atol=0, err_msg=str(in_hw))


def test_resize_bilinear_matches_torch(rng):
    for in_hw, out_hw in [((5, 8), (9, 16)), ((36, 64), (72, 128)),
                          ((72, 128), (72, 128))]:
        x = rng.randn(2, *in_hw, 3).astype(np.float32)
        ours = np.asarray(L.resize_bilinear(jnp.asarray(x), out_hw))
        xt = torch.tensor(np.transpose(x, (0, 3, 1, 2)))
        expected = nhwc(F.interpolate(xt, out_hw, mode='bilinear',
                                      align_corners=False))
        np.testing.assert_allclose(ours, expected, atol=1e-5,
                                   err_msg=str((in_hw, out_hw)))


def _dense_cell_params(tc):
    return {'params': {
        'weight_ih': jnp.asarray(tc.weight_ih.detach().numpy()),
        'weight_hh': jnp.asarray(tc.weight_hh.detach().numpy()),
        'bias_ih': jnp.asarray(tc.bias_ih.detach().numpy()),
        'bias_hh': jnp.asarray(tc.bias_hh.detach().numpy()),
    }}


def test_gru_cell_matches_torch(rng):
    x = rng.randn(6, 32).astype(np.float32)
    h = rng.randn(6, 16).astype(np.float32)
    tc = torch.nn.GRUCell(32, 16)
    expected = tc(torch.tensor(x), torch.tensor(h)).detach().numpy()
    cell = C.GRUCell(hidden_size=16)
    out, new_h = cell.apply(_dense_cell_params(tc), jnp.asarray(x),
                            jnp.asarray(h))
    np.testing.assert_allclose(np.asarray(out), expected, atol=1e-5)
    np.testing.assert_allclose(np.asarray(new_h), expected, atol=1e-5)


def test_lstm_cell_matches_torch(rng):
    x = rng.randn(6, 32).astype(np.float32)
    h = rng.randn(6, 16).astype(np.float32)
    c0 = rng.randn(6, 16).astype(np.float32)
    tc = torch.nn.LSTMCell(32, 16)
    eh, ec = tc(torch.tensor(x), (torch.tensor(h), torch.tensor(c0)))
    cell = C.LSTMCell(hidden_size=16)
    out, (nh, nc) = cell.apply(_dense_cell_params(tc), jnp.asarray(x),
                               (jnp.asarray(h), jnp.asarray(c0)))
    np.testing.assert_allclose(np.asarray(nh), eh.detach().numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(nc), ec.detach().numpy(), atol=1e-5)


def test_rnn_cell_matches_torch(rng):
    x = rng.randn(6, 32).astype(np.float32)
    h = rng.randn(6, 16).astype(np.float32)
    tc = torch.nn.RNNCell(32, 16)
    expected = tc(torch.tensor(x), torch.tensor(h)).detach().numpy()
    cell = C.RNNCell(hidden_size=16)
    out, _ = cell.apply(_dense_cell_params(tc), jnp.asarray(x), jnp.asarray(h))
    np.testing.assert_allclose(np.asarray(out), expected, atol=1e-5)


def test_cgru_cell_matches_torch(rng):
    from tests.torch_oracles import TorchCGRUCell
    tc = TorchCGRUCell(12, 8)
    x = rng.randn(2, 5, 8, 12).astype(np.float32)
    h = rng.randn(2, 5, 8, 8).astype(np.float32)
    params = {'params': {
        'gates_1': {'kernel': jnp.asarray(conv_kernel_to_jax(tc.gates_1.weight)),
                    'bias': jnp.asarray(tc.gates_1.bias.detach().numpy())},
        'gate_2': {'kernel': jnp.asarray(conv_kernel_to_jax(tc.gate_2.weight)),
                   'bias': jnp.asarray(tc.gate_2.bias.detach().numpy())},
    }}
    cell = C.ConvGRUCell(hidden_size=8)
    out, _ = cell.apply(params, jnp.asarray(x), jnp.asarray(h))
    expected = nhwc(tc(torch.tensor(np.transpose(x, (0, 3, 1, 2))),
                       torch.tensor(np.transpose(h, (0, 3, 1, 2)))))
    np.testing.assert_allclose(np.asarray(out), expected, atol=1e-5)


def test_clstm_cell_matches_torch(rng):
    from tests.torch_oracles import TorchCLSTMCell
    tc = TorchCLSTMCell(12, 8)
    x = rng.randn(2, 5, 8, 12).astype(np.float32)
    h = rng.randn(2, 5, 8, 8).astype(np.float32)
    c0 = rng.randn(2, 5, 8, 8).astype(np.float32)
    params = {'params': {
        'gates': {'kernel': jnp.asarray(conv_kernel_to_jax(tc.gates.weight)),
                  'bias': jnp.asarray(tc.gates.bias.detach().numpy())},
    }}
    cell = C.ConvLSTMCell(hidden_size=8)
    out, (nh, nc) = cell.apply(params, jnp.asarray(x),
                               (jnp.asarray(h), jnp.asarray(c0)))
    eh, ec = tc(torch.tensor(np.transpose(x, (0, 3, 1, 2))),
                torch.tensor(np.transpose(h, (0, 3, 1, 2))),
                torch.tensor(np.transpose(c0, (0, 3, 1, 2))))
    np.testing.assert_allclose(np.asarray(nh), nhwc(eh), atol=1e-5)
    np.testing.assert_allclose(np.asarray(nc), nhwc(ec), atol=1e-5)


def test_selu_matches_torch(rng):
    x = rng.randn(100).astype(np.float32)
    expected = F.selu(torch.tensor(x)).numpy()
    np.testing.assert_allclose(np.asarray(L.selu(jnp.asarray(x))), expected,
                               atol=1e-6)
