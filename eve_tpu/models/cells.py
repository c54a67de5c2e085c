"""Recurrent cells: dense RNN/LSTM/GRU and conv CRNN/CLSTM/CGRU.

Dense cells reproduce ``torch.nn.{RNN,LSTM,GRU}Cell`` gate math and parameter
layout (``weight_ih (G*H, in)``, ``weight_hh (G*H, H)`` with per-part biases)
so reference checkpoints convert 1:1. Conv cells reproduce the reference's
``CRNNCell/CLSTMCell/CGRUCell`` (``/root/reference/src/models/common.py:331-415``):
3x3 convolutions on channel-concatenated ``[x, h]`` (NHWC here), tanh/sigmoid
gates, zero initial state.

These cells are the *only* part of the network that runs inside the temporal
``lax.scan`` — everything conv-heavy around them is batched over (B*T).
"""

import jax
import jax.numpy as jnp
import flax.linen as nn

from eve_tpu.models.layers import Conv


def _uniform_rnn_init(hidden_size):
    """torch RNN cell param init: U(-1/sqrt(H), 1/sqrt(H)) for all params."""
    bound = 1.0 / float(hidden_size) ** 0.5

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class _DenseCellBase(nn.Module):
    """Shared parameter layout for torch-style dense cells."""
    hidden_size: int
    num_gates: int = 1

    def _linear_parts(self, x, h):
        init = _uniform_rnn_init(self.hidden_size)
        gh = self.num_gates * self.hidden_size
        w_ih = self.param('weight_ih', init, (gh, x.shape[-1]))
        w_hh = self.param('weight_hh', init, (gh, self.hidden_size))
        b_ih = self.param('bias_ih', init, (gh,))
        b_hh = self.param('bias_hh', init, (gh,))
        xi = x @ w_ih.T + b_ih
        hh = h @ w_hh.T + b_hh
        return xi, hh


class RNNCell(_DenseCellBase):
    """h' = tanh(W_ih x + b_ih + W_hh h + b_hh), as torch.nn.RNNCell."""
    num_gates: int = 1

    @nn.compact
    def __call__(self, x, h):
        xi, hh = self._linear_parts(x, h)
        new_h = jnp.tanh(xi + hh)
        return new_h, new_h

    def init_state(self, batch_size, dtype=jnp.float32):
        return jnp.zeros((batch_size, self.hidden_size), dtype)


class GRUCell(_DenseCellBase):
    """torch.nn.GRUCell gate math (r, z, n gate order)."""
    num_gates: int = 3

    @nn.compact
    def __call__(self, x, h):
        xi, hh = self._linear_parts(x, h)
        H = self.hidden_size
        r = jax.nn.sigmoid(xi[..., :H] + hh[..., :H])
        z = jax.nn.sigmoid(xi[..., H:2 * H] + hh[..., H:2 * H])
        n = jnp.tanh(xi[..., 2 * H:] + r * hh[..., 2 * H:])
        new_h = (1.0 - z) * n + z * h
        return new_h, new_h

    def init_state(self, batch_size, dtype=jnp.float32):
        return jnp.zeros((batch_size, self.hidden_size), dtype)


class LSTMCell(_DenseCellBase):
    """torch.nn.LSTMCell gate math (i, f, g, o gate order)."""
    num_gates: int = 4
    tuple_state = True

    @nn.compact
    def __call__(self, x, state):
        h, c = state
        xi, hh = self._linear_parts(x, h)
        H = self.hidden_size
        gates = xi + hh
        i = jax.nn.sigmoid(gates[..., :H])
        f = jax.nn.sigmoid(gates[..., H:2 * H])
        g = jnp.tanh(gates[..., 2 * H:3 * H])
        o = jax.nn.sigmoid(gates[..., 3 * H:])
        new_c = f * c + i * g
        new_h = o * jnp.tanh(new_c)
        return new_h, (new_h, new_c)

    def init_state(self, batch_size, dtype=jnp.float32):
        z = jnp.zeros((batch_size, self.hidden_size), dtype)
        return (z, z)


class ConvRNNCell(nn.Module):
    """h' = tanh(conv3x3([x, h])). Reference CRNNCell (common.py:331-352)."""
    hidden_size: int

    @nn.compact
    def __call__(self, x, h):
        hidden = Conv(self.hidden_size, 3, 1, 1, name='cell')(
            jnp.concatenate([x, h], axis=-1))
        new_h = jnp.tanh(hidden)
        return new_h, new_h

    def init_state(self, batch_size, hw, dtype=jnp.float32):
        return jnp.zeros((batch_size, hw[0], hw[1], self.hidden_size), dtype)


class ConvLSTMCell(nn.Module):
    """4-gate conv LSTM. Reference CLSTMCell (common.py:355-385)."""
    tuple_state = True
    hidden_size: int

    @nn.compact
    def __call__(self, x, state):
        h, c = state
        gates = Conv(4 * self.hidden_size, 3, 1, 1, name='gates')(
            jnp.concatenate([x, h], axis=-1))
        H = self.hidden_size
        in_gate = jax.nn.sigmoid(gates[..., :H])
        forget_gate = jax.nn.sigmoid(gates[..., H:2 * H])
        out_gate = jax.nn.sigmoid(gates[..., 2 * H:3 * H])
        cell_gate = jnp.tanh(gates[..., 3 * H:])
        new_c = forget_gate * c + in_gate * cell_gate
        new_h = out_gate * jnp.tanh(new_c)
        return new_h, (new_h, new_c)

    def init_state(self, batch_size, hw, dtype=jnp.float32):
        z = jnp.zeros((batch_size, hw[0], hw[1], self.hidden_size), dtype)
        return (z, z)


class ConvGRUCell(nn.Module):
    """2+1-gate conv GRU. Reference CGRUCell (common.py:388-415).

    Note the reference's concat order for the output gate: ``[reset*h, x]``.
    """
    hidden_size: int

    @nn.compact
    def __call__(self, x, h):
        gates_1 = Conv(2 * self.hidden_size, 3, 1, 1, name='gates_1')(
            jnp.concatenate([x, h], axis=-1))
        H = self.hidden_size
        reset = jax.nn.sigmoid(gates_1[..., :H])
        update = jax.nn.sigmoid(gates_1[..., H:])
        output = Conv(self.hidden_size, 3, 1, 1, name='gate_2')(
            jnp.concatenate([reset * h, x], axis=-1))
        output = jnp.tanh(output)
        new_h = (1.0 - update) * output + update * h
        return new_h, new_h

    def init_state(self, batch_size, hw, dtype=jnp.float32):
        return jnp.zeros((batch_size, hw[0], hw[1], self.hidden_size), dtype)


DENSE_CELLS = {'RNN': RNNCell, 'LSTM': LSTMCell, 'GRU': GRUCell}
CONV_CELLS = {'CRNN': ConvRNNCell, 'CLSTM': ConvLSTMCell, 'CGRU': ConvGRUCell}


def zero_state(cell_cls, hidden_size, batch_size, hw=None,
               dtype=jnp.float32):
    """Zero initial state for a cell CLASS (no Module instantiation).

    The single owner of per-cell-type state structure; models call this
    from their init_state helpers (flax forbids constructing a Module
    inside another module's method, so the class-level ``tuple_state``
    attribute carries the only structural difference).
    """
    shape = ((batch_size, hidden_size) if hw is None
             else (batch_size, hw[0], hw[1], hidden_size))
    z = jnp.zeros(shape, dtype)
    return (z, z) if getattr(cell_cls, 'tuple_state', False) else z
