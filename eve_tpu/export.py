"""AOT model export: serialize the jitted EVE inference step to a
portable StableHLO artifact (``jax.export``).

The artifact bakes the weights in as constants, so deployment needs only
this one file: no Python model code, no checkpoint directory, no tracing
at serving time — the serving process deserializes and calls. This is the
TPU-native analog of the reference's released ``.pt`` weights
(``/root/reference/src/utils/load_model.py:32-52``) upgraded to a
self-contained compiled program.

Artifact layout (``.eve`` file): a 16-byte header (magic + version +
flags) followed by the ``jax.export`` serialization. The streaming flag
records whether the function signature is ``f(batch) -> outputs`` or
``f(batch, states) -> outputs + {'states': ...}``.
"""

import io
import struct

import numpy as np

import jax

from eve_tpu.models import eve as eve_lib

_MAGIC = b'EVETPU\x00\x01'
_HEADER = struct.Struct('<8sII')  # magic, version, flags
_FLAG_STREAMING = 1

# Prediction keys the exported function returns (when computable from the
# example batch) — the single source is the serving layer's constant.
from eve_tpu.serve import DEFAULT_SERVED_OUTPUTS as EXPORTED_OUTPUTS  # noqa: E402


def _abstractify(batch):
    out = {}
    for k, v in batch.items():
        if isinstance(v, jax.ShapeDtypeStruct):
            out[k] = v
        else:
            arr = np.asarray(v)
            out[k] = jax.ShapeDtypeStruct(arr.shape, arr.dtype)
    return out


def export_inference(spec, params, example_batch, streaming=False,
                     platforms=None):
    """Serialize the inference step for ``example_batch``'s signature.

    Args:
      spec: ``EveSpec``; weights from ``params`` are baked into the
        artifact as constants.
      example_batch: dict of arrays (or ShapeDtypeStructs) fixing the
        input keys/shapes/dtypes. Build it without ground-truth keys to
        export a predictions-only server artifact.
      streaming: export ``f(batch, states)`` carrying recurrent state
        across chunks (see ``eve_tpu.models.eve.init_stream_state``).
      platforms: lowering platforms (default: current backend).

    Returns: artifact bytes (write to a ``.eve`` file).
    """
    from jax import export as jexport

    def predictions(out):
        keep = {k: out[k] for k in EXPORTED_OUTPUTS if k in out}
        assert keep, 'no prediction outputs; check the example batch keys'
        return keep

    if streaming:
        def fn(batch, states):
            out = eve_lib.forward(spec, params, batch, training=False,
                                  output_predictions=True,
                                  initial_states=states, return_states=True)
            keep = predictions(out)
            keep['states'] = out['states']
            return keep

        B = next(iter(example_batch.values())).shape[0]
        state_abs = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype),
            eve_lib.init_stream_state(spec, B))
        exported = jexport.export(
            jax.jit(fn), platforms=platforms)(
                _abstractify(example_batch), state_abs)
        flags = _FLAG_STREAMING
    else:
        def fn(batch):
            out = eve_lib.forward(spec, params, batch, training=False,
                                  output_predictions=True)
            return predictions(out)

        exported = jexport.export(
            jax.jit(fn), platforms=platforms)(_abstractify(example_batch))
        flags = 0

    blob = exported.serialize()
    buf = io.BytesIO()
    buf.write(_HEADER.pack(_MAGIC, 1, flags))
    buf.write(blob)
    return buf.getvalue()


class ExportedModel:
    """A deserialized artifact; call like the original jitted step."""

    def __init__(self, exported, streaming):
        self._exported = exported
        self.streaming = streaming
        self._call = jax.jit(exported.call)

    @property
    def input_signature(self):
        return self._exported.in_avals

    @property
    def aval_tree(self):
        """Input avals as the original (args, kwargs) pytree: args[0] is
        the batch dict of ShapeDtypeStructs, args[1] the states tree for a
        streaming artifact."""
        args, _kwargs = jax.tree_util.tree_unflatten(
            self._exported.in_tree, list(self._exported.in_avals))
        return args

    def __call__(self, batch, states=None):
        if self.streaming:
            assert states is not None, 'streaming artifact needs states'
            return self._call(batch, states)
        assert states is None, (
            'states passed to a non-streaming artifact (it would silently '
            'reset recurrent state every chunk); export with streaming=True')
        return self._call(batch)


def load_exported(data):
    """Load an artifact produced by :func:`export_inference`.

    Accepts bytes or a file path; returns an :class:`ExportedModel`.
    """
    from jax import export as jexport

    if not isinstance(data, bytes):
        with open(data, 'rb') as f:
            data = f.read()
    magic, version, flags = _HEADER.unpack_from(data)
    assert magic == _MAGIC, 'not an eve_tpu export artifact'
    assert version == 1, 'unsupported artifact version %d' % version
    exported = jexport.deserialize(data[_HEADER.size:])
    return ExportedModel(exported, bool(flags & _FLAG_STREAMING))
