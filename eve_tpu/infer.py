"""Inference harness: single-video dataset, weight loading, eval iterator.

Mirrors src/core/inference.py:40-127: hard config overrides, input-path
parsing into (participant, stimulus, camera), a batch-1 dataset over that
one video, weights from ``--resume-from`` checkpoints or local copies of the
released reference weights, and a no-grad iterator yielding numpy dicts.
"""

import logging
import os

import numpy as np

import jax

from eve_tpu.config import DefaultConfig
from eve_tpu.data.dataset import EVESequencesBase
from eve_tpu.data.loader import DataLoader, to_device_arrays
from eve_tpu.models import eve as eve_lib
from eve_tpu.train import harness
from eve_tpu.train.checkpoint import CheckpointManager
from eve_tpu.train.step import make_eval_step
from eve_tpu.utils.load_model import load_pretrained_params

logger = logging.getLogger(__name__)


def script_init_common(argv=None):
    config = DefaultConfig()
    config.override('fully_reproducible', True)
    config.override('refine_net_enabled', True)
    config.override('load_screen_content', True)
    config.override('load_full_frame_for_visualization', True)
    harness.script_init_common(argv=argv,
                               description='Run EVE inference on a video.')
    assert os.path.isfile(config.input_path), config.input_path
    assert config.output_path > ''
    return config


def init_dataset(config):
    components = config.input_path.split('/')
    person_id = components[-3]
    stimulus_type = components[-2].split('_')[1]
    camera_type = components[-1][:-4]
    for suffix in ('_eyes', '_face'):
        if camera_type.endswith(suffix):
            camera_type = camera_type[:-len(suffix)]
    assert stimulus_type in ('image', 'video', 'wikipedia')
    assert camera_type in ('webcam_l', 'webcam_c', 'webcam_r', 'basler')

    dataset = EVESequencesBase(
        config.datasrc_eve, config=config,
        participants_to_use=[person_id],
        cameras_to_use=[camera_type],
        types_of_stimuli=[stimulus_type],
        stimulus_name_includes=components[-2])
    dataloader = DataLoader(dataset, batch_size=1, shuffle=False,
                            drop_last=False, num_workers=2)
    return dataset, dataloader


def model_setup(config, pretrained_dir=None, require_weights=False):
    """Build spec + params from a run dir or released weights.

    ``require_weights=True`` raises instead of silently falling back to
    random initialization when neither --resume-from nor local pretrained
    files provide weights (serving/export entry points must never ship
    random predictions)."""
    spec = eve_lib.EveSpec.from_config(config)
    params = eve_lib.init_params(spec, jax.random.PRNGKey(0))

    if config.resume_from:
        assert os.path.isdir(config.resume_from)
        from eve_tpu.train.step import TrainState
        import jax.numpy as jnp
        dummy_state = TrainState(step=jnp.zeros((), jnp.int32),
                                 params=params, opt_state=())
        mgr = CheckpointManager(config.resume_from)
        state, last_step = mgr.load_last_checkpoint(dummy_state,
                                                    load_optimizer=False)
        assert last_step > 0, 'no checkpoint found in %s' % config.resume_from
        params = state.params
    else:
        logger.info('Loading default weights if possible '
                    '(no --resume-from specified).')
        eye = load_pretrained_params(config, 'eye_net', pretrained_dir)
        if eye is not None:
            params['eye_net'] = eye
        refine = load_pretrained_params(config, 'refine_net', pretrained_dir)
        if refine is not None:
            params['refine_net'] = refine
        if require_weights:
            # Check EVERY enabled submodule: serving with only the eye-net
            # release present would otherwise ship a randomly initialized
            # RefineNet without a word.
            missing = []
            if eye is None:
                missing.append('eye_net')
            if getattr(spec, 'refine_net_enabled', True) and refine is None:
                missing.append('refine_net')
            if missing:
                raise RuntimeError(
                    'No %s weights: pass --resume-from <run_dir> or place '
                    'the released weights under $EVE_PRETRAINED_DIR '
                    '(refusing to serve/export randomly initialized '
                    'parameters).' % ' + '.join(missing))
    return spec, params


def iterator(spec, params, dataloader, create_images=True, streaming=False,
             materialize_inputs=True, mesh=None):
    """Yield (step, inputs_np, outputs_np) per batch (reference :103-127).

    ``streaming=True`` carries the GRU/ConvGRU states across batches —
    correct when the loader yields consecutive clips of one video in order
    (the inference-CLI dataset does; batch_size must be 1). The reference
    resets recurrent state at every clip boundary; streaming produces the
    same results as processing the whole video as one clip.

    ``materialize_inputs=False`` skips the device->host copy of the input
    tensors (inputs_np then carries only the host-side extras) — the
    codalab evaluator reads only string metadata, and copying the eye/
    screen tensors back costs ~2 GB per 128-clip batch.

    ``mesh``: a 1-D ``jax.sharding.Mesh`` (axis ``data``) evaluates
    data-parallel: each batch's clip dim shards over the axis while the
    parameters replicate, so N chips evaluate N× the clips at one chip's
    latency (the eval analog of the training harness's data axis;
    per-clip results are independent, so values are unchanged). Requires
    the loader's batch size to divide by the axis (ragged final batches
    are already padded to the full size below). Incompatible with
    ``streaming`` (which is defined for batch_size=1).
    """
    import functools
    import jax as jax_lib
    from eve_tpu.models import eve as eve_lib

    shard_put = None
    if mesh is not None:
        if streaming:
            raise ValueError('mesh evaluation is batch-parallel; streaming '
                             'inference runs one clip (batch_size=1)')
        from eve_tpu.parallel import mesh as mesh_lib
        axis = mesh.axis_names[0]
        extent = mesh.shape[axis]
        full = getattr(dataloader, 'batch_size', 0) or 0
        if not full:
            # Both the divisibility check and the ragged-final-batch padding
            # key off the loader's fixed batch size; without it a
            # non-divisible batch would fail deep inside jax.device_put
            # with an opaque sharding error.
            raise ValueError(
                'mesh evaluation requires the dataloader to expose a '
                'positive batch_size attribute (needed to pad ragged final '
                'batches to a shardable shape)')
        if full % extent != 0:
            raise ValueError(
                'eval batch_size=%d must divide by the %d-device %r '
                'mesh axis' % (full, extent, axis))
        params = mesh_lib.replicate(mesh, params)
        shard_put = lambda b: mesh_lib.shard_batch(mesh, b, axis)

    if streaming:
        @functools.partial(jax_lib.jit, static_argnames=())
        def eval_step_stream(params, batch, states):
            return eve_lib.forward(spec, params, batch, training=False,
                                   output_predictions=True,
                                   create_images=create_images,
                                   initial_states=states, return_states=True)
        states = None
    else:
        eval_step = make_eval_step(spec, output_predictions=True,
                                   create_images=create_images)
    full_batch = getattr(dataloader, 'batch_size', None)
    for current_step, batch in enumerate(dataloader):
        # Pad a ragged final batch to the loader's fixed batch size BEFORE
        # device placement: eval_step is shape-specialized, and a one-off
        # shape would recompile the whole model for the last batch.
        B = next((v.shape[0] for v in batch.values()
                  if isinstance(v, np.ndarray)), None)
        pad = 0
        if not streaming and full_batch and B is not None and B < full_batch:
            pad = full_batch - B
            batch = {k: (np.concatenate([v, np.repeat(v[-1:], pad, axis=0)])
                         if isinstance(v, np.ndarray) else v)
                     for k, v in batch.items()}
        device_batch, host_extras = to_device_arrays(
            batch, device_put=shard_put)
        if streaming:
            if states is None:
                assert B == 1, 'streaming inference requires batch_size=1'
                states = eve_lib.init_stream_state(spec, B)
            outputs = eval_step_stream(params, device_batch, states)
            states = outputs.pop('states')
        else:
            outputs = eval_step(params, device_batch)
            if pad:
                outputs = {k: (v[:B] if hasattr(v, 'ndim') and v.ndim >= 1
                               and v.shape[0] == B + pad else v)
                           for k, v in outputs.items()}
        inputs_np = {}
        if materialize_inputs:
            inputs_np.update({k: np.asarray(v)[:B]
                              for k, v in device_batch.items()})
        inputs_np.update(host_extras)
        outputs_np = {k: np.asarray(v) for k, v in outputs.items()
                      if hasattr(v, 'shape')}
        # Original int64 timestamps for downstream writers.
        if 'timestamps_ns' in host_extras:
            outputs_np['timestamps'] = host_extras['timestamps_ns']
        yield current_step, inputs_np, outputs_np
