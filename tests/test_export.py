"""Tests for AOT export (eve_tpu/export.py): artifact round trip equals
the live model, streaming artifacts carry state, and the CLI writes a
loadable file from a checkpoint."""

import numpy as np
import jax
import pytest

from eve_tpu.data.synthetic import make_synthetic_batch
from eve_tpu.export import export_inference, load_exported
from eve_tpu.models import eve as eve_lib


@pytest.fixture(scope='module')
def spec():
    return eve_lib.EveSpec(refine_net_enabled=True, load_screen_content=True)


@pytest.fixture(scope='module')
def params(spec):
    return eve_lib.init_params(spec, jax.random.PRNGKey(0))


def _batch(seed, B=1, T=3, with_gt=False):
    rng = np.random.RandomState(seed)
    return make_synthetic_batch(rng, batch_size=B, sequence_len=T,
                                eyes_size=32, with_gt=with_gt)


@pytest.mark.slow
def test_round_trip_matches_live_forward(spec, params, tmp_path):
    batch = _batch(0)
    blob = export_inference(spec, params, batch)
    path = tmp_path / 'model.eve'
    path.write_bytes(blob)

    model = load_exported(str(path))
    assert not model.streaming
    out = model(batch)

    import jax.numpy as jnp
    ref = eve_lib.forward(spec, params,
                          {k: jnp.asarray(v) for k, v in batch.items()},
                          training=False, output_predictions=True)
    for key in ('PoG_px_initial', 'PoG_px_final', 'left_pupil_size'):
        np.testing.assert_allclose(np.asarray(out[key]),
                                   np.asarray(ref[key]),
                                   rtol=1e-5, atol=1e-4, err_msg=key)
    # GT-less example batch => predictions-only artifact (no loss keys).
    assert all(not k.startswith('loss') for k in out)


@pytest.mark.slow
def test_streaming_artifact_carries_state(spec, params):
    T = 4
    batch = _batch(1, T=T)
    chunk0 = {k: (v[:, :T // 2] if v.ndim >= 2 and v.shape[1] == T else v)
              for k, v in batch.items()}
    chunk1 = {k: (v[:, T // 2:] if v.ndim >= 2 and v.shape[1] == T else v)
              for k, v in batch.items()}

    blob = export_inference(spec, params, chunk0, streaming=True)
    model = load_exported(blob)
    assert model.streaming

    states = eve_lib.init_stream_state(spec, 1)
    out0 = model(chunk0, states)
    out1 = model(chunk1, out0['states'])

    import jax.numpy as jnp
    full = eve_lib.forward(spec, params,
                           {k: jnp.asarray(v) for k, v in batch.items()},
                           training=False, output_predictions=True)
    streamed = np.concatenate([np.asarray(out0['PoG_px_final']),
                               np.asarray(out1['PoG_px_final'])], axis=1)
    np.testing.assert_allclose(streamed, np.asarray(full['PoG_px_final']),
                               rtol=1e-4, atol=1e-3)


@pytest.mark.slow
def test_serving_engine_from_streaming_artifact(spec, params):
    """ServingEngine(artifact=...) serves sessions from a streaming AOT
    export — no model code or checkpoint at serving time — with results
    equal to the live forward, and rejects foreign signatures."""
    from eve_tpu.serve import ServingEngine

    T = 4
    example = _batch(3, B=2, T=T // 2)
    blob = export_inference(spec, params, example, streaming=True)
    engine = ServingEngine(artifact=blob, max_delay_ms=10.0)
    try:
        assert engine.max_batch == 2  # taken from the artifact
        full = _batch(4, B=1, T=T)
        sid = engine.open_session()
        outs = []
        for t0 in (0, T // 2):
            chunk = {k: (v[0, t0:t0 + T // 2]
                         if v.ndim >= 2 and v.shape[1] == T else v[0])
                     for k, v in full.items()}
            outs.append(engine.infer(chunk, session_id=sid, timeout=600))
        engine.close_session(sid)

        import jax.numpy as jnp
        ref = eve_lib.forward(spec, params,
                              {k: jnp.asarray(v) for k, v in full.items()},
                              training=False, output_predictions=True)
        streamed = np.concatenate([o['PoG_px_final'] for o in outs], axis=0)
        np.testing.assert_allclose(streamed,
                                   np.asarray(ref['PoG_px_final'])[0],
                                   rtol=1e-4, atol=1e-3)

        # A request with a different T does not match the artifact's one
        # exported signature and must fail with a clear error.
        bad = {k: (v[0, :3] if v.ndim >= 2 and v.shape[1] == T else v[0])
               for k, v in full.items()}
        with pytest.raises(RuntimeError, match='signature'):
            engine.infer(bad, timeout=600)
    finally:
        engine.stop()


@pytest.mark.slow
def test_serving_engine_from_nonstreaming_artifact(spec, params):
    """A stateless artifact serves stateless requests; sessions are
    refused up front (they would silently reset state every chunk)."""
    from eve_tpu.serve import ServingEngine

    example = _batch(5, B=2, T=3)
    blob = export_inference(spec, params, example)
    engine = ServingEngine(artifact=blob, max_delay_ms=10.0)
    try:
        with pytest.raises(RuntimeError, match='streaming'):
            engine.open_session()
        clip = {k: v[0] for k, v in _batch(6, B=1, T=3).items()}
        out = engine.infer(clip, timeout=600)
        import jax.numpy as jnp
        ref = eve_lib.forward(
            spec, params,
            {k: jnp.asarray(v)[None] for k, v in clip.items()},
            training=False, output_predictions=True)
        np.testing.assert_allclose(out['PoG_px_final'],
                                   np.asarray(ref['PoG_px_final'])[0],
                                   rtol=1e-4, atol=1e-3)
    finally:
        engine.stop()


def test_rejects_foreign_file(tmp_path):
    path = tmp_path / 'bogus.eve'
    path.write_bytes(b'not an artifact' * 10)
    with pytest.raises(AssertionError, match='artifact'):
        load_exported(str(path))


@pytest.mark.slow
def test_export_cli(spec, params, tmp_path, monkeypatch):
    """Save a checkpoint in the production layout, export via the CLI,
    reload and run the artifact."""
    import jax.numpy as jnp

    import export_model
    from eve_tpu.config import DefaultConfig
    from eve_tpu.train.checkpoint import CheckpointManager
    from eve_tpu.train.logging_utils import Tensorboard
    from eve_tpu.train.step import TrainState

    DefaultConfig._reset_instance_for_testing()
    Tensorboard._reset_for_testing()
    monkeypatch.chdir(tmp_path)
    try:
        run_dir = tmp_path / 'run'
        state = TrainState(step=jnp.zeros((), jnp.int32),
                           params=params, opt_state=())
        CheckpointManager(str(run_dir)).save_at_step(3, state)

        out_path = tmp_path / 'model.eve'
        export_model.main([
            '--resume-from', str(run_dir),
            '--export-path', str(out_path),
            '--export-batch-size', '1',
            '--max-sequence-len', '3',
            '--eyes-size', '[32, 32]',
        ])
        model = load_exported(str(out_path))
        out = model(_batch(2, T=3))
        assert np.asarray(out['PoG_px_final']).shape == (1, 3, 2)
    finally:
        DefaultConfig._reset_instance_for_testing()
        Tensorboard._reset_for_testing()
