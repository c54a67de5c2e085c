"""Tests for the serving engine and HTTP front-end (eve_tpu/serve.py).

The engine is a TPU-native addition (the reference has no serving path);
these tests pin its contract: micro-batched results equal direct forwards,
session state carries across chunks exactly like streaming inference, and
same-session chunks are processed in submission order even when submitted
concurrently.
"""

import http.client
import io
import json
import threading

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from eve_tpu.data.synthetic import make_synthetic_batch
from eve_tpu.models import eve as eve_lib
from eve_tpu.serve import (DEFAULT_SERVED_OUTPUTS, EngineOverloadedError,
                           ServingEngine, UnknownSessionError,
                           make_http_server)


@pytest.fixture(scope='module')
def spec():
    return eve_lib.EveSpec(refine_net_enabled=True, load_screen_content=True)


@pytest.fixture(scope='module')
def params(spec):
    return eve_lib.init_params(spec, jax.random.PRNGKey(0))


def _clips(seed, n, T=3):
    """n single-clip input dicts (leading dim T, no batch dim)."""
    rng = np.random.RandomState(seed)
    batch = make_synthetic_batch(rng, batch_size=n, sequence_len=T,
                                 eyes_size=32)
    return [{k: v[i] for k, v in batch.items()} for i in range(n)]


def _direct(spec, params, clip):
    batch = {k: jnp.asarray(v)[None] for k, v in clip.items()}
    return eve_lib.forward(spec, params, batch, training=False,
                           output_predictions=True)


@pytest.mark.slow
def test_engine_matches_direct_forward(spec, params):
    engine = ServingEngine(spec, params, max_batch=4, max_delay_ms=200.0)
    try:
        clips = _clips(0, 3)
        futures = [engine.submit(c) for c in clips]
        results = [f.result(timeout=300) for f in futures]
        for clip, res in zip(clips, results):
            ref = _direct(spec, params, clip)
            for key in ('PoG_px_initial', 'PoG_px_final',
                        'left_pupil_size'):
                np.testing.assert_allclose(
                    res[key], np.asarray(ref[key])[0],
                    rtol=1e-4, atol=1e-3, err_msg=key)
        # 3 requests submitted back-to-back within the 200 ms gather
        # window must actually SHARE batches (fewer batches than
        # requests), or the micro-batcher is broken.
        assert engine.stats['requests'] == 3
        assert engine.stats['batches'] < 3
    finally:
        engine.stop()


def test_session_state_matches_streaming(spec, params):
    """Chunks through a session == the full clip in one forward."""
    engine = ServingEngine(spec, params, max_batch=2, max_delay_ms=1.0)
    try:
        T = 4
        [clip] = _clips(1, 1, T=T)
        sid = engine.open_session()
        outs = []
        for t0 in (0, T // 2):
            chunk = {k: (v[t0:t0 + T // 2] if v.ndim >= 1 and
                         v.shape[0] == T else v)
                     for k, v in clip.items()}
            outs.append(engine.infer(chunk, session_id=sid, timeout=300))
        engine.close_session(sid)

        full = _direct(spec, params, clip)
        for key in ('PoG_px_initial', 'PoG_px_final', 'left_pupil_size'):
            streamed = np.concatenate([o[key] for o in outs], axis=0)
            np.testing.assert_allclose(streamed, np.asarray(full[key])[0],
                                       rtol=1e-4, atol=1e-3, err_msg=key)
    finally:
        engine.stop()


def test_concurrent_sessions_stay_isolated_and_ordered(spec, params):
    """Two sessions' interleaved chunks give each session the same results
    as its own sequential streaming run; same-session chunks submitted
    together are processed in order (the engine defers the second)."""
    engine = ServingEngine(spec, params, max_batch=4, max_delay_ms=20.0)
    try:
        T = 4
        clips = _clips(2, 2, T=T)
        sids = [engine.open_session() for _ in clips]
        futures = {0: [], 1: []}
        # Submit both chunks of both sessions at once.
        for t0 in (0, T // 2):
            for i, (clip, sid) in enumerate(zip(clips, sids)):
                chunk = {k: (v[t0:t0 + T // 2] if v.ndim >= 1 and
                             v.shape[0] == T else v)
                         for k, v in clip.items()}
                futures[i].append(engine.submit(chunk, session_id=sid))
        for i, clip in enumerate(clips):
            outs = [f.result(timeout=300) for f in futures[i]]
            full = _direct(spec, params, clip)
            for key in ('PoG_px_final', 'left_pupil_size'):
                streamed = np.concatenate([o[key] for o in outs], axis=0)
                np.testing.assert_allclose(
                    streamed, np.asarray(full[key])[0],
                    rtol=1e-4, atol=1e-3, err_msg=f'session{i}:{key}')
    finally:
        engine.stop()


@pytest.mark.slow
def test_mixed_signatures_are_batched_separately(spec, params):
    """Requests with different (shape, dtype) signatures submitted together
    are deferred into separate batches, each with its own compilation, and
    all resolve to the correct per-signature results."""
    engine = ServingEngine(spec, params, max_batch=4, max_delay_ms=20.0)
    try:
        short = _clips(5, 2, T=2)
        long_ = _clips(6, 1, T=3)
        futures = [engine.submit(c) for c in short + long_]
        results = [f.result(timeout=600) for f in futures]
        for clip, res in zip(short + long_, results):
            ref = _direct(spec, params, clip)
            np.testing.assert_allclose(
                res['PoG_px_final'], np.asarray(ref['PoG_px_final'])[0],
                rtol=1e-4, atol=1e-3)
        assert engine.stats['requests'] == 3
        assert engine.stats['batches'] >= 2  # one per signature at least
    finally:
        engine.stop()


def test_unknown_session_rejected(spec, params):
    engine = ServingEngine(spec, params, max_batch=2, max_delay_ms=1.0)
    try:
        [clip] = _clips(3, 1)
        with pytest.raises(UnknownSessionError):
            engine.submit(clip, session_id='nope')
    finally:
        engine.stop()


def test_session_closed_before_dispatch_fails_request(spec, params):
    """A session deleted between submit and dispatch fails the chunk
    instead of silently running it on freshly-zeroed state."""
    engine = ServingEngine(spec, params, max_batch=2, max_delay_ms=700.0)
    try:
        [clip] = _clips(7, 1)
        sid = engine.open_session()
        fut = engine.submit(clip, session_id=sid)
        engine.close_session(sid)  # within the 700 ms gather window
        with pytest.raises(UnknownSessionError):
            fut.result(timeout=600)
        assert engine.stats['errors'] == 1
    finally:
        engine.stop()


def test_stop_fails_pending_requests_promptly(spec, params):
    """stop() resolves queued futures with an error instead of leaving
    callers blocked until their timeout. (submit() itself refuses after
    stop — see test_submit_after_stop_raises — so the undrained request is
    planted directly in the queue, as the submit/stop race would.)"""
    import time as time_mod

    from eve_tpu.serve import _Request

    engine = ServingEngine(spec, params, max_batch=2, max_delay_ms=1.0)
    engine._stop.set()  # freeze the batcher before it can drain the queue
    engine._thread.join(timeout=10.0)
    [clip] = _clips(8, 1)
    req = _Request(inputs=clip, session_id=None,
                   enqueued_at=time_mod.monotonic())
    engine._queue.put_nowait(req)
    t0 = time_mod.monotonic()
    engine.stop()
    with pytest.raises(RuntimeError, match='stopped'):
        req.future.result(timeout=60)
    assert time_mod.monotonic() - t0 < 10


def test_drain_completes_accepted_requests_then_rejects(spec, params):
    """drain() = graceful SIGTERM shutdown: accepted requests RESOLVE with
    results (not errors), new submissions get EngineDrainingError, stats
    expose the draining flag, and the engine ends stopped."""
    from eve_tpu.serve import EngineDrainingError

    engine = ServingEngine(spec, params, max_batch=4, max_delay_ms=20.0)
    try:
        clips = _clips(21, 3)
        futures = [engine.submit(c) for c in clips]
        engine.drain(timeout=300.0)
        for f in futures:
            out = f.result(timeout=1)  # already resolved, with a RESULT
            assert np.isfinite(np.asarray(out['PoG_px_final'])).all()
        stats = engine.get_stats()
        assert stats['draining'] is True
        assert stats['inflight'] == 0, \
            'every accepted request must be accounted resolved after drain'
        before = stats['rejected_draining']
        with pytest.raises(EngineDrainingError, match='draining'):
            engine.submit(clips[0])
        # New sessions are refused too: binding a stream to a dying backend
        # would mislead clients into retrying against it.
        with pytest.raises(EngineDrainingError, match='no new sessions'):
            engine.open_session()
        assert engine.get_stats()['rejected_draining'] == before + 2, \
            'draining rejections must be observable in stats'
    finally:
        engine.stop()


def test_http_returns_503_while_draining(spec, params):
    """The HTTP front-end maps EngineDrainingError to 503 (route-elsewhere
    signal), distinct from 429 overload."""
    import http.client

    from eve_tpu.serve import make_http_server

    engine = ServingEngine(spec, params, max_batch=2, max_delay_ms=1.0)
    server = make_http_server(engine, host='127.0.0.1', port=0)
    import threading
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        import json as json_mod
        conn0 = http.client.HTTPConnection(*server.server_address,
                                           timeout=30)
        conn0.request('GET', '/healthz')
        r0 = conn0.getresponse()
        assert r0.status == 200
        assert json_mod.loads(r0.read())['status'] == 'ok'

        engine.drain(timeout=10.0)  # no pending work: drains immediately

        conn0 = http.client.HTTPConnection(*server.server_address,
                                           timeout=30)
        conn0.request('GET', '/healthz')
        r1 = conn0.getresponse()
        assert r1.status == 503, 'draining backend must fail readiness'
        assert json_mod.loads(r1.read())['status'] == 'draining'

        [clip] = _clips(23, 1)
        import io
        buf = io.BytesIO()
        np.savez(buf, **clip)
        conn = http.client.HTTPConnection(*server.server_address, timeout=30)
        conn.request('POST', '/v1/infer', body=buf.getvalue(),
                     headers={'Content-Type': 'application/octet-stream'})
        resp = conn.getresponse()
        assert resp.status == 503, resp.status
        assert b'draining' in resp.read()

        conn2 = http.client.HTTPConnection(*server.server_address,
                                           timeout=30)
        conn2.request('POST', '/v1/sessions')
        r2 = conn2.getresponse()
        assert r2.status == 503, 'no new sessions on a draining backend'
        assert b'draining' in r2.read()
    finally:
        server.shutdown()
        engine.stop()


def test_server_close_joins_handlers_despite_idle_keepalive(spec, params):
    """Graceful shutdown joins handler threads (so in-flight responses are
    flushed before interpreter exit, instead of daemon threads being
    killed mid-write), and the join is BOUNDED: an idle keep-alive
    connection is released by the handler read timeout rather than
    pinning server_close() forever."""
    import http.client
    import threading
    import time as time_mod

    from eve_tpu.serve import make_http_server

    engine = ServingEngine(spec, params, max_batch=2, max_delay_ms=1.0)
    server = make_http_server(engine, host='127.0.0.1', port=0,
                              keepalive_timeout_s=0.5)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    conn = http.client.HTTPConnection(*server.server_address, timeout=30)
    try:
        conn.request('GET', '/healthz')
        assert conn.getresponse().read()  # handler now idles on keep-alive
        server.shutdown()
        engine.stop()
        t0 = time_mod.monotonic()
        server.server_close()  # joins the idle handler thread
        elapsed = time_mod.monotonic() - t0
        assert elapsed < 10, (
            'server_close blocked %.1fs on an idle keep-alive connection'
            % elapsed)
    finally:
        conn.close()
        engine.stop()


def test_signature_limit(spec, params):
    """Beyond max_signatures distinct input shapes, requests fail fast
    instead of compiling unboundedly."""
    engine = ServingEngine(spec, params, max_batch=2, max_delay_ms=1.0,
                           max_signatures=1)
    try:
        [a] = _clips(9, 1, T=2)
        [b] = _clips(10, 1, T=3)
        engine.infer(a, timeout=600)  # occupies the single signature slot
        with pytest.raises(RuntimeError, match='signature limit'):
            engine.infer(b, timeout=600)
    finally:
        engine.stop()


def test_signature_limit_counts_per_variant(spec, params):
    """max_signatures bounds distinct SHAPES per assembly variant: an
    engine that compiles both the default and the device-resident 'slots'
    step for the same shape must not hit the limit at half the configured
    count (ADVICE r4: the combined len() check fired early and reported a
    misleading 'distinct shapes' number)."""
    engine = ServingEngine(spec, params, max_batch=2, max_delay_ms=1.0,
                           max_signatures=1)
    try:
        sig_a, sig_b = ('sig_a',), ('sig_b',)
        engine._get_jit(sig_a)        # fills the default-variant slot
        engine._get_jit_slots(sig_a)  # same shape, other variant: allowed
        with pytest.raises(RuntimeError, match='signature limit'):
            engine._get_jit(sig_b)
        with pytest.raises(RuntimeError, match='signature limit'):
            engine._get_jit_slots(sig_b)
    finally:
        engine.stop()


def test_served_outputs_bound_device_fetch(spec, params):
    """The jitted step returns only the served keys (plus nothing else
    batch-shaped), so dispatches don't fetch input echoes or loss arrays."""
    engine = ServingEngine(spec, params, max_batch=2, max_delay_ms=1.0)
    try:
        [clip] = _clips(11, 1)
        out = engine.infer(clip, timeout=600)
        assert set(out) <= set(DEFAULT_SERVED_OUTPUTS)
        assert 'PoG_px_final' in out
    finally:
        engine.stop()


def test_same_session_order_across_signature_mismatch(spec, params):
    """A later same-session chunk whose signature matches the batch head
    must NOT overtake an earlier chunk deferred on signature mismatch.

    Trigger (advisor finding): another signature is in flight as the batch
    head; session chunk N (different signature) defers; chunk N+1 (matching
    the head) previously slipped into the current batch and ran on
    pre-predecessor recurrent state."""
    engine = ServingEngine(spec, params, max_batch=4, max_delay_ms=150.0)
    try:
        T = 4
        [clip] = _clips(12, 1, T=T)
        [other] = _clips(13, 1, T=3)  # T=3 signature: the batch head
        sid = engine.open_session()
        fut_other = engine.submit(other)  # seeds the batch, signature T=3
        chunks = []
        for t0 in (0, T // 2):  # session chunks, signature T=2
            chunks.append({k: (v[t0:t0 + T // 2] if v.ndim >= 1 and
                               v.shape[0] == T else v)
                           for k, v in clip.items()})
        f1 = engine.submit(chunks[0], session_id=sid)
        f2 = engine.submit(chunks[1], session_id=sid)
        outs = [f1.result(timeout=600), f2.result(timeout=600)]
        fut_other.result(timeout=600)

        full = _direct(spec, params, clip)
        for key in ('PoG_px_final', 'left_pupil_size'):
            streamed = np.concatenate([o[key] for o in outs], axis=0)
            np.testing.assert_allclose(streamed, np.asarray(full[key])[0],
                                       rtol=1e-4, atol=1e-3, err_msg=key)
    finally:
        engine.stop()


def test_idle_sessions_evicted_on_open(spec, params):
    """Abandoned sessions age out: a client that opens sessions and
    vanishes must not leak slots until max_sessions permanently refuses
    every new stream. Idle sessions past session_ttl_s are reaped when a
    new session opens (BEFORE the capacity check); submits and chunk
    completions refresh the session's clock, so active streams never age
    out. Idleness is simulated by rewinding last_used directly — real
    sleeps would race the cold-compile time on a loaded host."""
    # Margins sized for a loaded 1-core CI host: the rewind (-10s) is far
    # past the TTL, and the TTL is far above any scheduler stall between
    # the live session's last submit and the eviction scan (a sub-second
    # TTL flaked here whenever a GIL stall aged the LIVE session out too).
    engine = ServingEngine(spec, params, max_batch=2, max_delay_ms=1.0,
                           max_sessions=2, request_timeout_s=2.0,
                           session_ttl_s=5.0)
    try:
        assert engine.session_ttl_s == 5.0  # above the 2x-timeout floor
        stale = engine.open_session()
        live = engine.open_session()
        engine.submit(_clips(21, 1)[0], session_id=live).result(timeout=300)
        with engine._sessions_lock:
            engine._sessions[stale].last_used -= 10.0  # abandoned
        # Session table is full; the idle-past-TTL session must be reaped
        # rather than the open refused.
        fresh = engine.open_session()  # evicts `stale`, keeps `live`
        stats = engine.get_stats()
        assert stats['sessions_evicted'] == 1
        assert stats['sessions_open'] == 2
        with pytest.raises(UnknownSessionError):
            engine.submit(_clips(22, 1)[0], session_id=stale)
        # The active session and the new one still work.
        engine.submit(_clips(23, 1)[0], session_id=live).result(timeout=300)
        engine.submit(_clips(24, 1)[0], session_id=fresh).result(timeout=300)
    finally:
        engine.stop()


def test_session_ttl_floored_at_request_timeout(spec, params):
    """A TTL below 2x request_timeout_s could evict a session whose chunk
    is still queued; the engine floors it instead."""
    engine = ServingEngine(spec, params, max_batch=2, max_delay_ms=1.0,
                           request_timeout_s=30.0, session_ttl_s=1.0)
    try:
        assert engine.session_ttl_s == 60.0
        disabled = ServingEngine(spec, params, max_batch=2,
                                 max_delay_ms=1.0, session_ttl_s=0)
        try:
            assert disabled.session_ttl_s == 0  # 0 disables, no floor
        finally:
            disabled.stop()
    finally:
        engine.stop()


def test_queue_overflow_rejects(spec, params):
    """Submissions beyond max_queue fail fast with EngineOverloadedError
    instead of growing host memory without bound."""
    engine = ServingEngine(spec, params, max_batch=2, max_delay_ms=1.0,
                           max_queue=2)
    engine._stop.set()  # freeze the batcher so the queue cannot drain
    engine._thread.join(timeout=10.0)
    engine._stop.clear()  # allow submissions again (batcher stays dead)
    try:
        clips = _clips(14, 3)
        engine.submit(clips[0])
        engine.submit(clips[1])
        with pytest.raises(EngineOverloadedError, match='queue full'):
            engine.submit(clips[2])
        assert engine.get_stats()['rejected'] == 1
        assert engine.get_stats()['queue_depth'] == 2
    finally:
        engine.stop()


def test_request_timeout_in_batcher(spec, params):
    """Requests older than request_timeout_s fail instead of occupying
    batch slots — and an expired SESSION chunk poisons its successors
    (running them would use recurrent state that never saw the lost
    chunk)."""
    import time as time_mod

    engine = ServingEngine(spec, params, max_batch=2, max_delay_ms=1.0,
                           request_timeout_s=0.2)
    engine._stop.set()  # hold the request in the queue past its deadline
    engine._thread.join(timeout=10.0)
    try:
        [clip] = _clips(15, 1)
        engine._stop.clear()
        sid = engine.open_session()
        fut = engine.submit(clip, session_id=sid)
        time_mod.sleep(0.4)
        successor = engine.submit(clip, session_id=sid)  # fresh, unexpired
        # Restart the batcher so it observes the expired request.
        engine._thread = threading.Thread(target=engine._loop, daemon=True)
        engine._thread.start()
        with pytest.raises(EngineOverloadedError, match='waited'):
            fut.result(timeout=60)
        assert engine.stats['timed_out'] == 1
        with pytest.raises(RuntimeError, match='failed or expired'):
            successor.result(timeout=60)
        # Closing and reopening the session clears the poisoned state.
        engine.close_session(sid)
        assert sid not in engine._broken_sessions
    finally:
        engine.stop()


def test_submit_after_stop_raises(spec, params):
    """submit() after stop() raises instead of returning a Future no thread
    will ever resolve."""
    engine = ServingEngine(spec, params, max_batch=2, max_delay_ms=1.0)
    engine.stop()
    [clip] = _clips(16, 1)
    with pytest.raises(RuntimeError, match='stopped'):
        engine.submit(clip)


def test_http_overload_and_body_cap(spec, params):
    """HTTP maps queue overflow to 429 (+Retry-After) and oversized bodies
    to 413 without reading them."""
    engine = ServingEngine(spec, params, max_batch=2, max_delay_ms=1.0,
                           max_queue=1)
    engine._stop.set()  # freeze the batcher: first request fills the queue
    engine._thread.join(timeout=10.0)
    engine._stop.clear()
    server = make_http_server(engine, host='127.0.0.1', port=0,
                              max_body_bytes=1024 * 1024)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    host, port = server.server_address
    try:
        [clip] = _clips(17, 1)
        buf = io.BytesIO()
        np.savez(buf, **clip)
        body = buf.getvalue()

        # Oversized Content-Length: 413 before the body is read.
        conn = http.client.HTTPConnection(host, port, timeout=60)
        conn.putrequest('POST', '/v1/infer')
        conn.putheader('Content-Length', str(600 * 1024 * 1024))
        conn.endheaders()
        resp = conn.getresponse()
        assert resp.status == 413
        resp.read()
        conn.close()

        # Fill the 1-slot queue directly, then overflow over HTTP -> 429.
        engine.submit(clip)
        conn = http.client.HTTPConnection(host, port, timeout=60)
        conn.request('POST', '/v1/infer', body=body,
                     headers={'Content-Length': str(len(body))})
        resp = conn.getresponse()
        assert resp.status == 429
        assert resp.getheader('Retry-After') == '1'
        resp.read()

        # Stats expose live queue depth.
        conn.request('GET', '/v1/stats')
        stats = json.loads(conn.getresponse().read())
        assert stats['queue_depth'] == 1
        assert stats['rejected'] == 1
    finally:
        server.shutdown()
        engine.stop()


def test_http_server_round_trip(spec, params):
    engine = ServingEngine(spec, params, max_batch=2, max_delay_ms=1.0)
    server = make_http_server(engine, host='127.0.0.1', port=0)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    host, port = server.server_address
    [clip] = _clips(4, 1)
    try:
        # Compile the comparison forward BEFORE opening the connection: a
        # cold jit here takes ~1 min on a 1-core host, and the reference
        # comparison below would otherwise idle the keep-alive connection
        # past the server's 15 s timeout (the server then correctly closes
        # it and the later /v1/stats request would see RemoteDisconnected).
        ref = _direct(spec, params, clip)
        conn = http.client.HTTPConnection(host, port, timeout=300)

        conn.request('GET', '/healthz')
        resp = conn.getresponse()
        assert resp.status == 200
        assert json.loads(resp.read())['status'] == 'ok'

        conn.request('POST', '/v1/sessions')
        sid = json.loads(conn.getresponse().read())['session_id']

        buf = io.BytesIO()
        np.savez(buf, **clip)
        conn.request('POST', '/v1/infer', body=buf.getvalue(),
                     headers={'X-Session-Id': sid,
                              'Content-Length': str(len(buf.getvalue()))})
        resp = conn.getresponse()
        assert resp.status == 200
        with np.load(io.BytesIO(resp.read())) as z:
            out = {k: z[k] for k in z.files}
        assert set(out) <= set(DEFAULT_SERVED_OUTPUTS)
        np.testing.assert_allclose(out['PoG_px_final'],
                                   np.asarray(ref['PoG_px_final'])[0],
                                   rtol=1e-4, atol=1e-3)

        conn.request('GET', '/v1/stats')
        stats = json.loads(conn.getresponse().read())
        assert stats['requests'] >= 1

        conn.request('DELETE', '/v1/sessions/' + sid)
        resp = conn.getresponse()
        resp.read()  # drain keep-alive body before the next request
        assert resp.status == 200

        # Inference against the deleted session 404s.
        conn.request('POST', '/v1/infer', body=buf.getvalue(),
                     headers={'X-Session-Id': sid,
                              'Content-Length': str(len(buf.getvalue()))})
        resp = conn.getresponse()
        resp.read()
        assert resp.status == 404
    finally:
        server.shutdown()
        engine.stop()


def test_engine_requires_params_with_spec(spec):
    with pytest.raises(ValueError, match='spec AND params'):
        ServingEngine(spec, None)


def _frozen_engine(spec, params, **kw):
    """Engine with the batcher thread stopped so _try_add/_dispatch can be
    driven deterministically from the test thread."""
    engine = ServingEngine(spec, params, **kw)
    engine._stop.set()
    engine._thread.join(timeout=10.0)
    engine._stop.clear()
    return engine


def test_stale_chunk_after_session_reopen_fails(spec, params):
    """A chunk submitted against a session that is then closed and
    re-opened under the same id must fail (identity check) instead of
    advancing the NEW incarnation's recurrent state."""
    import time as time_lib

    from eve_tpu.serve import _Request

    engine = _frozen_engine(spec, params, max_batch=2)
    try:
        sid = engine.open_session(session_id='S')
        with engine._sessions_lock:
            first_incarnation = engine._sessions[sid]
        stale = _Request(inputs={}, session_id=sid,
                         session=first_incarnation,
                         enqueued_at=time_lib.perf_counter())
        engine.close_session(sid)
        engine.open_session(session_id=sid)

        assert engine._try_add(stale, [], set()) is False
        with pytest.raises(UnknownSessionError):
            stale.future.result(timeout=0)

        # The new incarnation is clean and admissible.
        with engine._sessions_lock:
            second = engine._sessions[sid]
        assert second is not first_incarnation
        fresh = _Request(inputs={}, session_id=sid, session=second,
                         enqueued_at=time_lib.perf_counter())
        reqs = []
        assert engine._try_add(fresh, reqs, set()) is True
        assert reqs == [fresh]
    finally:
        engine.stop()


def test_expired_chunk_does_not_poison_reopened_session(spec, params):
    """Queue expiry marks only the CURRENT incarnation broken; closing and
    re-opening the id starts clean (no unbounded _broken_sessions growth,
    no permanently-poisoned ids)."""
    import time as time_lib

    from eve_tpu.serve import _Request

    # Generous timeout + an explicitly-old enqueued_at for the chunk that
    # must expire: with a tiny timeout the LIVE requests below flake
    # whenever the loaded 1-core CI host delays _try_add past it.
    engine = _frozen_engine(spec, params, request_timeout_s=5.0)
    try:
        sid = engine.open_session(session_id='S')
        with engine._sessions_lock:
            first_incarnation = engine._sessions[sid]
        old = _Request(inputs={}, session_id=sid, session=first_incarnation,
                       enqueued_at=time_lib.perf_counter() - 10.0)
        assert engine._try_add(old, [], set()) is False
        with pytest.raises(EngineOverloadedError):
            old.future.result(timeout=0)
        assert first_incarnation in engine._broken_sessions

        # Successor of the same incarnation fails (broken stream)...
        succ = _Request(inputs={}, session_id=sid,
                        session=first_incarnation,
                        enqueued_at=time_lib.perf_counter())
        assert engine._try_add(succ, [], set()) is False
        with pytest.raises(RuntimeError, match='failed or expired'):
            succ.future.result(timeout=0)

        # ...but close+reopen starts clean, and the broken entry is gone.
        engine.close_session(sid)
        assert first_incarnation not in engine._broken_sessions
        engine.open_session(session_id=sid)
        with engine._sessions_lock:
            second = engine._sessions[sid]
        fresh = _Request(inputs={}, session_id=sid, session=second,
                         enqueued_at=time_lib.perf_counter())
        assert engine._try_add(fresh, [], set()) is True
    finally:
        engine.stop()


def test_infer_timeout_marks_session_broken(spec, params):
    """A client-side infer() timeout poisons the session: the chunk may
    still execute server-side, so a retry must not silently double-apply."""
    engine = _frozen_engine(spec, params)  # batcher frozen: result never comes
    try:
        sid = engine.open_session()
        [clip] = _clips(3, 1)
        from concurrent.futures import TimeoutError as FTimeout
        with pytest.raises(FTimeout):
            engine.infer(clip, session_id=sid, timeout=0.05)
        with engine._sessions_lock:
            session = engine._sessions[sid]
        assert session in engine._broken_sessions
    finally:
        engine.stop()


def test_http_length_handling(spec, params):
    """Missing Content-Length -> 411, malformed -> 400, chunked -> 411,
    each closing the connection so keep-alive streams cannot desync."""
    engine = ServingEngine(spec, params, max_batch=2, max_delay_ms=1.0)
    server = make_http_server(engine, host='127.0.0.1', port=0)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    host, port = server.server_address
    try:
        cases = [
            ({}, 411),
            ({'Content-Length': 'abc'}, 400),
            ({'Transfer-Encoding': 'chunked'}, 411),
        ]
        for headers, expect in cases:
            conn = http.client.HTTPConnection(host, port, timeout=60)
            conn.putrequest('POST', '/v1/infer')
            for k, v in headers.items():
                conn.putheader(k, v)
            conn.endheaders()
            resp = conn.getresponse()
            assert resp.status == expect, (headers, resp.status)
            assert resp.getheader('Connection') == 'close'
            resp.read()
            conn.close()
    finally:
        server.shutdown()
        engine.stop()


def test_http_served_outputs_follow_engine(spec, params):
    """The HTTP layer's default filter is the ENGINE's served_outputs, not
    an independent list that can disagree with it."""
    engine = ServingEngine(spec, params, max_batch=2, max_delay_ms=1.0,
                           served_outputs=('PoG_px_final',))
    server = make_http_server(engine, host='127.0.0.1', port=0)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    host, port = server.server_address
    try:
        [clip] = _clips(21, 1)
        buf = io.BytesIO()
        np.savez(buf, **clip)
        body = buf.getvalue()
        conn = http.client.HTTPConnection(host, port, timeout=300)
        conn.request('POST', '/v1/infer', body=body,
                     headers={'Content-Length': str(len(body))})
        resp = conn.getresponse()
        assert resp.status == 200
        with np.load(io.BytesIO(resp.read())) as z:
            assert sorted(z.files) == ['PoG_px_final']
    finally:
        server.shutdown()
        engine.stop()


@pytest.mark.slow
def test_mesh_serving_matches_single_device(spec, params):
    """Data-parallel serving: a mesh engine's results equal the
    single-device engine's (batch slots shard over the 'data' axis,
    params replicate), including session state carried across chunks."""
    from eve_tpu.parallel.mesh import make_mesh
    mesh = make_mesh(4)
    engine = ServingEngine(spec, params, max_batch=4, max_delay_ms=200.0,
                           mesh=mesh)
    try:
        clips = _clips(31, 3)
        futures = [engine.submit(c) for c in clips]
        results = [f.result(timeout=300) for f in futures]
        for clip, res in zip(clips, results):
            ref = _direct(spec, params, clip)
            for key in ('PoG_px_initial', 'PoG_px_final',
                        'left_pupil_size'):
                np.testing.assert_allclose(
                    res[key], np.asarray(ref[key])[0],
                    rtol=1e-4, atol=1e-3, err_msg=key)

        # Sessions still carry recurrent state under mesh sharding.
        T = 4
        [clip] = _clips(32, 1, T=T)
        sid = engine.open_session()
        outs = []
        for t0 in (0, T // 2):
            chunk = {k: (v[t0:t0 + T // 2] if v.ndim >= 1 and
                         v.shape[0] == T else v)
                     for k, v in clip.items()}
            outs.append(engine.infer(chunk, session_id=sid, timeout=300))
        engine.close_session(sid)
        full = _direct(spec, params, clip)
        for key in ('PoG_px_initial', 'PoG_px_final'):
            streamed = np.concatenate([o[key] for o in outs], axis=0)
            np.testing.assert_allclose(streamed, np.asarray(full[key])[0],
                                       rtol=1e-4, atol=1e-3, err_msg=key)
    finally:
        engine.stop()


def test_mesh_serving_validates_batch_divisibility(spec, params):
    from eve_tpu.parallel.mesh import make_mesh
    with pytest.raises(ValueError, match='must divide'):
        ServingEngine(spec, params, max_batch=3, mesh=make_mesh(4))


@pytest.mark.slow
def test_device_resident_engine_matches_default(spec, params):
    """device_resident=True (jit-assembled batches, device-kept session
    state, jax-array inputs) must produce the default engine's results —
    sessionless, and streamed across session chunks."""
    engine = ServingEngine(spec, params, max_batch=2, max_delay_ms=1.0,
                           device_resident=True)
    try:
        T = 4
        [clip] = _clips(5, 1, T=T)
        dev_clip = {k: jax.device_put(jnp.asarray(v))
                    for k, v in clip.items()}
        res = engine.infer(dev_clip, timeout=300)
        ref = _direct(spec, params, clip)
        for key in ('PoG_px_initial', 'PoG_px_final', 'left_pupil_size'):
            np.testing.assert_allclose(res[key], np.asarray(ref[key])[0],
                                       rtol=1e-4, atol=1e-3, err_msg=key)

        # Streaming session: device-resident state across chunks == one
        # full-clip forward; the state stays a jax Array between chunks.
        sid = engine.open_session()
        outs = []
        for t0 in (0, T // 2):
            chunk = {k: (v[t0:t0 + T // 2] if v.ndim >= 1 and
                         v.shape[0] == T else v)
                     for k, v in dev_clip.items()}
            outs.append(engine.infer(chunk, session_id=sid, timeout=300))
        with engine._sessions_lock:
            state_leaf = jax.tree_util.tree_leaves(
                engine._sessions[sid].state)[0]
        assert isinstance(state_leaf, jax.Array)
        engine.close_session(sid)
        for key in ('PoG_px_initial', 'PoG_px_final', 'left_pupil_size'):
            streamed = np.concatenate([o[key] for o in outs], axis=0)
            np.testing.assert_allclose(streamed, np.asarray(ref[key])[0],
                                       rtol=1e-4, atol=1e-3, err_msg=key)
    finally:
        engine.stop()


@pytest.mark.slow
def test_device_resident_mesh_matches_default(spec, params):
    """device_resident + mesh compose (round-4 verdict item: previously
    mutually exclusive with no measured reason): batch slots shard over
    the data axis, session state stays in device memory replicated across
    the mesh, and results equal the plain single-device engine's —
    sessionless and streamed."""
    from eve_tpu.parallel.mesh import make_mesh
    engine = ServingEngine(spec, params, max_batch=4, max_delay_ms=200.0,
                           mesh=make_mesh(4), device_resident=True)
    try:
        clips = _clips(41, 3)
        futures = [engine.submit(c) for c in clips]
        results = [f.result(timeout=300) for f in futures]
        for clip, res in zip(clips, results):
            ref = _direct(spec, params, clip)
            for key in ('PoG_px_initial', 'PoG_px_final',
                        'left_pupil_size'):
                np.testing.assert_allclose(
                    res[key], np.asarray(ref[key])[0],
                    rtol=1e-4, atol=1e-3, err_msg=key)

        # Streaming session: state stays a device array, replicated over
        # the mesh, and chunked results match one full-clip pass.
        T = 4
        [clip] = _clips(42, 1, T=T)
        sid = engine.open_session()
        outs = []
        for t0 in (0, T // 2):
            chunk = {k: (v[t0:t0 + T // 2] if v.ndim >= 1 and
                         v.shape[0] == T else v)
                     for k, v in clip.items()}
            outs.append(engine.infer(chunk, session_id=sid, timeout=300))
        with engine._sessions_lock:
            state_leaf = jax.tree_util.tree_leaves(
                engine._sessions[sid].state)[0]
        assert isinstance(state_leaf, jax.Array)
        assert len(state_leaf.sharding.device_set) == 4  # replicated
        engine.close_session(sid)
        full = _direct(spec, params, clip)
        for key in ('PoG_px_initial', 'PoG_px_final'):
            streamed = np.concatenate([o[key] for o in outs], axis=0)
            np.testing.assert_allclose(streamed, np.asarray(full[key])[0],
                                       rtol=1e-4, atol=1e-3, err_msg=key)
    finally:
        engine.stop()


def test_device_resident_rejects_artifact(spec, params):
    with pytest.raises(ValueError, match='device_resident'):
        ServingEngine(artifact=b'not-a-real-artifact', max_batch=4,
                      device_resident=True)


def test_cli_plumbs_serve_device_resident(monkeypatch):
    """--serve-device-resident yes must reach the engine constructor (the
    flag is config-generated; this pins the cli/serve.py plumb-through)."""
    import eve_tpu.serve as serve_mod
    import eve_tpu.infer as infer_mod
    from eve_tpu.config import DefaultConfig
    from eve_tpu.cli import serve as cli_serve

    seen = {}

    class FakeEngine:
        max_batch = 8

        def __init__(self, *a, **kw):
            seen.update(kw)

        def stop(self):
            pass

        def drain(self):
            pass

    class FakeServer:
        server_address = ('127.0.0.1', 0)

        def serve_forever(self):
            pass

        def shutdown(self):
            pass

        def server_close(self):
            pass

    monkeypatch.setattr(serve_mod, 'ServingEngine', FakeEngine)
    monkeypatch.setattr(serve_mod, 'make_http_server',
                        lambda engine, **kw: FakeServer())
    monkeypatch.setattr(infer_mod, 'model_setup',
                        lambda config, require_weights: ('spec', 'params'))
    DefaultConfig._reset_instance_for_testing()
    try:
        cli_serve.main(argv=['--serve-device-resident', 'yes',
                             '--refine-net-enabled', 'no',
                             '--load-screen-content', 'no'])
    finally:
        DefaultConfig._reset_instance_for_testing()
    assert seen.get('device_resident') is True
