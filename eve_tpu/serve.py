"""Production serving engine: micro-batched, stateful EVE inference.

The reference has no serving path (its inference is a batch script,
``/root/reference/src/inference.py``); this module is a TPU-native addition
for deployment. Design:

- One jitted forward compiled for a fixed ``(max_batch, T, ...)`` shape;
  partial batches are padded so there is exactly one compilation per input
  signature (XLA static shapes).
- A background batcher thread gathers requests from a queue for up to
  ``max_delay_ms`` (or until ``max_batch`` are pending) and dispatches them
  as one device step — trading a small, bounded latency for MXU-efficient
  batch sizes.
- Sessions: a session carries the recurrent state (EyeNet GRU and RefineNet
  ConvGRU; gaze-history maps are visualization-only outputs and never feed
  the model) across consecutive chunks of one video via
  ``eve_tpu.models.eve.init_stream_state`` / ``forward(initial_states=...)``,
  so results match processing the whole video as one clip. Chunks of the
  same session are processed strictly in submission order (a chunk whose
  session already has an earlier chunk in the current batch OR deferred is
  itself deferred), and a failed or queue-expired chunk marks the session
  BROKEN: every successor fails until the client closes the session and
  restarts the stream — never a silently-skipped hole in the recurrent
  history. Requests without a session get fresh state each time (the
  reference's per-clip semantics).

The HTTP front-end (``EveHTTPServer``) is a thin stdlib wrapper: numpy
``.npz`` request/response bodies, so no extra dependencies.
"""

from __future__ import annotations

import io
import json
import logging
import queue
import threading
import time
import uuid
from concurrent.futures import Future, TimeoutError as FuturesTimeoutError
from dataclasses import dataclass, field
from typing import Dict, List, Optional

import numpy as np

import jax
import jax.numpy as jnp

from eve_tpu.models import eve as eve_lib

logger = logging.getLogger(__name__)

# Outputs served by default: the quantities the reference's evaluation
# pipeline scores (src/eval_codalab.py:73-88) plus gaze vectors. The jitted
# step returns ONLY these (plus states), so each dispatch device-fetches a
# few small arrays instead of every forward output.
DEFAULT_SERVED_OUTPUTS = (
    'PoG_px_initial', 'PoG_px_final', 'PoG_cm_final',
    'left_pupil_size', 'right_pupil_size', 'g_initial', 'g_final',
)


class UnknownSessionError(KeyError):
    """The request names a session that does not (or no longer) exist."""


class EngineOverloadedError(RuntimeError):
    """The request queue is full or the request timed out waiting in it.

    The HTTP front-end maps this to 429 + Retry-After so clients load-shed
    instead of growing host memory without bound."""


class EngineDrainingError(RuntimeError):
    """The engine is draining for shutdown and accepts no new requests.

    Raised by :meth:`ServingEngine.submit` after :meth:`ServingEngine.drain`
    begins (e.g. on SIGTERM); already-accepted requests still complete. The
    HTTP front-end maps this to 503 so load balancers route elsewhere."""


@dataclass
class _Request:
    inputs: Dict[str, np.ndarray]  # per-clip arrays, leading dim T
    session_id: Optional[str]
    # The Session OBJECT captured at submit time. A session id can be
    # closed and re-opened while a chunk is still queued; identity
    # comparison against the current mapping detects such stale chunks so
    # they fail instead of advancing the NEW incarnation's state, and a
    # stale chunk's failure never poisons the new incarnation.
    session: Optional["Session"] = None
    future: Future = field(default_factory=Future)
    signature: tuple = ()
    enqueued_at: float = 0.0


class Session:
    """Recurrent state + ordering lock for one video stream."""

    def __init__(self, session_id, state):
        self.session_id = session_id
        self.state = state  # host numpy pytree, leading dim 1
        self.chunks_processed = 0
        # Idle-eviction clock: refreshed on every submit that names this
        # session, so only ABANDONED streams age out (see
        # ServingEngine session_ttl_s).
        self.last_used = time.monotonic()


class ServingEngine:
    """Micro-batching inference engine over one jitted EVE forward."""

    def __init__(self, spec=None, params=None, *, artifact=None,
                 max_batch=8, max_delay_ms=5.0,
                 served_outputs=DEFAULT_SERVED_OUTPUTS,
                 max_sessions=1024, max_signatures=8,
                 max_queue=64, request_timeout_s=30.0,
                 session_ttl_s=600.0, mesh=None, device_resident=False):
        """``served_outputs`` bounds what the jitted step returns (None =
        every forward output). ``max_sessions`` / ``max_signatures`` bound
        the two client-controlled growth axes: open sessions (state arrays)
        and distinct input (shape, dtype) signatures (each costs one XLA
        compilation, executed on the batcher thread — the first request of
        a new signature stalls serving for that compile). ``max_queue``
        bounds pending requests (overflow raises EngineOverloadedError
        rather than growing host memory); ``request_timeout_s`` fails
        requests that waited longer than that in the queue/deferred list.

        ``session_ttl_s``: sessions idle longer than this are evicted on
        the next open_session (0 disables). Without it, clients that open
        sessions and vanish leak slots until the ``max_sessions`` cap
        permanently refuses every new stream. The clock refreshes on each
        submit naming the session, and the effective TTL is floored at
        2x ``request_timeout_s`` so a session with a queued/deferred
        chunk can never age out mid-flight. Evicted ids behave like
        closed ones (submit raises UnknownSessionError; reopen to
        restart the stream).

        ``artifact``: serve from a self-contained AOT export
        (``eve_tpu.export``: a ``.eve`` path, bytes, or ExportedModel)
        instead of ``spec``/``params`` — no model code, checkpoint, or
        tracing at serving time. The artifact fixes ONE input signature and
        the batch size (``max_batch`` is taken from it); sessions require a
        streaming export. Exactly one of (spec+params) / artifact must be
        given.

        ``device_resident``: keep per-session recurrent state in device
        memory and accept ``jax.Array`` inputs without a host round-trip.
        The batch is then assembled INSIDE the jitted step (one dispatch
        per micro-batch stacks the slots and runs the model), so a chunk
        costs: [H2D of any host-side inputs] + one jit dispatch + D2H of
        the small served outputs — instead of the default path's
        host-stack + H2D of the whole batch + D2H of every slot state +
        H2D of those states again next chunk. On a TPU VM this removes
        ~2x the session-state bytes per chunk from PCIe; with
        device-resident inputs (``bench_serve.py --loopback``) it
        isolates the engine's own scheduling/batching overhead from
        transfer cost entirely. Spec+params path only (no artifact).

        ``mesh``: a 1-D ``jax.sharding.Mesh`` (axis ``data``) to serve
        data-parallel across chips: each dispatched micro-batch shards its
        ``max_batch`` slots over the axis while parameters replicate, so
        N chips serve N× the batch at one chip's latency — the serving
        analog of the training harness's data axis (parallel/mesh.py).
        Requires ``max_batch`` divisible by the axis size and the
        spec+params path (AOT artifacts are compiled for one device).

        ``mesh`` + ``device_resident`` compose: batch assembly moves
        inside the jit with the stacked slots sharding-constrained over
        the data axis, and each session's between-chunk state lives in
        device memory REPLICATED across the mesh (a (1, ...) state cannot
        shard over a >1 axis; replicating it makes every slot assignment
        reach its state locally, keeps one stable input sharding per
        signature — no per-slot-assignment recompiles — and costs only a
        per-dispatch all-gather of the ~100 KB state tree over ICI)."""
        if artifact is None:
            if spec is None or params is None:
                raise ValueError(
                    'pass spec AND params (got spec=%s, params=%s), or '
                    'artifact=...' % (type(spec).__name__,
                                      type(params).__name__))
        elif spec is not None or params is not None:
            raise ValueError('pass either spec+params or artifact, not both')
        if device_resident and artifact is not None:
            raise ValueError(
                'device_resident serving needs the spec+params path '
                '(AOT artifacts fix their own input layout)')
        self.spec = spec
        self._artifact = None
        if artifact is not None:
            from eve_tpu.export import ExportedModel, load_exported
            model = (artifact if isinstance(artifact, ExportedModel)
                     else load_exported(artifact))
            self._artifact = model
            avals = model.aval_tree
            batch_avals = avals[0]
            art_batch = next(iter(batch_avals.values())).shape[0]
            if int(max_batch) != art_batch:
                logger.warning(
                    'max_batch=%d overridden to the artifact\'s exported '
                    'batch size %d', max_batch, art_batch)
            max_batch = art_batch
            self._artifact_signature = tuple(sorted(
                (k, tuple(v.shape[1:]), str(np.dtype(v.dtype)))
                for k, v in batch_avals.items()))
        self.max_batch = int(max_batch)
        self.max_delay_s = float(max_delay_ms) / 1e3
        self.served_outputs = (tuple(served_outputs)
                               if served_outputs is not None else None)
        self.max_sessions = int(max_sessions)
        self.max_signatures = int(max_signatures)
        self.request_timeout_s = float(request_timeout_s)
        self.session_ttl_s = float(session_ttl_s)
        if self.session_ttl_s:
            # Floor: a session whose chunk is still queued/deferred (at
            # most request_timeout_s old, and submit refreshed last_used)
            # must never be evictable.
            self.session_ttl_s = max(self.session_ttl_s,
                                     2.0 * self.request_timeout_s)
        self.device_resident = bool(device_resident)
        self._mesh = mesh
        self._batch_sharding = None
        self._replicated_sharding = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec
            if self._artifact is not None:
                raise ValueError(
                    'mesh serving needs spec+params; AOT artifacts are '
                    'compiled for a single device')
            axis = mesh.axis_names[0]
            extent = mesh.shape[axis]
            if self.max_batch % extent != 0:
                raise ValueError(
                    'max_batch=%d must divide by the %d-device %r mesh '
                    'axis (every dispatch pads to max_batch, so each chip '
                    'takes an equal slot count)'
                    % (self.max_batch, extent, axis))
            self._batch_sharding = NamedSharding(mesh, PartitionSpec(axis))
            self._replicated_sharding = NamedSharding(mesh, PartitionSpec())
            self._params = jax.device_put(params, self._replicated_sharding)
        else:
            self._params = (None if self._artifact
                            else jax.device_put(params))
        self._queue: "queue.Queue[_Request]" = queue.Queue(
            maxsize=int(max_queue))
        self._deferred: List[_Request] = []  # owned by the batcher thread
        self._deferred_sessions = set()      # sessions with a deferred chunk
        # Session OBJECTS with a failed/expired chunk: successors must fail
        # too (running them would use recurrent state that never saw the
        # lost chunk). Holds objects, not ids, so a closed-and-reopened id
        # starts clean; an entry is removed when its session is closed.
        # Mutated by the batcher thread and (on client-side timeouts) by
        # caller threads — individual set ops are atomic under the GIL.
        self._broken_sessions = set()
        self._sessions: Dict[str, Session] = {}
        self._sessions_lock = threading.Lock()
        if self._artifact is not None:
            if self._artifact.streaming:
                # Per-slot zero state from the artifact's own state avals.
                self._zero_state = jax.tree.map(
                    lambda a: np.zeros((1,) + tuple(a.shape[1:]),
                                       np.dtype(a.dtype)),
                    self._artifact.aval_tree[1])
            else:
                self._zero_state = {}
        else:
            self._zero_state = jax.tree.map(
                np.asarray, eve_lib.init_stream_state(spec, 1))
            if self.device_resident and self._replicated_sharding is not None:
                # Pre-commit the zero state replicated on the mesh so every
                # dispatch sees ONE input sharding per signature (a numpy
                # zero state in some slots and replicated session states in
                # others would otherwise key separate compilations).
                self._zero_state = jax.device_put(
                    self._zero_state, self._replicated_sharding)
        # Compiled-step caches, one per assembly variant (host-stacked vs
        # device-resident slots) so max_signatures bounds DISTINCT SHAPES
        # per variant — an engine that compiles both variants for the same
        # shape must not hit the limit at half the configured count.
        self._jit_cache = {}
        self._jit_cache_slots = {}
        # Counters are bumped from the batcher thread AND from caller/HTTP
        # threads (rejections, timeouts); dict-item += is not atomic, so
        # every mutation goes through _stat_inc.
        self._stats_lock = threading.Lock()
        self.stats = {
            'requests': 0, 'batches': 0, 'batched_slots': 0,
            'errors': 0, 'sessions_opened': 0, 'sessions_evicted': 0,
            'rejected': 0, 'timed_out': 0, 'rejected_draining': 0,
        }
        # Accepted-but-unresolved requests. Incremented BEFORE the queue
        # put and decremented exactly once when the request's future
        # resolves (every resolution goes through _resolve_request /
        # _fail_request), so drain() observing 0 PROVES nothing accepted is
        # pending — no window where a request is popped from the queue but
        # not yet visible as in-flight.
        self._inflight = 0
        self._stop = threading.Event()
        self._draining = threading.Event()
        self._thread = threading.Thread(target=self._loop, daemon=True,
                                        name='eve-serving-batcher')
        self._thread.start()

    # ---------------- public API ----------------

    def open_session(self, session_id=None):
        """Allocate fresh recurrent state; returns the session id.

        Refused while draining/stopped: handing out a session on a dying
        backend would invite clients to bind a stream that will never be
        served (every subsequent infer on it gets 503)."""
        if self._draining.is_set():
            self._stat_inc('rejected_draining')
            raise EngineDrainingError(
                'serving engine is draining for shutdown; no new sessions')
        if self._stop.is_set():
            raise RuntimeError('serving engine stopped')
        if self._artifact is not None and not self._artifact.streaming:
            raise RuntimeError(
                'sessions need recurrent state, but the serving artifact '
                'was exported without it; re-export with streaming=True')
        session_id = session_id or uuid.uuid4().hex
        evicted = 0
        with self._sessions_lock:
            if session_id in self._sessions:
                raise ValueError('session exists: %s' % session_id)
            if self.session_ttl_s:
                # Reap abandoned streams BEFORE the capacity check, so
                # leaked sessions can never permanently brick the server
                # at max_sessions.
                cutoff = time.monotonic() - self.session_ttl_s
                for sid in [sid for sid, s in self._sessions.items()
                            if s.last_used < cutoff]:
                    stale = self._sessions.pop(sid)
                    self._broken_sessions.discard(stale)
                    evicted += 1
            if len(self._sessions) >= self.max_sessions:
                raise RuntimeError(
                    'session limit reached (%d); close unused sessions'
                    % self.max_sessions)
            self._sessions[session_id] = Session(
                session_id, jax.tree.map(np.copy, self._zero_state))
        if evicted:
            self._stat_inc('sessions_evicted', evicted)
            logger.info('evicted %d idle session(s) past the %.0fs TTL',
                        evicted, self.session_ttl_s)
        self._stat_inc('sessions_opened')
        return session_id

    def _stat_inc(self, key, n=1):
        with self._stats_lock:
            self.stats[key] += n

    def _resolve_request(self, r, result):
        """Complete an accepted request (exactly-once in-flight release)."""
        r.future.set_result(result)
        with self._stats_lock:
            self._inflight -= 1

    def _fail_request(self, r, exc):
        """Fail an accepted request; no-op if it already resolved.

        Returns True when THIS call resolved the future (callers use that
        to count errors without double-counting)."""
        if r.future.done():
            return False
        r.future.set_exception(exc)
        with self._stats_lock:
            self._inflight -= 1
        return True

    def close_session(self, session_id):
        with self._sessions_lock:
            session = self._sessions.pop(session_id, None)
        if session is not None:
            self._broken_sessions.discard(session)

    def submit(self, inputs, session_id=None) -> Future:
        """Enqueue one clip (arrays with leading dim T); returns a Future.

        The future resolves to the model's output dict with per-sample
        arrays (batch dim stripped). With a ``session_id``, recurrent state
        is carried from this session's previous chunk.
        """
        # Draining outranks stopped: from SIGTERM until process exit the
        # client signal should consistently be 503-route-elsewhere, even
        # after the drain's final stop() lands.
        if self._draining.is_set():
            # Counted so monitoring can distinguish "drained with no
            # traffic" from "turned away N requests while the load
            # balancer was slow to eject this backend".
            self._stat_inc('rejected_draining')
            raise EngineDrainingError(
                'serving engine is draining for shutdown')
        if self._stop.is_set():
            raise RuntimeError('serving engine stopped')
        session = None
        if session_id is not None:
            with self._sessions_lock:
                session = self._sessions.get(session_id)
                if session is not None:
                    session.last_used = time.monotonic()
            if session is None:
                raise UnknownSessionError(
                    'unknown session: %s' % session_id)
        req = _Request(
            # jax Arrays pass through untouched (np.asarray would force a
            # device->host copy); everything else is coerced to numpy.
            inputs={k: (v if isinstance(v, jax.Array) else np.asarray(v))
                    for k, v in inputs.items()},
            session_id=session_id, session=session,
            enqueued_at=time.perf_counter())
        req.signature = tuple(sorted(
            (k, v.shape, str(v.dtype)) for k, v in req.inputs.items()))
        # In-flight BEFORE the put: the request must never be visible to
        # the batcher while invisible to drain()'s accounting.
        with self._stats_lock:
            self._inflight += 1
        try:
            self._queue.put_nowait(req)
        except queue.Full:
            with self._stats_lock:
                self._inflight -= 1
            self._stat_inc('rejected')
            raise EngineOverloadedError(
                'request queue full (%d pending); retry later'
                % self._queue.maxsize)
        if self._stop.is_set():
            # Race: stop() may have drained the queue before our put landed;
            # make sure this request cannot dangle unresolved forever.
            self._fail_queued(RuntimeError('serving engine stopped'))
        return req.future

    def infer(self, inputs, session_id=None, timeout=None):
        """Blocking convenience wrapper around :meth:`submit`.

        ``timeout=None`` waits ``request_timeout_s`` plus a 120 s
        first-compile allowance (a new signature's XLA compile runs on the
        batcher thread with the request already admitted). A client-side
        timeout marks the session broken: the chunk may still execute and
        advance the recurrent state, so letting a retry run would apply it
        twice; successors fail loudly until the client restarts the stream.
        """
        if timeout is None:
            timeout = self.request_timeout_s + 120.0
        future = self.submit(inputs, session_id)
        try:
            return future.result(timeout=timeout)
        except FuturesTimeoutError:
            if session_id is not None:
                with self._sessions_lock:
                    session = self._sessions.get(session_id)
                if session is not None:
                    self._broken_sessions.add(session)
            raise

    def drain(self, timeout=None):
        """Graceful shutdown: reject new work, finish accepted work, stop.

        Sets the draining flag (``submit`` raises
        :class:`EngineDrainingError`; HTTP returns 503), waits until every
        already-accepted request has resolved — queue empty, no deferred
        chunks, no batch in flight — then calls :meth:`stop`. ``timeout``
        (default ``request_timeout_s`` + the 120 s first-compile allowance)
        bounds the wait; whatever is still unresolved then is failed by
        ``stop``. Use on SIGTERM so in-flight clients get answers instead
        of dropped connections.
        """
        self._draining.set()
        if timeout is None:
            timeout = self.request_timeout_s + 120.0
        deadline = time.perf_counter() + timeout
        while time.perf_counter() < deadline:
            # _inflight counts accepted-but-unresolved requests exactly
            # (incremented before the queue put, decremented at future
            # resolution), so 0 here PROVES nothing accepted is pending —
            # whether queued, deferred, or mid-dispatch on the batcher.
            with self._stats_lock:
                inflight = self._inflight
            if inflight == 0:
                break
            time.sleep(0.02)
        self.stop()

    def stop(self):
        """Stop the batcher and promptly fail all pending requests."""
        self._stop.set()
        self._thread.join(timeout=10.0)
        err = RuntimeError('serving engine stopped')
        for r in self._deferred:
            self._fail_request(r, err)
        self._deferred = []
        self._deferred_sessions = set()
        self._fail_queued(err)

    def _fail_queued(self, err):
        while True:
            try:
                r = self._queue.get_nowait()
            except queue.Empty:
                break
            self._fail_request(r, err)

    def get_stats(self):
        """Counters plus live queue/deferred depth (for monitoring)."""
        with self._stats_lock:
            out = dict(self.stats)
        out['queue_depth'] = self._queue.qsize()
        out['deferred'] = len(self._deferred)
        with self._stats_lock:
            out['inflight'] = self._inflight
        out['draining'] = self._draining.is_set()
        with self._sessions_lock:
            out['sessions_open'] = len(self._sessions)
        return out

    # ---------------- batcher ----------------

    def _loop(self):
        # self._deferred is touched only by this thread while it runs
        # (stop() drains it after join), so no lock is needed.
        while not self._stop.is_set():
            reqs: List[_Request] = []
            sessions_in_batch = set()
            # Seed from deferred (ordering: oldest first), else block briefly.
            pending, self._deferred = self._deferred, []
            self._deferred_sessions = set()
            for r in pending:
                self._try_add(r, reqs, sessions_in_batch)
            if not reqs:
                try:
                    first = self._queue.get(timeout=0.05)
                except queue.Empty:
                    continue
                self._try_add(first, reqs, sessions_in_batch)
                if not reqs:
                    continue
            deadline = time.perf_counter() + self.max_delay_s
            while len(reqs) < self.max_batch:
                remaining = deadline - time.perf_counter()
                if remaining <= 0:
                    break
                try:
                    r = self._queue.get(timeout=remaining)
                except queue.Empty:
                    break
                self._try_add(r, reqs, sessions_in_batch)
            try:
                self._dispatch(reqs)
            except Exception as e:  # pragma: no cover - defensive
                # Count only requests failed HERE (dispatch may already
                # have failed-and-counted some, e.g. closed sessions).
                newly_failed = [r for r in reqs if not r.future.done()]
                self._stat_inc('errors', len(newly_failed))
                for r in newly_failed:
                    self._fail_request(r, e)
                # A session whose chunk failed must not silently continue
                # from pre-failure state: fail its deferred successors too.
                failed = {r.session for r in newly_failed
                          if r.session is not None}
                self._broken_sessions |= failed
                if failed:
                    keep = []
                    for r in self._deferred:
                        if r.session in failed:
                            self._stat_inc('errors')
                            self._fail_request(r, RuntimeError(
                                'a previous chunk of session %s failed'
                                % r.session_id))
                        else:
                            keep.append(r)
                    self._deferred = keep
                    self._deferred_sessions = {
                        r.session_id for r in keep
                        if r.session_id is not None}

    def _try_add(self, r, reqs, sessions_in_batch):
        """Add request to the batch, or defer/expire it.

        Defers when (a) its session already has an EARLIER chunk deferred —
        admitting a later chunk would run it on pre-predecessor recurrent
        state even if its signature happens to match the batch head; (b) its
        session already has a chunk in this batch; (c) its signature differs
        from the batch head's; or (d) the batch is full. Requests older than
        ``request_timeout_s`` fail with EngineOverloadedError instead of
        occupying a slot."""
        if r.session is not None:
            with self._sessions_lock:
                current = self._sessions.get(r.session_id) is r.session
            if not current:
                # The session was closed (and possibly re-opened under the
                # same id) after this chunk was submitted; running it would
                # advance the NEW incarnation's state with stale data.
                self._stat_inc('errors')
                self._fail_request(r, UnknownSessionError(
                    'session closed before dispatch: %s' % r.session_id))
                return False
            if r.session in self._broken_sessions:
                self._stat_inc('errors')
                self._fail_request(r, RuntimeError(
                    'a previous chunk of session %s failed or expired; '
                    'close the session and restart the stream'
                    % r.session_id))
                return False
        if (time.perf_counter() - r.enqueued_at) > self.request_timeout_s:
            self._stat_inc('errors')
            self._stat_inc('timed_out')
            self._fail_request(r, EngineOverloadedError(
                'request waited > %.1fs in queue' % self.request_timeout_s))
            if r.session is not None:
                # The stream now has a hole; successors must not run on
                # pre-expiry recurrent state. (r.session was just checked
                # to be the CURRENT incarnation, so this cannot poison a
                # re-opened id.)
                self._broken_sessions.add(r.session)
            return False

        def defer():
            self._deferred.append(r)
            if r.session_id is not None:
                self._deferred_sessions.add(r.session_id)
            return False

        if r.session_id is not None and r.session_id in self._deferred_sessions:
            return defer()  # strict per-session submission order
        if reqs and r.signature != reqs[0].signature:
            return defer()
        if r.session_id is not None and r.session_id in sessions_in_batch:
            return defer()
        if len(reqs) >= self.max_batch:
            return defer()
        reqs.append(r)
        if r.session_id is not None:
            sessions_in_batch.add(r.session_id)
        return True

    def _get_jit(self, signature):
        if self._artifact is not None:
            if signature != self._artifact_signature:
                raise RuntimeError(
                    'input signature %s does not match the serving '
                    'artifact\'s exported signature %s (AOT artifacts '
                    'serve exactly one shape; pad clips client-side or '
                    're-export)' % (signature, self._artifact_signature))
            model = self._artifact
            if model.streaming:
                def step(_params, batch, states):
                    return dict(model(batch, states))
            else:
                def step(_params, batch, states):
                    out = dict(model(batch))
                    out['states'] = states  # pass-through (no sessions)
                    return out
            return step
        fn = self._jit_cache.get(signature)
        if fn is None:
            if len(self._jit_cache) >= self.max_signatures:
                raise RuntimeError(
                    'input-signature limit reached (%d distinct shapes); '
                    'pad clips to a fixed shape client-side'
                    % self.max_signatures)
            spec = self.spec
            served = self.served_outputs

            @jax.jit
            def step(params, batch, states):
                out = eve_lib.forward(
                    spec, params, batch, training=False,
                    output_predictions=True,
                    initial_states=states, return_states=True)
                states_out = out.pop('states')
                if served is not None:
                    out = {k: out[k] for k in served if k in out}
                out['states'] = states_out
                return out

            fn = self._jit_cache[signature] = step
        return fn

    def _get_jit_slots(self, signature):
        """Device-resident variant: batch assembly INSIDE the jit.

        Takes a max_batch-tuple of per-slot input dicts plus a tuple of
        per-slot (leading-dim-1) states; stacks/concatenates them in the
        traced graph so one dispatch covers stack + model. Device-resident
        inputs/states then never touch the host. Returns states as a
        max_batch-TUPLE of per-slot trees (sliced in-graph), so each
        session keeps an independent device buffer.

        With a mesh, the stacked batch and states are sharding-constrained
        over the data axis (GSPMD shards the model step) and each per-slot
        output state is constrained REPLICATED — every future slot
        assignment then reads it locally, and all session states share one
        sharding so a signature compiles exactly once.
        """
        fn = self._jit_cache_slots.get(signature)
        if fn is None:
            if len(self._jit_cache_slots) >= self.max_signatures:
                raise RuntimeError(
                    'input-signature limit reached (%d distinct shapes); '
                    'pad clips to a fixed shape client-side'
                    % self.max_signatures)
            spec = self.spec
            served = self.served_outputs
            max_batch = self.max_batch
            batch_sh = self._batch_sharding
            rep_sh = self._replicated_sharding

            def _constrain(tree, sh):
                if sh is None:
                    return tree
                return jax.tree.map(
                    lambda x: jax.lax.with_sharding_constraint(x, sh), tree)

            @jax.jit
            def step(params, slots, states_slots):
                import jax.numpy as jnp
                batch = {k: jnp.stack([s[k] for s in slots])
                         for k in slots[0]}
                batch = _constrain(batch, batch_sh)
                states = jax.tree.map(
                    lambda *xs: jnp.concatenate(xs, axis=0), *states_slots)
                states = _constrain(states, batch_sh)
                out = eve_lib.forward(
                    spec, params, batch, training=False,
                    output_predictions=True,
                    initial_states=states, return_states=True)
                states_out = out.pop('states')
                if served is not None:
                    out = {k: out[k] for k in served if k in out}
                out['states'] = tuple(
                    _constrain(
                        jax.tree.map(lambda x, i=i: x[i:i + 1], states_out),
                        rep_sh)
                    for i in range(max_batch))
                return out

            fn = self._jit_cache_slots[signature] = step
        return fn

    def _dispatch(self, reqs: List[_Request]):
        # A session deleted between submit() and here must fail its chunk,
        # not silently run on freshly-zeroed state mid-stream.
        live: List[_Request] = []
        sessions: List[Optional[Session]] = []
        dropped = 0
        with self._sessions_lock:
            for r in reqs:
                if r.session is None:
                    live.append(r)
                    sessions.append(None)
                    continue
                # Identity (not id) check: a closed-and-reopened session id
                # must not have its new state advanced by a stale chunk.
                if self._sessions.get(r.session_id) is r.session:
                    live.append(r)
                    sessions.append(r.session)
                else:
                    dropped += 1
                    self._fail_request(r, UnknownSessionError(
                        'session closed before dispatch: %s' % r.session_id))
        if dropped:
            self._stat_inc('errors', dropped)
        reqs = live
        if not reqs:
            return
        n = len(reqs)
        pad = self.max_batch - n
        # Per-slot states: session state, or fresh zero state.
        slot_states = [s.state if s else self._zero_state for s in sessions]
        for _ in range(pad):
            slot_states.append(self._zero_state)
        if self.device_resident:
            # Batch assembly happens INSIDE the jit (one dispatch); inputs
            # and states may be jax Arrays and never touch the host.
            slots = tuple(r.inputs for r in reqs) + (reqs[-1].inputs,) * pad
            step = self._get_jit_slots(reqs[0].signature)
            outputs = step(self._params, slots, tuple(slot_states))
            # A max_batch-tuple of per-slot state trees, sliced in-graph
            # (fresh device buffers — per-session state does not pin the
            # batch; replicated across the mesh when one is configured).
            new_states = outputs.pop('states')

            def get_slot_state(idx):
                return new_states[idx]
        else:
            batch = {}
            for k in reqs[0].inputs:
                stacked = np.stack([r.inputs[k] for r in reqs])
                if pad:
                    stacked = np.concatenate(
                        [stacked, np.repeat(stacked[-1:], pad, axis=0)])
                batch[k] = stacked
            states = jax.tree.map(
                lambda *xs: np.concatenate(xs, axis=0), *slot_states)
            if self._batch_sharding is not None:
                # Mesh serving: slots shard over the data axis (params are
                # already replicated); GSPMD propagates the placement
                # through the jitted step, so outputs/new states come back
                # sharded and np.asarray gathers them.
                put = lambda x: jax.device_put(x, self._batch_sharding)
                batch = {k: put(v) for k, v in batch.items()}
                states = jax.tree.map(put, states)

            step = self._get_jit(reqs[0].signature)
            outputs = step(self._params, batch, states)
            new_states = outputs.pop('states')
            new_states = jax.tree.map(np.asarray, new_states)

            def get_slot_state(idx):
                # Copy (not slice-view) so the per-session state doesn't
                # pin the whole batch-sized array in memory.
                return jax.tree.map(lambda x: np.copy(x[idx:idx + 1]),
                                    new_states)
        host = {k: np.asarray(v) for k, v in outputs.items()
                if hasattr(v, 'shape')}

        with self._sessions_lock:
            for i, s in enumerate(sessions):
                # Session may have been closed mid-flight; drop state then.
                if s is not None and \
                        self._sessions.get(s.session_id) is s:
                    s.state = get_slot_state(i)
                    s.chunks_processed += 1
                    # Completion also refreshes the idle clock: a chunk
                    # that spent long in compile/queue must not leave its
                    # session one tick from eviction.
                    s.last_used = time.monotonic()
        for i, r in enumerate(reqs):
            per_sample = {}
            for k, v in host.items():
                if v.ndim >= 1 and v.shape[0] == self.max_batch:
                    per_sample[k] = v[i]
                elif v.ndim == 0:
                    per_sample[k] = v
            self._resolve_request(r, per_sample)
        with self._stats_lock:
            self.stats['requests'] += n
            self.stats['batches'] += 1
            self.stats['batched_slots'] += n


# ----------------------------------------------------------------------
# HTTP front-end (stdlib only; npz bodies)
# ----------------------------------------------------------------------

def _npz_bytes(arrays):
    buf = io.BytesIO()
    np.savez(buf, **arrays)
    return buf.getvalue()


def _npz_parse(body):
    with np.load(io.BytesIO(body), allow_pickle=False) as z:
        return {k: z[k] for k in z.files}


def make_http_server(engine: ServingEngine, host='127.0.0.1', port=0,
                     served_outputs=None,
                     max_body_bytes=256 * 1024 * 1024,
                     keepalive_timeout_s=15.0):
    """Build a ``ThreadingHTTPServer`` exposing the engine.

    ``served_outputs=None`` (default) serves whatever the ENGINE was
    configured to produce — the HTTP layer adds no second, possibly
    disagreeing filter. Pass an explicit tuple to narrow responses
    further.

    Routes:
      GET  /healthz                      -> {"status": "ok"}
      GET  /v1/stats                     -> engine stats JSON (incl. live
                                            queue depth)
      POST /v1/sessions                  -> {"session_id": ...}
      DELETE /v1/sessions/<id>           -> {}
      POST /v1/infer  (npz body; optional X-Session-Id header)
           -> npz of served output arrays

    Overload responses: 413 for bodies over ``max_body_bytes`` (rejected
    BEFORE reading, so an oversized Content-Length cannot exhaust host
    memory); 429 + Retry-After when the engine queue is full or the request
    timed out waiting.

    ``keepalive_timeout_s`` bounds how long a handler thread blocks reading
    an idle keep-alive connection (or a stalled body). Without it, idle
    connections would pin handler threads forever, making a graceful
    shutdown's thread join (``server_close``) unbounded.
    """
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    class Handler(BaseHTTPRequestHandler):
        protocol_version = 'HTTP/1.1'
        # Socket read timeout: handle_one_request treats it as end-of-
        # keep-alive (closes the connection), so the handler thread exits
        # and server_close()'s join is bounded.
        timeout = float(keepalive_timeout_s)

        def log_message(self, fmt, *args):
            logger.debug('http: ' + fmt, *args)

        def _json(self, code, obj):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header('Content-Type', 'application/json')
            self.send_header('Content-Length', str(len(body)))
            if self.close_connection:
                # Announce the close (stdlib only closes the socket; the
                # header lets well-behaved clients stop reusing it first).
                self.send_header('Connection', 'close')
            self.end_headers()
            self.wfile.write(body)

        def _bytes(self, code, body, ctype='application/octet-stream'):
            self.send_response(code)
            self.send_header('Content-Type', ctype)
            self.send_header('Content-Length', str(len(body)))
            if self.close_connection:
                self.send_header('Connection', 'close')
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == '/healthz':
                # 503 while draining so load balancers eject this backend
                # before its in-flight work finishes (readiness semantics).
                if engine._draining.is_set():
                    self._json(503, {'status': 'draining'})
                else:
                    self._json(200, {'status': 'ok'})
            elif self.path == '/v1/stats':
                self._json(200, engine.get_stats())
            else:
                self._json(404, {'error': 'not found'})

        def do_POST(self):
            try:
                if self.path == '/v1/sessions':
                    self._json(200, {'session_id': engine.open_session()})
                    return
                if self.path == '/v1/infer':
                    # Any refusal before the body is fully read must close
                    # the connection: leftover body bytes would be parsed
                    # as the NEXT request line on a keep-alive stream.
                    if 'chunked' in (self.headers.get('Transfer-Encoding')
                                     or '').lower():
                        self.close_connection = True
                        self._json(411, {
                            'error': 'chunked bodies unsupported; send '
                                     'Content-Length'})
                        return
                    raw_length = self.headers.get('Content-Length')
                    if raw_length is None or not raw_length.strip().isdigit():
                        self.close_connection = True
                        self._json(411 if raw_length is None else 400, {
                            'error': 'missing or malformed Content-Length'})
                        return
                    length = int(raw_length)
                    if length > max_body_bytes:
                        # Refuse BEFORE reading the body (an oversized
                        # Content-Length must not exhaust host memory).
                        self.close_connection = True
                        self._json(413, {
                            'error': 'body of %d bytes exceeds limit %d'
                                     % (length, max_body_bytes)})
                        return
                    inputs = _npz_parse(self.rfile.read(length))
                    sid = self.headers.get('X-Session-Id') or None
                    out = engine.infer(inputs, session_id=sid)
                    keys = (served_outputs if served_outputs is not None
                            else engine.served_outputs)
                    if keys is None:
                        served = out
                    else:
                        served = {k: out[k] for k in keys if k in out}
                    self._bytes(200, _npz_bytes(served))
                    return
                self._json(404, {'error': 'not found'})
            except UnknownSessionError as e:
                self._json(404, {'error': str(e)})
            except EngineDrainingError as e:
                # Shutting down: tell load balancers to route elsewhere.
                self.close_connection = True
                self._json(503, {'error': str(e)})
            except EngineOverloadedError as e:
                self.send_response(429)
                body = json.dumps({'error': str(e)}).encode()
                self.send_header('Content-Type', 'application/json')
                self.send_header('Retry-After', '1')
                self.send_header('Content-Length', str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            except Exception as e:  # noqa: BLE001
                logger.exception('request failed')
                # Conservative: the body may not have been (fully) read on
                # this path; never reuse a possibly-desynced connection.
                self.close_connection = True
                self._json(500, {'error': repr(e)})

        def do_DELETE(self):
            prefix = '/v1/sessions/'
            if self.path.startswith(prefix):
                engine.close_session(self.path[len(prefix):])
                self._json(200, {})
            else:
                self._json(404, {'error': 'not found'})

    return ThreadingHTTPServer((host, port), Handler)
