#!/usr/bin/env python3
"""Serve EVE gaze inference over HTTP (TPU-native addition; no reference
equivalent — the reference's inference is a batch script).

Usage:
    python serve.py [config.json ...] [--flags] \
        --resume-from <run_dir> [--serve-port 8000] [--serve-max-batch 8]

Protocol (stdlib HTTP, numpy .npz bodies): see eve_tpu/serve.py.
A client streams consecutive T-frame chunks of one video through a session
to carry the recurrent state (EyeNet GRU / RefineNet ConvGRU) across
chunk boundaries:

    POST /v1/sessions                 -> {"session_id": s}
    POST /v1/infer (X-Session-Id: s, body=npz of model inputs)
                                      -> npz of PoG/pupil/gaze outputs
    DELETE /v1/sessions/s
"""

import logging

logger = logging.getLogger(__name__)


def main(argv=None):
    from eve_tpu.config import DefaultConfig
    from eve_tpu.train import harness

    config = DefaultConfig()
    config.override('fully_reproducible', True)
    # Serve the full pipeline by default (as inference.py does); CLI flags
    # still override, e.g. --refine-net-enabled no for an EyeNet-only model.
    config.override('refine_net_enabled', True)
    config.override('load_screen_content', True)
    harness.script_init_common(argv=argv,
                               description='Serve EVE inference over HTTP.')

    from eve_tpu import infer as infer_lib
    from eve_tpu.serve import ServingEngine, make_http_server

    common = dict(
        max_batch=config.serve_max_batch,
        max_delay_ms=config.serve_max_delay_ms,
        max_queue=config.serve_max_queue,
        request_timeout_s=config.serve_request_timeout_s,
        max_sessions=config.serve_max_sessions,
        session_ttl_s=config.serve_session_ttl_s,
        device_resident=config.serve_device_resident)
    if config.serve_num_devices > 1:
        # Data-parallel serving: each micro-batch shards over the mesh.
        from eve_tpu.parallel import mesh as mesh_lib
        common['mesh'] = mesh_lib.make_mesh(config.serve_num_devices)
        logger.info('serving data-parallel over %d devices',
                    config.serve_num_devices)
    if config.serve_artifact:
        logger.info('serving from AOT artifact %s', config.serve_artifact)
        engine = ServingEngine(artifact=config.serve_artifact, **common)
    else:
        spec, params = infer_lib.model_setup(config, require_weights=True)
        engine = ServingEngine(spec, params, **common)
    server = make_http_server(
        engine, host=config.serve_host, port=config.serve_port,
        max_body_bytes=config.serve_max_body_mb * 1024 * 1024)
    logger.info('serving on http://%s:%d (max_batch=%d, max_delay=%.1fms)',
                *server.server_address, engine.max_batch,
                config.serve_max_delay_ms)

    # Graceful SIGTERM (platform preemption / orchestrator stop): stop
    # accepting (new requests get 503), let accepted requests finish, then
    # exit cleanly — instead of dropping in-flight work mid-batch. The
    # drain runs on a helper thread because server.shutdown() deadlocks if
    # called from the thread inside serve_forever (the signal handler runs
    # on the main thread, which is that thread).
    import signal
    import threading

    def _drain_and_shutdown():
        engine.drain()
        server.shutdown()

    def _on_sigterm(signum, frame):
        logger.warning('SIGTERM: draining in-flight requests, then '
                       'shutting down')
        threading.Thread(target=_drain_and_shutdown, daemon=True,
                         name='eve-serving-drain').start()

    if threading.current_thread() is threading.main_thread():
        signal.signal(signal.SIGTERM, _on_sigterm)
    else:
        logger.warning('not on the main thread; graceful SIGTERM drain is '
                       'NOT armed (call engine.drain() + server.shutdown() '
                       'from your own handler for graceful shutdown)')

    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.shutdown()
        # Resolve every still-pending future FIRST (on the SIGTERM path the
        # drain already completed them gracefully; on Ctrl-C this fails
        # them promptly) so handler threads blocked in engine.infer()
        # unblock, THEN join the handler threads (ThreadingHTTPServer sets
        # daemon_threads, so without block_on_close's join in
        # server_close() the interpreter would kill a handler mid-way
        # through writing its response — the dropped in-flight work the
        # drain exists to prevent). The join is bounded by the HTTP
        # layer's keep-alive read timeout.
        engine.stop()
        server.server_close()


if __name__ == '__main__':
    main()
