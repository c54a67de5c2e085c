"""eve_tpu — TPU-native video gaze estimation framework.

A ground-up JAX/XLA/Pallas rebuild of EVE ("Towards End-to-end Video-based
Eye Tracking", ECCV 2020). Import surface:

- ``eve_tpu.config.DefaultConfig`` — the ~80-key config (reference JSONs
  run unmodified)
- ``eve_tpu.models.eve`` — ``EveSpec``, ``init_params``, ``forward``
- ``eve_tpu.data.dataset`` — ``EVESequences_{train,val,test}``
- ``eve_tpu.train.harness`` — training loop / experiment runtime
- ``eve_tpu.infer`` / ``eve_tpu.serve`` / ``eve_tpu.export`` — batch
  inference, HTTP serving, AOT artifact export
- ``eve_tpu.cli`` — console entry points (eve-train, eve-inference, …)

Submodules are imported lazily by design: importing ``eve_tpu`` must not
pull in jax/flax (the pure-host data tooling is usable without them).
"""

__version__ = '0.2.0'
