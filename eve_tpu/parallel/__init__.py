"""Device mesh construction and batch/param sharding helpers."""

from eve_tpu.parallel.mesh import (  # noqa: F401
    make_mesh, shard_batch, replicate,
    is_primary_process, local_data_slice)
from eve_tpu.parallel.temporal import sharded_scan  # noqa: F401
