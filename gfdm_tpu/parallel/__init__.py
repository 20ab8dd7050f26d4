"""Mesh sharding, halo exchange and distributed metrics (SURVEY.md 2.6, 5.8)."""
from .mesh import (  # noqa: F401
    detect_bursts_sharded,
    halo_exchange_right,
    make_mesh,
    psum_metrics,
    shard_bursts,
)

# multi-host launch/worker helpers live in gfdm_tpu.parallel.multihost
# (imported lazily there: the worker entry must control backend selection
# before any device query)
