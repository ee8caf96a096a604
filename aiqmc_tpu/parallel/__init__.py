"""Distributed runtime: mesh construction, sharding helpers, sharded PRNG.

TPU-native replacement for the reference's pmap runtime
(``AIQMCrelease3/constants.py:5-9`` and the kfac_jax replicate/broadcast helpers):
we use a global-view ``jax.sharding.Mesh`` with NamedSharding annotations and let
XLA/GSPMD insert psum/pmean collectives over ICI.
"""

from aiqmc_tpu.parallel.mesh import (  # noqa: F401
    DATA_AXIS,
    make_mesh,
    replicated,
    data_sharding,
    shard_walkers,
    replicate,
    host_batch_info,
)
