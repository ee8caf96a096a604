"""Multi-host accounting and process-local sharding paths.

The cluster itself can't be faked in one process, but the accounting math
(ref main_pp_adam_muti_GPU.py:52-63) and the process-local global-array
assembly (``jax.make_array_from_process_local_data``) are exercised for real
on the conftest's 8-virtual-CPU-device mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aiqmc_tpu.parallel import mesh as mesh_lib
from aiqmc_tpu.parallel import multi_host


def test_host_batch_info_multi_process_accounting():
    # Fake topology: 32 devices over 4 hosts of 8 local devices each.
    info = mesh_lib.host_batch_info(4096, num_total=32, num_local=8)
    assert info.num_hosts == 4
    assert info.host_batch_size == 1024
    assert info.device_batch_size == 128
    assert info.host_batch_size * info.num_hosts == info.batch_size
    with pytest.raises(ValueError):
        mesh_lib.host_batch_info(100, num_total=32, num_local=8)


def test_host_batch_info_single_process():
    info = mesh_lib.host_batch_info(64)
    assert info.num_hosts == 1
    assert info.host_batch_size == 64
    assert info.device_batch_size == 64 // jax.device_count()


def test_shard_walkers_from_process_local():
    """The make_array_from_process_local_data path builds the same global
    sharded array as plain device_put (single process: local == global)."""
    mesh = mesh_lib.make_mesh()
    x = np.arange(16 * 6, dtype=np.float32).reshape(16, 6)
    via_local = mesh_lib.shard_walkers(x, mesh, from_process_local=True)
    via_put = mesh_lib.shard_walkers(x, mesh, from_process_local=False)
    np.testing.assert_array_equal(np.asarray(via_local), np.asarray(via_put))
    assert via_local.sharding.spec == via_put.sharding.spec
    # Each device holds batch/n_devices walkers.
    shard = via_local.addressable_shards[0]
    assert shard.data.shape == (16 // jax.device_count(), 6)


def test_broadcast_seed_and_check_synced_single_host():
    assert multi_host.broadcast_seed(1234) == 1234
    assert multi_host.check_synced({"w": jnp.ones((2, 2))})
