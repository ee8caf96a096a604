"""Odd walker populations must not silently serialise a multi-device run.

VERDICT round-3 weak #6: ``walker_mesh`` used to shrink to the largest device
prefix dividing the population — worst case a single device — with only a log
line. Now it raises unless explicitly allowed, the DMC driver rounds its
population UP to a device multiple (restore tiling / branching make that
free), and ``vmc_eval.distribute`` TRIMS to a device multiple (walkers are
iid, the dropped remainder is statistically free).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aiqmc_tpu import vmc_eval
from aiqmc_tpu.models.network import AINetData
from aiqmc_tpu.parallel import mesh as mesh_lib


def test_walker_mesh_raises_on_odd_population():
    assert jax.device_count() == 8
    with pytest.raises(ValueError, match="not divisible"):
        mesh_lib.walker_mesh(4097)


def test_walker_mesh_allow_shrink_keeps_old_behaviour():
    mesh = mesh_lib.walker_mesh(4097, allow_shrink=True)
    assert mesh.devices.size == 1  # 4097 is prime w.r.t. 2..8
    mesh = mesh_lib.walker_mesh(12, allow_shrink=True)
    assert mesh.devices.size == 6


def test_rounding_helpers():
    assert mesh_lib.round_up_to_devices(4097, 8) == 4104
    assert mesh_lib.round_up_to_devices(4096, 8) == 4096
    assert mesh_lib.round_up_to_devices(3, 8) == 8
    assert mesh_lib.trim_to_devices(4097, 8) == 4096
    assert mesh_lib.trim_to_devices(7, 8) == 0
    # Default n_devices = live device count (8 virtual CPUs here).
    assert mesh_lib.round_up_to_devices(9) == 16
    assert mesh_lib.trim_to_devices(9) == 8


def test_distribute_trims_odd_population_to_full_mesh():
    """An odd eval population keeps ALL devices by dropping the remainder."""
    n = 19  # not divisible by 8; largest prefix divisor would be 1 device
    pos = jax.random.normal(jax.random.PRNGKey(0), (n, 6))
    data = AINetData(positions=pos, spins=jnp.array([1.0, -1.0]),
                     atoms=jnp.zeros((1, 3)), charges=jnp.array([2.0]))
    params = {"w": jnp.ones((3,))}
    p, d, mesh = vmc_eval.distribute(params, data)
    assert mesh.devices.size == 8          # NOT serialised
    assert d.positions.shape[0] == 16      # trimmed to the device multiple
    np.testing.assert_array_equal(np.asarray(d.positions),
                                  np.asarray(pos[:16]))


def test_distribute_tiny_population_shrinks_loudly():
    """Fewer walkers than devices (unit-test scale) still works."""
    pos = jax.random.normal(jax.random.PRNGKey(0), (5, 6))
    data = AINetData(positions=pos, spins=jnp.array([1.0, -1.0]),
                     atoms=jnp.zeros((1, 3)), charges=jnp.array([2.0]))
    p, d, mesh = vmc_eval.distribute({"w": jnp.ones((3,))}, data)
    assert d.positions.shape[0] == 5
    assert mesh.devices.size == 5
