"""REAL 2-process multi-host test (beyond the fake-accounting unit tests):
spawns two coordinated JAX CPU processes (jax.distributed.initialize) and
drives the actual multi-host wiring — broadcast_seed, broadcast_tree,
shard_walkers via make_array_from_process_local_data, check_synced, and a
global-mean reduction over the assembled sharded array (the walker-energy
pattern of the one-jit training step).

Pattern: ref ferminet/utils/multi_host.py:22-44 and the per-host batch
accounting of ref AIQMCrelease3/main/main_pp_adam_muti_GPU.py:52-63, which
only a true multi-process run can exercise.
"""

import os
import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import os, sys
import numpy as np

proc_id = int(sys.argv[1])
port = sys.argv[2]

import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=2, process_id=proc_id)
import jax.numpy as jnp
from aiqmc_tpu.parallel import mesh as mesh_lib
from aiqmc_tpu.parallel import multi_host

assert jax.process_count() == 2, jax.process_count()

# Seed broadcast: process 1 starts with a different seed and must adopt 0's.
seed = multi_host.broadcast_seed(123 if proc_id == 0 else 999)
assert seed == 123, seed

# Param broadcast from process 0 (the post-pretraining pattern).
tree = {"w": jnp.full((3,), float(proc_id + 1))}
tree = multi_host.broadcast_tree(tree)
np.testing.assert_allclose(np.asarray(tree["w"]), 1.0)
multi_host.check_synced(tree)

# Host-local walker shards -> one global sharded array; each process holds
# host_batch_size rows of the global batch.
mesh = mesh_lib.make_mesh()
info = mesh_lib.host_batch_info(8)
assert info.num_hosts == 2 and info.host_batch_size == 4, info
local = np.arange(info.host_batch_size, dtype=np.float32) + 100.0 * proc_id
global_arr = mesh_lib.shard_walkers(local[:, None], mesh)
assert global_arr.shape == (8, 1), global_arr.shape

# A jitted global reduction must see BOTH hosts' walkers.
mean = jax.jit(jnp.mean)(global_arr)
want = np.mean(np.concatenate(
    [np.arange(4, dtype=np.float32), np.arange(4, dtype=np.float32) + 100.0]))
np.testing.assert_allclose(np.asarray(mean), want, rtol=1e-6)

# check_synced must FAIL on genuinely different trees.
bad = {"w": jnp.full((3,), float(proc_id))}
try:
    multi_host.check_synced(bad)
    raise SystemExit("check_synced missed a desync")
except AssertionError:
    pass

print(f"proc {proc_id} OK")
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_multi_host(tmp_path):
    port = _free_port()
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PALLAS_AXON_POOL_IPS", None)
    # Two local CPU devices per process -> 4 global devices, 2 hosts.
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["PYTHONPATH"] = "/root/repo"
    procs = [subprocess.Popen([sys.executable, str(script), str(i), str(port)],
                              stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                              text=True, env=env)
             for i in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multi-process run timed out")
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out}"
        assert f"proc {i} OK" in out, out
