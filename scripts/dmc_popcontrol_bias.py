"""DMC population-control bias study (ROADMAP): energy vs walker population.

Population control (branching + E_trial feedback) biases the DMC energy by
O(1/N_walkers). We measure it on the hydrogen atom (exact E = -0.5 Ha,
nodeless: no fixed-node error) with a deliberately crude trial
psi = e^{-0.8 r}, so population control does real work (same setup as
tests/test_dmc.py::test_dmc_projects_hydrogen_to_exact).

Usage (CPU, ~20 min):
  env JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= PYTHONPATH=/root/repo \
    python -u scripts/dmc_popcontrol_bias.py [tau] [steps]
"""
import sys

import numpy as np
import jax
import jax.numpy as jnp

from aiqmc_tpu.dmc import branch as branch_lib
from aiqmc_tpu.dmc.propagate import calculate_total_energy, dmc_propagate
from aiqmc_tpu.hamiltonian import local_energy as ae
from aiqmc_tpu.models.network import AINetData

TAU = float(sys.argv[1]) if len(sys.argv) > 1 else 0.03
STEPS = int(sys.argv[2]) if len(sys.argv) > 2 else 1500
ALPHA = 0.8
EQUIL = STEPS // 3


def run_dmc(batch: int, seed: int):
    def psi(params, pos, spins, atoms, charges):
        return jnp.ones(()), -ALPHA * jnp.linalg.norm(pos)

    run = dmc_propagate(
        signed_network=psi, log_network=None, logabs_f=None, list_l=0,
        nelectrons=1, natoms=1, ndim=3, batch_size=batch, tstep=TAU,
        nsteps=1, charges=jnp.array([1.0]), spins=(1, 0), Rn_local=None,
        Local_coes=None, Local_exps=None, Rn_non_local=None,
        Non_local_coes=None, Non_local_exps=None)
    jb = jax.jit(branch_lib.branch)
    key = jax.random.PRNGKey(seed)
    data = AINetData(positions=jax.random.normal(key, (batch, 3)),
                     spins=jnp.array([1.0]), atoms=jnp.zeros((1, 3)),
                     charges=jnp.array([1.0]))
    el = ae.local_energy(psi, jnp.array([1.0]), (1, 0))
    tot = jax.jit(calculate_total_energy(el))
    _, (e0, var0) = tot(None, key, data)
    e_trial = e_est = e0
    weights = jnp.ones((batch,))
    es = []
    for t in range(STEPS):
        key, sk, bk = jax.random.split(key, 3)
        energy, weights, data = run(None, sk, data, weights,
                                    10.0 * jnp.sqrt(var0), e_trial, e_est)
        w = weights / jnp.sum(weights)
        e_est = jnp.sum(energy.real * w)
        es.append(float(e_est))
        if t % 5 == 4:
            data, weights, _ = jb(data, weights, bk)
        e_trial = e_est - 0.3 * jnp.log(jnp.mean(weights)).real
    tail = np.asarray(es[EQUIL:])
    # crude autocorrelation-aware error: block averages of 50
    blocks = tail[: len(tail) // 50 * 50].reshape(-1, 50).mean(axis=1)
    return tail.mean(), blocks.std() / np.sqrt(len(blocks))


def main():
    print("tau=%.3f, %d steps, trial alpha=%.2f (exact -0.5)" %
          (TAU, STEPS, ALPHA))
    for batch in (64, 256, 1024, 4096):
        ms = [run_dmc(batch, seed) for seed in (0, 1)]
        m = np.mean([x[0] for x in ms])
        s = np.sqrt(np.mean([x[1] ** 2 for x in ms]) / len(ms))
        print("N=%5d: E = %.5f +- %.5f Ha  (bias %+7.2f mHa)"
              % (batch, m, s, 1000 * (m + 0.5)))


if __name__ == "__main__":
    main()
