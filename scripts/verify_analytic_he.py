"""Verify flow 1: He stub psi = e^{-2r1-2r2}; sampler+local-energy => -2.75."""
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
from aiqmc_tpu.hamiltonian import local_energy
from aiqmc_tpu.sampling.mcmc import make_mcmc_step
from aiqmc_tpu.models.network import AINetData

def f(params, pos, spins, atoms, charges):
    del params, spins, charges
    r1 = jnp.linalg.norm(pos[:3] - atoms[0])
    r2 = jnp.linalg.norm(pos[3:] - atoms[0])
    return jnp.ones(()), -2.0 * (r1 + r2)

batch = 4096
atoms = jnp.zeros((1, 3))
charges = jnp.asarray([2.0])
key = jax.random.PRNGKey(0)
pos = 0.5 * jax.random.normal(key, (batch, 6))
data = AINetData(positions=pos,
                 spins=jnp.broadcast_to(jnp.array([1.0, -1.0]), (batch, 2)),
                 atoms=atoms, charges=charges)
batch_net = jax.vmap(lambda p, x, s, a, c: f(p, x, s, a, c)[1],
                     in_axes=(None, 0, 0, None, None))
mcmc = jax.jit(make_mcmc_step(batch_net, batch, steps=30))
width = jnp.asarray(0.4)
for i in range(12):
    key, sub = jax.random.split(key)
    data, pmove = mcmc(None, data, sub, width)
e_l = jax.jit(jax.vmap(
    local_energy.local_energy(f, charges, (1, 1), complex_output=False),
    in_axes=(None, 0, AINetData(positions=0, spins=0, atoms=None,
                                charges=None))))
es = []
for i in range(6):
    key, sub = jax.random.split(key)
    data, pmove = mcmc(None, data, sub, width)
    e, _ = e_l(None, jax.random.split(sub, batch), data)
    es.append(np.asarray(e))
es = np.concatenate(es)
mean = es.mean(); sem = es.std() / np.sqrt(len(es))
print(f"E = {mean:.5f} +- {sem:.5f}  (exact -2.75), pmove={float(pmove):.3f}")
assert abs(mean + 2.75) < max(4 * sem, 0.01), "analytic-trial check FAILED"
print("analytic-trial check PASSED")
