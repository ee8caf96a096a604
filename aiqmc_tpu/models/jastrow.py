"""Pade Jastrow factors for e-e and e-a cusp conditions.

Parity with ref ``AIQMCrelease3/wavefunction_Ynlm/Jastrow.py``. The pair gathers
use static index arrays computed once at build time (models.spin_indices); the
per-pair / per-(electron, atom) evaluations are plain vectorised gathers +
elementwise math (VPU work, fused by XLA) instead of the reference's nested vmaps.
"""

from __future__ import annotations

import enum
from typing import Mapping, Tuple

import jax.numpy as jnp
import numpy as np


class JastrowType(enum.Enum):
    """Available Jastrow factors (ref Jastrow.py:11-13 +
    ferminet/jastrows.py:25-30)."""
    PADE = enum.auto()
    SIMPLE_EE = enum.auto()
    NONE = enum.auto()


def make_pade_ee_jastrow():
    """Pade e-e cusp Jastrow: (r * cusp) / (1 + alpha * r) (ref Jastrow.py:44-63).

    Cusp constants: 0.25 for parallel spins, 0.5 for antiparallel. One variational
    alpha per pair, as in the reference.
    """

    def pade_ee_cusp_fun(r_ee, cusp, alpha):
        # The Pade form requires alpha > 0: a negative variational alpha puts a
        # pole at r = 1/|alpha| (psi singular on a sphere, E_L unbounded).
        # |alpha| preserves the reference initialisation (alpha=1) and the cusp
        # (which is alpha-independent at r=0).
        return (r_ee * cusp) / (1.0 + jnp.abs(alpha) * r_ee)

    def init(n_parallel: int, n_antiparallel: int) -> Mapping[str, jnp.ndarray]:
        return {
            "ee_par": jnp.ones(shape=(n_parallel,)),
            "ee_anti": jnp.ones(shape=(n_antiparallel,)),
        }

    def apply(r_ee: jnp.ndarray, params, parallel_indices: np.ndarray,
              antiparallel_indices: np.ndarray) -> jnp.ndarray:
        # r_ee: (nelec, nelec) distance matrix.
        r_par = r_ee[parallel_indices[0], parallel_indices[1]]
        r_anti = r_ee[antiparallel_indices[0], antiparallel_indices[1]]
        j_par = jnp.sum(pade_ee_cusp_fun(r_par, 0.25, params["ee_par"]))
        j_anti = jnp.sum(pade_ee_cusp_fun(r_anti, 0.5, params["ee_anti"]))
        return j_par + j_anti

    return init, apply


def make_simple_ee_jastrow():
    """Simple e-e cusp Jastrow: -(cusp * alpha^2) / (alpha + r) with ONE shared
    alpha per spin channel (ref ferminet/jastrows.py:63-90). Same cusp values
    as Pade (0.25 parallel, 0.5 antiparallel); d/dr at r=0 = cusp for any
    alpha."""

    def simple_ee_cusp_fun(r, cusp, alpha):
        alpha = jnp.abs(alpha) + 1e-6  # alpha < 0 would pole at r = -alpha
        return -(cusp * alpha ** 2) / (alpha + r)

    def init(n_parallel: int, n_antiparallel: int) -> Mapping[str, jnp.ndarray]:
        del n_parallel, n_antiparallel  # one shared alpha per channel
        return {"ee_par": jnp.ones(shape=(1,)), "ee_anti": jnp.ones(shape=(1,))}

    def apply(r_ee: jnp.ndarray, params, parallel_indices: np.ndarray,
              antiparallel_indices: np.ndarray) -> jnp.ndarray:
        r_par = r_ee[parallel_indices[0], parallel_indices[1]]
        r_anti = r_ee[antiparallel_indices[0], antiparallel_indices[1]]
        j_par = jnp.sum(simple_ee_cusp_fun(r_par, 0.25, params["ee_par"]))
        j_anti = jnp.sum(simple_ee_cusp_fun(r_anti, 0.5, params["ee_anti"]))
        return j_par + j_anti

    return init, apply


def make_null_ee_jastrow():
    """No e-e Jastrow (ref ferminet/jastrows.py JastrowType.NONE)."""

    def init(n_parallel: int, n_antiparallel: int) -> Mapping[str, jnp.ndarray]:
        del n_parallel, n_antiparallel
        return {}

    def apply(r_ee: jnp.ndarray, params, parallel_indices: np.ndarray,
              antiparallel_indices: np.ndarray) -> jnp.ndarray:
        del params, parallel_indices, antiparallel_indices
        return jnp.zeros((), dtype=r_ee.dtype)

    return init, apply


def make_pade_ae_jastrow(charges: jnp.ndarray, per_electron: bool = True):
    """Pade a-e cusp Jastrow (ref Jastrow.py:81-103).

    J_ae = sum_{i,a} -(2 Z_a)^{3/4} (1 - exp(-(2 Z_a)^{1/4} r_ia beta_ia)) / (2 beta_ia)

    Args:
      charges: (natoms,) nuclear charges.
      per_electron: if True (reference behaviour) beta has shape
        (nelectrons, natoms). Note this breaks exact antisymmetry of the total
        ansatz under same-spin exchange; per_electron=False shares beta across
        electrons (shape (1, natoms)), restoring it.
    """

    def init(nelectrons: int, natoms: int) -> Mapping[str, jnp.ndarray]:
        shape = (nelectrons, natoms) if per_electron else (1, natoms)
        return {"ae": jnp.ones(shape=shape)}

    def apply(r_ae: jnp.ndarray, params) -> jnp.ndarray:
        # r_ae: (nelec, natoms); charges broadcast along electrons.
        # beta must stay positive: for beta < 0 the exponential grows with r and
        # exp(J) makes |psi|^2 non-normalisable. The e-n cusp (-Z) is exact for
        # any beta > 0.
        beta = jnp.abs(params["ae"]) + 1e-6
        z2 = 2.0 * charges[None, :]
        val = -(z2 ** 0.75) * (1.0 - jnp.exp(-(z2 ** 0.25) * r_ae * beta)) / (2.0 * beta)
        return jnp.sum(val)

    return init, apply


def make_null_ae_jastrow():
    """No a-e Jastrow. The Pade a-e term forces the all-electron cusp
    d log|psi| / dr_ia = -Z_a at each nucleus; for a pseudopotential atom the
    exact wavefunction is SMOOTH at the core (the ECP removes the -Z/r
    singularity), so the forced kink adds an uncancelled ~Z/r kinetic spike —
    a variance and energy floor. (The reference applies the cusp Jastrow to
    its ECP Hamiltonian too, ref Energy/pphamiltonian.py + Jastrow.py:81-103 —
    reference behaviour available via jastrow_ae=True.)"""

    def init(nelectrons: int, natoms: int) -> Mapping[str, jnp.ndarray]:
        del nelectrons, natoms
        return {}

    def apply(r_ae: jnp.ndarray, params) -> jnp.ndarray:
        del params
        return jnp.zeros((), dtype=r_ae.dtype)

    return init, apply


def get_jastrow(charges: jnp.ndarray, per_electron_ae: bool = True,
                include_ae: bool = True, ee_type: str = "pade"
                ) -> Tuple[object, object, object, object]:
    """Returns (ee_init, ee_apply, ae_init, ae_apply) (ref Jastrow.py:132-135).

    ee_type: 'pade' (reference AIQMC, per-pair alpha) | 'simple_ee'
    (ref ferminet/jastrows.py:63-100, shared alpha) | 'none'.
    """
    if ee_type == "pade":
        jastrow_ee_init, jastrow_ee_apply = make_pade_ee_jastrow()
    elif ee_type == "simple_ee":
        jastrow_ee_init, jastrow_ee_apply = make_simple_ee_jastrow()
    elif ee_type == "none":
        jastrow_ee_init, jastrow_ee_apply = make_null_ee_jastrow()
    else:
        raise ValueError(f"Unknown e-e Jastrow type: {ee_type}")
    if include_ae:
        jastrow_ae_init, jastrow_ae_apply = make_pade_ae_jastrow(
            charges, per_electron=per_electron_ae)
    else:
        jastrow_ae_init, jastrow_ae_apply = make_null_ae_jastrow()
    return jastrow_ee_init, jastrow_ee_apply, jastrow_ae_init, jastrow_ae_apply
