"""One DMC propagation step: T-moves -> drift-diffusion -> reweighting.

Capability parity with ref ``AIQMCrelease3/DMC/dmc.py:13-93``.

Program structure: the step dispatches THREE compiled programs per iteration —
(1) T-moves + drift-diffusion, (2) one local-energy evaluator invoked at the
pre- and post-move positions, (3) the elementwise S-matrix reweighting. An
earlier all-in-one-program variant was bisected to produce deterministic,
program-shape-dependent local-energy corruption (per-walker errors up to
~100 Ha) on the axon TPU backend: the SAME positions evaluated by the same
``total_e`` gave different values inside the fused program than standalone,
for both Laplacian methods. Splitting keeps every energy evaluation in the
single-program shape that validates against physics oracles, and matches the
reference's own dispatch granularity (ref DMC/dmc.py:42-83 runs tmoves,
drift-diffusion and the two energy evaluations as separate pmaps).
"""

from __future__ import annotations

from typing import Optional

import chex
import jax
import jax.numpy as jnp

from aiqmc_tpu.dmc.drift_diffusion import propose_drift_diffusion
from aiqmc_tpu.dmc.s_matrix import comput_S
from aiqmc_tpu.dmc.tmoves import compute_tmoves
from aiqmc_tpu.hamiltonian import local_energy as ae_local_energy
from aiqmc_tpu.hamiltonian import pp_local_energy
from aiqmc_tpu.models.network import AINetData


def calculate_total_energy(local_energy, pair_output: bool = False):
    """Batch-averaged local energy (ref DMC/total_energy.py:9-33).

    Returns fn(params, key, data) -> (per-walker E_L, (mean, variance)).

    pair_output: the local energy returns the TPU-safe stacked [Re, Im] pair
    (complex-pairs/twisted trials); reduce to the REAL component, which is
    exactly the fixed-phase effective local energy of |psi|
    (Ortiz-Ceperley-Martin 1993: E_FP = -1/2 (lap log|psi| + |grad log|psi||^2)
    + V + 1/2 |grad phase|^2 = Re E_L), so the downstream S-matrix/branching
    machinery is unchanged."""
    batch_local_energy = jax.vmap(
        local_energy,
        in_axes=(None, 0, AINetData(positions=0, spins=None, atoms=None,
                                    charges=None)),
        out_axes=(0, 0))

    def total_energy(params, key: chex.PRNGKey, data: AINetData):
        keys = jax.random.split(key, num=data.positions.shape[0])
        e_l, _ = batch_local_energy(params, keys, data)
        if pair_output:
            e_l = e_l[..., 0]
        # Walkers at |psi| ~ 0 legitimately produce non-finite E_L (the pair
        # GE returns logabs = -inf for psi = 0); mask them out of the summary
        # statistics exactly like the VMC loss does — one bad walker must not
        # poison E_init/E_trial/sigma for the whole run (observed: all-NaN
        # blocks from block 0 on the diamond fixed-phase DMC).
        ok = jnp.isfinite(jnp.abs(e_l))
        n_ok = jnp.maximum(jnp.sum(ok), 1)
        mean = jnp.sum(jnp.where(ok, e_l, 0)) / n_ok
        variance = jnp.sum(jnp.where(ok, jnp.abs(e_l - mean) ** 2, 0)) / n_ok
        return e_l, (mean, variance)

    return total_energy


def reweight_walkers(weights, tdamp, v_old, v_new, eloc_old, eloc_new,
                     branchcut, e_trial, e_est, tstep: float, nelec: int):
    """S-matrix weight multiplier (ref DMC/dmc.py:86-92), per walker.

    Walkers whose local energy (either side of the move) or whose multiplier
    is non-finite are KILLED (weight -> 0) rather than allowed to poison the
    population: E_L = +-inf/NaN means the walker crossed into |psi| ~ 0
    territory, the fixed-node/fixed-phase death zone; the next branching comb
    respawns from healthy walkers."""
    s_old = comput_S(e_trial=e_trial, e_est=e_est, branchcut=branchcut,
                     v2=jnp.square(v_old), tau=tstep, eloc=eloc_old,
                     nelec=nelec)
    s_new = comput_S(e_trial=e_trial, e_est=e_est, branchcut=branchcut,
                     v2=jnp.square(v_new), tau=tstep, eloc=eloc_new,
                     nelec=nelec)
    wmult = jnp.exp(tstep * tdamp * (0.5 * s_new + 0.5 * s_old))
    ok = (jnp.isfinite(jnp.real(eloc_old)) & jnp.isfinite(jnp.real(eloc_new))
          & jnp.isfinite(wmult))
    return jnp.where(ok, wmult * weights, 0.0)


def build_dmc_local_energy(signed_network, charges, spins, Rn_local,
                           Local_coes, Local_exps, Rn_non_local,
                           Non_local_coes, Non_local_exps, natoms,
                           nelectrons, ndim, list_l,
                           complex_output: bool = False,
                           laplacian_chunk: Optional[int] = None,
                           pair_output: bool = False,
                           lattice=None,
                           convergence_radius: int = 5,
                           quadrature: str = "msc50",
                           laplacian_method: str = "default",
                           orbitals_fn=None,
                           twist_k=None):
    """Selects the DMC Hamiltonian: molecular all-electron / molecular ccECP
    (refs Energy/hamiltonian.py, Energy/pphamiltonian.py) or, with a lattice,
    the periodic variants (Ewald; + minimum-image ccECP channels when tables
    are present). Shared by dmc_propagate and the driver's E_init estimate.

    laplacian_method="forward" (+ orbitals_fn, and twist_k for twisted
    trials) selects the forward-Laplacian kinetic — DMC evaluates E_L twice
    per step, so this is a ~2x step-time lever; gate it with
    scripts/probe_forward_{real,pair}.py exactly as the VMC scripts do."""
    all_electron = Rn_local is None
    if lattice is not None and not all_electron:
        from aiqmc_tpu.hamiltonian import pp_pbc
        return pp_pbc.local_energy(
            f=signed_network, charges=charges, nspins=spins, lattice=lattice,
            rn_local=Rn_local, local_coes=Local_coes, local_exps=Local_exps,
            rn_non_local=Rn_non_local, non_local_coes=Non_local_coes,
            non_local_exps=Non_local_exps, natoms=natoms,
            nelectrons=nelectrons, ndim=ndim, list_l=list_l,
            complex_output=complex_output,
            convergence_radius=convergence_radius,
            laplacian_chunk=laplacian_chunk, pair_output=pair_output,
            laplacian_method=laplacian_method, orbitals_fn=orbitals_fn,
            twist_k=twist_k, quadrature=quadrature)
    if lattice is not None:
        from aiqmc_tpu.pbc import ewald as ewald_lib
        return ewald_lib.local_energy(
            f=signed_network, charges=charges, nspins=spins, lattice=lattice,
            complex_output=complex_output,
            convergence_radius=convergence_radius,
            laplacian_chunk=laplacian_chunk, pair_output=pair_output,
            laplacian_method=laplacian_method, orbitals_fn=orbitals_fn,
            twist_k=twist_k)
    if all_electron:
        return ae_local_energy.local_energy(
            f=signed_network, charges=charges, nspins=spins,
            complex_output=complex_output, laplacian_chunk=laplacian_chunk,
            laplacian_method=laplacian_method, orbitals_fn=orbitals_fn,
            pair_output=pair_output)
    return pp_local_energy.local_energy(
        f=signed_network, lognetwork=None, charges=charges, nspins=spins,
        rn_local=Rn_local, local_coes=Local_coes, local_exps=Local_exps,
        rn_non_local=Rn_non_local, non_local_coes=Non_local_coes,
        non_local_exps=Non_local_exps, natoms=natoms, nelectrons=nelectrons,
        ndim=ndim, list_l=list_l, complex_output=complex_output,
        laplacian_chunk=laplacian_chunk, pair_output=pair_output,
        laplacian_method=laplacian_method, orbitals_fn=orbitals_fn,
        quadrature=quadrature)


def dmc_propagate(signed_network,
                  log_network,
                  logabs_f,
                  list_l: int,
                  nelectrons: int,
                  natoms: int,
                  ndim: int,
                  batch_size: int,
                  tstep: float,
                  nsteps: int,
                  charges: jnp.ndarray,
                  spins,
                  Rn_local: jnp.ndarray,
                  Local_coes: jnp.ndarray,
                  Local_exps: jnp.ndarray,
                  Rn_non_local: jnp.ndarray,
                  Non_local_coes: jnp.ndarray,
                  Non_local_exps: jnp.ndarray,
                  complex_output: bool = False,
                  laplacian_chunk: Optional[int] = None,
                  use_tmoves: bool = True,
                  quadrature: str = "msc50",
                  fused: bool = False,
                  pair_output: bool = False,
                  lattice=None,
                  convergence_radius: int = 5,
                  phase_kill: bool = True,
                  laplacian_method: str = "default",
                  orbitals_fn=None,
                  twist_k=None):
    """Builds dmc_propagate_run(params, key, data, weights, branchcut, e_trial,
    e_est) -> (eloc_new, weights, new_data) (ref DMC/dmc.py:72-93).

    Pseudopotential tables may be None, selecting the all-electron Coulomb
    Hamiltonian (no T-moves needed).

    fused=True compiles the whole propagation step (moves + both energy
    evaluations + reweighting) as ONE program — lower dispatch overhead, but
    gated off by default because the round-1 axon toolchain miscompiled the
    fused shape (module docstring); run scripts/probe_fused_dmc.py on the
    current toolchain before enabling.

    pair_output=True runs FIXED-PHASE DMC on a complex-pair/twisted trial
    (beyond the reference, whose DMC is real molecular): the local energy is
    the stacked [Re, Im] pair and the branching weight uses Re E_L — exactly
    the fixed-phase effective energy of |psi| (calculate_total_energy).
    Combine with phase_kill=False for smooth complex trials (no nodes; a
    fixed-node rejection would bias the walk) but keep phase_kill=True for
    twisted-REAL trials (pbc/twist.real_to_angle: the real factor still has
    genuine nodes under the smooth boost).

    lattice (+convergence_radius) selects the periodic Hamiltonian: Ewald
    with the given charges, plus the short-range ccECP channels at minimum
    image when pseudopotential tables are present (hamiltonian/pp_pbc.py).
    T-moves act about nearest-image atoms under a lattice (tmoves.py); with
    pair trials their amplitudes use Re psi-ratios (fixed-phase matrix
    elements)."""
    del log_network, logabs_f, nsteps  # API parity with the reference factory

    all_electron = Rn_local is None
    tmove = compute_tmoves(
        list_l=list_l, tstep=tstep, nelectrons=nelectrons, natoms=natoms,
        ndim=ndim, signed_network=signed_network, Rn_non_local=Rn_non_local,
        Non_local_coes=Non_local_coes, Non_local_exps=Non_local_exps,
        complex_output=complex_output, quadrature=quadrature,
        lattice=lattice) \
        if (use_tmoves and not all_electron) else None

    drift_diffusion = propose_drift_diffusion(
        signed_network=signed_network, tstep=tstep, ndim=ndim,
        nelectrons=nelectrons, batch_size=batch_size, phase_kill=phase_kill)

    localenergy = build_dmc_local_energy(
        signed_network=signed_network, charges=charges, spins=spins,
        Rn_local=Rn_local, Local_coes=Local_coes, Local_exps=Local_exps,
        Rn_non_local=Rn_non_local, Non_local_coes=Non_local_coes,
        Non_local_exps=Non_local_exps, natoms=natoms, nelectrons=nelectrons,
        ndim=ndim, list_l=list_l, complex_output=complex_output,
        laplacian_chunk=laplacian_chunk, pair_output=pair_output,
        lattice=lattice, convergence_radius=convergence_radius,
        quadrature=quadrature, laplacian_method=laplacian_method,
        orbitals_fn=orbitals_fn, twist_k=twist_k)
    total_e = calculate_total_energy(localenergy, pair_output=pair_output)

    def move_walkers(params, key: chex.PRNGKey, data: AINetData):
        """Program 1: T-moves + drift-diffusion. Returns the post-T-move data
        (where the old-side S-matrix energy is defined, ref DMC/dmc.py:42-51),
        the moved data, acceptance damping and limited drifts."""
        key, tmove_key, dd_key = jax.random.split(key, num=3)
        if tmove is not None:
            tmove_keys = jax.random.split(tmove_key, num=batch_size)
            pos, _ = jax.vmap(tmove, in_axes=(
                AINetData(positions=0, spins=None, atoms=None, charges=None),
                None, 0))(data, params, tmove_keys)
            data = AINetData(**(dict(data) | {"positions": pos}))
        new_data, _, tdamp, v_old, v_new = drift_diffusion(params, dd_key, data)
        return data, new_data, tdamp, v_old, v_new

    def reweight(weights, tdamp, v_old, v_new, eloc_old, eloc_new,
                 branchcut_start, e_trial, e_est):
        """Program 3: S-matrix reweighting (module-level reweight_walkers)."""
        return reweight_walkers(weights, tdamp, v_old, v_new, eloc_old,
                                eloc_new, branchcut_start, e_trial, e_est,
                                tstep=tstep, nelec=nelectrons)

    if fused:
        @jax.jit
        def dmc_propagate_fused(params, key, data, weights, branchcut_start,
                                e_trial, e_est):
            key, move_key, e_key = jax.random.split(key, num=3)
            data_tm, new_data, tdamp, v_old, v_new = move_walkers(
                params, move_key, data)
            eloc_old, _ = total_e(params, e_key, data_tm)
            eloc_new, _ = total_e(params, e_key, new_data)
            weights = reweight(weights, tdamp, v_old, v_new, eloc_old,
                               eloc_new, branchcut_start, e_trial, e_est)
            return eloc_new, weights, new_data

        return dmc_propagate_fused

    jit_move = jax.jit(move_walkers)
    jit_energy = jax.jit(total_e)
    jit_reweight = jax.jit(reweight)

    def dmc_propagate_run(params,
                          key: chex.PRNGKey,
                          data: AINetData,
                          weights: jnp.ndarray,
                          branchcut_start,
                          e_trial,
                          e_est):
        key, move_key, e_key = jax.random.split(key, num=3)
        data_tm, new_data, tdamp, v_old, v_new = jit_move(params, move_key,
                                                          data)
        eloc_old, _ = jit_energy(params, e_key, data_tm)
        eloc_new, _ = jit_energy(params, e_key, new_data)
        weights = jit_reweight(weights, tdamp, v_old, v_new, eloc_old,
                               eloc_new, branchcut_start, e_trial, e_est)
        return eloc_new, weights, new_data

    return dmc_propagate_run
