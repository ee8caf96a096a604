"""Orbital pretraining.

Capability parity with ref ``ferminet/pretrain.py:119-311`` (MSE of the network
orbital matrices against target single-particle orbitals, interleaved with MCMC
on the current ansatz). The upstream targets are pyscf Hartree-Fock orbitals;
pyscf is not available in this environment, so the built-in target is a
Slater-rules hydrogenic minimal basis (1s/2s/2p with screened exponents), and
any callable with the same signature — e.g. a pyscf-backed one where pyscf
exists — can be passed instead.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import chex
import jax
import jax.numpy as jnp
import numpy as np
import optax

from aiqmc_tpu.models.network import AINetData
from aiqmc_tpu.sampling import mcmc as rw_mcmc

TargetOrbitals = Callable[[jnp.ndarray], Tuple[jnp.ndarray, jnp.ndarray]]


def _slater_orbitals(z: float):
    """Occupied hydrogenic orbital functions for an atom of charge z.

    Returns a list of callables r_vec -> orbital value, in filling order
    (1s, 2s, 2p_z, 2p_x, 2p_y), with Slater-screened exponents.
    """
    z = float(z)
    zeta1 = max(z - 0.3, 0.7)
    n1 = min(z, 2.0)
    zeta2 = max((z - 0.35 * 1 - 0.85 * n1) / 2.0, 0.5)

    def s1(rv):
        r = jnp.linalg.norm(rv, axis=-1)
        return jnp.exp(-zeta1 * r)

    def s2(rv):
        r = jnp.linalg.norm(rv, axis=-1)
        return (1.0 - zeta2 * r) * jnp.exp(-zeta2 * r)

    def p(axis):
        def _p(rv):
            r = jnp.linalg.norm(rv, axis=-1)
            return rv[..., axis] * jnp.exp(-zeta2 * r)

        return _p

    return [s1, s2, p(2), p(0), p(1)]


def make_hydrogenic_orbitals(atoms: np.ndarray, charges: np.ndarray,
                             nspins: Tuple[int, int]) -> TargetOrbitals:
    """Builds target orbitals phi_k(r) for each spin channel.

    Orbitals are filled per atom in energy order, alternating spins (paired
    first), mirroring aufbau filling; crude but an effective pretraining
    target in the absence of an SCF solver.
    """
    atoms = np.asarray(atoms)
    charges = np.asarray(charges)
    # Build (orbital fn, atom index) assignments per spin channel.
    assignments = {0: [], 1: []}
    remaining = [nspins[0], nspins[1]]
    # Round-robin over atoms, filling each atom's orbital ladder with up to 2
    # electrons per orbital across the molecule until channels are full.
    ladders = [( _slater_orbitals(z), a) for a, z in enumerate(charges)]
    level = 0
    while (remaining[0] > 0 or remaining[1] > 0) and level < 5:
        for fns, a in ladders:
            if level < len(fns):
                for spin in (0, 1):
                    if remaining[spin] > 0:
                        assignments[spin].append((fns[level], a))
                        remaining[spin] -= 1
        level += 1
    if remaining[0] > 0 or remaining[1] > 0:
        raise ValueError("Not enough target orbitals for the electron count")

    atoms_j = jnp.asarray(atoms)

    def targets(pos: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """pos: (nelec * 3,) -> (phi_up (n_up, n_up), phi_down (n_dn, n_dn))."""
        x = jnp.reshape(pos, (-1, 3))
        xu, xd = x[:nspins[0]], x[nspins[0]:]
        mats = []
        for spin, xs in ((0, xu), (1, xd)):
            cols = [fn(xs - atoms_j[a][None]) for fn, a in assignments[spin]]
            mats.append(jnp.stack(cols, axis=-1) if cols else
                        jnp.zeros((0, 0)))
        return mats[0], mats[1]

    return targets


def make_planewave_targets(lattice: np.ndarray,
                           nspins: Tuple[int, int]) -> TargetOrbitals:
    """Gamma-point plane-wave closed-shell targets for jellium/PBC systems.

    The Hartree-Fock (and non-interacting) ground state of the homogeneous
    electron gas at Gamma occupies the lowest |k| shells of the reciprocal
    lattice; a real representation of that occupied space is {1} plus
    {cos(k.r), sin(k.r)} over one representative per +-k pair in |k| order.
    The reference ships no pretraining for its HEG config
    (ref ferminet/configs/heg.py; ref ferminet/pretrain.py:119-211 is
    molecular pyscf-SCF only) — without it the multiwave-envelope ansatz
    starts at a random determinant ~7 Ha above HF and KFAC descends at
    ~0.2 mHa/iter (round-5 measurement, BASELINE.md HEG row); with it the
    t=0 energy starts at the HF-anchor scale.

    Args:
      lattice: (3, 3) primitive cell, ROWS are lattice vectors.
      nspins: electrons per spin channel. Each non-empty channel must be
        odd (1 + whole +-k pairs) so the real pairing is exact; a count
        that additionally cuts a degenerate |k| shell is allowed (the
        representative choice is basis-arbitrary) but logged.
    """
    from absl import logging

    lattice = np.asarray(lattice, dtype=np.float64)
    rec = 2.0 * np.pi * np.linalg.inv(lattice).T  # rows are b_i
    span = 4
    rng = range(-span, span + 1)
    grid = np.array([(i, j, k) for i in rng for j in rng for k in rng])
    ks = grid @ rec
    k2 = np.einsum("ij,ij->i", ks, ks)
    order = np.argsort(k2, kind="stable")
    reps, rep_k2, seen = [], [], set()
    for idx in order:
        g = tuple(int(v) for v in grid[idx])
        if g == (0, 0, 0) or g in seen:
            continue
        seen.add(g)
        seen.add(tuple(-v for v in g))
        # Canonical +-pair representative: first nonzero integer component
        # positive (a sign flip only negates the sin column — same span —
        # but the canonical choice keeps targets deterministic).
        sign = 1.0
        for v in g:
            if v != 0:
                sign = 1.0 if v > 0 else -1.0
                break
        reps.append(sign * ks[idx])
        rep_k2.append(k2[idx])
    max_n = 1 + 2 * len(reps)

    def channel_fns(n: int):
        if n == 0:
            return []
        if n % 2 == 0:
            raise ValueError(
                f"planewave pretraining needs an odd per-spin count "
                f"(1 + whole +-k pairs); got {n}")
        npairs = (n - 1) // 2
        if npairs > len(reps):
            raise ValueError(f"plane-wave table too small for {n} electrons "
                             f"(max {max_n}); enlarge span")
        if npairs and npairs < len(reps) and \
                abs(rep_k2[npairs - 1] - rep_k2[npairs]) < 1e-9:
            logging.info(
                "planewave pretraining: %d pairs cut a degenerate |k| "
                "shell; the representative choice is basis-arbitrary",
                npairs)
        fns = [lambda rv: jnp.ones(rv.shape[:-1])]
        for kvec in reps[:npairs]:
            kj = jnp.asarray(kvec)
            fns.append(lambda rv, kj=kj: jnp.cos(rv @ kj))
            fns.append(lambda rv, kj=kj: jnp.sin(rv @ kj))
        return fns

    fns_up = channel_fns(nspins[0])
    fns_dn = channel_fns(nspins[1])

    def targets(pos: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """pos: (nelec * 3,) -> (phi_up (n_up, n_up), phi_down (n_dn, n_dn))."""
        x = jnp.reshape(pos, (-1, 3))
        xu, xd = x[:nspins[0]], x[nspins[0]:]
        mats = []
        for fns, xs in ((fns_up, xu), (fns_dn, xd)):
            mats.append(jnp.stack([fn(xs) for fn in fns], axis=-1) if fns
                        else jnp.zeros((0, 0)))
        return mats[0], mats[1]

    return targets


def make_pretrain_step(network_orbitals,
                       batch_network,
                       target_fn: TargetOrbitals,
                       optimizer: optax.GradientTransformation,
                       nspins: Tuple[int, int],
                       mcmc_width: float = 0.2,
                       mcmc_steps: int = 5):
    """One pretraining step: orbital-MSE update + MCMC on the current ansatz
    (ref pretrain.py:119-227)."""
    n_up = nspins[0]

    def loss_fn(params, data: AINetData):
        def single(pos):
            dets = network_orbitals(params, pos, data.spins, data.atoms,
                                    data.charges)[0]  # (ndet, nelec, nelec)
            if isinstance(dets, tuple):  # pair-complex mode: match Re part
                dets = dets[0]
            phi_up, phi_down = target_fn(pos)
            nelec = dets.shape[-1]
            target = jnp.zeros((nelec, nelec), dets.dtype)
            target = target.at[:n_up, :n_up].set(phi_up)
            target = target.at[n_up:, n_up:].set(phi_down)
            diff = dets.real - target[None]
            return jnp.mean(jnp.square(diff))

        return jnp.mean(jax.vmap(single)(data.positions))

    mcmc_step = rw_mcmc.make_mcmc_step(batch_network, 0, steps=mcmc_steps)

    def step(params, opt_state, data: AINetData, key: chex.PRNGKey):
        loss, grad = jax.value_and_grad(loss_fn)(params, data)
        updates, opt_state = optimizer.update(grad, opt_state, params)
        params = optax.apply_updates(params, updates)
        key, subkey = jax.random.split(key)
        data, pmove = mcmc_step(params, data, subkey, mcmc_width)
        return params, opt_state, data, loss, pmove

    return step


def make_pretrain_states_step(network_orbitals,
                              batch_logabs_total,
                              target_fns,
                              optimizer: optax.GradientTransformation,
                              nspins: Tuple[int, int],
                              states: int,
                              mcmc_width: float = 0.2,
                              mcmc_steps: int = 5):
    """Excited-state pretraining step (ref ferminet/pretrain.py:150-196):
    determinant group k of the shared network, evaluated at configuration k of
    the extended walker, targets the k-th mean-field determinant
    (ground + lowest excitations); MCMC runs on the current TOTAL ansatz
    |det M|^2 so walkers sample the distribution training will use."""
    n_up = nspins[0]

    def loss_fn(params, data: AINetData):
        def single(pos):
            configs = jnp.reshape(pos, (states, -1))
            total = 0.0
            for k in range(states):
                dets = network_orbitals(params, configs[k], data.spins,
                                        data.atoms, data.charges)[0]
                if isinstance(dets, tuple):
                    dets = dets[0]
                ndets_k = dets.shape[0] // states
                group = dets[k * ndets_k:(k + 1) * ndets_k]
                phi_up, phi_down = target_fns[k](configs[k])
                nelec = group.shape[-1]
                tgt = jnp.zeros((nelec, nelec), group.dtype)
                tgt = tgt.at[:n_up, :n_up].set(phi_up)
                tgt = tgt.at[n_up:, n_up:].set(phi_down)
                total = total + jnp.mean(jnp.square(group.real - tgt[None]))
            return total / states

        return jnp.mean(jax.vmap(single)(data.positions))

    mcmc_step = rw_mcmc.make_mcmc_step(batch_logabs_total, 0,
                                       steps=mcmc_steps)

    def step(params, opt_state, data: AINetData, key: chex.PRNGKey):
        loss, grad = jax.value_and_grad(loss_fn)(params, data)
        updates, opt_state = optimizer.update(grad, opt_state, params)
        params = optax.apply_updates(params, updates)
        key, subkey = jax.random.split(key)
        data, pmove = mcmc_step(params, data, subkey, mcmc_width)
        return params, opt_state, data, loss, pmove

    return step


def make_rhf_targets(atoms, charges, nspins: Tuple[int, int],
                     basis=None) -> TargetOrbitals:
    """Hartree-Fock pretraining targets from the built-in RHF solver
    (utils/scf.py; the reference uses pyscf for this, ferminet/pretrain.py:34).

    basis: any gto.build_basis spec — None (STO-3G H-Ne, even-tempered
    fallback for heavier elements), "even_tempered", or an nwchem basis file
    path for cc-pVDZ-class targets (ref AIQMC/C.cc-pVDZ.nwchem format)."""
    from aiqmc_tpu.utils import scf as scf_lib
    nelectrons = sum(nspins)
    # RHF needs an even count; run on the nearest closed shell and take the
    # lowest n_up / n_dn orbitals for open shells.
    n_rhf = nelectrons if nelectrons % 2 == 0 else nelectrons + 1
    result = scf_lib.run_rhf(np.asarray(atoms), np.asarray(charges),
                             nelectrons=n_rhf, basis=basis)
    return scf_lib.make_rhf_orbitals(result, nspins)


def make_uhf_targets(atoms, charges, nspins: Tuple[int, int],
                     basis=None) -> TargetOrbitals:
    """Open-shell UHF pretraining targets: per-spin occupied orbitals
    (ref ferminet/utils/scf.py restricted=False path)."""
    from aiqmc_tpu.utils import scf as scf_lib
    result = scf_lib.run_uhf(np.asarray(atoms), np.asarray(charges),
                             nspins=nspins, basis=basis)
    return scf_lib.make_uhf_orbitals(result, nspins)


def make_ecp_rhf_targets(atoms, z_eff, pp_cfg, nspins: Tuple[int, int],
                         z_true=None) -> TargetOrbitals:
    """Valence-only pretraining targets for pseudopotential systems: pseudo
    RHF with the ccECP folded into hcore (utils/ecp_scf; the reference attaches
    the ECP to the pyscf molecule, ferminet/base_config.py `use_pp`)."""
    from aiqmc_tpu.utils import ecp_scf, scf as scf_lib
    z_eff = np.asarray(z_eff, dtype=float)
    if z_true is None:
        # He-core ccECPs (Li..Ne): true Z = Z_eff + 2.
        z_true = (z_eff + 2).astype(int)
    nelectrons = sum(nspins)
    n_rhf = nelectrons if nelectrons % 2 == 0 else nelectrons + 1
    result = ecp_scf.run_rhf_ecp(
        np.asarray(atoms), z_true, z_eff,
        rn_local=np.asarray(pp_cfg.rn_local),
        local_coes=np.asarray(pp_cfg.local_coes),
        local_exps=np.asarray(pp_cfg.local_exps),
        rn_non_local=np.asarray(pp_cfg.rn_non_local),
        non_local_coes=np.asarray(pp_cfg.non_local_coes),
        non_local_exps=np.asarray(pp_cfg.non_local_exps),
        nelectrons=n_rhf, list_l=pp_cfg.list_l)
    return scf_lib.make_rhf_orbitals(result, nspins)


def pretrain_orbitals(network,
                      data: AINetData,
                      nspins: Tuple[int, int],
                      iterations: int = 100,
                      learning_rate: float = 3e-4,
                      target_fn: Optional[TargetOrbitals] = None,
                      target: str = "rhf",
                      key: Optional[chex.PRNGKey] = None,
                      params=None,
                      pp_cfg=None,
                      basis=None,
                      states: int = 0,
                      lattice=None):
    """Pretrains network orbitals (ref pretrain.py:230-311). Returns
    (params, data). target: 'rhf' (default), 'uhf' (open-shell per-spin
    orbitals), 'hydrogenic', or 'planewave' (Gamma closed shell for
    jellium/PBC; requires ``lattice``); ``basis`` selects the SCF basis
    (None = STO-3G/even-tempered, or an nwchem file path for cc-pVDZ-class
    targets). With pp_cfg set, 'rhf' targets come from the valence ECP-RHF.

    states > 0: NES-VMC excited-state pretraining of the SHARED-parameter
    network (determinants = states * ndets): each determinant group targets
    its own mean-field determinant (ground + lowest S_z-preserving
    excitations; ref ferminet/pretrain.py:150-196, utils/scf.py:302)."""
    if key is None:
        key = jax.random.PRNGKey(0)
    if params is None:
        key, subkey = jax.random.split(key)
        params = network.init(subkey)
    if states:
        return _pretrain_orbitals_states(
            network, data, nspins, states, iterations, learning_rate,
            target, key, params, pp_cfg, basis)
    if target_fn is None and target == "planewave":
        if lattice is None:
            raise ValueError("planewave pretraining requires the primitive "
                             "cell (set cfg.system.pbc with system.structure)")
        target_fn = make_planewave_targets(np.asarray(lattice), nspins)
    if target_fn is None:
        if target in ("rhf", "uhf"):
            try:
                if pp_cfg is not None:
                    if target == "uhf" or basis is not None:
                        from absl import logging
                        logging.warning(
                            "Pseudopotential systems pretrain against the "
                            "valence ECP-RHF solver; requested target=%r / "
                            "basis=%r are ignored on this path.",
                            target, basis)
                    target_fn = make_ecp_rhf_targets(
                        np.asarray(data.atoms), np.asarray(data.charges),
                        pp_cfg, nspins)
                elif target == "uhf":
                    target_fn = make_uhf_targets(
                        np.asarray(data.atoms), np.asarray(data.charges),
                        nspins, basis=basis)
                else:
                    target_fn = make_rhf_targets(
                        np.asarray(data.atoms), np.asarray(data.charges),
                        nspins, basis=basis)
            except ValueError:
                target_fn = None
        if target_fn is None:
            target_fn = make_hydrogenic_orbitals(
                np.asarray(data.atoms), np.asarray(data.charges), nspins)
    optimizer = optax.adam(learning_rate)
    opt_state = optimizer.init(params)
    batch_network = jax.vmap(
        lambda p, x, s, a, c: network.apply(p, x, s, a, c)[1],
        in_axes=(None, 0, None, None, None))
    step = jax.jit(make_pretrain_step(
        network.orbitals, batch_network, target_fn, optimizer, nspins))
    for _ in range(iterations):
        key, subkey = jax.random.split(key)
        params, opt_state, data, loss, pmove = step(params, opt_state, data,
                                                    subkey)
    return params, data


def _pretrain_orbitals_states(network, data, nspins, states, iterations,
                              learning_rate, target, key, params, pp_cfg,
                              basis):
    """Shared-network excited-state pretraining (see pretrain_orbitals)."""
    from aiqmc_tpu.models import excited as excited_lib
    from aiqmc_tpu.utils import scf as scf_lib

    atoms = np.asarray(data.atoms)
    charges = np.asarray(data.charges)
    nelectrons = sum(nspins)
    if pp_cfg is not None:
        from aiqmc_tpu.utils import ecp_scf
        z_eff = charges.astype(float)
        n_rhf = nelectrons if nelectrons % 2 == 0 else nelectrons + 1
        result = ecp_scf.run_rhf_ecp(
            atoms, (z_eff + 2).astype(int), z_eff,
            rn_local=np.asarray(pp_cfg.rn_local),
            local_coes=np.asarray(pp_cfg.local_coes),
            local_exps=np.asarray(pp_cfg.local_exps),
            rn_non_local=np.asarray(pp_cfg.rn_non_local),
            non_local_coes=np.asarray(pp_cfg.non_local_coes),
            non_local_exps=np.asarray(pp_cfg.non_local_exps),
            nelectrons=n_rhf, list_l=pp_cfg.list_l)
    elif target == "uhf":
        result = scf_lib.run_uhf(atoms, charges, nspins=nspins, basis=basis)
    else:
        n_rhf = nelectrons if nelectrons % 2 == 0 else nelectrons + 1
        result = scf_lib.run_rhf(atoms, charges, nelectrons=n_rhf,
                                 basis=basis)
    target_fns = scf_lib.make_excited_target_list(result, nspins, states)

    # MCMC samples |det M|^2 of the CURRENT shared total ansatz.
    _, tot_apply = excited_lib.make_shared_total_ansatz(network, states)
    batch_logabs = jax.vmap(
        lambda p, x, s, a, c: tot_apply(p, x, s, a, c)[1],
        in_axes=(None, 0, None, None, None))

    optimizer = optax.adam(learning_rate)
    opt_state = optimizer.init(params)
    step = jax.jit(make_pretrain_states_step(
        network.orbitals, batch_logabs, target_fns, optimizer, nspins,
        states))
    for _ in range(iterations):
        key, subkey = jax.random.split(key)
        params, opt_state, data, loss, pmove = step(params, opt_state, data,
                                                    subkey)
    return params, data
