"""VMC training driver.

Capability parity with ref ``AIQMCrelease3/main/main_pp_adam_muti_GPU.py:27-212``
(device accounting, checkpoint restore-or-init, network build, sampler, ECP local
energy, clipped loss, Adam + power-law LR schedule, CSV/ckpt logging), rebuilt
TPU-first:

  * ONE jitted step per iteration containing the full MCMC sweep + loss/grad +
    optimizer update, compiled once over a ``Mesh(('data',))`` with walker arrays
    sharded and parameters replicated. XLA/GSPMD inserts the gradient psum over
    ICI; there is no pmap and no host round-trip between MCMC and optimization
    (the reference dispatches two separate pmaps per iteration,
    main_pp_adam_muti_GPU.py:188-190).
  * Walker and optimizer buffers are donated to the step, so positions/opt state
    update in place in HBM.
"""

from __future__ import annotations

import dataclasses
import os
import time
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import ml_collections
import numpy as np
from absl import logging

from aiqmc_tpu import checkpoint as checkpoint_lib
from aiqmc_tpu import config as config_lib
from aiqmc_tpu import loss as loss_lib
from aiqmc_tpu.hamiltonian import local_energy as ae_local_energy
from aiqmc_tpu.hamiltonian import pp_local_energy
from aiqmc_tpu.models import network as nn
from aiqmc_tpu.models import spin_indices
from aiqmc_tpu.optim import adam as adam_lib
from aiqmc_tpu.optim import kfac as kfac_lib
from aiqmc_tpu.parallel import mesh as mesh_lib
from aiqmc_tpu.parallel import multi_host
from aiqmc_tpu.sampling import drift_diffusion, mcmc as rw_mcmc
from aiqmc_tpu.sampling.init_electrons import init_electrons
from aiqmc_tpu.utils import writers


@dataclasses.dataclass
class TrainResult:
    """Handles returned by train() for downstream evaluation / DMC restart."""
    network: nn.Network
    params: nn.ParamTree
    data: nn.AINetData
    opt_state: object
    energies: np.ndarray
    ckpt_save_path: str


def _envelope_kwargs(cfg, nelectrons: int):
    """Construction-time kwargs for zoo envelopes; the multiwave (Bloch)
    envelope needs the Cartesian k-point set of the simulation cell
    (ref ferminet/configs/heg.py:24-31)."""
    envelope_type = cfg.network.get("envelope_type", "pp_like")
    if envelope_type == "gto":
        # Ab-initio flexible-Gaussian-basis envelope: channel table from the
        # system's elements + a basis spec (see envelopes_zoo.make_gto_envelope).
        return {"charges": np.asarray(cfg.system.charges),
                "basis": cfg.network.get("gto_basis", "") or None}
    if envelope_type != "multiwave":
        return None
    if not cfg.system.get("pbc", False):
        raise ValueError("multiwave envelope requires cfg.system.pbc")
    from aiqmc_tpu.pbc import kpoints as kpoints_lib
    return {"kpoints": kpoints_lib.make_envelope_kpoints(
        np.asarray(cfg.system.structure), nelectrons)}


def _gather_data(data: nn.AINetData) -> nn.AINetData:
    """Host copy of walker data for checkpointing; in a multi-process run the
    positions are a globally-sharded array whose shards live partly on other
    hosts, where plain device_get raises — all-gather them first."""
    if jax.process_count() == 1:
        return jax.device_get(data)
    from jax.experimental import multihost_utils
    return nn.AINetData(
        positions=np.asarray(
            multihost_utils.process_allgather(data.positions, tiled=True)),
        spins=jax.device_get(data.spins),
        atoms=jax.device_get(data.atoms),
        charges=jax.device_get(data.charges))


def _twist_real(cfg) -> bool:
    """True when a nonzero twist rides a REAL network: the sign output is
    converted to a phase angle and the estimators run in pair-complex mode
    (pbc/twist.py real_to_angle) — TABC evaluation of Gamma-trained real
    checkpoints without retraining in complex mode."""
    twist = np.asarray(cfg.system.get("twist", (0.0, 0.0, 0.0)), dtype=float)
    return (cfg.system.get("pbc", False) and bool(np.any(twist != 0.0))
            and not cfg.network.complex_orbitals)


def _effective_complex(cfg):
    """(complex_output, pair_output) for estimators, including twisted-real."""
    if _twist_real(cfg):
        return True, True
    complex_output = cfg.network.complex_orbitals
    return complex_output, (complex_output
                            and cfg.network.get("complex_pairs", False))


def _resolve_plugin(path: str):
    """Resolves a 'module.sub.function' config string via importlib
    (ref ferminet/train.py:440-467,688-702 plugin hooks)."""
    import importlib
    module_name, fn_name = path.rsplit(".", 1)
    return getattr(importlib.import_module(module_name), fn_name)


def _plugin_kwargs(cfg_value) -> dict:
    if cfg_value is None:
        return {}
    if isinstance(cfg_value, ml_collections.ConfigDict):
        return cfg_value.to_dict()
    return dict(cfg_value)


def _shared_states(cfg) -> bool:
    """Excited states share one parameter tree (upstream parity, default)
    unless cfg.system.excited_param_copies requests the legacy K-copy mode."""
    return bool(cfg.system.get("states", 0)) and not cfg.system.get(
        "excited_param_copies", False)


def _state_det_count(cfg) -> int:
    """Determinants of the BASE network: cfg.network.determinants per state,
    multiplied by K in the shared construction (each state sums its own
    determinant group, ref ferminet/networks.py:1273-1311)."""
    dets = int(cfg.network.determinants)
    if _shared_states(cfg):
        dets *= int(cfg.system.states)
    return dets


def _build_network(cfg: ml_collections.ConfigDict) -> Tuple[nn.Network, tuple]:
    from aiqmc_tpu.models import blocks
    blocks.set_matmul_dtype(
        jnp.bfloat16
        if cfg.network.get("matmul_dtype", "float32") == "bfloat16" else None)
    spins = np.asarray(cfg.system.spins)
    nelectrons = int(spins.size)
    par, anti, n_par, n_anti = spin_indices.jastrow_indices_ee(spins, nelectrons)
    up, down = spin_indices.spin_indices_h(spins)
    if cfg.network.get("network_type", "ainet") == "psiformer":
        twist0 = np.asarray(cfg.system.get("twist", (0.0, 0.0, 0.0)))
        if cfg.system.get("pbc", False) and np.any(twist0 != 0.0):
            raise NotImplementedError(
                "Twisted boundary conditions are not wired for the psiformer "
                "network (the twist wrapper is applied on the ainet path)")
        from aiqmc_tpu.models import psiformer
        pf = cfg.network.psiformer
        network = psiformer.make_psiformer(
            nspins=tuple(cfg.system.nspins),
            charges=jnp.asarray(cfg.system.charges),
            parallel_indices=par, antiparallel_indices=anti,
            spin_up_indices=up, spin_down_indices=down,
            n_parallel=n_par, n_antiparallel=n_anti,
            ndim=cfg.system.ndim,
            natoms=int(np.asarray(cfg.system.atoms).shape[0]),
            nelectrons=nelectrons,
            determinants=_state_det_count(cfg),
            num_layers=pf.num_layers, num_heads=pf.num_heads,
            heads_dim=pf.heads_dim,
            mlp_hidden_dims=tuple(pf.mlp_hidden_dims),
            use_layer_norm=pf.use_layer_norm,
            rescale_inputs=cfg.network.rescale_inputs)
        return network, (up, down)
    network = nn.make_ai_net(
        nspins=tuple(cfg.system.nspins),
        charges=jnp.asarray(cfg.system.charges),
        parallel_indices=par,
        antiparallel_indices=anti,
        spin_up_indices=up,
        spin_down_indices=down,
        n_parallel=n_par,
        n_antiparallel=n_anti,
        ndim=cfg.system.ndim,
        natoms=int(np.asarray(cfg.system.atoms).shape[0]),
        nelectrons=nelectrons,
        determinants=_state_det_count(cfg),
        bias_orbitals=cfg.network.bias_orbitals,
        rescale_inputs=cfg.network.rescale_inputs,
        hidden_dims=tuple(map(tuple, cfg.network.hidden_dims)),
        hidden_dims_Ynlm=tuple(cfg.network.hidden_dims_ynlm),
        full_equivariance=cfg.network.full_equivariance,
        complex_orbitals=cfg.network.complex_orbitals,
        complex_pairs=cfg.network.get("complex_pairs", False),
        bounded_envelope=cfg.network.bounded_envelope,
        regular_harmonics=cfg.network.regular_harmonics,
        lattice=(jnp.asarray(cfg.system.structure)
                 if cfg.system.get("pbc", False) else None),
        envelope_type=cfg.network.get("envelope_type", "pp_like"),
        envelope_kwargs=_envelope_kwargs(cfg, nelectrons),
        use_schnet=cfg.network.get("use_schnet", False),
        h_stream=cfg.network.get("h_stream", "ainet"),
        y_stream=cfg.network.get("y_stream", True),
        pbc_smooth_r=cfg.network.get("pbc_smooth_r", False),
        pbc_features=cfg.network.get("pbc_features", "sincos"),
        pbc_gmax=cfg.network.get("pbc_gmax", 1),
        pbc_gvector_smooth=cfg.network.get("pbc_gvector_smooth", True),
        pbc_include_r_ae=cfg.network.get("pbc_include_r_ae", True),
        # The Pade a-e cusp is exact for bare Coulomb nuclei but wrong for
        # ECP cores (smooth psi there); default: on iff all-electron.
        jastrow_ae=(cfg.network.get("jastrow_ae", None)
                    if cfg.network.get("jastrow_ae", None) is not None
                    else not cfg.system.use_pp),
        jastrow_scale=cfg.network.get("jastrow_scale", None),
        jastrow_ee=cfg.network.get("jastrow_ee", "pade"),
        # Importlib plugin hooks (ref ferminet/train.py:440-467): config
        # strings naming factories for a custom feature layer / envelope.
        feature_layer=(
            _resolve_plugin(cfg.network.make_feature_layer_fn)(
                natoms=int(np.asarray(cfg.system.atoms).shape[0]),
                nspins=tuple(cfg.system.nspins), ndim=cfg.system.ndim,
                **_plugin_kwargs(
                    cfg.network.get("make_feature_layer_kwargs", None)))
            if cfg.network.get("make_feature_layer_fn", "") else None),
        envelope=(
            _resolve_plugin(cfg.network.make_envelope_fn)(
                **_plugin_kwargs(cfg.network.get("make_envelope_kwargs", None)))
            if cfg.network.get("make_envelope_fn", "") else None))
    twist = np.asarray(cfg.system.get("twist", (0.0, 0.0, 0.0)), dtype=float)
    if cfg.system.get("pbc", False) and np.any(twist != 0.0):
        from aiqmc_tpu.pbc import twist as twist_lib
        if not cfg.network.complex_orbitals:
            # Gamma-real ansatz at a twist: sign -> phase angle, then boost;
            # estimators switch to pair-complex mode (_effective_complex).
            network = twist_lib.real_to_angle(network)
        network = twist_lib.apply_twist(
            network, np.asarray(cfg.system.structure), twist,
            ndim=cfg.system.ndim)
    states = cfg.system.get("states", 0)
    if states:
        if cfg.network.get("complex_pairs", False):
            raise NotImplementedError(
                "NES-VMC excited states with the pair complex representation")
        # NES-VMC total ansatz det[psi_i(x_j)] (ref networks.py:1313-1348);
        # `orbitals` stays the base network's for the per-state
        # forward-Laplacian energy matrix.
        from aiqmc_tpu.models import excited
        if _shared_states(cfg):
            # Upstream parameterisation (ref networks.py:1273-1311): shared
            # layers, K determinant groups — the base network was built with
            # determinants = K * cfg.network.determinants (_state_det_count).
            tot_init, tot_apply = excited.make_shared_total_ansatz(
                network, states)
        else:
            # Legacy: K independent parameter copies
            # (cfg.system.excited_param_copies=True).
            tot_init, tot_apply = excited.make_total_ansatz(network, states)
        network = nn.Network(init=tot_init, apply=tot_apply,
                             orbitals=network.orbitals)
    return network, (up, down)


def network_from_config(cfg) -> nn.Network:
    """The EXACT network ``train(cfg)`` builds — including twist wrapping,
    plugin hooks and every behaviour flag (bounded_envelope,
    regular_harmonics, ...).

    Eval/DMC drivers MUST build their trial through this (not a hand-rolled
    make_ai_net call): several flags change the wavefunction without changing
    the param tree, so a mismatched reconstruction restores cleanly and then
    silently evaluates a different ansatz (observed: the diamond fixed-phase
    DMC rebuilt with make_ai_net defaults — bounded_envelope/regular_harmonics
    False vs the trained True — giving E_L tails of 1e4 Ha and NaN blocks)."""
    config_lib.resolve(cfg)
    return _build_network(cfg)[0]


def _build_local_energy(cfg, network):
    complex_output, pair_output = _effective_complex(cfg)
    laplacian_method = cfg.optim.get("laplacian", "default")
    if complex_output and not pair_output:
        # The forward Laplacian covers real wavefunctions and the (re, im)
        # pair representation; only the true complex-dtype path (never used
        # on TPU — no complex64) falls back to batched tangents.
        laplacian_method = "default"
    orbitals_fn = network.orbitals if laplacian_method == "forward" else None
    # network.orbitals is boost-free (pbc/twist.apply_twist wraps apply), so
    # the forward kinetic gets the twist wavevector analytically.
    twist_k = None
    _twist = np.asarray(cfg.system.get("twist", (0.0, 0.0, 0.0)), dtype=float)
    if (laplacian_method == "forward" and cfg.system.get("pbc", False)
            and np.any(_twist != 0.0)):
        from aiqmc_tpu.pbc import twist as twist_lib
        twist_k = twist_lib.twist_wavevector(
            np.asarray(cfg.system.structure), _twist)
    if cfg.system.get("make_local_energy_fn", ""):
        # Importlib plugin hook (ref ferminet/train.py:688-702): the named
        # factory receives the signed network and system info and returns
        # e_l(params, key, data) -> (E_L, aux).
        make_local_energy = _resolve_plugin(cfg.system.make_local_energy_fn)
        return make_local_energy(
            f=network.apply,
            charges=jnp.asarray(cfg.system.charges),
            nspins=tuple(cfg.system.nspins),
            use_scan=False,
            complex_output=complex_output,
            **_plugin_kwargs(cfg.system.get("make_local_energy_kwargs", None)))
    states = cfg.system.get("states", 0)
    if states:
        # NES-VMC energy matrix over the K-state total ansatz
        # (ref ferminet/hamiltonian.py:165-226,340-394).
        from aiqmc_tpu.hamiltonian import excited as exc_ham
        make_mat = (exc_ham.local_energy_matrix_shared if _shared_states(cfg)
                    else exc_ham.local_energy_matrix)
        return make_mat(
            network.orbitals,
            charges=jnp.asarray(cfg.system.charges),
            states=states,
            nelectrons=int(np.asarray(cfg.system.spins).size),
            ndim=cfg.system.ndim)
    if cfg.system.get("pbc", False):
        if cfg.system.use_pp:
            # Valence-only periodic system: Ewald with Z_eff + short-range
            # ccECP channels at minimum image (hamiltonian/pp_pbc.py).
            from aiqmc_tpu.hamiltonian import pp_pbc
            pp = cfg.system.pp
            return pp_pbc.local_energy(
                f=network.apply,
                charges=jnp.asarray(cfg.system.charges),
                nspins=tuple(cfg.system.nspins),
                lattice=jnp.asarray(cfg.system.structure),
                rn_local=jnp.asarray(pp.rn_local),
                local_coes=jnp.asarray(pp.local_coes),
                local_exps=jnp.asarray(pp.local_exps),
                rn_non_local=jnp.asarray(pp.rn_non_local),
                non_local_coes=jnp.asarray(pp.non_local_coes),
                non_local_exps=jnp.asarray(pp.non_local_exps),
                natoms=int(np.asarray(cfg.system.atoms).shape[0]),
                nelectrons=int(np.asarray(cfg.system.spins).size),
                ndim=cfg.system.ndim,
                list_l=pp.list_l,
                complex_output=complex_output,
                convergence_radius=cfg.system.ewald.truncation_limit,
                laplacian_chunk=cfg.optim.laplacian_chunk,
                laplacian_method=laplacian_method,
                orbitals_fn=orbitals_fn,
                pair_output=pair_output,
                twist_k=twist_k,
                quadrature=pp.get("quadrature", "msc50"))
        from aiqmc_tpu.pbc import ewald
        return ewald.local_energy(
            f=network.apply,
            charges=jnp.asarray(cfg.system.charges),
            nspins=tuple(cfg.system.nspins),
            complex_output=complex_output,
            lattice=jnp.asarray(cfg.system.structure),
            heg=cfg.system.ewald.heg,
            convergence_radius=cfg.system.ewald.truncation_limit,
            laplacian_chunk=cfg.optim.laplacian_chunk,
            laplacian_method=laplacian_method,
            orbitals_fn=orbitals_fn,
            twist_k=twist_k,
            ndim=cfg.system.ndim,
            pair_output=pair_output)
    if cfg.system.use_pp:
        pp = cfg.system.pp
        return pp_local_energy.local_energy(
            f=network.apply,
            lognetwork=None,
            charges=jnp.asarray(cfg.system.charges),
            nspins=tuple(cfg.system.nspins),
            rn_local=jnp.asarray(pp.rn_local),
            local_coes=jnp.asarray(pp.local_coes),
            local_exps=jnp.asarray(pp.local_exps),
            rn_non_local=jnp.asarray(pp.rn_non_local),
            non_local_coes=jnp.asarray(pp.non_local_coes),
            non_local_exps=jnp.asarray(pp.non_local_exps),
            natoms=int(np.asarray(cfg.system.atoms).shape[0]),
            nelectrons=int(np.asarray(cfg.system.spins).size),
            ndim=cfg.system.ndim,
            list_l=pp.list_l,
            complex_output=complex_output,
            laplacian_chunk=cfg.optim.laplacian_chunk,
            reference_compat=pp.reference_compat,
            quadrature=pp.get("quadrature", "msc50"),
            laplacian_method=laplacian_method,
            orbitals_fn=orbitals_fn,
            pair_output=pair_output)
    return ae_local_energy.local_energy(
        f=network.apply,
        charges=jnp.asarray(cfg.system.charges),
        nspins=tuple(cfg.system.nspins),
        complex_output=complex_output,
        laplacian_chunk=cfg.optim.laplacian_chunk,
        laplacian_method=laplacian_method,
        orbitals_fn=orbitals_fn,
        pair_output=pair_output)


def _build_mcmc(cfg, network, batch_size: int):
    # NES-VMC extends the configuration to K stacked electron sets; the
    # sampler sweeps all K * nelec electrons of the total ansatz.
    nelectrons = (int(np.asarray(cfg.system.spins).size)
                  * max(1, cfg.system.get("states", 0)))
    lattice = (jnp.asarray(cfg.system.structure)
               if cfg.system.get("pbc", False) else None)
    # Uniform signature mc_step(params, data, key, width); only the
    # random-walk sampler uses the (host-adapted) width argument.
    if cfg.mcmc.algorithm == "drift_diffusion":
        dd = drift_diffusion.main_monte_carlo(
            f=network.apply, tstep=cfg.mcmc.tstep, ndim=cfg.system.ndim,
            nelectrons=nelectrons, nsteps=cfg.mcmc.steps, batch_size=batch_size,
            lattice=lattice)
        return lambda params, data, key, width: dd(params, data, key)
    if cfg.mcmc.algorithm == "mala":
        from aiqmc_tpu.sampling import mala
        logabs = lambda p, x, s, a, c: network.apply(p, x, s, a, c)[1]
        ml = mala.make_mala_step(logabs, tstep=cfg.mcmc.tstep,
                                 steps=cfg.mcmc.steps, lattice=lattice)
        return lambda params, data, key, width: ml(params, data, key)
    batch_network = jax.vmap(
        lambda p, x, s, a, c: network.apply(p, x, s, a, c)[1],
        in_axes=(None, 0, None, None, None))
    return rw_mcmc.make_mcmc_step(
        batch_network, batch_size, steps=cfg.mcmc.steps, lattice=lattice,
        blocks=cfg.mcmc.get("blocks", 1), nelectrons=nelectrons,
        ndim=cfg.system.ndim,
        scale_by_nuclear_distance=cfg.mcmc.get("scale_by_nuclear_distance",
                                               False))


def make_learning_rate_schedule(cfg):
    """Power-law decay (ref main_pp_adam_muti_GPU.py:158-159)."""
    rate, delay, decay = cfg.optim.lr.rate, cfg.optim.lr.delay, cfg.optim.lr.decay

    def schedule(t_):
        return rate * jnp.power(1.0 / (1.0 + (t_ / delay)), decay)

    return schedule


def _step_stats(aux):
    """Per-step scalars surfaced from the loss aux (variance; NES-VMC
    per-state energies as the batch-mean energy-matrix diagonal)."""
    stats = {"variance": aux.variance}
    if aux.local_energy_mat is not None:
        mean_mat = jnp.mean(aux.local_energy_mat, axis=0)
        stats["state_energies"] = jnp.diagonal(mean_mat).real
        # Full batch-mean energy matrix: the NES-VMC eigenvalue extraction
        # needs the off-diagonal elements too (non-orthogonal states; the
        # upstream streams the whole matrix to energy_matrix.npy,
        # ref ferminet/train.py:595-600).
        stats["state_energy_matrix"] = mean_mat.real
    return stats


class _TrainingComponents:
    """Bundle of (mc_step, evaluate_loss, opt init, combined step)."""

    def __init__(self, mc_step, evaluate_loss, opt_init, combined_step):
        self.mc_step = mc_step
        self.evaluate_loss = evaluate_loss
        self.init = opt_init  # opt_state = components.init(params)
        self.combined_step = combined_step


def _guard_enabled(cfg) -> bool:
    """Resolves cfg.optim.guard.enable: True/False are literal; "auto" (the
    default) arms the guard for the curvature optimizers (kfac, spring) whose
    finite divergences motivated it (Si collapse, SPRING plateau creep —
    BASELINE.md) and leaves first-order optimizers unguarded."""
    guard_cfg = cfg.optim.get("guard", None)
    if not guard_cfg:
        return False
    enable = guard_cfg.get("enable", None)
    if enable is None or enable == "auto":
        return cfg.optim.get("optimizer", "") in ("kfac", "spring")
    return bool(enable)


def apply_spring_continuation_floor(cfg, restoring: bool) -> None:
    """Floor SPRING's damping on continuation runs.

    Restores from (typically converged) trials noise-fit at the fresh-start
    damping 1e-3 — the sample-space solve fits 1024 directions of batch noise
    per step and the variance creeps 0.02 -> 3 Ha^2 (probe 1,
    runs/c_spring_probe) — but stay healthy AND keep descending at 0.1
    (probe 2 + frozen eval -5.41757(12), BASELINE.md). Mutates cfg in place
    before the optimizer is built; opt out with
    cfg.optim.spring.continuation_damping = 0.
    """
    if not (restoring and cfg.optim.optimizer == "spring"):
        return
    floor = cfg.optim.spring.get("continuation_damping", 0.0)
    if floor and cfg.optim.spring.damping < floor:
        logging.warning(
            "SPRING continuation: raising damping %.1e -> %.1e "
            "(plateau-continuation noise-fitting cure; set "
            "cfg.optim.spring.continuation_damping=0 to opt out)",
            cfg.optim.spring.damping, floor)
        cfg.optim.spring.damping = floor


def make_training_components(cfg, network, batch_size: int,
                             params_template=None, data_template=None):
    """Builds the training-step bundle for the configured optimizer,
    optionally wrapped in the statistical step-rejection guard
    (cfg.optim.guard — see optim/guard.py)."""
    components = _make_training_components(
        cfg, network, batch_size, params_template=params_template,
        data_template=data_template)
    guard_cfg = cfg.optim.get("guard", None)
    if _guard_enabled(cfg):
        from aiqmc_tpu.optim import guard as guard_lib
        wrap_init, guarded = guard_lib.make_guarded_step(
            components.combined_step,
            var_factor=guard_cfg.get("var_factor", 8.0),
            jump_sigmas=guard_cfg.get("jump_sigmas", 20.0),
            warmup=guard_cfg.get("warmup", 300),
            decay=guard_cfg.get("decay", 0.98),
            var_ceiling=guard_cfg.get("var_ceiling", 0.0))
        components = _TrainingComponents(
            components.mc_step, components.evaluate_loss,
            wrap_init(components.init), guarded)
    return components


def _make_training_components(cfg, network, batch_size: int,
                              params_template=None, data_template=None):
    """Builds the raw (unguarded) training-step bundle."""
    import optax

    localenergy = _build_local_energy(cfg, network)
    complex_output, pair_output = _effective_complex(cfg)
    logabs_network = lambda *a, **k: network.apply(*a, **k)[1]
    if pair_output:
        # log psi as a stacked real [log|psi|, phase] pair (TPU-safe).
        loss_network = nn.make_pair_log_network(network.apply)
    elif complex_output:
        # log psi = log|psi| + i*phase (ref main_pp_adam_muti_GPU.py:119-121).
        loss_network = nn.make_log_network(network.apply)
    else:
        loss_network = logabs_network
    make_loss = (loss_lib.make_wqmc_loss if cfg.optim.objective == "wqmc"
                 else loss_lib.make_loss)
    loss_kwargs = {"pair_output": pair_output}
    evaluate_loss = make_loss(
        network=loss_network,
        local_energy=localenergy,
        clip_local_energy=cfg.optim.clip_local_energy,
        clip_from_median=cfg.optim.clip_from_median,
        center_at_clipped_energy=cfg.optim.center_at_clipped_energy,
        complex_output=complex_output,
        el_chunk=int(cfg.optim.get("el_chunk", 0) or 0),
        **loss_kwargs)

    mc_step = _build_mcmc(cfg, network, batch_size)

    if cfg.optim.optimizer == "kfac":
        if params_template is None or data_template is None:
            raise ValueError("KFAC requires params/data templates at build time")
        kf = cfg.optim.kfac
        options = kfac_lib.KfacOptions(
            damping=kf.damping,
            cov_ema_decay=kf.cov_ema_decay,
            norm_constraint=kf.norm_constraint,
            min_damping=kf.min_damping,
            max_damping=kf.get("max_damping", 1e6),
            momentum=kf.momentum,
            update_period=kf.get("update_period", 1),
            adaptive_learning_rate=kf.get("adaptive_learning_rate", False),
            adaptive_damping=kf.get("adaptive_damping", False),
            damping_adaptation_interval=kf.get("damping_adaptation_interval", 5),
            damping_adaptation_decay=kf.get("damping_adaptation_decay", 0.9),
            learning_rate_schedule=lambda t: kf.lr.rate / (1.0 + t / kf.lr.delay))
        opt_init, kfac_step = kfac_lib.make_kfac_optimizer(
            evaluate_loss=evaluate_loss,
            loss_network=logabs_network,  # Fisher uses |psi| only
            params_template=params_template,
            options=options,
            data_template=data_template)

        def combined_step(params, opt_state, data, key, width):
            mcmc_key, loss_key = jax.random.split(key)
            data, pmove = mc_step(params, data, mcmc_key, width)
            params, opt_state, loss_val, aux = kfac_step(
                params, opt_state, loss_key, data)
            return (params, opt_state, data, loss_val,
                    _step_stats(aux), pmove)

        return _TrainingComponents(mc_step, evaluate_loss, opt_init,
                                   combined_step)

    if cfg.optim.optimizer == "spring":
        if complex_output and not pair_output:
            raise NotImplementedError(
                "SPRING needs a real or pair-complex wavefunction")
        if params_template is None:
            raise ValueError("SPRING requires a params template at build time")
        from aiqmc_tpu.optim import spring as spring_lib
        sp = cfg.optim.spring
        sp_options = spring_lib.SpringOptions(
            damping=sp.damping, mu=sp.mu,
            clip_local_energy=cfg.optim.clip_local_energy,
            norm_constraint=sp.norm_constraint,
            learning_rate_schedule=lambda t: sp.lr.rate / (1.0 + t / sp.lr.delay))
        sp_init, sp_step = spring_lib.make_spring_optimizer(
            logabs_network=logabs_network,
            local_energy=localenergy,
            params_template=params_template,
            options=sp_options,
            pair_output=pair_output,
            signed_network=network.apply if pair_output else None)

        def combined_step_spring(params, opt_state, data, key, width):
            mcmc_key, loss_key = jax.random.split(key)
            data, pmove = mc_step(params, data, mcmc_key, width)
            params, opt_state, loss_val, aux = sp_step(
                params, opt_state, loss_key, data)
            return (params, opt_state, data, loss_val,
                    _step_stats(aux), pmove)

        return _TrainingComponents(mc_step, evaluate_loss, sp_init,
                                   combined_step_spring)

    if cfg.optim.optimizer == "none":
        def opt_init_none(params):
            del params
            return ()

        def combined_step_none(params, opt_state, data, key, width):
            mcmc_key, loss_key = jax.random.split(key)
            data, pmove = mc_step(params, data, mcmc_key, width)
            loss_val, aux = evaluate_loss(params, loss_key, data)
            return (params, opt_state, data, loss_val,
                    _step_stats(aux), pmove)

        return _TrainingComponents(mc_step, evaluate_loss, opt_init_none,
                                   combined_step_none)

    if cfg.optim.optimizer == "lamb":
        # ref ferminet/train.py:749-755
        optimizer = optax.chain(
            optax.clip_by_global_norm(1.0),
            optax.scale_by_adam(eps=1e-7),
            optax.scale_by_trust_ratio(),
            optax.scale_by_schedule(make_learning_rate_schedule(cfg)),
            optax.scale(-1.0))
    else:
        optimizer = optax.chain(
            optax.scale_by_adam(**cfg.optim.adam.to_dict()),
            optax.scale_by_schedule(make_learning_rate_schedule(cfg)),
            optax.scale(-1.0))
    opt_step = adam_lib.make_training_step(
        adam_lib.make_opt_update_step(evaluate_loss, optimizer))

    def combined_step(params, opt_state, data, key, width):
        mcmc_key, loss_key = jax.random.split(key)
        data, pmove = mc_step(params, data, mcmc_key, width)
        data, params, opt_state, loss_val, aux = opt_step(
            data, params, opt_state, loss_key)
        return (params, opt_state, data, loss_val,
                    _step_stats(aux), pmove)

    return _TrainingComponents(mc_step, evaluate_loss, optimizer.init,
                               combined_step)


def train(cfg: ml_collections.ConfigDict,
          writer_manager: Optional[writers.Writer] = None) -> TrainResult:
    """Runs VMC optimisation per the config; returns final state handles."""
    cfg = config_lib.resolve(cfg)
    info = mesh_lib.host_batch_info(cfg.batch_size)
    mesh = mesh_lib.make_mesh()
    logging.info("Starting QMC: %d devices / %d hosts, global batch %d",
                 info.num_devices, info.num_hosts, cfg.batch_size)

    if cfg.debug.deterministic:
        seed = cfg.debug.seed
    else:
        seed = int(1e6 * time.time()) % (2 ** 31)
    # All hosts must agree on the RNG stream (ref main_pp_adam_muti_GPU.py:61-63,
    # multihost_utils.broadcast_one_to_all); no-op in a single-process run.
    seed = multi_host.broadcast_seed(seed)
    key = jax.random.PRNGKey(seed)

    atoms = jnp.asarray(cfg.system.atoms)
    charges = jnp.asarray(cfg.system.charges)
    spins = jnp.asarray(cfg.system.spins)
    nelectrons = int(spins.size)

    network, _ = _build_network(cfg)
    key, subkey = jax.random.split(key)
    params = network.init(subkey)

    ckpt_save_path = checkpoint_lib.create_save_path(cfg.log.save_path or None)
    ckpt_restore_path = checkpoint_lib.get_restore_path(cfg.log.restore_path or None)
    ckpt_restore_filename = (
        checkpoint_lib.find_last_checkpoint(ckpt_save_path) or
        checkpoint_lib.find_last_checkpoint(ckpt_restore_path))

    apply_spring_continuation_floor(cfg, restoring=bool(ckpt_restore_filename))

    key, subkey = jax.random.split(key)
    # Each host initialises only ITS host_batch_size walkers from a
    # host-distinct key; shard_walkers assembles the global array from the
    # process-local shards (single-host: host batch == global batch, key
    # untouched — bit-identical to the single-process path).
    local_batch = info.host_batch_size
    if info.num_hosts > 1:
        subkey = jax.random.fold_in(subkey, jax.process_index())
    states = cfg.system.get("states", 0)
    if states:
        # One independently-initialised electron set per state, stacked along
        # the coordinate axis (extended NES configuration).
        state_pos = []
        for s in range(states):
            pos_s, spins_out = init_electrons(
                jax.random.fold_in(subkey, s), cfg.system.structure, atoms,
                charges, spins, batch_size=local_batch,
                init_width=cfg.mcmc.init_width)
            state_pos.append(pos_s)
        pos = jnp.concatenate(state_pos, axis=-1)
    else:
        pos, spins_out = init_electrons(
            subkey, cfg.system.structure, atoms, charges, spins,
            batch_size=local_batch, init_width=cfg.mcmc.init_width)
    data = nn.AINetData(positions=pos, spins=spins_out, atoms=atoms,
                        charges=charges)

    # Build-time templates always carry GLOBAL shapes (jit traces the global
    # program under GSPMD even when each host holds only its local shard).
    if info.num_hosts > 1:
        data_template = nn.AINetData(
            positions=jnp.zeros((cfg.batch_size,) + tuple(pos.shape[1:]),
                                pos.dtype),
            spins=spins_out, atoms=atoms, charges=charges)
    else:
        data_template = data
    components = make_training_components(
        cfg, network, cfg.batch_size, params_template=params,
        data_template=data_template)
    mc_step = components.mc_step
    combined_step = components.combined_step
    opt_state = components.init(params)
    t_init = 0

    ckpt_extra = {}
    if ckpt_restore_filename:
        t_init, rdata, params, opt_state, ckpt_extra = checkpoint_lib.restore(
            ckpt_restore_filename, cfg.batch_size,
            target_params=params, target_opt_state=opt_state,
            allow_batch_resize=bool(cfg.log.get("restore_resize", False)))
        rpos = jnp.asarray(rdata.positions)
        if info.num_hosts > 1:
            # Checkpoints hold the GLOBAL walker batch; each host takes its
            # contiguous slice before shard_walkers reassembles the global
            # sharded array from process-local shards.
            pi = jax.process_index()
            rpos = rpos[pi * local_batch:(pi + 1) * local_batch]
        data = nn.AINetData(
            positions=rpos,
            spins=jnp.asarray(rdata.spins),
            atoms=jnp.asarray(rdata.atoms),
            charges=jnp.asarray(rdata.charges))
        if cfg.log.get("restore_use_ema", False):
            # Evaluate/continue from the Polyak average instead of the last
            # raw iterate (averaged iterates have lower MC fluctuation at a
            # plateau; standard NNQMC eval trick).
            ema_restored = checkpoint_lib.ema_from_extra(ckpt_extra, params)
            if ema_restored is None:
                raise ValueError(
                    "log.restore_use_ema: checkpoint carries no EMA params — "
                    "the saving run must set cfg.optim.ema_decay > 0")
            params = ema_restored
    elif (cfg.get("pretrain", None) and cfg.pretrain.iterations > 0
          and (not cfg.system.get("states", 0) or _shared_states(cfg))):
        # Orbital pretraining before VMC (ref ferminet/train.py:427-438).
        # Shared-parameter excited states pretrain each determinant group
        # against its own mean-field determinant (ground + lowest
        # excitations, ref ferminet/pretrain.py:150-196); the legacy K-copy
        # mode has no group structure and skips pretraining.
        from aiqmc_tpu import pretrain as pretrain_lib
        logging.info("Pretraining orbitals for %d iterations",
                     cfg.pretrain.iterations)
        key, subkey = jax.random.split(key)
        params, data = pretrain_lib.pretrain_orbitals(
            network, data, tuple(cfg.system.nspins),
            iterations=cfg.pretrain.iterations,
            learning_rate=cfg.pretrain.learning_rate,
            target=cfg.pretrain.target, key=subkey, params=params,
            pp_cfg=cfg.system.pp if cfg.system.use_pp else None,
            basis=cfg.pretrain.get("basis", None) or None,
            states=cfg.system.get("states", 0),
            lattice=(np.asarray(cfg.system.structure)
                     if cfg.system.get("pbc", False) else None))
        if info.num_hosts > 1:
            # Each host pretrained against its own local walkers; take host
            # 0's params so every process starts training identically
            # (check_synced below would otherwise fail).
            params = multi_host.broadcast_tree(params)
        opt_state = components.init(params)

    # Polyak-averaged params (cfg.optim.ema_decay > 0): tracked outside the
    # combined step (one tiny fused tree_map per iteration), checkpointed in
    # the extras payload so old checkpoints stay restorable either way.
    ema_decay = float(cfg.optim.get("ema_decay", 0.0))
    ema_params = None
    if ema_decay > 0.0:
        ema_params = checkpoint_lib.ema_from_extra(ckpt_extra, params)
        if ema_params is None:
            ema_params = params

    # Distribute: walkers sharded (assembled from process-local shards in a
    # multi-process run), params/opt state replicated.
    data = nn.AINetData(
        positions=mesh_lib.shard_walkers(data.positions, mesh),
        spins=mesh_lib.replicate(data.spins, mesh),
        atoms=mesh_lib.replicate(data.atoms, mesh),
        charges=mesh_lib.replicate(data.charges, mesh))
    params = mesh_lib.replicate(params, mesh)
    opt_state = mesh_lib.replicate(opt_state, mesh)
    if ema_params is not None:
        ema_params = mesh_lib.replicate(ema_params, mesh)
    # All hosts must hold identical params after init/restore
    # (ref ferminet/utils/multi_host.py:22-44); no-op single-host.
    multi_host.check_synced(params)

    jit_step = jax.jit(combined_step, donate_argnums=(1, 2))
    if ema_params is not None:
        ema_step = jax.jit(lambda e, p: jax.tree_util.tree_map(
            lambda a, b: ema_decay * a + (1.0 - ema_decay) * b, e, p),
            donate_argnums=(0,))

    # Adaptive proposal width for the random-walk sampler
    # (ref ferminet/mcmc.py:293-327, train.py:862-894); width resumes from the
    # checkpoint (ref ferminet/checkpoint.py:92-181 saves mcmc_width).
    if "mcmc_width" in ckpt_extra:
        mcmc_width = jnp.asarray(float(ckpt_extra["mcmc_width"]))
    else:
        mcmc_width = jnp.asarray(float(cfg.mcmc.move_width))
    pmoves_buf = np.zeros(cfg.mcmc.adapt_frequency)

    # Normalisability guard (cheap: nelec x 4 forward evals): a flat
    # log|psi| tail ionises walkers and sends the energy toward 0 — catch it
    # before burning compute (the reference's unbounded-envelope defect;
    # aiqmc_tpu/diagnostics.py). Molecular systems only: under PBC the
    # far-radius probe has no meaning (positions wrap).
    if not cfg.system.get("pbc", False) and not cfg.system.get("states", 0):
        from aiqmc_tpu import diagnostics
        # One locally-addressable walker (multi-process safe).
        _pos0 = np.asarray(data.positions.addressable_shards[0].data)[0]
        _probe = nn.AINetData(positions=jnp.asarray(_pos0), spins=data.spins,
                              atoms=data.atoms, charges=data.charges)
        _logabs = lambda p, x, s, a, c: network.apply(p, x, s, a, c)[1]
        _ok, _prof = diagnostics.check_normalisable(
            _logabs, params, _probe)
        if not _ok:
            logging.warning(
                "Wavefunction normalisability check FAILED: log|psi| does "
                "not decay on every electron ray (profiles per electron x "
                "radius:\n%s).\nWalkers may ionise (energy trending to 0). "
                "Check the envelope configuration (bounded_envelope, "
                "envelope_type).", np.array2string(_prof, precision=2))

    # Burn-in: MCMC only (ref ferminet/train.py:820-838 pattern).
    if cfg.mcmc.burn_in > 0:
        jit_mc = jax.jit(mc_step, donate_argnums=(1,))
        burn_per_call = max(1, cfg.mcmc.burn_in // max(1, cfg.mcmc.steps))
        for _ in range(burn_per_call):
            key, subkey = jax.random.split(key)
            data, _ = jit_mc(params, data, subkey, mcmc_width)

    # Optional observables (ref ferminet/train.py:599-641 wiring).
    obs_fns = {}
    obs_key_fns = {}  # estimators that consume a PRNG key (forces)
    obs_cols = {}
    density = None
    sfactor = None
    if cfg.get("observables", None):
        from aiqmc_tpu import observables as obs_lib
        n_obs_states = cfg.system.get("states", 0)
        if n_obs_states and _effective_complex(cfg)[0]:
            raise NotImplementedError(
                "excited-state observables need a real (sign-representation) "
                "network, matching the upstream's spin-assigned-only scope")
        if cfg.observables.s2:
            if n_obs_states:
                # NES-VMC S^2 state matrix (per-state diag + transitions).
                obs_fns["s2"] = jax.jit(obs_lib.make_observable_fns(
                    obs_lib.make_s2_states(network, tuple(cfg.system.nspins),
                                           n_obs_states,
                                           shared=_shared_states(cfg))))
                obs_cols["s2"] = [f"s2_{i}{j}" for i in range(n_obs_states)
                                  for j in range(n_obs_states)]
            else:
                obs_fns["s2"] = jax.jit(obs_lib.make_observable_fns(
                    obs_lib.make_s2(network.apply, tuple(cfg.system.nspins),
                                    complex_output=_effective_complex(cfg)[0])))
                obs_cols["s2"] = ["s2"]
        if cfg.observables.dipole:
            if n_obs_states:
                obs_fns["dipole"] = jax.jit(obs_lib.make_observable_fns(
                    obs_lib.make_dipole_states(network, n_obs_states,
                                               shared=_shared_states(cfg))))
                obs_cols["dipole"] = [f"dipole_{d}_{i}{j}" for d in "xyz"
                                      for i in range(n_obs_states)
                                      for j in range(n_obs_states)]
            else:
                obs_fns["dipole"] = jax.jit(obs_lib.make_observable_fns(
                    obs_lib.make_dipole(network.apply)))
                obs_cols["dipole"] = ["dipole_x", "dipole_y", "dipole_z"]
        if cfg.observables.get("density", False):
            # One-RDM with the auxiliary r' chain; chain state + running
            # accumulation live in the checkpoint so a resumed run continues
            # accumulating (ref ferminet/train.py:599-641, observables.py:32-64).
            from aiqmc_tpu import density as density_lib
            if n_obs_states:
                # Excited states: one-RDM STATE MATRICES (per-state +
                # transition 1-RDMs) over the extended configuration — the
                # ground estimator would silently misread the stacked
                # walkers (ref ferminet/density.py:247-271).
                if not _shared_states(cfg):
                    raise NotImplementedError(
                        "excited-state density needs the shared-parameter "
                        "ansatz (cfg.system.excited_param_copies=False)")
                from aiqmc_tpu.models import excited as excited_lib
                d_init, d_update, d_estimator = (
                    density_lib.make_one_rdm_states_aux(
                        excited_lib.make_shared_state_signs_logs(
                            network, n_obs_states),
                        np.asarray(cfg.system.atoms),
                        np.asarray(cfg.system.charges),
                        tuple(cfg.system.nspins), states=n_obs_states,
                        mcmc_steps=cfg.observables.get(
                            "density_mcmc_steps", 10)))
            else:
                d_init, d_update, d_estimator = density_lib.make_one_rdm_aux(
                    network.apply, np.asarray(cfg.system.atoms),
                    np.asarray(cfg.system.charges), tuple(cfg.system.nspins),
                    mcmc_steps=cfg.observables.get("density_mcmc_steps", 10),
                    complex_output=_effective_complex(cfg)[0])
            if "density_positions" in ckpt_extra:
                d_state = density_lib.DensityState(
                    t=jnp.asarray(ckpt_extra["density_t"]),
                    positions=jnp.asarray(ckpt_extra["density_positions"]),
                    probabilities=jnp.asarray(
                        ckpt_extra["density_probabilities"]),
                    move_width=jnp.asarray(ckpt_extra["density_move_width"]))
                rho_accum = np.asarray(ckpt_extra["density_rho_accum"])
                rho_count = int(ckpt_extra["density_rho_count"])
            else:
                key, subkey = jax.random.split(key)
                d_state = d_init(subkey, data)
                rho_accum, rho_count = None, 0
            density = {"update": jax.jit(d_update), "est": jax.jit(d_estimator),
                       "state": d_state, "accum": rho_accum,
                       "count": rho_count}
        if cfg.observables.get("forces", False):
            # Interatomic forces: AD of the SWCT correlated-sample energy
            # (forces.py). Needs the reverse-differentiable batched-tangent
            # kinetic, so a dedicated local energy is built with
            # laplacian="default" regardless of the training-path choice
            # (the forward-Laplacian interpreter is not itself transformable).
            from aiqmc_tpu import forces as forces_lib
            if n_obs_states:
                raise NotImplementedError(
                    "observables.forces supports ground-state runs only")
            if _effective_complex(cfg)[0]:
                raise NotImplementedError(
                    "observables.forces needs a real wavefunction")
            if cfg.system.get("pbc", False):
                raise NotImplementedError(
                    "observables.forces covers molecular systems (the "
                    "periodic estimator needs Ewald derivatives)")
            import copy as _copy
            _cfg_f = _copy.deepcopy(cfg)
            _cfg_f.optim.laplacian = "default"
            _force_le = _build_local_energy(_cfg_f, network)
            _force_samples = forces_lib.make_force_samples(
                network.apply, _force_le,
                mode=cfg.observables.get("forces_mode", "rev"))

            @jax.jit
            def _force_mean(params, subkey, data):
                f, _ = _force_samples(params, subkey, data)
                return jnp.mean(f, axis=0)

            obs_key_fns["forces"] = _force_mean
            # natoms from the host-side config (the device `atoms` array may
            # already have been donated to a jitted step by now).
            obs_cols["forces"] = [
                f"force_{a}_{d}"
                for a in range(len(np.asarray(cfg.system.atoms)))
                for d in "xyz"]
        if cfg.observables.get("structure_factor", False):
            # Static structure factor S(k) on a shell-grouped reciprocal grid
            # (beyond the reference): running accumulation checkpointed;
            # saved to structure_factor.npz for the CCMH finite-size
            # correction (pbc/structure_factor.chiesa_potential_correction).
            if not cfg.system.get("pbc", False):
                raise ValueError(
                    "observables.structure_factor needs a periodic system "
                    "(cfg.system.pbc with a lattice)")
            from aiqmc_tpu.pbc import structure_factor as sf_lib
            sf_k, sf_knorm = sf_lib.make_kshells(
                np.asarray(cfg.system.structure),
                nmax=int(cfg.observables.get("structure_factor_nmax", 3)))
            sfactor = {
                "est": jax.jit(sf_lib.make_structure_factor(sf_k, nelectrons)),
                "k": sf_k, "knorm": sf_knorm,
                "accum": (np.asarray(ckpt_extra["sk_accum"])
                          if "sk_accum" in ckpt_extra else None),
                "count": (int(ckpt_extra["sk_count"])
                          if "sk_count" in ckpt_extra else 0)}

    def _ckpt_extra():
        extra = {"mcmc_width": np.asarray(mcmc_width)}
        if ema_params is not None:
            extra[checkpoint_lib.EMA_EXTRA_KEY] = checkpoint_lib.ema_to_extra(
                jax.device_get(ema_params))
        if density is not None:
            s = density["state"]
            extra.update(
                density_t=np.asarray(s.t),
                density_positions=np.asarray(s.positions),
                density_probabilities=np.asarray(s.probabilities),
                density_move_width=np.asarray(s.move_width),
                density_rho_accum=np.asarray(
                    density["accum"] if density["accum"] is not None else 0.0),
                density_rho_count=np.asarray(density["count"]))
        if sfactor is not None and sfactor["count"] > 0:
            extra.update(sk_accum=np.asarray(sfactor["accum"]),
                         sk_count=np.asarray(sfactor["count"]))
        return extra

    schema = ["step", "energy", "variance", "pmove", "ewmean", "ewstd"]
    n_states = cfg.system.get("states", 0)
    state_cols = [f"energy_state_{k}" for k in range(n_states)]
    state_mat_cols = [f"energy_mat_{i}{j}" for i in range(n_states)
                      for j in range(n_states)]
    schema += state_cols + state_mat_cols
    guard_on = _guard_enabled(cfg)
    if guard_on:
        # Surface the step-rejection counter so a stalled (all-rejecting)
        # run is visible in the CSV rather than silently frozen.
        schema.append("guard_rejected")
    for _cols in obs_cols.values():
        schema += _cols
    # In a multi-process run every host executes this loop; only process 0
    # may touch the (typically shared) save_path — concurrent writes to the
    # same CSV/npz corrupt them (ref drivers are single-host and never hit
    # this; ferminet/train.py gates nothing either, a latent defect there).
    is_chief = jax.process_index() == 0
    if writer_manager is None:
        writer_manager = (writers.Writer(
            name="train_states", schema=schema,
            directory=ckpt_save_path, iteration_key=None, log=False)
            if is_chief else writers.NullWriter())

    from aiqmc_tpu.utils.statistics import ExponentiallyWeightedStat
    ew = ExponentiallyWeightedStat(decay=0.99)

    energies = []
    time_of_last_ckpt = time.time()
    # Optional XLA/TPU profiler window (the reference has no tracing at all,
    # SURVEY.md §5; its jax.debug.print instrumentation is host-sync poison).
    # cfg.log.profile_steps = (start, stop) captures a trace viewable in
    # TensorBoard/XProf under <save_path>/profile.
    profile_window = cfg.log.get("profile_steps", None)
    profiling = False
    with writer_manager as writer:
        for t in range(t_init, t_init + cfg.optim.iterations):
            if (profile_window and not profiling
                    and t - t_init == int(profile_window[0])):
                jax.profiler.start_trace(
                    os.path.join(ckpt_save_path, "profile"))
                profiling = True
            key, subkey = jax.random.split(key)
            params, opt_state, data, loss_val, stats, pmove = jit_step(
                params, opt_state, data, subkey, mcmc_width)
            if ema_params is not None:
                ema_params = ema_step(ema_params, params)
            if cfg.mcmc.algorithm == "random_walk":
                new_width, pmoves_buf = rw_mcmc.update_mcmc_width(
                    t - t_init, float(mcmc_width), cfg.mcmc.adapt_frequency,
                    float(np.asarray(pmove)), pmoves_buf)
                mcmc_width = jnp.asarray(new_width)
            loss_host = float(np.asarray(jax.device_get(loss_val)).real)
            energies.append(loss_host)
            if np.isfinite(loss_host):
                ew.update(loss_host)
            if t % cfg.log.stats_frequency == 0:
                extra = {}
                for name, fn in obs_fns.items():
                    vals = np.asarray(fn(params, data)).reshape(-1)
                    extra.update({c: float(v)
                                  for c, v in zip(obs_cols[name], vals)})
                for name, fn in obs_key_fns.items():
                    key, subkey = jax.random.split(key)
                    vals = np.asarray(fn(params, subkey, data)).reshape(-1)
                    extra.update({c: float(v)
                                  for c, v in zip(obs_cols[name], vals)})
                if density is not None:
                    key, subkey = jax.random.split(key)
                    density["state"] = density["update"](
                        params, density["state"], subkey)
                    rho = np.asarray(
                        density["est"](params, data, density["state"]))
                    density["accum"] = (rho if density["accum"] is None
                                        else density["accum"] + rho)
                    density["count"] += 1
                if sfactor is not None:
                    sk = np.asarray(sfactor["est"](data))
                    sfactor["accum"] = (sk if sfactor["accum"] is None
                                        else sfactor["accum"] + sk)
                    sfactor["count"] += 1
                if state_cols:
                    se = np.asarray(stats["state_energies"]).reshape(-1)
                    extra.update({c: float(v)
                                  for c, v in zip(state_cols, se)})
                    em = np.asarray(
                        stats["state_energy_matrix"]).reshape(-1)
                    extra.update({c: float(v)
                                  for c, v in zip(state_mat_cols, em)})
                if guard_on:
                    extra["guard_rejected"] = int(
                        np.asarray(stats["guard_rejected"]))
                writer.write(t, step=t, energy=loss_host,
                             variance=float(np.asarray(stats["variance"]).real),
                             pmove=float(np.asarray(pmove)),
                             ewmean=ew.mean, ewstd=ew.std, **extra)
            logging.info("Step %05d: %03.4f E_h", t, loss_host)
            if profiling and t - t_init >= int(profile_window[1]):
                jax.block_until_ready(loss_val)
                jax.profiler.stop_trace()
                profiling = False
            if time.time() - time_of_last_ckpt > cfg.log.save_frequency * 60:
                gathered = _gather_data(data)  # collective: all hosts call
                if is_chief:
                    checkpoint_lib.save(ckpt_save_path, t, gathered,
                                        jax.device_get(params),
                                        jax.device_get(opt_state),
                                        extra=_ckpt_extra())
                time_of_last_ckpt = time.time()
        if profiling:
            # Training ended (or the window overshot iterations) with the
            # trace still open — close it so the capture isn't lost.
            jax.block_until_ready(loss_val)
            jax.profiler.stop_trace()
            profiling = False
        gathered = _gather_data(data)  # collective: all hosts call
        if is_chief:
            checkpoint_lib.save(ckpt_save_path,
                                t_init + cfg.optim.iterations - 1,
                                gathered, jax.device_get(params),
                                jax.device_get(opt_state),
                                extra=_ckpt_extra())
        if is_chief and density is not None and density["count"] > 0:
            np.save(os.path.join(ckpt_save_path, "density_rdm.npy"),
                    density["accum"] / density["count"])
        if is_chief and sfactor is not None and sfactor["count"] > 0:
            np.savez(os.path.join(ckpt_save_path, "structure_factor.npz"),
                     kpoints=sfactor["k"], knorm=sfactor["knorm"],
                     sk=sfactor["accum"] / sfactor["count"],
                     count=sfactor["count"])

    return TrainResult(network=network, params=params, data=data,
                       opt_state=opt_state, energies=np.asarray(energies),
                       ckpt_save_path=ckpt_save_path)


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
         list_l: int = 2,
         nspins: Optional[Tuple[int, int]] = None,
         save_path: Optional[str] = None,
         restore_path: Optional[str] = None,
         Rn_local=None,
         Local_coes=None,
         Local_exps=None,
         Rn_non_local=None,
         Non_local_coes=None,
         Non_local_exps=None,
         save_frequency: float = 10.0,
         structure=None,
         **overrides) -> TrainResult:
    """Reference-keyword-compatible entry point
    (ref main/main_pp_adam_muti_GPU.py:27-52)."""
    del nelectrons, natoms, nsteps  # derived from arrays / cfg.mcmc.steps
    cfg = config_lib.default()
    with cfg.unlocked():
        cfg.batch_size = batch_size
        cfg.optim.iterations = iterations
        cfg.mcmc.tstep = tstep
        cfg.system.atoms = np.asarray(atoms)
        cfg.system.charges = np.asarray(charges)
        cfg.system.spins = np.asarray(spins)
        cfg.system.nspins = nspins
        cfg.system.ndim = ndim
        cfg.system.structure = structure
        cfg.log.save_path = save_path or ""
        cfg.log.restore_path = restore_path or ""
        cfg.log.save_frequency = save_frequency
        if Rn_local is not None:
            cfg.system.use_pp = True
            cfg.system.pp.list_l = list_l
            cfg.system.pp.rn_local = np.asarray(Rn_local)
            cfg.system.pp.local_coes = np.asarray(Local_coes)
            cfg.system.pp.local_exps = np.asarray(Local_exps)
            cfg.system.pp.rn_non_local = np.asarray(Rn_non_local)
            cfg.system.pp.non_local_coes = np.asarray(Non_local_coes)
            cfg.system.pp.non_local_exps = np.asarray(Non_local_exps)
        for path, value in overrides.items():
            node = cfg
            *parents, leaf = path.split(".")
            for p in parents:
                node = node[p]
            node[leaf] = value
    return train(cfg)
