"""Default configuration tree.

ConfigDict-based system in the style of the vendored ferminet config
(ref ferminet/base_config.py:36-297), carrying the AIQMC physics options (Y_nlm
stream, flexible-Gaussian envelope, ccECP tables, drift-diffusion sampler). The
reference AIQMC trees use bare keyword arguments to ``main(...)``
(ref main/main_pp_adam_muti_GPU.py:27-52); ``aiqmc_tpu.train.main`` remains as a
keyword-compatible wrapper that populates this config.
"""

from __future__ import annotations

import ml_collections


def default() -> ml_collections.ConfigDict:
    cfg = ml_collections.ConfigDict({
        "batch_size": 256,             # global walker count across all chips
        "optim": {
            "iterations": 100,
            "optimizer": "adam",        # adam | lamb | kfac | spring | none
            "ema_decay": 0.0,           # >0: maintain Polyak-averaged params
                                        # (ema <- d*ema + (1-d)*params each
                                        # step), saved in checkpoint extras;
                                        # evaluate/DMC from them via
                                        # log.restore_use_ema / dmc use_ema
            # rate / (1 + t/delay)^decay. NOTE: the reference hardcodes
            # delay=1.0, decay=10000 (main_pp_adam_muti_GPU.py:158-159), which
            # collapses the LR to 0.5^10000 = 0 after the first step — training
            # freezes at the init wavefunction. We default to the upstream
            # FermiNet schedule (ferminet/base_config.py lr: delay=1e4, decay=1).
            "lr": {
                "rate": 0.05,
                "delay": 10000.0,
                "decay": 1.0,
            },
            "adam": {"b1": 0.9, "b2": 0.999, "eps": 1e-8, "eps_root": 0.0},
            # Sweep on He (tests/../kfac sweep): momentum 0.9 + lr 0.02 tracks
            # Adam's convergence; damping 1e-3 with pi-splitting.
            "kfac": {
                "damping": 1e-3,
                "cov_ema_decay": 0.95,
                "norm_constraint": 1e-3,
                "min_damping": 1e-4,
                "lr": {"rate": 0.02, "delay": 10000.0},
                "momentum": 0.9,
                "update_period": 1,       # Kronecker-factor refresh cadence
                "adaptive_learning_rate": False,  # exact quadratic-model (a, mu)
                "adaptive_damping": False,        # LM reduction-ratio rule
                "damping_adaptation_interval": 5,
                "damping_adaptation_decay": 0.9,
                "max_damping": 1e6,
            },
            # SPRING/MinSR natural gradient in sample space (optim/spring.py;
            # beyond the reference's Adam/KFAC zoo).
            "spring": {
                "damping": 1e-3,
                "mu": 0.99,
                "norm_constraint": 1e-3,
                "lr": {"rate": 2e-2, "delay": 4000.0},
                # Continuations (restore from a checkpoint) floor the damping
                # at this value: at a converged trial the SPRING residual is
                # mostly batch noise and the lam=1e-3 sample-space solve fits
                # it (variance creep 0.02 -> 3 Ha^2, runs/c_spring_probe),
                # while damping 0.1 stayed healthy AND descended below the
                # KFAC plateau (frozen eval -5.41757(12), runs/c_spring_probe2
                # + BASELINE.md). Set to 0 to keep the fresh-start damping on
                # restore as well.
                "continuation_damping": 0.1,
            },
            # Statistical step rejection (optim/guard.py): rolls back
            # finite-but-pathological optimizer steps (variance explosion /
            # non-variational energy plunge). Motivated by the Si
            # all-electron divergence (runs/si_vmc, BASELINE.md). "auto"
            # (default) enables it for the curvature optimizers (kfac,
            # spring) — the two whose steps have been measured to diverge
            # finitely — and leaves the first-order ones (adam, lamb) bare;
            # set True/False to force either way.
            "guard": {
                # object-typed so callers can assign True/False over the
                # "auto" default (ml_collections enforces field types).
                "enable": ml_collections.config_dict.placeholder(object),
                "var_factor": 8.0,   # reject if batch var > factor * EW var
                "jump_sigmas": 20.0, # reject if |E - EW E| > k * sem
                "warmup": 300,       # accepted steps before the guard engages
                "decay": 0.98,       # EW decay for the running statistics
                "var_ceiling": 0.0,  # >0: reject if batch var exceeds this
                                     # ABSOLUTE Ha^2 ceiling (gradual creep
                                     # evades the relative tests — set to
                                     # ~10x the plateau variance when
                                     # continuing a converged trial)
            },
            "clip_local_energy": 5.0,
            "clip_from_median": True,
            "center_at_clipped_energy": True,
            "objective": "vmc",         # vmc | wqmc
            "laplacian_chunk": None,    # coordinates per Laplacian chunk
            "laplacian": "default",     # default | forward (ops/forward_laplacian)
            "el_chunk": 0,              # walkers per lax.map E_L chunk (0=vmap)
        },
        "network": {
            "hidden_dims": ((32, 16), (32, 16), (32, 16)),
            "hidden_dims_ynlm": (8, 8, 8),
            "determinants": 1,
            "bias_orbitals": True,
            "rescale_inputs": False,
            "complex_orbitals": False,  # TPU backend lacks complex64; see models.network
        "complex_pairs": False,     # complex orbitals as (re, im) real pairs — the
                                    # TPU-safe complex path (no complex dtype anywhere)
            "full_equivariance": True,  # exactly antisymmetric variant
            "bounded_envelope": True,   # decaying-everywhere envelope (see models.envelope)
            "regular_harmonics": True,  # smooth solid harmonics (see models.harmonics)
            "envelope_type": "pp_like", # pp_like | isotropic | diagonal | full |
                                        # sto | sto_poly | null | gto (ab-initio
                                        # flexible Gaussian basis, gen-1 namesake)
            "gto_basis": "",            # gto envelope basis: "" = embedded
                                        # STO-3G/even-tempered | "even_tempered"
                                        # | nwchem file path (cc-pVDZ-class)
            "use_schnet": False,        # SchNet-style two-electron convolutions
        "h_stream": "ainet",        # ainet (conv-reduce, ref nn.py:294-300) |
                                    # ferminet (full linear on symmetric features)
        "y_stream": True,           # multiplicative Y_nlm orbital factor (ref
                                    # nn.py:449-452); False = exact published
                                    # FermiNet orbital form (ablation arm)
        "pbc_smooth_r": False,      # smooth periodic r for Jastrow/envelope
                                    # (C^inf at the WS boundary) vs minimum image
        "pbc_features": "sincos",   # sincos (upstream phase features) | gvector
                                    # (the AIQMC tree's raw lattice-image
                                    # expansion, ref PBC/nnPBC.py:104)
        "pbc_gmax": 1,              # gvector variant: images per axis in
                                    # [-g_max, g_max]^ndim
        "pbc_gvector_smooth": True,  # gvector variant: C^inf periodic base
                                    # displacement (continuous across the
                                    # half-cell boundary); False = minimum-
                                    # image wrap (exact geometry, log|psi|
                                    # discontinuous at +-1/2 — ablation only)
        "pbc_include_r_ae": True,   # sincos variant: include the periodic
                                    # e-a distance feature. Set False for
                                    # ghost-atom systems (HEG): an origin-
                                    # pinned distance on a chargeless anchor
                                    # is spurious structure the gas must
                                    # unlearn (ref ferminet/pbc/
                                    # feature_layer.py include_r_ae)
        "jastrow_ae": None,         # None = auto: a-e cusp Jastrow only for
                                    # all-electron systems (wrong at ECP cores)
        "jastrow_ee": "pade",       # pade (ref AIQMC, per-pair alpha) |
                                    # simple_ee (ref ferminet/jastrows.py) | none
            "jastrow_scale": None,      # None = 1/nelectrons (exact at det level)
            "matmul_dtype": "float32",  # float32 | bfloat16 (h-stream matmuls)
            "network_type": "ainet",    # ainet | psiformer
            # Importlib plugin hooks (ref ferminet/base_config.py:36-297,
            # train.py:440-467): "module.path.function" strings, resolved at
            # build time. Factories receive (natoms, nspins, ndim, **kwargs) /
            # (**kwargs) and return a FeatureLayer / (init, apply) envelope.
            "make_feature_layer_fn": "",
            "make_feature_layer_kwargs": {},
            "make_envelope_fn": "",
            "make_envelope_kwargs": {},
            "psiformer": {
                "num_layers": 2,
                "num_heads": 4,
                "heads_dim": 16,
                "mlp_hidden_dims": (64,),
                "use_layer_norm": True,
            },
        },
        "mcmc": {
            "algorithm": "drift_diffusion",  # drift_diffusion | random_walk | mala
            "tstep": 0.05,
            "steps": 10,
            "burn_in": 100,
            "init_width": 1.0,
            "move_width": 0.2,          # random_walk proposal width
            "adapt_frequency": 100,
            # random_walk only: per-electron proposal widths scaled by the
            # harmonic-mean nuclear distance with the detailed-balance
            # asymmetry correction (ref ferminet/mcmc.py:118-148) — core
            # electrons take short steps, valence long ones; the acceptance
            # equaliser for heavy all-electron systems (e.g. Si Z=14).
            "scale_by_nuclear_distance": False,
            # random_walk only: split electrons into this many groups with
            # separate proposals per step (ref ferminet/mcmc.py:151-218).
            "blocks": 1,
        },
        "system": {
            "atoms": None,              # (natoms, 3)
            "charges": None,            # (natoms,)
            "spins": None,              # (nelectrons,) of +-1
            "nspins": None,             # (n_up, n_down)
            "states": 0,                # K>0: NES-VMC total ansatz of K states
            # False (default): ONE shared network, K determinant groups
            # (upstream parity, ref ferminet/networks.py:1273-1311; base net
            # gets determinants = K * network.determinants). True: legacy K
            # independent parameter copies (K x params/opt state, K^2 evals).
            "excited_param_copies": False,
            "ndim": 3,
            # Importlib plugin hook (ref ferminet/train.py:688-702): factory
            # called as fn(f=, charges=, nspins=, use_scan=, complex_output=,
            # **kwargs) returning e_l(params, key, data) -> (E_L, aux).
            "make_local_energy_fn": "",
            "make_local_energy_kwargs": {},
            "use_pp": False,
            "pp": {
                "list_l": 2,
                "rn_local": None,
                "local_coes": None,
                "local_exps": None,
                "rn_non_local": None,
                "non_local_coes": None,
                "non_local_exps": None,
                "reference_compat": False,
                # "msc50" (reference parity) | "icosahedral12" (ferminet
                # parity, ~4x cheaper nonlocal quadrature)
                "quadrature": "msc50",
            },
            "structure": None,          # lattice rows (PBC; ignored otherwise)
            "pbc": False,               # periodic ansatz + Ewald local energy
            # Fractional twist theta in [-1/2,1/2)^3 (pbc/twist.py TABC);
            # nonzero twists require complex_orbitals (complex_pairs on TPU).
            "twist": (0.0, 0.0, 0.0),
            "ewald": {
                "truncation_limit": 5,
                "heg": False,
            },
        },
        "pretrain": {
            "iterations": 0,            # 0 = no pretraining
            "target": "rhf",            # rhf | uhf (open-shell) | hydrogenic
            # SCF basis: "" = embedded STO-3G (H-Ne) with an even-tempered
            # fallback for heavier elements; "even_tempered"; or a path to an
            # nwchem basis file (cc-pVDZ-class targets, ref
            # AIQMC/C.cc-pVDZ.nwchem format -> aiqmc_tpu/data/).
            "basis": "",
            "learning_rate": 3e-4,
        },
        "observables": {
            "s2": False,                # spin magnitude <S^2>
            "dipole": False,            # electric dipole moment
            "density": False,           # one-RDM via auxiliary r' chain;
                                        # state+accumulation checkpointed
            "density_mcmc_steps": 10,   # r' RW-MH sweeps per stats step
            # PBC only: accumulate the static structure factor S(k) on a
            # shell-grouped reciprocal grid -> structure_factor.npz, for the
            # CCMH two-body finite-size correction
            # (pbc/structure_factor.chiesa_potential_correction).
            "structure_factor": False,
            "structure_factor_nmax": 3,
            # Interatomic forces by AD of the SWCT correlated-sample energy
            # (forces.py; beyond the reference, which uses its space-warp
            # machinery for displaced-geometry energies only). Logs
            # force_{a}_{x,y,z} batch means per stats step. Molecular real
            # wavefunctions only; costs ~3x E_L (third derivatives), so the
            # production pattern is a frozen eval (optimizer="none") on a
            # trained checkpoint rather than logging during optimisation.
            "forces": False,
            "forces_mode": "rev",   # rev = vjp (fewest FLOPs; its kinetic
                                    # reverse residuals measure ~21G for C2
                                    # ccECP — OOMs the 15.75G v5e chip) |
                                    # fwd = per-coordinate jvp (natoms*ndim
                                    # forward passes, memory at plain-E_L
                                    # scale; use on chip)
        },
        "log": {
            "save_path": "",
            "restore_path": "",
            "restore_resize": False,    # allow batch_size != checkpoint batch
                                        # (subsample / tile walkers on restore)
            "restore_use_ema": False,   # start from the checkpoint's Polyak-
                                        # averaged params (requires the saving
                                        # run to have set optim.ema_decay > 0)
            "save_frequency": 10.0,     # minutes
            "stats_frequency": 1,
            "profile_steps": None,      # (start, stop) step window -> XLA trace
                                        # in <save_path>/profile (TensorBoard)
        },
        "debug": {
            "deterministic": False,
            "seed": 1,
        },
    })
    return cfg


def resolve(cfg: ml_collections.ConfigDict) -> ml_collections.ConfigDict:
    """Fills derived fields (nelectrons, nspins) from the system definition."""
    import numpy as np
    spins = np.asarray(cfg.system.spins)
    nelectrons = spins.size
    n_up = int(np.sum(spins > 0))
    with cfg.unlocked():
        cfg.system.nelectrons = nelectrons
        if cfg.system.nspins is None:
            cfg.system.nspins = (n_up, nelectrons - n_up)
        cfg.system.natoms = int(np.asarray(cfg.system.atoms).shape[0])
    return cfg
