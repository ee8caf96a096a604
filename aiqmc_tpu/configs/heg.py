"""Unpolarised 14-electron simple-cubic homogeneous electron gas (pattern:
ref ferminet/configs/heg.py: chargeless anchor atom at the origin, Wigner-Seitz
radius rs, multiwave Bloch envelope, Ewald with uniform background)."""

from __future__ import annotations

import numpy as np

from aiqmc_tpu import config as config_lib


def _sc_lattice_vecs(rs: float, nelec: int) -> np.ndarray:
    """Simple-cubic cell with Wigner-Seitz radius rs (rows = vectors)."""
    volume = (4.0 / 3.0) * np.pi * (rs ** 3) * nelec
    return volume ** (1.0 / 3.0) * np.eye(3)


def get_config(rs: float = 1.0, nelec: int = 14):
    n_up = nelec // 2
    lattice = _sc_lattice_vecs(rs, nelec)
    cfg = config_lib.default()
    with cfg.unlocked():
        # A single chargeless "atom" anchors the feature/envelope streams
        # (the reference uses a ghost atom 'X'); all interactions come from
        # Ewald e-e with the neutralising background.
        cfg.system.atoms = np.zeros((1, 3))
        cfg.system.charges = np.array([0.0])
        cfg.system.spins = np.concatenate(
            [np.ones(n_up), -np.ones(nelec - n_up)])
        cfg.system.structure = lattice
        cfg.system.pbc = True
        cfg.system.ewald = {"truncation_limit": 5, "heg": True}
        cfg.network.envelope_type = "multiwave"
        # The gas is homogeneous: strip every origin-anchored structure the
        # molecular ansatz pins to the ghost atom (ref ferminet/configs/
        # heg.py sets include_r_ae=False; upstream FermiNet has no Y factor
        # and no a-e Jastrow). With them on, the network first has to
        # UNLEARN an artificial well at the anchor — the round-5 flatline
        # (~5 Ha above the HF anchor after 2.4k iterations, BASELINE.md).
        cfg.network.pbc_include_r_ae = False
        cfg.network.y_stream = False
        cfg.network.jastrow_ae = False
        cfg.mcmc.init_width = 0.1
    return cfg
