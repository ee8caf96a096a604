"""HCl excited states (ref ferminet/configs/hcl.py:15-80).

The reference attaches a pyscf-backed ccECP to Cl (`cfg.system.pp.symbols =
['Cl']`); pyscf is absent here and the only ECP table shipped anywhere in the
reference repo is carbon's (C.ccECP.nwchem), so this config is all-electron by
default. To run the pseudopotential variant, supply Cl ccECP tables through
``cfg.system.pp.*`` (parse an .nwchem file with hamiltonian/ecp_io.py).
"""

from __future__ import annotations

from aiqmc_tpu import config as config_lib
from aiqmc_tpu.utils import system


def get_config(states: int = 3):
    cfg = config_lib.default()
    h = system.Atom("H", (0.0, 0.0, 0.0), units="angstrom")
    cl = system.Atom("Cl", (0.0, 0.0, 1.2799799), units="angstrom")
    spins = system.spin_config([h, cl], charge=0)
    pos, charges = system.molecule_arrays([h, cl])
    with cfg.unlocked():
        cfg.system.atoms = pos
        cfg.system.charges = charges
        cfg.system.spins = spins
        cfg.system.states = states
    return cfg
