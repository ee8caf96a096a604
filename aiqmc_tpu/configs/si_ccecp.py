"""Si atom with a ccECP pseudopotential from a user-supplied nwchem table —
BASELINE config #3 names Si, but neither the reference nor this repo ships Si
ECP data (the reference carries ONLY the carbon tables,
ref AIQMCrelease3/pseudopotential/C.ccECP.nwchem; ref readpp.py:44 never
finished the generic loader). Rather than fabricate literature parameters,
this config loads any standard nwchem-format ccECP file the user downloads
(e.g. Si.ccECP.nwchem from pseudopotentiallibrary.org) via
``hamiltonian/ecp_io.py`` — the same parser the carbon runs use.

Si ccECP is Ne-core: 10 core electrons, Z_eff = 4, ground state 3P (2,2)
over the 3s/3p valence shell -> 4 valence electrons, spins (3,1) triplet.
"""

from __future__ import annotations

import numpy as np

from aiqmc_tpu import config as config_lib
from aiqmc_tpu.hamiltonian import ecp_io


def get_config(ecp_source: str = ""):
    """Args:
      ecp_source: path to (or full text of) an nwchem ECP file containing an
        ``Si`` table. Required — there is no embedded fallback on purpose.
    """
    if not ecp_source:
        raise ValueError(
            "Si ccECP tables are not shipped (the reference only carries "
            "carbon). Pass get_config(ecp_source=<path or text of an nwchem "
            "ECP file with an Si entry>), e.g. Si.ccECP.nwchem from "
            "pseudopotentiallibrary.org.")
    cfg = config_lib.default()
    with cfg.unlocked():
        cfg.system.atoms = np.array([[0.0, 0.0, 0.0]])
        # 4 valence electrons, 3P triplet (3,1): charges are overwritten with
        # Z_eff = Z - ncore by configure_pp below.
        cfg.system.spins = np.array([1.0, 1.0, 1.0, -1.0])
        cfg.mcmc.tstep = 0.1
        cfg.system.pp.quadrature = "icosahedral12"
    ecp_io.configure_pp(cfg, ["Si"], ecp_source)
    return cfg
