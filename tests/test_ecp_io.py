"""ECP file-reader tests against the reference's C.ccECP tables
(ref example/single_atom_C/single_atom_C.py:13-23)."""

import numpy as np

from aiqmc_tpu.hamiltonian import ecp_io

C_ECP = """\
C nelec 2
C ul
1 14.43502 4.00000
3 8.39889 57.74008
2 7.38188 -25.81955
C S
2 7.76079 52.13345
"""


def test_parse_c_ccecp():
    tables = ecp_io.parse_nwchem_ecp(C_ECP)
    t = tables["C"]
    assert t.ncore == 2
    np.testing.assert_allclose(t.rn_local, [1, 3, 2])
    np.testing.assert_allclose(t.local_exps, [14.43502, 8.39889, 7.38188])
    np.testing.assert_allclose(t.local_coes, [4.0, 57.74008, -25.81955])
    np.testing.assert_allclose(t.rn_non_local, [[2]])
    np.testing.assert_allclose(t.non_local_coes, [[52.13345]])


def test_stack_matches_reference_example_tables():
    tables = ecp_io.parse_nwchem_ecp(C_ECP)
    stacked = ecp_io.stack_ecp_tables([tables["C"]])
    # Reference example hardcodes these arrays (single_atom_C.py:13-23).
    np.testing.assert_allclose(stacked["rn_local"], [[1.0, 3.0, 2.0]])
    np.testing.assert_allclose(stacked["local_coes"],
                               [[4.00000, 57.74008, -25.81955]])
    np.testing.assert_allclose(stacked["local_exps"],
                               [[14.43502, 8.39889, 7.38188]])
    np.testing.assert_allclose(stacked["non_local_coes"], [[[52.13345]]])
    assert stacked["list_l"] == 0


def test_multi_element_padding():
    two = C_ECP + """\
Si nelec 10
Si ul
1 5.168316 4.000000
3 8.861690 20.673264
2 3.933474 -14.818174
Si S
2 9.447023 14.832760
2 2.553812 26.349664
Si P
2 3.660001 7.621400
2 1.903653 10.331583
"""
    tables = ecp_io.parse_nwchem_ecp(two)
    stacked = ecp_io.stack_ecp_tables([tables["C"], tables["Si"]])
    assert stacked["rn_non_local"].shape == (2, 2, 2)
    # C has one S term; padding zeros elsewhere.
    np.testing.assert_allclose(stacked["non_local_coes"][0, 0], [52.13345, 0.0])
    np.testing.assert_allclose(stacked["non_local_coes"][1, 1],
                               [7.621400, 10.331583])
    assert stacked["list_l"] == 1


def test_configure_pp_from_shipped_file():
    """cfg.system.pp loaded from the packaged C ccECP file must reproduce the
    hand-transcribed tables of configs/c_atom_ccecp (ref single_atom_C.py)."""
    import os
    import numpy as np
    from aiqmc_tpu import config as config_lib
    from aiqmc_tpu.configs import c_atom_ccecp as cc
    from aiqmc_tpu.hamiltonian import ecp_io

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "aiqmc_tpu", "data", "C.ccECP.nwchem")
    cfg = config_lib.default()
    with cfg.unlocked():
        cfg.system.atoms = np.zeros((1, 3))
        cfg.system.spins = np.array([1.0, 1.0, 1.0, -1.0])
    ecp_io.configure_pp(cfg, ["C"], path)
    assert cfg.system.use_pp
    np.testing.assert_allclose(cfg.system.charges, [4.0])
    # Same physics content as the hand-written tables (local channel rows may
    # be ordered as in the file).
    got = {(float(n), float(e), float(c))
           for n, e, c in zip(cfg.system.pp.rn_local[0],
                              cfg.system.pp.local_exps[0],
                              cfg.system.pp.local_coes[0])}
    want = {(float(n), float(e), float(c))
            for n, e, c in zip(cc.RN_LOCAL[0], cc.LOCAL_EXPS[0],
                               cc.LOCAL_COES[0])}
    assert got == want
    np.testing.assert_allclose(cfg.system.pp.non_local_coes[0][0][0], 52.13345)
    np.testing.assert_allclose(cfg.system.pp.non_local_exps[0][0][0], 7.76079)
