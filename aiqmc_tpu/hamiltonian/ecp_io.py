"""ccECP nwchem-format pseudopotential file reader.

Completes what ref ``AIQMCrelease3/pseudopotential/readpp.py`` left unfinished
(its nonlocal parsing stops at readpp.py:44 "not sure if I should spend time on
this"): parses the local (``ul``) channel AND the nonlocal angular-momentum
channels (S, P, D, ...), padding per-atom tables to a common shape the
ECP kernels consume directly (the zero-padding convention of
ref pseudopotential.py:38-44).

Format (e.g. C.ccECP.nwchem):
    C nelec 2
    C ul
    1 14.43502 4.00000        # n  exponent  coefficient
    3 8.39889 57.74008
    2 7.38188 -25.81955
    C S
    2 7.76079 52.13345
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Sequence

import numpy as np

_CHANNELS = ["S", "P", "D", "F", "G"]


@dataclasses.dataclass
class EcpTable:
    """Parsed ECP for one element."""
    symbol: str
    ncore: int                    # electrons removed by the ECP
    rn_local: np.ndarray          # (K,)
    local_exps: np.ndarray        # (K,)
    local_coes: np.ndarray        # (K,)
    rn_non_local: np.ndarray      # (n_l, Kn)
    non_local_exps: np.ndarray    # (n_l, Kn)
    non_local_coes: np.ndarray    # (n_l, Kn)


def parse_nwchem_ecp(text: str) -> Dict[str, EcpTable]:
    """Parses one or more nwchem ECP blocks; returns {symbol: EcpTable}."""
    tables: Dict[str, EcpTable] = {}
    current_symbol = None
    ncore = {}
    sections: Dict[str, Dict[str, List[List[float]]]] = {}
    section = None
    for raw in text.splitlines():
        line = raw.split("#")[0].strip()
        if not line:
            continue
        parts = line.split()
        if len(parts) == 3 and parts[1].lower() == "nelec":
            current_symbol = parts[0]
            ncore[current_symbol] = int(parts[2])
            sections.setdefault(current_symbol, {})
            section = None
            continue
        if len(parts) == 2 and (parts[1] == "ul" or parts[1] in _CHANNELS):
            current_symbol = parts[0]
            sections.setdefault(current_symbol, {})
            section = parts[1]
            sections[current_symbol].setdefault(section, [])
            continue
        if section is not None and len(parts) == 3:
            sections[current_symbol][section].append(
                [float(parts[0]), float(parts[1]), float(parts[2])])

    for symbol, secs in sections.items():
        local = np.asarray(secs.get("ul", []), dtype=np.float64)
        nl_channels = [c for c in _CHANNELS if c in secs]
        kn = max((len(secs[c]) for c in nl_channels), default=1)
        n_l = max(len(nl_channels), 1)
        rn_nl = np.zeros((n_l, kn))
        exps_nl = np.zeros((n_l, kn))
        coes_nl = np.zeros((n_l, kn))
        for li, c in enumerate(nl_channels):
            rows = np.asarray(secs[c], dtype=np.float64)
            rn_nl[li, :len(rows)] = rows[:, 0]
            exps_nl[li, :len(rows)] = rows[:, 1]
            coes_nl[li, :len(rows)] = rows[:, 2]
        tables[symbol] = EcpTable(
            symbol=symbol,
            ncore=ncore.get(symbol, 0),
            rn_local=local[:, 0] if local.size else np.zeros((0,)),
            local_exps=local[:, 1] if local.size else np.zeros((0,)),
            local_coes=local[:, 2] if local.size else np.zeros((0,)),
            rn_non_local=rn_nl,
            non_local_exps=exps_nl,
            non_local_coes=coes_nl)
    return tables


def read_nwchem_ecp(path: str) -> Dict[str, EcpTable]:
    with open(path) as f:
        return parse_nwchem_ecp(f.read())


def stack_ecp_tables(tables: Sequence[EcpTable]):
    """Stacks per-atom tables into the padded arrays the ECP kernels take.

    Returns dict with rn_local (natoms, K), local_coes, local_exps,
    rn_non_local (natoms, n_l, Kn), non_local_coes, non_local_exps, and the
    max angular momentum list_l.
    """
    natoms = len(tables)
    k_loc = max(t.rn_local.size for t in tables)
    n_l = max(t.rn_non_local.shape[0] for t in tables)
    k_nl = max(t.rn_non_local.shape[1] for t in tables)
    rn_local = np.zeros((natoms, k_loc))
    local_coes = np.zeros((natoms, k_loc))
    local_exps = np.zeros((natoms, k_loc))
    rn_nl = np.zeros((natoms, n_l, k_nl))
    coes_nl = np.zeros((natoms, n_l, k_nl))
    exps_nl = np.zeros((natoms, n_l, k_nl))
    for i, t in enumerate(tables):
        rn_local[i, :t.rn_local.size] = t.rn_local
        local_coes[i, :t.local_coes.size] = t.local_coes
        local_exps[i, :t.local_exps.size] = t.local_exps
        nli, kni = t.rn_non_local.shape
        rn_nl[i, :nli, :kni] = t.rn_non_local
        coes_nl[i, :nli, :kni] = t.non_local_coes
        exps_nl[i, :nli, :kni] = t.non_local_exps
    return {
        "rn_local": rn_local,
        "local_coes": local_coes,
        "local_exps": local_exps,
        "rn_non_local": rn_nl,
        "non_local_coes": coes_nl,
        "non_local_exps": exps_nl,
        "list_l": max(n_l - 1, 0),
    }


def configure_pp(cfg, symbols: Sequence[str], ecp_source) -> None:
    """Fills ``cfg.system.pp`` (+ use_pp, valence charges) from ECP data.

    The glue the reference never finished (ref readpp.py:44): example scripts
    there hand-transcribe the C tables (ref example/single_atom_C.py:13-23);
    here any system config can load them straight from the shipped nwchem
    files (aiqmc_tpu/data/C.ccECP.nwchem).

    Args:
      cfg: a config (cfg.system.atoms/spins already set); modified in place.
      symbols: element symbol per atom, e.g. ["C", "C"].
      ecp_source: path to an nwchem ECP file, its text, or {symbol: EcpTable}.
    """
    from aiqmc_tpu.utils import elements
    if isinstance(ecp_source, str):
        if "\n" in ecp_source:
            tables = parse_nwchem_ecp(ecp_source)
        else:
            tables = read_nwchem_ecp(ecp_source)
    else:
        tables = dict(ecp_source)
    per_atom = []
    z_eff = []
    for symbol in symbols:
        if symbol not in tables:
            raise ValueError(f"No ECP table for element {symbol}")
        t = tables[symbol]
        per_atom.append(t)
        z_true = elements.SYMBOLS[symbol].atomic_number
        z_eff.append(float(z_true - t.ncore))
    stacked = stack_ecp_tables(per_atom)
    with cfg.unlocked():
        cfg.system.use_pp = True
        cfg.system.charges = np.asarray(z_eff)
        cfg.system.pp.list_l = stacked["list_l"]
        for key in ("rn_local", "local_coes", "local_exps", "rn_non_local",
                    "non_local_coes", "non_local_exps"):
            setattr(cfg.system.pp, key, stacked[key])
