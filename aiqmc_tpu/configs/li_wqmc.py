"""Lithium atom with the WQMC objective (pattern: ref
ferminet/configs/li_wqmc.py)."""

from __future__ import annotations

from aiqmc_tpu.configs import atom


def get_config():
    cfg = atom.get_config("Li")
    with cfg.unlocked():
        cfg.optim.objective = "wqmc"
    return cfg
