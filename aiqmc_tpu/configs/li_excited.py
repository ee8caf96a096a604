"""Excited states of the lithium atom (pattern: ref
ferminet/configs/li_excited.py: Li, 3 NES-VMC states)."""

from __future__ import annotations

from aiqmc_tpu.configs import atom


def get_config(states: int = 3):
    cfg = atom.get_config("Li")
    with cfg.unlocked():
        cfg.system.states = states
        cfg.optim.clip_local_energy = 5.0
    return cfg
