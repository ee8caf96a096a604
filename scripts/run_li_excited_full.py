"""Li 3-state NES-VMC SHOWCASE: the complete excited-state pipeline.

One command exercising everything the excited stack now has — shared-parameter
ansatz, mean-field-excitation pretraining, KFAC, the S^2/dipole/energy state
matrices, the transition one-RDM — and printing a spectroscopy summary
(excitation energies from the eigen-unmixed energy matrix, per-state <S^2>,
oscillator strengths).

Exact targets (NIST ASD levels + exact nonrelativistic ground state): with
no symmetry restriction the three lowest states of Li are 1s^2 2s (2S)
-7.47806 Ha and TWO components of the triply-degenerate 1s^2 2p (2P)
-7.41016 (excitation 0.06791 Ha each) — NOT 3s, which lies above the third
2P component. All are doublets (<S^2> = 0.75). The 2s->2p resonance line
has total oscillator strength 0.747 over the full 2P multiplet, i.e.
0.249 per component; with 2 of 3 components present the 2P-block total
should read ~0.498 (excited_state_summary reports the block sum — the
per-state split inside a degenerate multiplet is basis-arbitrary).

Usage:
  CPU check : env JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= PYTHONPATH=/root/repo \
                python -u scripts/run_li_excited_full.py 300 512
  chip run  : usual TPU env (CLAUDE.md), e.g. 8000 2048
  trailing argv: iters batch [save_path]
"""
import json
import sys

import numpy as np

from aiqmc_tpu import train as train_lib
from aiqmc_tpu.configs import li_excited
from aiqmc_tpu.utils import analysis_tools

iters = int(sys.argv[1]) if len(sys.argv) > 1 else 400
batch = int(sys.argv[2]) if len(sys.argv) > 2 else 512
save = sys.argv[3] if len(sys.argv) > 3 else "/root/repo/runs/li_excited_full"

cfg = li_excited.get_config()
with cfg.unlocked():
    cfg.batch_size = batch
    cfg.optim.iterations = iters
    cfg.optim.optimizer = "kfac"
    cfg.mcmc.steps = 10
    cfg.mcmc.burn_in = 100
    cfg.network.hidden_dims = ((64, 16), (64, 16), (64, 16))
    cfg.network.hidden_dims_ynlm = (8, 8, 8)
    cfg.network.determinants = 4
    cfg.pretrain.iterations = 500
    cfg.pretrain.target = "uhf"
    cfg.observables.s2 = True
    cfg.observables.dipole = True
    cfg.observables.density = True
    cfg.log.save_path = save
    cfg.log.save_frequency = 10.0
result = train_lib.train(cfg)

summary = analysis_tools.excited_state_summary(
    f"{result.ckpt_save_path}/train_states.csv", states=3, burn_fraction=0.5)
print("SUMMARY " + json.dumps(summary))
exact = {"E": [-7.47806, -7.41016, -7.41016],
         "excitation_2p": 0.06791, "f_2p_block_2of3": 0.498}
print(f"exact: {exact}")
