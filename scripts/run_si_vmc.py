"""Si atom all-electron VMC smoke run (BASELINE config #3 names Si).

The reference ships ONLY the carbon ccECP table (C.ccECP.nwchem); no Si ccECP
data exists in the reference or this zero-egress environment, and fabricating
published ccECP coefficients from memory would be unsound — so the Si entry is
covered by (a) the ccECP machinery fully validated on C against deterministic
integral oracles, and (b) this all-electron Si run exercising a third-row
element end-to-end (14 electrons, (8,6) 3P ground-state spins, even-tempered
UHF pretraining targets from the data-free basis fallback).

Usage: JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache \
       PYTHONPATH=/root/repo:/root/.axon_site python -u \
       scripts/run_si_vmc.py [iterations] [save_path] [laplacian]

laplacian: forward (default) | default — pass "default" when
scripts/probe_forward_real.py FAILs on the current chip toolchain.
"""
import sys

import numpy as np

from aiqmc_tpu import train as train_lib
from aiqmc_tpu import config as config_lib

iterations = int(sys.argv[1]) if len(sys.argv) > 1 else 3000
save_path = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/runs/si_vmc"
laplacian = sys.argv[3] if len(sys.argv) > 3 else "forward"

cfg = config_lib.default()
with cfg.unlocked():
    cfg.system.atoms = np.zeros((1, 3))
    cfg.system.charges = np.array([14.0])
    # 3P ground state: (8 up, 6 down).
    cfg.system.spins = np.concatenate([np.ones(8), -np.ones(6)])
    cfg.batch_size = 1024
    cfg.network.hidden_dims = ((128, 32),) * 4
    cfg.network.hidden_dims_ynlm = (16, 16, 16, 16)
    cfg.network.determinants = 8
    cfg.optim.optimizer = "kfac"
    cfg.optim.laplacian = laplacian
    cfg.optim.iterations = iterations
    # First attempt (runs/si_vmc, seed 43, lr 0.05) reached -288.6 Ha at
    # iteration 1500 (exact -289.36) then diverged through finite steps at
    # ~1806 (batch variance 150 -> 5000 Ha^2, non-variational plunge to
    # -700 Ha). Remedies: halved LR + the statistical step-rejection guard
    # (optim/guard.py), which rolls back variance-explosion steps.
    cfg.optim.kfac.lr.rate = 0.025
    cfg.optim.kfac.lr.delay = 2000.0
    cfg.optim.guard.enable = True
    cfg.optim.guard.warmup = 400
    cfg.pretrain.iterations = 1000
    cfg.pretrain.target = "uhf"
    cfg.pretrain.basis = "even_tempered"
    cfg.mcmc.tstep = 0.02      # heavy nucleus: small steps
    cfg.mcmc.steps = 10
    cfg.mcmc.burn_in = 300
    cfg.log.save_path = save_path
    cfg.log.save_frequency = 10.0
    cfg.debug.deterministic = True
    cfg.debug.seed = 43

result = train_lib.train(cfg)
tail = result.energies[-max(1, iterations // 5):]
# Si references: UHF limit -288.854 Ha, exact -289.359 Ha.
print("FINAL tail mean %.5f +- %.5f Ha over %d iters (Si all-electron)"
      % (tail.mean(), tail.std() / np.sqrt(len(tail)), len(tail)))
print("ckpt:", result.ckpt_save_path)
