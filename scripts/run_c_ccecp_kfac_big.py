"""Flagship trial: C atom ccECP VMC at published-FermiNet capacity.

Sized to a session: 12000 iterations at ~0.55 it/s on one v5e chip (~6 h);
same LR schedule as runs/c_kfac5 so the capacity effect is isolated.

(256,32)x4 h-stream, 16 determinants, batch 2048, native KFAC, ECP-RHF
pretraining — the capacity at which published FermiNet-class VMC reaches
-5.4254 Ha (exact/DMC -5.434). Round-1 result with the half-size net
((128,32)x4 / 8 det, runs/c_kfac5) plateaued at -5.41020(17); the ~19 mHa DMC
residual was shown to be fixed-node error of that trial (BASELINE.md tau
study), so this bigger trial is what closes it.

Usage: JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache \
       PYTHONPATH=/root/repo python -u \
       scripts/run_c_ccecp_kfac_big.py [iterations] [save_path]
"""
import sys

import numpy as np

from aiqmc_tpu import train as train_lib
from aiqmc_tpu.configs import c_atom_ccecp

iterations = int(sys.argv[1]) if len(sys.argv) > 1 else 12000
save_path = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/runs/c_kfac_big"
# Optional lr-schedule overrides. Motivation (BASELINE.md round-2 tail): the
# 67k-iteration plateau moved only 1.7 mHa in 55k iterations at delay=3000 —
# an lr-starvation test is a cheap continuation with delay=10000 (the
# upstream-FermiNet schedule: 3x the lr at t=67k). If the energy breaks below
# the plateau within a few-k iterations, the round-2 gap was schedule-level.
lr_rate = float(sys.argv[3]) if len(sys.argv) > 3 else 0.05
lr_delay = float(sys.argv[4]) if len(sys.argv) > 4 else 3000.0
# Optional restore dir: lets an experiment arm branch off the main campaign
# checkpoints into its own save_path (restore scans save_path FIRST, so an
# arm dir that already has checkpoints continues itself).
restore_path = sys.argv[5] if len(sys.argv) > 5 else ""

cfg = c_atom_ccecp.get_config()
with cfg.unlocked():
    # Triplet 3P ground state: (3 up, 1 down) valence electrons.
    cfg.system.spins = np.array([1.0, 1.0, 1.0, -1.0])
    cfg.batch_size = 2048
    cfg.network.hidden_dims = ((256, 32),) * 4
    cfg.network.hidden_dims_ynlm = (16, 16, 16, 16)
    cfg.network.determinants = 16
    cfg.optim.optimizer = "kfac"
    cfg.optim.laplacian = "forward"
    # msc50 OOMs at this capacity (16.21G > 15.75G HBM: f32[128,200,4,256]
    # quadrature gathers in the loss JVP); the 12-pt icosahedral rule is
    # measured estimator-identical (BASELINE.md) at 1/4 the memory and cost.
    cfg.system.pp.quadrature = "icosahedral12"
    cfg.optim.iterations = iterations
    cfg.optim.kfac.lr.rate = lr_rate
    cfg.optim.kfac.lr.delay = lr_delay
    # Polyak average over ~1k recent iterates: the DMC stage evaluates the
    # averaged trial (run_c_ccecp_dmc_big.py auto-detects it).
    cfg.optim.ema_decay = 0.999
    cfg.pretrain.iterations = 1000
    cfg.mcmc.tstep = 0.25
    cfg.mcmc.steps = 10
    cfg.mcmc.burn_in = 200
    cfg.log.save_path = save_path
    if restore_path:
        cfg.log.restore_path = restore_path
    cfg.log.save_frequency = 10.0
    cfg.debug.deterministic = True
    cfg.debug.seed = 29

result = train_lib.train(cfg)
tail = result.energies[-max(1, iterations // 5):]
print("FINAL tail mean %.5f +- %.5f Ha over %d iters"
      % (tail.mean(), tail.std() / np.sqrt(len(tail)), len(tail)))
print("ckpt:", result.ckpt_save_path)
