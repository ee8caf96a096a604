"""Frozen-eval AD-SWCT interatomic forces on the trained C2 trial.

Rebuilds the EXACT config of scripts/run_c2_ccecp_kfac.py (geometry
2.348 a0, (128,32)x4, 8 dets — eval_forces.py's bare get_config() would
restore fine but evaluate at the default 2.0 a0 geometry with a trial
trained at 2.348, which is physically wrong), freezes the parameters and
logs the AD-SWCT force estimator (aiqmc_tpu/forces.py; beyond the
reference, whose SWCT machinery only evaluates displaced-geometry
energies). At the experimental equilibrium bond (re = 2.348 a0) the axial
force on each atom should vanish within the estimator's error + the
trial's finite-optimisation bias; the transverse components vanish by
symmetry (they diagnose estimator noise).

Usage: JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache \
       PYTHONPATH=/root/repo:/root/.axon_site python -u \
       scripts/run_c2_forces.py [restore_dir] [iters] [batch] [save] [bond]
"""
import sys

import numpy as np

from aiqmc_tpu import train as train_lib
from aiqmc_tpu.configs import c2_ccecp
from aiqmc_tpu.utils import analysis_tools, statistics

restore = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/runs/c2_kfac"
iters = int(sys.argv[2]) if len(sys.argv) > 2 else 400
batch = int(sys.argv[3]) if len(sys.argv) > 3 else 1024
save = sys.argv[4] if len(sys.argv) > 4 else "/root/repo/runs/c2_forces"
bond = float(sys.argv[5]) if len(sys.argv) > 5 else 2.348
lap_chunk = int(sys.argv[6]) if len(sys.argv) > 6 else 2
force_mode = sys.argv[7] if len(sys.argv) > 7 else "rev"

cfg = c2_ccecp.get_config(bond_length=bond)
with cfg.unlocked():
    cfg.batch_size = batch
    # The force vjp reverse-differentiates through the batched-tangent
    # kinetic; unchunked, its third-derivative residuals dominate compile-
    # time HBM (~21G batch-independent — 37.4G at batch 1024 / 25.2G at
    # 256 both OOM the 15.75G v5e, runs/c2_forces_r5{b,d}.log).
    # laplacian_chunk scans the per-electron tangent loop, shrinking the
    # residuals proportionally. 0 disables.
    cfg.optim.laplacian_chunk = lap_chunk or None
    cfg.network.hidden_dims = ((128, 32),) * 4
    cfg.network.hidden_dims_ynlm = (16, 16, 16, 16)
    cfg.network.determinants = 8
    cfg.optim.optimizer = "none"
    cfg.optim.iterations = iters
    cfg.pretrain.iterations = 0
    cfg.mcmc.burn_in = 200
    cfg.observables.forces = True
    cfg.observables.forces_mode = force_mode  # "fwd" = per-coordinate jvp
                                              # (no 21G reverse residuals)
    cfg.log.restore_path = restore
    cfg.log.restore_use_ema = True
    cfg.log.restore_resize = True   # walker population resize on restore
    cfg.log.save_path = save
    cfg.log.stats_frequency = 1
    cfg.log.save_frequency = 1e9

result = train_lib.train(cfg)
e = result.energies
e = e[np.isfinite(e)]
print("FROZEN ENERGY %.5f +- %.5f Ha over %d iters"
      % (e.mean(), e.std() / np.sqrt(len(e)), len(e)))

stats = analysis_tools.read_train_stats(f"{result.ckpt_save_path}/train_states.csv")
burn = len(stats["energy"]) // 5
for a in range(2):
    comps = []
    for d in "xyz":
        v = stats[f"force_{a}_{d}"][burn:]
        v = v[np.isfinite(v)]
        err = statistics.blocked_error(v)
        comps.append("F_%s = %+.5f +- %.5f" % (d, v.mean(), err))
    print(f"FORCES atom {a}: " + "  ".join(comps) + " Ha/a0")
