"""Frozen-eval interatomic forces on a trained checkpoint.

Restores a trial, freezes the parameters (optimizer="none") and logs the
AD-SWCT force estimator (aiqmc_tpu/forces.py) every iteration via
cfg.observables.forces; prints per-atom force components with reblocked
error bars at the end. Beyond the reference: its SWCT machinery
(correlatedsamples/) evaluates displaced-geometry energies only.

Usage:
  PYTHONPATH=/root/repo python scripts/eval_forces.py \
      <config_module> <restore_dir> [iters] [batch] [save_dir]
  e.g. config_module = aiqmc_tpu.configs.c2_ccecp (any zoo/user module with
  get_config()).
CPU smoke:
  env JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= PYTHONPATH=/root/repo \
      python scripts/eval_forces.py aiqmc_tpu.configs.h4 "" 20 64 /tmp/f
  (empty restore_dir = random params; machinery check only.)
"""
import importlib
import sys

import numpy as np

from aiqmc_tpu import train as train_lib
from aiqmc_tpu.utils import analysis_tools, statistics

config_module = sys.argv[1]
restore = sys.argv[2]
iters = int(sys.argv[3]) if len(sys.argv) > 3 else 400
batch = int(sys.argv[4]) if len(sys.argv) > 4 else 1024
save = sys.argv[5] if len(sys.argv) > 5 else "/root/repo/runs/eval_forces"

cfg = importlib.import_module(config_module).get_config()
with cfg.unlocked():
    cfg.batch_size = batch
    cfg.optim.optimizer = "none"
    cfg.optim.iterations = iters
    cfg.pretrain.iterations = 0
    cfg.mcmc.burn_in = 200
    cfg.observables.forces = True
    cfg.log.restore_path = restore
    cfg.log.save_path = save
    cfg.log.stats_frequency = 1
    cfg.log.save_frequency = 1e9

result = train_lib.train(cfg)
e = result.energies
e = e[np.isfinite(e)]
print("FROZEN ENERGY %.5f +- %.5f Ha over %d iters"
      % (e.mean(), e.std() / np.sqrt(len(e)), len(e)))

stats = analysis_tools.read_train_stats(f"{result.ckpt_save_path}/train_states.csv")
natoms = len(np.asarray(cfg.system.atoms))
burn = len(stats["energy"]) // 5
for a in range(natoms):
    comps = []
    for d in "xyz":
        v = stats[f"force_{a}_{d}"][burn:]
        v = v[np.isfinite(v)]
        err = statistics.blocked_error(v)
        comps.append("%+.5f(%d)" % (v.mean(), max(1, round(err * 1e5))))
    print(f"FORCE atom {a}: " + "  ".join(comps) + "  Ha/a0")
