"""Frozen (optimizer=none) eval of a C-ccECP flagship-class checkpoint.

The honest check for any continuation arm that descends BELOW the parent
plateau (SPRING probe 1 drifted to -5.51 by fitting batch noise — its
training-time energies were NOT variational): re-evaluate the final params
with frozen weights on a fresh equilibrated walker population. A real
improvement survives; noise-fitting evaporates.

Usage: ... eval_frozen_c.py <restore_dir> [iters] [batch] [h_stream] [width]
       [dets] [laplacian] [ema]

ema: raw (default) | ema — "ema" evaluates the Polyak-averaged trial from the
checkpoint extras (log.restore_use_ema), the same params DMC consumes.
"""
import sys

import numpy as np

from aiqmc_tpu import train as train_lib
from aiqmc_tpu.configs import c_atom_ccecp

restore = sys.argv[1]
iters = int(sys.argv[2]) if len(sys.argv) > 2 else 600
batch = int(sys.argv[3]) if len(sys.argv) > 3 else 1024
h_stream = sys.argv[4] if len(sys.argv) > 4 else "ferminet"
width = int(sys.argv[5]) if len(sys.argv) > 5 else 256
dets = int(sys.argv[6]) if len(sys.argv) > 6 else 16
laplacian = sys.argv[7] if len(sys.argv) > 7 else "forward"
use_ema = (sys.argv[8] if len(sys.argv) > 8 else "raw") == "ema"

cfg = c_atom_ccecp.get_config()
with cfg.unlocked():
    cfg.system.spins = np.array([1.0, 1.0, 1.0, -1.0])
    cfg.batch_size = batch
    cfg.network.hidden_dims = ((width, 32),) * 4
    cfg.network.h_stream = h_stream
    cfg.network.hidden_dims_ynlm = (16, 16, 16, 16)
    cfg.network.determinants = dets
    cfg.system.pp.quadrature = "icosahedral12"
    cfg.optim.optimizer = "none"
    cfg.optim.laplacian = laplacian
    cfg.optim.iterations = iters
    cfg.pretrain.iterations = 0
    cfg.mcmc.tstep = 0.25
    cfg.mcmc.steps = 10
    cfg.mcmc.burn_in = 400
    cfg.log.restore_path = restore
    cfg.log.restore_resize = True
    cfg.log.restore_use_ema = use_ema
    cfg.log.save_path = "/root/repo/runs/eval_" + restore.rstrip("/").split("/")[-1]
    cfg.log.save_frequency = 1e9

result = train_lib.train(cfg)
e = result.energies
e = e[np.isfinite(e)]
tail = e[len(e) // 5:]
print("FROZEN EVAL %s: %.5f +- %.5f Ha over %d iters"
      % (restore, tail.mean(), tail.std() / np.sqrt(len(tail)), len(tail)))
