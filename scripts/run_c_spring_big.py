"""SPRING continuation of the flagship C ccECP trial (runs/c_kfac_big).

The KFAC flagship plateaus near -5.4155 Ha (exact -5.434; published
FermiNet-class VMC -5.4254) with sub-mHa gains per 10k iterations — the
residual is optimisation, not capacity (BASELINE.md). SPRING (optim/spring.py)
solves the natural gradient exactly in sample space each step, so continuing
the SAME trial wavefunction with SPRING is the sharpest test of whether the
plateau is a KFAC preconditioning limit.

Batch is dropped 2048 -> 1024 for the (B x P) jacobian: P ~ 9e5 at flagship
capacity, so O alone is ~3.7 GB at B=1024 (comfortably on-chip) vs ~7.4 GB at
B=2048 (OOM risk beside the solve). Restore handles the batch change via
cfg.log.restore_resize (walkers subsampled, then burn-in re-equilibrates).

Usage: JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache \
       PYTHONPATH=/root/repo:/root/.axon_site python -u \
       scripts/run_c_spring_big.py [iterations] [save_path] [restore_path]
"""
import sys

import numpy as np

from aiqmc_tpu import train as train_lib
from aiqmc_tpu.configs import c_atom_ccecp

extra_iters = int(sys.argv[1]) if len(sys.argv) > 1 else 8000
save_path = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/runs/c_spring_big"
restore_path = sys.argv[3] if len(sys.argv) > 3 else "/root/repo/runs/c_kfac_big"
# Optional hyperparameter overrides (probe arms). The 2026-08-17 probe
# (runs/c_spring_probe, damping 1e-3): 250 healthy plateau-tracking iters —
# the HIGHEST-precision fix holds on chip — then GRADUAL variance growth
# 0.02 -> 3 Ha^2 with non-variational drift: at a converged trial the
# residual is mostly batch noise and the lam=1e-3 sample-space solve fits
# it; continuation needs heavier damping.
damping = float(sys.argv[4]) if len(sys.argv) > 4 else 1e-3
lr_rate = float(sys.argv[5]) if len(sys.argv) > 5 else 0.01
mu = float(sys.argv[6]) if len(sys.argv) > 6 else 0.99
# Trial-architecture overrides: the 67k ainet c_kfac_big trial was lost
# in the 2026-08-19 box swap; surviving trials (artifacts/c_kfac_fstream,
# artifacts/c_kfac_wide) use the upstream-FermiNet h-stream.
h_stream = sys.argv[7] if len(sys.argv) > 7 else "ainet"
width = int(sys.argv[8]) if len(sys.argv) > 8 else 256

# cfg.optim.iterations counts ADDITIONAL steps from the restored t
# (train.py loops range(t_init, t_init + iterations)), so pass "extra"
# straight through; the restore resumes at the checkpoint's t by itself.
from aiqmc_tpu import checkpoint as ckpt_lib  # noqa: E402
last = (ckpt_lib.find_last_checkpoint(save_path)
        or ckpt_lib.find_last_checkpoint(restore_path))
t0 = 0
if last:
    import re
    m = re.search(r"(\d+)\.npz$", last)
    t0 = int(m.group(1)) + 1 if m else 0
iterations = extra_iters
print("resuming at t=%d -> training to %d" % (t0, t0 + iterations))

cfg = c_atom_ccecp.get_config()
with cfg.unlocked():
    # Must match runs/c_kfac_big exactly (param tree), except batch/optimizer.
    cfg.system.spins = np.array([1.0, 1.0, 1.0, -1.0])
    cfg.batch_size = 1024
    cfg.network.hidden_dims = ((width, 32),) * 4
    cfg.network.h_stream = h_stream
    cfg.network.hidden_dims_ynlm = (16, 16, 16, 16)
    cfg.network.determinants = 16
    cfg.system.pp.quadrature = "icosahedral12"
    cfg.optim.optimizer = "spring"
    cfg.optim.laplacian = "forward"
    cfg.optim.iterations = iterations
    # Continuation of a converged-ish trial: start gentler than cold-start
    # SPRING and keep the trust region tight.
    cfg.optim.spring.lr.rate = lr_rate
    cfg.optim.spring.lr.delay = 10000.0
    cfg.optim.spring.damping = damping
    cfg.optim.spring.mu = mu
    # Belt-and-braces after the 2026-08-17 divergence (fixed by HIGHEST-
    # precision O-matmuls in optim/spring.py): reject statistical outlier
    # steps instead of letting them compound. The probe-1 creep (variance
    # 0.02 -> 3 Ha^2, gradual) evades the relative tests, so also set an
    # absolute ceiling at ~10x the known KFAC plateau variance (0.023) and
    # engage early (this is a continuation, not a cold start).
    cfg.optim.guard.enable = True
    cfg.optim.guard.var_ceiling = 0.25
    cfg.optim.guard.warmup = 50
    cfg.pretrain.iterations = 0          # restoring, not cold-starting
    cfg.mcmc.tstep = 0.25
    cfg.mcmc.steps = 10
    cfg.mcmc.burn_in = 400               # re-equilibrate the subsampled batch
    cfg.log.save_path = save_path
    cfg.log.restore_path = restore_path
    cfg.log.restore_resize = True
    cfg.log.save_frequency = 10.0
    cfg.debug.deterministic = True
    cfg.debug.seed = 37

print("SPRING arm: damping=%g lr=%g mu=%g batch=%d h_stream=%s width=%d"
      % (damping, lr_rate, mu, cfg.batch_size, h_stream, width))
result = train_lib.train(cfg)
tail = result.energies[-max(1, iterations // 5):]
finite = tail[np.isfinite(tail) & (tail != 0.0)]
print("FINAL tail mean %.5f +- %.5f Ha over %d/%d finite iters (SPRING cont.)"
      % (finite.mean(), finite.std() / np.sqrt(max(1, len(finite))),
         len(finite), len(tail)))
print("ckpt:", result.ckpt_save_path)
