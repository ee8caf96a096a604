"""Round-3 arm C: fresh flagship C ccECP with the upstream-FermiNet h-stream.

The 67k-iteration ainet-h-stream flagship plateaus at -5.41563(6) — ~10 mHa
above published FermiNet-class VMC (-5.4254) at matched capacity
((256,32)x4, 16 dets) — and the trajectory says continuation cannot close it
(BASELINE.md). The remaining structural differences to the published setup
are the h-stream (conv-reduce ainet vs the full FermiNet two-electron
stream), batch (2048 vs 4096) and the lr schedule (delay 3000 vs 10000).
This arm flips all three; a from-scratch run needs most of a round on one
chip (~0.3 it/s at batch 4096), so start it only after the cheap
lr-boost/SPRING arms have reported (ROADMAP.md round-3 plan).

Usage: JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache \
       PYTHONPATH=/root/repo:/root/.axon_site python -u \
       scripts/run_c_ccecp_kfac_fstream.py [iterations] [save_path] \
           [laplacian] [determinants] [width] [y_stream] [envelope]

laplacian: forward (default) | default — pass "default" when
scripts/probe_forward_real.py FAILs on the current chip toolchain.
determinants (default 16) / width (one-electron stream, default 256): the
structural levers once an arm plateaus (ROADMAP; published -5.4254 uses a
2x-wide net) — either changes the param tree, so pass a FRESH save_path
with them (restore would fail).
y_stream: on (default) | off — "off" removes the multiplicative Y_nlm
orbital factor entirely (round-4 ablation arm after BOTH the f-stream and
2x-wide trajectories extrapolated to asymptotes ~7 mHa above the published
-5.4254). Changes the param tree: fresh save_path.
envelope: pp_like (default, the reference's flexible-Gaussian form) or any
envelopes_zoo name — "isotropic" is the published-FermiNet envelope
(exp(-sigma*r) per orbital; the Gaussian pp_like tail cannot represent the
exponential valence decay, so this is the SECOND structural delta to the
published orbital form alongside Y_nlm). "off isotropic" together = the
exact published-FermiNet orbital form. Changes the param tree: fresh
save_path.
"""
import sys

import numpy as np

from aiqmc_tpu import train as train_lib
from aiqmc_tpu.configs import c_atom_ccecp

iterations = int(sys.argv[1]) if len(sys.argv) > 1 else 12000
save_path = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/runs/c_kfac_fstream"
laplacian = sys.argv[3] if len(sys.argv) > 3 else "forward"
determinants = int(sys.argv[4]) if len(sys.argv) > 4 else 16
width = int(sys.argv[5]) if len(sys.argv) > 5 else 256
y_stream = (sys.argv[6] if len(sys.argv) > 6 else "on") != "off"
envelope = sys.argv[7] if len(sys.argv) > 7 else "pp_like"

cfg = c_atom_ccecp.get_config()
with cfg.unlocked():
    cfg.system.spins = np.array([1.0, 1.0, 1.0, -1.0])
    cfg.batch_size = 4096
    cfg.network.hidden_dims = ((width, 32),) * 4
    cfg.network.hidden_dims_ynlm = (16, 16, 16, 16)
    cfg.network.determinants = determinants
    cfg.network.h_stream = "ferminet"
    cfg.network.y_stream = y_stream
    cfg.network.envelope_type = envelope
    cfg.optim.optimizer = "kfac"
    cfg.optim.laplacian = laplacian
    cfg.system.pp.quadrature = "icosahedral12"
    cfg.optim.iterations = iterations
    cfg.optim.kfac.lr.rate = 0.05
    cfg.optim.kfac.lr.delay = 10000.0   # upstream-FermiNet schedule
    cfg.optim.ema_decay = 0.999
    cfg.pretrain.iterations = 1000
    cfg.mcmc.tstep = 0.25
    cfg.mcmc.steps = 10
    cfg.mcmc.burn_in = 200
    cfg.log.save_path = save_path
    cfg.log.save_frequency = 10.0
    cfg.debug.deterministic = True
    cfg.debug.seed = 31

result = train_lib.train(cfg)
tail = result.energies[-max(1, iterations // 5):]
print("FINAL tail mean %.5f +- %.5f Ha over %d iters (fstream arm)"
      % (tail.mean(), tail.std() / np.sqrt(len(tail)), len(tail)))
print("ckpt:", result.ckpt_save_path)
