"""DMC on the C ccECP atom from the FLAGSHIP (256,32)x4 / 16-det VMC trial
(runs/c_kfac_big) — BASELINE config #4 at published-FermiNet trial capacity.

Round 1 showed the ~19 mHa DMC residual of the half-size trial is pure
fixed-node error (tau 0.01 vs 0.02 statistically identical); this rerun from
the bigger trial is the close-the-gap measurement (exact ccECP C: -5.434 Ha).

Usage: JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache \
       PYTHONPATH=/root/repo:/root/.axon_site python -u \
       scripts/run_c_ccecp_dmc_big.py <vmc_ckpt_dir> [blocks] [iters] [save] \
           [tau] [h_stream] [laplacian] [determinants] [width]

h_stream must match the trial's VMC script: "ainet" (run_c_ccecp_kfac_big)
or "ferminet" (run_c_ccecp_kfac_fstream).
laplacian: default | forward — "forward" (~2x E_L) only after
scripts/probe_forward_real.py passes on the current chip toolchain.
determinants/width (defaults 16/256) must match the VMC trial's sizing
(run_c_ccecp_kfac_fstream.py argvs) or the restore will fail.
"""
import sys

import numpy as np

from aiqmc_tpu import train as train_lib
from aiqmc_tpu.configs import c_atom_ccecp as c
from aiqmc_tpu.dmc import driver

restore = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/runs/c_kfac_big"
nblocks = int(sys.argv[2]) if len(sys.argv) > 2 else 60
iters = int(sys.argv[3]) if len(sys.argv) > 3 else 40
save = sys.argv[4] if len(sys.argv) > 4 else "/root/repo/runs/c_dmc_big"
tstep = float(sys.argv[5]) if len(sys.argv) > 5 else 0.02
h_stream = sys.argv[6] if len(sys.argv) > 6 else "ainet"
laplacian = sys.argv[7] if len(sys.argv) > 7 else "default"
determinants = int(sys.argv[8]) if len(sys.argv) > 8 else 16
width = int(sys.argv[9]) if len(sys.argv) > 9 else 256

# Auto-detect Polyak-averaged params: if the VMC run tracked an EMA
# (cfg.optim.ema_decay > 0), run DMC from the averaged trial.
from aiqmc_tpu import checkpoint as ckpt_lib
use_ema = ckpt_lib.has_ema(restore)
print("trial dir:", restore, "use_ema:", use_ema)

# Trial built through the SAME config path as the VMC run (sizing mirrors
# run_c_ccecp_kfac_big / run_c_ccecp_kfac_fstream) so every behaviour flag —
# not just the param tree — matches the checkpoint.
cfg = c.get_config()
with cfg.unlocked():
    cfg.system.spins = np.array([1.0, 1.0, 1.0, -1.0])
    cfg.network.hidden_dims = ((width, 32),) * 4
    cfg.network.hidden_dims_ynlm = (16, 16, 16, 16)
    cfg.network.determinants = determinants
    cfg.network.h_stream = h_stream
network = train_lib.network_from_config(cfg)

energies, data, weights = driver.main(
    use_ema=use_ema, network=network,
    atoms=np.zeros((1, 3)), charges=np.array([4.0]),
    spins=np.array([1.0, 1.0, 1.0, -1.0]),
    tstep=tstep, nelectrons=4, nsteps=10, natoms=1, ndim=3,
    batch_size=2048, iterations=iters, nblocks=nblocks, feedback=1.0,
    nspins=(3, 1), save_path=save, restore_path=restore,
    Rn_local=c.RN_LOCAL, Local_coes=c.LOCAL_COES, Local_exps=c.LOCAL_EXPS,
    Rn_non_local=c.RN_NON_LOCAL, Non_local_coes=c.NON_LOCAL_COES,
    Non_local_exps=c.NON_LOCAL_EXPS, list_l=2, use_tmoves=True,
    quadrature="icosahedral12", laplacian=laplacian)

e = np.asarray(energies)
half = e[len(e) // 2:]
print("DMC blocks:", np.array2string(e, precision=4))
print("FINAL second-half mean %.5f +- %.5f Ha (exact -5.434)"
      % (half.mean(), half.std() / np.sqrt(len(half))))
from aiqmc_tpu.utils.analysis_tools import robust_block_stats
rs = robust_block_stats(half)
print("FINAL robust second-half %.5f +- %.5f Ha (median %.5f, "
      "%d/%d blocks kept)" % (rs["mean"], rs["stderr"], rs["median"],
                              rs["nblocks"], len(half)))
