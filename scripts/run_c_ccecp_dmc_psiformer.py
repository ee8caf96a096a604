"""DMC on the C ccECP atom from a PsiFormer VMC trial (arm D follow-up).

Mirrors scripts/run_c_ccecp_dmc_big.py but rebuilds the attention ansatz
(driver.main network= override) so the psiformer checkpoint's param tree
restores. Sizing must match scripts/run_c_ccecp_psiformer.py.

Usage: JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache \
       PYTHONPATH=/root/repo:/root/.axon_site python -u \
       scripts/run_c_ccecp_dmc_psiformer.py <vmc_ckpt_dir> [blocks] [iters] [save] [tau]
"""
import sys

import numpy as np

from aiqmc_tpu import train as train_lib
from aiqmc_tpu.configs import c_atom_ccecp as c
from aiqmc_tpu.dmc import driver

restore = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/runs/c_psiformer"
nblocks = int(sys.argv[2]) if len(sys.argv) > 2 else 60
iters = int(sys.argv[3]) if len(sys.argv) > 3 else 40
save = sys.argv[4] if len(sys.argv) > 4 else "/root/repo/runs/c_dmc_psiformer"
tstep = float(sys.argv[5]) if len(sys.argv) > 5 else 0.02

from aiqmc_tpu import checkpoint as ckpt_lib
use_ema = ckpt_lib.has_ema(restore)
print("trial dir:", restore, "use_ema:", use_ema)

# Trial built through the SAME config path as the VMC run (a hand-rolled
# make_psiformer call here once diverged on rescale_inputs, whose default
# differs from the config's — same param tree, different wavefunction).
spins = np.array([1.0, 1.0, 1.0, -1.0])
cfg = c.get_config()
with cfg.unlocked():
    cfg.system.spins = spins
    cfg.network.network_type = "psiformer"
    cfg.network.psiformer.num_layers = 4
    cfg.network.psiformer.num_heads = 4
    cfg.network.psiformer.heads_dim = 32
    cfg.network.psiformer.mlp_hidden_dims = (256,)
    cfg.network.determinants = 16
network = train_lib.network_from_config(cfg)

energies, data, weights = driver.main(
    use_ema=use_ema, network=network,
    atoms=np.zeros((1, 3)), charges=np.array([4.0]), spins=spins,
    tstep=tstep, nelectrons=4, nsteps=10, natoms=1, ndim=3,
    batch_size=2048, iterations=iters, nblocks=nblocks, feedback=1.0,
    nspins=(3, 1), save_path=save, restore_path=restore,
    Rn_local=c.RN_LOCAL, Local_coes=c.LOCAL_COES, Local_exps=c.LOCAL_EXPS,
    Rn_non_local=c.RN_NON_LOCAL, Non_local_coes=c.NON_LOCAL_COES,
    Non_local_exps=c.NON_LOCAL_EXPS, list_l=2, use_tmoves=True,
    quadrature="icosahedral12")

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
