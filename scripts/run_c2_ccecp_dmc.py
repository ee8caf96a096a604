"""C2 dimer ccECP DMC from the run_c2_ccecp_kfac.py trial — the reference's
own committed DMC example IS C2 (ref AIQMCrelease2/example/C2/restore_DMC/
DMC_states.csv: blocks -4.12, -4.10 Ha — an unconverged transient at the
wrong scale; 8 valence electrons sit near -11 Ha), so a converged C2 DMC
number completes BASELINE config #4 on the reference's flagship molecule.

The trial is rebuilt through train.network_from_config (bit-identical to the
VMC training network; hand-rolled rebuilds silently diverge on behaviour
flags — see the diamond DMC NaN post-mortem in BASELINE.md).

Usage: JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache \
       PYTHONPATH=/root/repo:/root/.axon_site python -u \
       scripts/run_c2_ccecp_dmc.py <vmc_ckpt_dir> [blocks] [iters] [save] \
           [tau] [laplacian] [bond] [batch]

batch: DMC walker population. Default 1024 — the 2026-08-19 batch-2048
attempt OOM'd at COMPILE time (forward-Laplacian temps: 17.97G needed vs
15.75G HBM on v5e; 8 valence electrons x 24 tangent dirs is 2x the C-atom
program).

bond MUST match the VMC run's geometry (run_c2_ccecp_kfac.py default
2.348 bohr equilibrium; the reference example used a compressed 2.0).

laplacian: default | forward — "forward" (~2x E_L) only after
scripts/probe_forward_real.py passes on the current chip toolchain.
"""
import sys

import numpy as np

from aiqmc_tpu import train as train_lib
from aiqmc_tpu.configs import c2_ccecp
from aiqmc_tpu.dmc import driver

restore = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/runs/c2_kfac"
nblocks = int(sys.argv[2]) if len(sys.argv) > 2 else 60
iters = int(sys.argv[3]) if len(sys.argv) > 3 else 40
save = sys.argv[4] if len(sys.argv) > 4 else "/root/repo/runs/c2_dmc"
tstep = float(sys.argv[5]) if len(sys.argv) > 5 else 0.02
laplacian = sys.argv[6] if len(sys.argv) > 6 else "default"
bond = float(sys.argv[7]) if len(sys.argv) > 7 else 2.348
batch = int(sys.argv[8]) if len(sys.argv) > 8 else 1024

# Auto-detect Polyak-averaged params (cfg.optim.ema_decay > 0 in the VMC run).
from aiqmc_tpu import checkpoint as ckpt_lib
use_ema = ckpt_lib.has_ema(restore)
print("trial dir:", restore, "use_ema:", use_ema)

# Sizing + geometry mirror scripts/run_c2_ccecp_kfac.py.
cfg = c2_ccecp.get_config(bond_length=bond)
with cfg.unlocked():
    cfg.network.hidden_dims = ((128, 32),) * 4
    cfg.network.hidden_dims_ynlm = (16, 16, 16, 16)
    cfg.network.determinants = 8
network = train_lib.network_from_config(cfg)

atoms = np.asarray(cfg.system.atoms)
charges = np.asarray(cfg.system.charges)
spins = np.asarray(cfg.system.spins)
pp = cfg.system.pp
energies, data, weights = driver.main(
    use_ema=use_ema, network=network,
    atoms=atoms, charges=charges, spins=spins,
    tstep=tstep, nelectrons=spins.size, nsteps=10, natoms=2, ndim=3,
    batch_size=batch, iterations=iters, nblocks=nblocks, feedback=1.0,
    nspins=(4, 4), save_path=save, restore_path=restore, save_frequency=10.0,
    Rn_local=np.asarray(pp.rn_local), Local_coes=np.asarray(pp.local_coes),
    Local_exps=np.asarray(pp.local_exps),
    Rn_non_local=np.asarray(pp.rn_non_local),
    Non_local_coes=np.asarray(pp.non_local_coes),
    Non_local_exps=np.asarray(pp.non_local_exps), list_l=2, use_tmoves=True,
    quadrature="icosahedral12", laplacian=laplacian)

e = np.asarray(energies)
half = e[len(e) // 2:]
print("DMC blocks:", np.array2string(e, precision=4))
print("FINAL second-half mean %.5f +- %.5f Ha"
      % (half.mean(), half.std() / np.sqrt(len(half))))
from aiqmc_tpu.utils.analysis_tools import robust_block_stats
rs = robust_block_stats(half)
print("FINAL robust second-half %.5f +- %.5f Ha (median %.5f, %d/%d kept)"
      % (rs["mean"], rs["stderr"], rs["median"], rs["nblocks"], len(half)))
