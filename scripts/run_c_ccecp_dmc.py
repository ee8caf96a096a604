"""DMC on the C ccECP atom from the VMC KFAC checkpoint (BASELINE #4).

T-moves on; network kwargs must match scripts/run_c_ccecp_kfac.py.
Exact ccECP C reference: -5.434 Ha (DMC).

Usage: JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache \
       PYTHONPATH=/root/repo:/root/.axon_site python -u \
       scripts/run_c_ccecp_dmc.py <vmc_ckpt_dir> [blocks] [iters_per_block]
"""
import sys

import numpy as np

from aiqmc_tpu.configs import c_atom_ccecp as c
from aiqmc_tpu.dmc import driver

restore = sys.argv[1]
nblocks = int(sys.argv[2]) if len(sys.argv) > 2 else 60
iters = int(sys.argv[3]) if len(sys.argv) > 3 else 40
save = sys.argv[4] if len(sys.argv) > 4 else "/tmp/c_ccecp_dmc"
tstep = float(sys.argv[5]) if len(sys.argv) > 5 else 0.02

energies, data, weights = driver.main(
    atoms=np.zeros((1, 3)), charges=np.array([4.0]),
    spins=np.array([1.0, 1.0, 1.0, -1.0]),
    tstep=tstep, nelectrons=4, nsteps=10, natoms=1, ndim=3,
    batch_size=2048, iterations=iters, nblocks=nblocks, feedback=1.0,
    nspins=(3, 1), save_path=save, restore_path=restore,
    Rn_local=c.RN_LOCAL, Local_coes=c.LOCAL_COES, Local_exps=c.LOCAL_EXPS,
    Rn_non_local=c.RN_NON_LOCAL, Non_local_coes=c.NON_LOCAL_COES,
    Non_local_exps=c.NON_LOCAL_EXPS, list_l=2, use_tmoves=True,
    network_kwargs=dict(
        hidden_dims=((128, 32),) * 4,
        hidden_dims_Ynlm=(16, 16, 16, 16), determinants=8,
        full_equivariance=True, complex_orbitals=False,
        bounded_envelope=True, regular_harmonics=True,
        # must match the VMC training network: runs/c_kfac4+ train with the
        # a-e cusp Jastrow disabled (wrong at ECP cores); pass
        # jastrow_ae=True only to restore from the older c_kfac2 checkpoint.
        jastrow_ae=(sys.argv[6].lower() == "true") if len(sys.argv) > 6 else False,
        h_stream=sys.argv[7] if len(sys.argv) > 7 else "ainet"))

e = np.asarray(energies)
half = e[len(e) // 2:]
print("DMC blocks:", np.array2string(e, precision=4))
print("FINAL second-half mean %.5f +- %.5f Ha (exact -5.434)"
      % (half.mean(), half.std() / np.sqrt(len(half))))
