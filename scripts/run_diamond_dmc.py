"""Fixed-phase DMC on the diamond ccECP cell from a (possibly twisted)
complex-pairs VMC trial — beyond the reference (its DMC is real molecular,
ref AIQMCrelease3/DMC/main_dmc.py); this makes BASELINE config #5 a
DMC-comparable number.

The trial network sizing/twist MUST match the VMC run that produced the
checkpoint (scripts/run_diamond_ccecp.py). Branching uses Re E_L (the
fixed-phase effective energy), T-moves act about nearest-image atoms
(Casula scheme, Re-psi-ratio amplitudes), and phase_kill is off for
complex-pair trials (smooth phase, no nodes).

Usage: JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache \
       PYTHONPATH=/root/repo:/root/.axon_site python -u \
       scripts/run_diamond_dmc.py <vmc_ckpt_dir> [tx ty tz] [blocks] [iters] \
           [save] [tau] [laplacian]

laplacian: default | forward — pass "forward" (~2x E_L, which DMC evaluates
twice per step) ONLY after scripts/probe_forward_pair.py passes on the
current chip toolchain.
"""
import sys

import numpy as np

from aiqmc_tpu import train as train_lib
from aiqmc_tpu.configs import diamond_ccecp
from aiqmc_tpu.dmc import driver

restore = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/runs/diamond_twist_a"
tw = (tuple(float(x) for x in sys.argv[2:5])
      if len(sys.argv) > 4 else (0.25, 0.25, 0.25))
nblocks = int(sys.argv[5]) if len(sys.argv) > 5 else 60
iters = int(sys.argv[6]) if len(sys.argv) > 6 else 40
save = sys.argv[7] if len(sys.argv) > 7 else "/root/repo/runs/diamond_dmc"
tstep = float(sys.argv[8]) if len(sys.argv) > 8 else 0.01
laplacian = sys.argv[9] if len(sys.argv) > 9 else "default"

# Config overrides mirror scripts/run_diamond_ccecp.py; the network itself is
# built by train.network_from_config so the trial is BIT-IDENTICAL to the one
# the VMC checkpoint was trained on (a hand-rolled make_ai_net call here once
# silently diverged on bounded_envelope/regular_harmonics -> NaN DMC).
cfg = diamond_ccecp.get_config()
with cfg.unlocked():
    cfg.network.hidden_dims = ((64, 16),) * 3
    cfg.network.hidden_dims_ynlm = (16, 16, 16)
    cfg.network.determinants = 4
    cfg.network.pbc_smooth_r = True
    cfg.system.twist = tw
    if any(t != 0.0 for t in tw):
        cfg.network.complex_orbitals = True
        cfg.network.complex_pairs = True
spins = np.asarray(cfg.system.spins)
nel = spins.size
atoms = np.asarray(cfg.system.atoms)
charges = np.asarray(cfg.system.charges)
lattice = np.asarray(cfg.system.structure)
network = train_lib.network_from_config(cfg)

pp = cfg.system.pp
energies, data, weights = driver.main(
    network=network, atoms=atoms, charges=charges, spins=spins,
    tstep=tstep, nelectrons=nel, nsteps=10, natoms=2, ndim=3,
    batch_size=1024, iterations=iters, nblocks=nblocks, feedback=1.0,
    nspins=(4, 4), save_path=save, restore_path=restore,
    save_frequency=10.0, Rn_local=np.asarray(pp.rn_local),
    Local_coes=np.asarray(pp.local_coes),
    Local_exps=np.asarray(pp.local_exps),
    Rn_non_local=np.asarray(pp.rn_non_local),
    Non_local_coes=np.asarray(pp.non_local_coes),
    Non_local_exps=np.asarray(pp.non_local_exps), list_l=2,
    quadrature="icosahedral12", lattice=lattice,
    # Follow the trial's representation: at Gamma (tw all-zero) the network
    # is REAL (sign output) — fixed-node DMC with phase_kill on — while any
    # nonzero twist builds the complex-pairs trial (fixed-phase branch).
    complex_output=bool(cfg.network.complex_orbitals),
    pair_output=bool(cfg.network.complex_pairs),
    laplacian=laplacian, twist=tw if any(t != 0.0 for t in tw) else None)

e = np.asarray(energies)
half = e[len(e) // 2:]
print("DMC blocks:", np.array2string(e, precision=4))
print("FINAL second-half mean %.5f +- %.5f Ha/cell (twist %s)"
      % (half.mean(), half.std() / np.sqrt(len(half)), (tw,)))
from aiqmc_tpu.utils.analysis_tools import robust_block_stats
rs = robust_block_stats(half)
print("FINAL robust second-half %.5f +- %.5f Ha (median %.5f, %d/%d kept)"
      % (rs["mean"], rs["stderr"], rs["median"], rs["nblocks"], len(half)))
