"""Homogeneous electron gas showcase (BASELINE row for the multiwave envelope).

14 unpolarised electrons in a simple-cubic cell at Wigner-Seitz radius rs
(ref ferminet/configs/heg.py; envelope ref ferminet/pbc/envelopes.py:31-76):
the Gamma-point closed shell (1 + 6 plane waves per spin), multiwave Bloch
envelope, Ewald with neutralising background, static structure factor S(k) on.

Internal oracle printed alongside: the EXACT Hartree-Fock energy of the
Gamma plane-wave determinant for this finite cell,
    E_HF = 2 sum_occ k^2/2  -  (2 pi / V) * 2 * sum_{k != k' occ} 1/|k-k'|^2
           + (N/2) * xi,
with xi the Ewald Madelung constant of the cell (Fraser et al., PRB 53, 1814
(1996)); the trained VMC energy must land BELOW it by the correlation energy
(thermodynamic-limit scale ~0.06 Ha/electron at rs=1).

Usage: JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache \
       PYTHONPATH=/root/repo:/root/.axon_site python -u \
       scripts/run_heg.py [iterations] [save_path] [rs] [laplacian] [batch] \
           [pretrain_iters]

pretrain_iters (default 500): Gamma plane-wave closed-shell pretraining
(aiqmc_tpu/pretrain.py make_planewave_targets); only applies to fresh
starts — restores skip pretraining.

laplacian: default | forward — pass "forward" only while
scripts/probe_forward_real.py passes on the current chip toolchain.
"""
import sys

import numpy as np

from aiqmc_tpu import train as train_lib
from aiqmc_tpu.configs import heg

iterations = int(sys.argv[1]) if len(sys.argv) > 1 else 5000
save_path = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/runs/heg_rs1"
rs = float(sys.argv[3]) if len(sys.argv) > 3 else 1.0
laplacian = sys.argv[4] if len(sys.argv) > 4 else "forward"
batch = int(sys.argv[5]) if len(sys.argv) > 5 else 2048
pretrain_iters = int(sys.argv[6]) if len(sys.argv) > 6 else 500

NELEC = 14
cfg = heg.get_config(rs=rs, nelec=NELEC)
lattice = np.asarray(cfg.system.structure)
cell_l = float(lattice[0, 0])

with cfg.unlocked():
    cfg.batch_size = batch
    cfg.network.hidden_dims = ((128, 32),) * 3
    cfg.network.hidden_dims_ynlm = (16, 16, 16)
    cfg.network.determinants = 4
    cfg.network.pbc_smooth_r = True
    cfg.optim.optimizer = "kfac"
    cfg.optim.iterations = iterations
    cfg.optim.laplacian = laplacian
    cfg.optim.kfac.lr.rate = 0.05
    cfg.optim.kfac.lr.delay = 3000.0
    cfg.mcmc.tstep = 0.2
    cfg.mcmc.steps = 10
    cfg.mcmc.burn_in = 300
    cfg.mcmc.init_width = cell_l  # spread walkers over the whole cell
    # Gamma closed-shell plane-wave pretraining (skipped automatically on
    # restore): without it the ansatz starts ~7 Ha above the HF anchor and
    # KFAC descends at ~0.2 mHa/iter (round-5 flatline, BASELINE.md).
    cfg.pretrain.iterations = pretrain_iters
    cfg.pretrain.target = "planewave"
    # Adam at the molecular default (3e-4) underfits the closed shell in a
    # session-scale budget; 1e-3 measured to cut the orbital MSE ~20x by
    # 600 iterations (round-5 CPU validation).
    cfg.pretrain.learning_rate = 1e-3
    cfg.observables.structure_factor = True
    cfg.observables.structure_factor_nmax = 3
    cfg.log.save_path = save_path
    cfg.log.save_frequency = 10.0
    cfg.debug.deterministic = True
    cfg.debug.seed = 47


def hf_gamma_energy() -> float:
    """Exact plane-wave HF energy of the Gamma closed shell in this cell."""
    import itertools

    from aiqmc_tpu.pbc import ewald

    rec = 2 * np.pi * np.linalg.inv(lattice).T
    grid = np.array(list(itertools.product(range(-2, 3), repeat=3)))
    ks = grid @ rec
    order = np.argsort(np.einsum("ij,ij->i", ks, ks), kind="stable")
    occ = ks[order[: NELEC // 2]]  # 1 + 6: closed shell at Gamma
    volume = abs(np.linalg.det(lattice))
    kinetic = 2.0 * 0.5 * float(np.einsum("ij,ij->", occ, occ))
    dk = occ[:, None, :] - occ[None, :, :]
    q2 = np.einsum("ijk,ijk->ij", dk, dk)
    inv_q2 = np.where(q2 > 1e-12, 1.0 / np.where(q2 > 1e-12, q2, 1.0), 0.0)
    exchange = -(2.0 * np.pi / volume) * 2.0 * float(np.sum(inv_q2))
    _, madelung = ewald.make_ewald_sum(lattice, truncation_limit=5)
    return kinetic + exchange + 0.5 * NELEC * float(madelung)


e_hf = hf_gamma_energy()
print("cell L = %.4f bohr, rs = %.2f, N = %d" % (cell_l, rs, NELEC))
print("HF anchor (Gamma plane-wave determinant): %.5f Ha (%.5f Ha/electron)"
      % (e_hf, e_hf / NELEC))

result = train_lib.train(cfg)
tail = result.energies[-max(1, iterations // 5):]
mean = tail.mean()
err = tail.std() / np.sqrt(len(tail))
print("FINAL tail mean %.5f +- %.5f Ha (%.5f Ha/electron) over %d iters"
      % (mean, err, mean / NELEC, len(tail)))
print("correlation recovered vs HF: %.2f mHa (%.2f mHa/electron)"
      % (1000 * (e_hf - mean), 1000 * (e_hf - mean) / NELEC))
print("S(k) artifact: %s/structure_factor.npz" % result.ckpt_save_path)
