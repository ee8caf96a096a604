"""C2 dimer with ccECP pseudopotentials, reference-keyword API
(ref AIQMCrelease3/example/C2_muti_GPU/C2test.py:1-55).

On a multi-chip TPU slice the walker batch is sharded over the full device
mesh automatically (GSPMD 'data' axis) — no per-device bookkeeping needed.
The config-driven equivalent is aiqmc_tpu/configs/c2_ccecp.py.
"""
import numpy as np

from aiqmc_tpu.train import main

structure = np.array([[10.0, 0, 0], [0, 10.0, 0], [0, 0, 10.0]])
atoms = np.array([[0.0, 0.0, -1.0], [0.0, 0.0, 1.0]])
charges = np.array([4.0, 4.0])
spins = np.array([1.0, 1.0, 1.0, 1.0, -1.0, -1.0, -1.0, -1.0])

Rn_local = np.array([[1.0, 3.0, 2.0]] * 2)
Local_coes = np.array([[4.00000, 57.74008, -25.81955]] * 2)
Local_exps = np.array([[14.43502, 8.39889, 7.38188]] * 2)
Rn_non_local = np.array([[[2.0, 2.0], [2.0, 2.0], [2.0, 2.0]]] * 2)
Non_local_coes = np.array([[[52.13345, 0], [0, 0], [0, 0]]] * 2)
Non_local_exps = np.array([[[7.76079, 0], [0, 0], [0, 0]]] * 2)

output = main(atoms=atoms,
              charges=charges,
              spins=spins,
              nelectrons=8,
              natoms=2,
              ndim=3,
              batch_size=256,
              iterations=200,
              tstep=0.25,
              nspins=(4, 4),
              nsteps=5,
              list_l=2,
              save_path="save",
              restore_path=None,
              save_frequency=10.0,
              structure=structure,
              Rn_local=Rn_local,
              Local_coes=Local_coes,
              Local_exps=Local_exps,
              Rn_non_local=Rn_non_local,
              Non_local_coes=Non_local_coes,
              Non_local_exps=Non_local_exps)
print("final energies:", output.energies[-5:])
