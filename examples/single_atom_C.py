"""Single C atom with the ccECP pseudopotential — the reference's canonical
example, through the reference-keyword API
(ref AIQMCrelease3/example/single_atom_C/single_atom_C.py:1-46).

For the config-driven equivalent see aiqmc_tpu/configs/c_atom_ccecp.py and
scripts/run_c_ccecp_kfac2.py (the production-quality run).
"""
import numpy as np

from aiqmc_tpu.train import main

structure = np.array([[10.0, 0, 0], [0, 10.0, 0], [0, 0, 10.0]])
atoms = np.array([[0.0, 0.0, 0.0]])
charges = np.array([4.0])
spins = np.array([1.0, -1.0, 1.0, -1.0])

Rn_local = np.array([[1.0, 3.0, 2.0]])
Local_coes = np.array([[4.00000, 57.74008, -25.81955]])
Local_exps = np.array([[14.43502, 8.39889, 7.38188]])
Rn_non_local = np.array([[[2.0, 2.0], [2.0, 2.0], [2.0, 2.0]]])
Non_local_coes = np.array([[[52.13345, 0], [0, 0], [0, 0]]])
Non_local_exps = np.array([[[7.76079, 0], [0, 0], [0, 0]]])

output = main(atoms=atoms,
              charges=charges,
              spins=spins,
              nelectrons=4,
              natoms=1,
              ndim=3,
              batch_size=256,
              iterations=200,
              tstep=0.25,
              nspins=(2, 2),
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
