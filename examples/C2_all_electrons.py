"""All-electron C2 (12 electrons), reference-keyword API
(ref AIQMCrelease3/example/C2_muti_GPU_all_electrons/*): omitting the
pseudopotential tables selects the bare-Coulomb Hamiltonian."""
import numpy as np

from aiqmc_tpu.train import main

atoms = np.array([[0.0, 0.0, -1.0], [0.0, 0.0, 1.0]])
charges = np.array([6.0, 6.0])
spins = np.array([1.0] * 6 + [-1.0] * 6)

output = main(atoms=atoms,
              charges=charges,
              spins=spins,
              nelectrons=12,
              natoms=2,
              ndim=3,
              batch_size=256,
              iterations=200,
              tstep=0.05,
              nspins=(6, 6),
              nsteps=5,
              save_path="save",
              restore_path=None,
              save_frequency=10.0)
print("final energies:", output.energies[-5:])
