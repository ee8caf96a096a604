"""Physics operators: kinetic/Coulomb local energy, ccECP pseudopotentials.

Import submodules explicitly (``hamiltonian.local_energy``,
``hamiltonian.pp_local_energy``, ``hamiltonian.ecp``, ...); names are not
re-exported here to avoid shadowing modules with same-named factory functions.
"""
