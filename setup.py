"""Package setup (API-surface parity with ref AIQMCrelease3/setup.py:1-8)."""

from setuptools import find_packages, setup

setup(
    name="aiqmc_tpu",
    version="0.1.0",
    description=("TPU-native neural-network Quantum Monte Carlo: FermiNet-style "
                 "Y_nlm wavefunction, VMC/DMC, ccECP pseudopotentials, "
                 "correlated samples, PBC/Ewald."),
    packages=find_packages(exclude=["tests"]),
    package_data={"aiqmc_tpu": ["data/*.nwchem"]},
    include_package_data=True,
    python_requires=">=3.10",
    install_requires=[
        "jax",
        "chex",
        "optax",
        "flax",
        "ml_collections",
        "absl-py",
        "numpy",
    ],
)
