"""SWCT correlated-samples tests."""

import jax
import jax.numpy as jnp
import numpy as np

from aiqmc_tpu import corrsamples


def test_zero_displacement_is_identity():
    atoms = jnp.array([[0.0, 0.0, 0.0], [1.0, 0.0, 0.0]])
    pos = jnp.array([0.3, 0.2, -0.1, 0.9, 0.1, 0.4])
    new_pos = corrsamples.correlated_samples(atoms, atoms, pos)
    np.testing.assert_allclose(np.asarray(new_pos), np.asarray(pos), atol=1e-7)
    jac = corrsamples.weights_jacobian(pos, atoms, atoms)
    np.testing.assert_allclose(float(jac), 1.0, rtol=1e-5)


def test_rigid_translation_moves_all_electrons():
    """If all atoms shift by d, omega weights sum to 1 per electron, so every
    electron shifts by exactly d (SWCT exactness for rigid translations)."""
    atoms = jnp.array([[0.0, 0.0, 0.0], [1.0, 0.0, 0.0]])
    d = jnp.array([0.1, -0.2, 0.3])
    new_atoms = atoms + d
    pos = jnp.array([0.3, 0.2, -0.1, 0.9, 0.1, 0.4])
    new_pos = corrsamples.correlated_samples(atoms, new_atoms, pos)
    np.testing.assert_allclose(np.asarray(new_pos - pos),
                               np.tile(np.asarray(d), 2), rtol=1e-5)
    jac = corrsamples.weights_jacobian(pos, atoms, new_atoms)
    np.testing.assert_allclose(float(jac), 1.0, rtol=1e-4)


def test_electron_near_atom_follows_it():
    """An electron sitting on atom a moves (almost) rigidly with atom a."""
    atoms = jnp.array([[0.0, 0.0, 0.0], [5.0, 0.0, 0.0]])
    new_atoms = jnp.array([[0.2, 0.0, 0.0], [5.0, 0.0, 0.0]])
    pos = jnp.array([0.01, 0.0, 0.0])  # electron at atom 0
    new_pos = corrsamples.correlated_samples(atoms, new_atoms, pos)
    np.testing.assert_allclose(float(new_pos[0] - pos[0]), 0.2, atol=1e-4)
