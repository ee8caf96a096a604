"""Real spherical harmonics (s, p, d, f) for the Y_nlm stream.

Parity with ref ``AIQMCrelease3/wavefunction_Ynlm/nn.py:156-193`` but fully
vectorised: the reference evaluates one (electron, atom) pair at a time under a
double vmap; here the closed forms are written directly on (..., 3) unit-vector
tensors so the whole (nelec, natoms) block is one fused VPU computation.

Conventions preserved from the reference:
  * s/p rows are the standard real harmonics of the *unit* vector u = ae/r_ae.
  * d/f rows divide the unit-vector polynomials by additional powers of r
    (``y**2``, ``y**3`` in the reference), so they scale as r^-2 / r^-3.
  * The reference's f-orbital line ``(x[0]**2 - x[1]**2) * x[3]`` indexes a
    3-vector out of bounds; JAX clamps that to x[2], and we reproduce the clamped
    semantics explicitly with u_z.
  * Near r -> 0 the d/f rows diverge like the reference's. We additionally guard
    the division with a tiny epsilon so reverse-mode gradients stay finite at
    exactly r = 0 (the reference NaNs there; see its comments nn.py:176-181).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

_SQRT_PI = np.sqrt(np.pi)

# Number of output channels.
N_SP = 4
N_DF = 12


def y_sp(u: jnp.ndarray) -> jnp.ndarray:
    """s + p real harmonics of unit vectors. u: (..., 3) -> (..., 4).

    Ref nn.py:156-167 (``y_l_real``).
    """
    c0 = 0.5 / _SQRT_PI
    c1 = np.sqrt(3.0 / (4.0 * np.pi))
    ones = jnp.ones_like(u[..., 0])
    return jnp.stack(
        [c0 * ones, c1 * u[..., 0], c1 * u[..., 1], c1 * u[..., 2]], axis=-1)


def y_sp_regular(ae: jnp.ndarray) -> jnp.ndarray:
    """Regular solid-harmonic s + p features: [c0, c1 x, c1 y, c1 z].

    The reference evaluates the p rows on unit vectors ae/r (ref nn.py:156-167),
    whose direction discontinuity at a nucleus makes the local kinetic energy
    diverge like 1/r^2 there. The regular solid harmonics r^l Y_lm are smooth
    polynomials of the raw displacement and span the same angular content.
    """
    c0 = 0.5 / _SQRT_PI
    c1 = np.sqrt(3.0 / (4.0 * np.pi))
    ones = jnp.ones_like(ae[..., 0])
    r2 = jnp.sum(ae * ae, axis=-1)
    p_scale = 1.0 / jnp.sqrt(1.0 + r2)  # bounded: -> Y_1m(u) at large r
    return jnp.stack(
        [c0 * ones,
         c1 * ae[..., 0] * p_scale,
         c1 * ae[..., 1] * p_scale,
         c1 * ae[..., 2] * p_scale], axis=-1)


def y_df_regular(ae: jnp.ndarray) -> jnp.ndarray:
    """Smooth, bounded d + f solid-harmonic features of ae.

    The regular solid harmonics r^l Y_lm are smooth polynomials (the reference's
    irregular Y_lm / r^l rows are singular at the nuclei — the source of its NaN
    war stories, ref nn.py:176-181); we additionally normalise by
    (1 + r^2)^(l/2), which keeps the features O(1) at large r (-> Y_lm(u)) while
    staying polynomial-smooth near the nucleus.
    """
    x, y, z = ae[..., 0], ae[..., 1], ae[..., 2]
    r2 = x * x + y * y + z * z
    d_scale = 1.0 / (1.0 + r2)
    f_scale = d_scale / jnp.sqrt(1.0 + r2)
    s15 = np.sqrt(15.0 / np.pi)
    s5 = np.sqrt(5.0 / np.pi)
    s35_2 = np.sqrt(35.0 / (2.0 * np.pi))
    s105 = np.sqrt(105.0 / np.pi)
    s21_2 = np.sqrt(21.0 / (2.0 * np.pi))
    s7 = np.sqrt(7.0 / np.pi)
    d_rows = [
        0.5 * s15 * x * y,
        0.5 * s15 * y * z,
        0.25 * s5 * (3.0 * z ** 2 - r2),
        0.5 * s15 * x * z,
        0.25 * s15 * (x ** 2 - y ** 2),
    ]
    f_rows = [
        0.25 * s35_2 * y * (3.0 * x ** 2 - y ** 2),
        0.5 * s105 * x * y * z,
        0.25 * s21_2 * y * (5.0 * z ** 2 - r2),
        0.25 * s7 * (5.0 * z ** 3 - 3.0 * z * r2),
        0.25 * s21_2 * x * (5.0 * z ** 2 - r2),
        0.25 * s105 * (x ** 2 - y ** 2) * z,
        0.25 * s35_2 * x * (x ** 2 - 3.0 * y ** 2),
    ]
    d_rows = [row * d_scale for row in d_rows]
    f_rows = [row * f_scale for row in f_rows]
    return jnp.stack(d_rows + f_rows, axis=-1)


def y_df(u: jnp.ndarray, r: jnp.ndarray) -> jnp.ndarray:
    """d + f rows of the reference's ``y_l_real_high`` (ref nn.py:169-193).

    u: (..., 3) unit vectors; r: (...,) or (..., 1) radii. Output (..., 12).
    The polynomials are in the unit vector; the reference divides by r^2 (d) and
    r^3 (f) on top, giving an explicit radial decay.
    """
    if r.ndim == u.ndim:  # (..., 1) -> (...)
        r = r[..., 0]
    ux, uy, uz = u[..., 0], u[..., 1], u[..., 2]
    r2 = jnp.square(r) + 1e-20
    r3 = r2 * r + 1e-30
    s15 = np.sqrt(15.0 / np.pi)
    s5 = np.sqrt(5.0 / np.pi)
    s35_2 = np.sqrt(35.0 / (2.0 * np.pi))
    s105 = np.sqrt(105.0 / np.pi)
    s21_2 = np.sqrt(21.0 / (2.0 * np.pi))
    s7 = np.sqrt(7.0 / np.pi)
    d_rows = [
        0.5 * s15 * (ux * uy) / r2,
        0.5 * s15 * (uy * uz) / r2,
        0.25 * s5 * (3.0 * uz ** 2 - 1.0) / r2,
        0.5 * s15 * (ux * uz) / r2,
        0.25 * s15 * (ux ** 2 - uy ** 2) / r2,
    ]
    f_rows = [
        0.25 * s35_2 * (uy * (3.0 * ux ** 2 - uy ** 2)) / r3,
        0.5 * s105 * (ux * uy * uz) / r3,
        0.25 * s21_2 * (uy * (5.0 * uz ** 2 - 1.0)) / r3,
        0.25 * s7 * (5.0 * uz ** 3 - 3.0 * uz) / r3,
        0.25 * s21_2 * (ux * (5.0 * uz ** 2 - 1.0)) / r3,
        # Reference writes x[3] here, which JAX clamps to x[2] (= u_z).
        0.25 * s105 * ((ux ** 2 - uy ** 2) * uz) / r3,
        0.25 * s35_2 * (ux * (ux ** 2 - 3.0 * uy ** 2)) / r3,
    ]
    return jnp.stack(d_rows + f_rows, axis=-1)
