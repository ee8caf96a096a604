"""Multiplicative envelope zoo.

Capability parity with ref ``ferminet/envelopes.py:29-318``: isotropic,
diagonal-covariance, full-covariance, STO and STO-poly per-orbital envelopes
plus a null envelope, all applied PRE_DETERMINANT (per matrix element, which
preserves antisymmetry). The AIQMC "flexible Gaussian" envelope lives in
``models.envelope``; any of these can be selected in ``make_ai_net`` via
``envelope_type``.

All envelopes return an (nelec, norb) matrix given r_ae (nelec, natoms, 1) and
ae (nelec, natoms, 3); norb = determinants * nelectrons. Decay parameters are
kept positive with |.| (like upstream's sigma usage) so |psi|^2 stays
normalisable.
"""

from __future__ import annotations

import enum
from typing import Mapping

import jax.numpy as jnp


class EnvelopeType(enum.Enum):
    PP_LIKE = enum.auto()      # AIQMC flexible-Gaussian (models.envelope)
    ISOTROPIC = enum.auto()
    DIAGONAL = enum.auto()
    FULL = enum.auto()
    STO = enum.auto()
    STO_POLY = enum.auto()
    NULL = enum.auto()
    MULTIWAVE = enum.auto()    # periodic Bloch-wave envelope (pbc)


def make_isotropic_envelope():
    """sum_a pi_aj exp(-|sigma_aj| r_ia) (ref envelopes.py:103-126)."""

    def init(natom: int, norb: int, ndim: int = 3) -> Mapping:
        return {"pi": jnp.ones((natom, norb)),
                "sigma": jnp.ones((natom, norb))}

    def apply(r_ae, ae, params):
        del ae
        r = r_ae[..., 0][:, :, None]  # (nelec, natoms, 1)
        return jnp.sum(params["pi"][None] *
                       jnp.exp(-jnp.abs(params["sigma"])[None] * r), axis=1)

    return init, apply


def make_diagonal_envelope():
    """Axis-aligned anisotropic decay (ref envelopes.py:168-191)."""

    def init(natom: int, norb: int, ndim: int = 3) -> Mapping:
        return {"pi": jnp.ones((natom, norb)),
                "sigma": jnp.ones((natom, ndim, norb))}

    def apply(r_ae, ae, params):
        del r_ae
        # effective radius per (elec, atom, orb) from per-axis scales
        r_eff = jnp.sqrt(jnp.sum(
            jnp.square(ae[..., None] * jnp.abs(params["sigma"])[None]),
            axis=2))  # (nelec, natoms, norb)
        return jnp.sum(params["pi"][None] * jnp.exp(-r_eff), axis=1)

    return init, apply


def make_full_envelope():
    """Full-covariance decay exp(-|A_a ae|) (ref envelopes.py:192-219)."""

    def init(natom: int, norb: int, ndim: int = 3) -> Mapping:
        eye = jnp.tile(jnp.eye(ndim)[None, :, :, None], (natom, 1, 1, norb))
        return {"pi": jnp.ones((natom, norb)), "sigma": eye}

    def apply(r_ae, ae, params):
        del r_ae
        # (nelec, natoms, dim_out, norb)
        rotated = jnp.einsum("iad,adko->iako", ae, params["sigma"])
        r_eff = jnp.sqrt(jnp.sum(jnp.square(rotated), axis=2) + 1e-12)
        return jnp.sum(params["pi"][None] * jnp.exp(-r_eff), axis=1)

    return init, apply


def make_sto_envelope():
    """Slater-type: r^n exp(-|sigma| r) with learnable n (ref envelopes.py:237-264)."""

    def init(natom: int, norb: int, ndim: int = 3) -> Mapping:
        return {"pi": jnp.ones((natom, norb)),
                "sigma": jnp.ones((natom, norb)),
                "n": jnp.zeros((natom, norb))}

    def apply(r_ae, ae, params):
        del ae
        r = r_ae[..., 0][:, :, None]
        poly = jnp.exp(params["n"][None] * jnp.log(r + 1e-12))
        return jnp.sum(params["pi"][None] * poly *
                       jnp.exp(-jnp.abs(params["sigma"])[None] * r), axis=1)

    return init, apply


def make_sto_poly_envelope(degree: int = 3):
    """(sum_k c_k r^k) exp(-|sigma| r) (ref envelopes.py:265-294)."""

    def init(natom: int, norb: int, ndim: int = 3) -> Mapping:
        return {"pi": jnp.ones((natom, degree + 1, norb)),
                "sigma": jnp.ones((natom, norb))}

    def apply(r_ae, ae, params):
        del ae
        r = r_ae[..., 0][:, :, None]  # (nelec, natoms, 1)
        powers = jnp.stack([r[..., 0] ** k for k in range(degree + 1)],
                           axis=2)  # (nelec, natoms, degree+1)
        poly = jnp.einsum("iak,ako->iao", powers, params["pi"])
        return jnp.sum(poly * jnp.exp(-jnp.abs(params["sigma"])[None] * r),
                       axis=1)

    return init, apply


def make_multiwave_envelope(kpoints):
    """Truncated Fourier series per atom (ref ferminet/pbc/envelopes.py:31-77).

    sum_a sum_i sigma_{2i}^2 cos(k_i . ae_a) + sigma_{2i+1}^2 sin(k_i . ae_a),
    with the first (k=0 cosine) coefficient initialised to 1 and the rest to 0
    so the envelope starts at unity. kpoints: (nk, ndim) Cartesian reciprocal
    vectors (see pbc.kpoints.make_envelope_kpoints). TPU-safe: real cos/sin
    pairs, no complex64.
    """
    kpoints = jnp.asarray(kpoints)

    def init(natom: int, norb: int, ndim: int = 3) -> Mapping:
        del natom, ndim
        nk = kpoints.shape[0]
        sigma = jnp.zeros((2 * nk, norb)).at[0, :].set(1.0)
        return {"sigma": sigma}

    def apply(r_ae, ae, params):
        del r_ae
        phase = ae @ kpoints.T  # (nelec, natoms, nk)
        waves = jnp.concatenate([jnp.cos(phase), jnp.sin(phase)], axis=2)
        env = waves @ (params["sigma"] ** 2.0)  # (nelec, natoms, norb)
        return jnp.sum(env, axis=1)

    return init, apply


def make_null_envelope():
    """No envelope (ref envelopes.py:220-236)."""

    def init(natom: int, norb: int, ndim: int = 3) -> Mapping:
        return {}

    def apply(r_ae, ae, params):
        del ae, params
        nelec = r_ae.shape[0]
        return jnp.ones((nelec, 1))

    return init, apply


def get_envelope(envelope_type: EnvelopeType, **kwargs):
    """Registry (ref envelopes.py:295-318)."""
    builders = {
        EnvelopeType.ISOTROPIC: make_isotropic_envelope,
        EnvelopeType.DIAGONAL: make_diagonal_envelope,
        EnvelopeType.FULL: make_full_envelope,
        EnvelopeType.STO: make_sto_envelope,
        EnvelopeType.STO_POLY: make_sto_poly_envelope,
        EnvelopeType.NULL: make_null_envelope,
        EnvelopeType.MULTIWAVE: make_multiwave_envelope,
    }
    return builders[envelope_type](**kwargs)
