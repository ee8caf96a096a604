"""The AI-Net wavefunction: FermiNet-style dual-stream ansatz with a Y_nlm
auxiliary stream, flexible-Gaussian envelope, Pade Jastrows and complex orbitals.

Capability parity with ref ``AIQMCrelease3/wavefunction_Ynlm/nn.py`` (factory
``make_ai_net``, nn.py:511-553; layers nn.py:196-353; orbitals nn.py:356-508),
re-designed for TPU:

  * No per-electron Python loops: the envelope (ref nn.py:479-484 loops over
    electrons), the spherical harmonics (double vmap per pair) and the Jastrow
    gathers are all single fused tensor ops.
  * All parameters are stacked arrays (never Python lists of per-electron dicts),
    so the whole forward pass is a handful of MXU matmuls + VPU elementwise ops.
  * Static spin bookkeeping (index arrays) is NumPy computed at build time.

Deviations from the reference (documented, all opt-in/out):
  * The reference derives per-layer init keys from an un-advanced PRNG key, giving
    every layer identical initial weights (ref nn.py:217-224); we split keys
    properly.
  * Symmetric features are built from the actual spin-up/down index sets rather
    than a positional split (ref nn.py:142-153); identical when electrons are
    ordered spin-up-first (the FermiNet convention).
  * ``full_equivariance=True`` shares the grouped-reduce ("convolutional") weights
    and the envelope / a-e Jastrow parameters across electrons so the ansatz is
    exactly antisymmetric; ``False`` reproduces the reference's per-electron
    parameters (which break exact antisymmetry — see README of the reference:
    "wavefunction ... still under construction").
  * ``determinants > 1`` is actually supported (the reference accepts the argument
    but hardcodes a single determinant, nn.py:466-474).
  * ``complex_orbitals`` controls whether orbitals are complex (reference
    behaviour, nn.py:456) or real. The TPU backend in this environment does not
    implement complex64 arithmetic, so the TPU execution path defaults to real
    orbitals (the standard FermiNet choice); the complex path remains available
    and is exercised on CPU.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Iterable, MutableMapping, Optional, Sequence, Tuple, Union

import chex
import jax
import jax.numpy as jnp
import numpy as np

from aiqmc_tpu.models import blocks as network_blocks
from aiqmc_tpu.models import envelope as envelope_lib
from aiqmc_tpu.models import harmonics
from aiqmc_tpu.models import jastrow as jastrow_lib
from aiqmc_tpu.models.features import FeatureLayer, construct_input_features, make_ainet_features

AILayers = Tuple[Tuple[int, int], ...]
ParamTree = Union[jnp.ndarray, Iterable["ParamTree"], MutableMapping[Any, "ParamTree"]]


@chex.dataclass
class AINetData:
    """Walker data crossing all layers (ref nn.py:20-25).

    Leading axes outside jit: [global_batch, ...] with the batch axis sharded over
    the device mesh's 'data' axis.
    """
    positions: Any
    spins: Any
    atoms: Any
    charges: Any


@dataclasses.dataclass
class Network:
    init: Callable[[chex.PRNGKey], ParamTree]
    apply: Callable[..., Tuple[jnp.ndarray, jnp.ndarray]]
    orbitals: Callable[..., Sequence[jnp.ndarray]]


def construct_symmetric_features(h_one: jnp.ndarray,
                                 h_two: jnp.ndarray,
                                 spin_up_indices: np.ndarray,
                                 spin_down_indices: np.ndarray,
                                 schnet_params=None) -> jnp.ndarray:
    """Permutation-equivariant features [h_i, g_up, g_down, g2_up_i, g2_down_i].

    Ref nn.py:142-153, generalised to gather channel members by the actual spin
    indices instead of a positional split (equal when spins are sorted up-first).

    With ``schnet_params`` the plain two-electron channel means become
    SchNet-style convolutions sum_j lambda(h_one_j) * gamma(h_two_ij)
    (ref ferminet/networks.py:560-676 option).
    """
    nelec = h_one.shape[0]
    groups = [idx for idx in (spin_up_indices, spin_down_indices) if len(idx) > 0]
    g_one = [jnp.tile(jnp.mean(h_one[idx], axis=0, keepdims=True), [nelec, 1])
             for idx in groups]
    if schnet_params is None:
        g_two = [jnp.mean(h_two[:, idx], axis=1) for idx in groups]
    else:
        lam = network_blocks.linear_layer(h_one, schnet_params["lambda_w"])
        gam = network_blocks.linear_layer(h_two, schnet_params["gamma_w"])
        conv = gam * lam[None, :, :]  # (i, j, d2)
        g_two = [jnp.mean(conv[:, idx], axis=1) for idx in groups]
    return jnp.concatenate([h_one] + g_one + g_two, axis=1)


def make_ai_net_layers(nspins: Tuple[int, int],
                       nelectrons: int,
                       natoms: int,
                       hidden_dims: AILayers,
                       hidden_dims_Ynlm: Sequence[int],
                       feature_layer: FeatureLayer,
                       spin_up_indices: np.ndarray,
                       spin_down_indices: np.ndarray,
                       full_equivariance: bool = False,
                       regular_harmonics: bool = False,
                       use_schnet: bool = False,
                       h_stream: str = "ainet",
                       y_stream: bool = True):
    """Dual-stream equivariant layers (ref nn.py:196-353).

    ``h_stream`` selects the one-electron update: "ainet" is the reference's
    grouped elementwise-reduce ("convolutional") layer followed by a linear
    (ref nn.py:294-300), "ferminet" is the upstream full linear on the
    concatenated symmetric features (ref ferminet/networks.py:676-774) — a
    strictly more expressive update that the vendored FermiNet tree uses.

    The h-stream interleaves a grouped-reduce layer with a dense layer and a
    residual; the Y_nlm stream is a small residual MLP on spherical-harmonic
    features of dimension 4*natoms + 2 (ref nn.py:220).

    ``y_stream=False`` removes the Y_nlm stream entirely (no params, no
    compute): with ``h_stream="ferminet"`` this is the exact published
    FermiNet ansatz (ref ferminet/networks.py:676-774 with no multiplicative
    Y factor) — the flagship-accuracy ablation arm (round-4), since the
    always-on Y factor is the last structural difference from the recipe
    behind published C ccECP VMC -5.4254.
    """
    nchannels = len([n for n in nspins if n > 0])
    if y_stream and len(hidden_dims_Ynlm) != len(hidden_dims):
        # init zips the two streams layer-by-layer while apply iterates each
        # by its own length — unequal depths used to surface as an opaque
        # IndexError at apply time (round-5 bench smoke).
        raise ValueError(
            f"hidden_dims ({len(hidden_dims)} layers) and hidden_dims_Ynlm "
            f"({len(hidden_dims_Ynlm)} layers) must have the same depth when "
            "the Y_nlm stream is enabled; set y_stream=False or match them.")

    def nfeatures(out1, out2):
        return (nchannels + 1) * out1 + nchannels * out2

    def init(key: chex.PRNGKey):
        params = {}
        (num_one_features, num_two_features), params["input"] = feature_layer.init()
        dims_one_in = num_one_features
        dims_two_in = num_two_features
        dims_y_in = 4 * natoms + 2  # s+p per atom, plus d/f mean and s/p mean.
        layers = []
        layers_y = []
        for i in range(len(hidden_dims)):
            key, convolu_key, single_key, single_y_key, double_key = jax.random.split(key, num=5)
            layer_params = {}
            layer_params_y = {}
            dims_one_full = network_blocks.conv_padded_dim(
                nfeatures(dims_one_in, dims_two_in))
            dims_one_out, dims_two_out = hidden_dims[i]
            dims_y_out = hidden_dims_Ynlm[i]
            if h_stream == "ferminet":
                layer_params["single"] = network_blocks.init_linear_layer(
                    single_key, in_dim=nfeatures(dims_one_in, dims_two_in),
                    out_dim=dims_one_out, include_bias=True)
                if i < len(hidden_dims) - 1:
                    layer_params["double"] = network_blocks.init_linear_layer(
                        double_key, in_dim=dims_two_in, out_dim=dims_two_out,
                        include_bias=True)
                if y_stream:
                    layer_params_y["single_Ynlm"] = (
                        network_blocks.init_linear_layer(
                            single_y_key, in_dim=dims_y_in, out_dim=dims_y_out,
                            include_bias=True))
                    layers_y.append(layer_params_y)
                    dims_y_in = dims_y_out
                layers.append(layer_params)
                dims_one_in = dims_one_out
                dims_two_in = dims_two_out
                continue
            # Grouped-reduce weights: per-electron in reference mode, shared for
            # an exactly-antisymmetric ansatz (same 1/sqrt(nelec) scale).
            if full_equivariance:
                wkey, bkey = jax.random.split(convolu_key)
                layer_params["convolutional"] = {
                    "w": jax.random.normal(wkey, (1, dims_one_full))
                         / jnp.sqrt(float(nelectrons)),
                    "b": jax.random.normal(
                        bkey, (1, dims_one_full // network_blocks.CONV_GROUP)),
                }
            else:
                layer_params["convolutional"] = network_blocks.init_convolu_layer(
                    nelectrons, convolu_key, in_dim_1=nelectrons,
                    in_dim_2=dims_one_full, include_bias=True)
            layer_params["single"] = network_blocks.init_linear_layer(
                single_key, in_dim=dims_one_full // network_blocks.CONV_GROUP,
                out_dim=dims_one_out, include_bias=True)
            if y_stream:
                layer_params_y["single_Ynlm"] = network_blocks.init_linear_layer(
                    single_y_key, in_dim=dims_y_in, out_dim=dims_y_out,
                    include_bias=True)
                layers_y.append(layer_params_y)
                dims_y_in = dims_y_out
            if use_schnet:
                key, lam_key, gam_key = jax.random.split(key, num=3)
                layer_params["schnet"] = {
                    "lambda_w": network_blocks.init_linear_layer(
                        lam_key, dims_one_in, dims_two_in,
                        include_bias=False)["w"],
                    "gamma_w": network_blocks.init_linear_layer(
                        gam_key, dims_two_in, dims_two_in,
                        include_bias=False)["w"],
                }
            if i < len(hidden_dims) - 1:
                layer_params["double"] = network_blocks.init_linear_layer(
                    double_key, in_dim=dims_two_in, out_dim=dims_two_out,
                    include_bias=True)
            layers.append(layer_params)
            dims_one_in = dims_one_out
            dims_two_in = dims_two_out
        params["streams"] = layers
        if y_stream:
            params["streams_y"] = layers_y
        return dims_one_in, (dims_y_in if y_stream else 0), params

    def _residual(x, y):
        return (x + y) / jnp.sqrt(2.0) if x.shape == y.shape else y

    def apply_layer(params, h_one, h_two):
        h_one_in = construct_symmetric_features(
            h_one, h_two[0], spin_up_indices, spin_down_indices,
            schnet_params=params.get("schnet"))
        if h_stream == "ferminet":
            h_one_next = jnp.tanh(
                network_blocks.linear_layer(h_one_in, **params["single"]))
            h_one = _residual(h_one, h_one_next)
            if "double" in params:
                h_two_next = jnp.tanh(
                    network_blocks.linear_layer(h_two[0], **params["double"]))
                h_two = (_residual(h_two[0], h_two_next),)
            return h_one, h_two
        conv = params["convolutional"]
        w = conv["w"]
        b = conv["b"]
        if full_equivariance:
            # Shared weights broadcast over electrons.
            w = jnp.broadcast_to(w, (nelectrons,) + w.shape[1:])
            b = jnp.broadcast_to(b, (nelectrons,) + b.shape[1:])
        h_one_next = jnp.tanh(
            network_blocks.convolu_layer(nelectrons, h_one_in, w, b))
        h_one_next = jnp.tanh(
            network_blocks.linear_layer(h_one_next, **params["single"]))
        h_one = _residual(h_one, h_one_next)
        if "double" in params:
            h_two_next = jnp.tanh(
                network_blocks.linear_layer(h_two[0], **params["double"]))
            h_two = (_residual(h_two[0], h_two_next),)
        return h_one, h_two

    def apply_layer_y(params, y_one):
        y_next = jnp.tanh(network_blocks.linear_layer(y_one, **params["single_Ynlm"]))
        return _residual(y_one, y_next)

    def apply(params, ae, r_ae, ee, r_ee):
        ae_features, ee_features = feature_layer.apply(ae=ae, r_ae=r_ae, ee=ee, r_ee=r_ee)
        if not y_stream:
            h_one = ae_features
            h_two = (ee_features,)
            for i in range(len(hidden_dims)):
                h_one, h_two = apply_layer(params["streams"][i], h_one, h_two)
            return h_one, None
        # Y_nlm stream inputs (ref nn.py:327-339), fully vectorised. Regular
        # solid harmonics (smooth polynomials) are the default for training;
        # the reference's irregular Y_lm/r^l variant is kept for parity.
        if regular_harmonics:
            y_sp = jnp.reshape(harmonics.y_sp_regular(ae), (nelectrons, -1))
            y_df = jnp.reshape(harmonics.y_df_regular(ae), (nelectrons, -1))
        else:
            u = ae / r_ae  # (nelec, natoms, 3) unit vectors
            y_sp = jnp.reshape(harmonics.y_sp(u), (nelectrons, -1))
            y_df = jnp.reshape(harmonics.y_df(u, r_ae[..., 0]), (nelectrons, -1))
        y_one = jnp.concatenate(
            [y_sp,
             jnp.mean(y_df, axis=-1, keepdims=True),
             jnp.mean(y_sp, axis=-1, keepdims=True)], axis=-1)
        for i in range(len(hidden_dims_Ynlm)):
            y_one = apply_layer_y(params["streams_y"][i], y_one)

        h_one = ae_features
        h_two = (ee_features,)
        for i in range(len(hidden_dims)):
            h_one, h_two = apply_layer(params["streams"][i], h_one, h_two)
        return h_one, y_one

    return init, apply


def make_orbitals(nspins: Tuple[int, int],
                  nelectrons: int,
                  parallel_indices: np.ndarray,
                  antiparallel_indices: np.ndarray,
                  spin_up_indices: np.ndarray,
                  spin_down_indices: np.ndarray,
                  n_parallel: int,
                  n_antiparallel: int,
                  charges: jnp.ndarray,
                  equivariant_layers,
                  ndim: int = 3,
                  determinants: int = 1,
                  bias_orbitals: bool = True,
                  full_equivariance: bool = False,
                  complex_orbitals: bool = True,
                  complex_pairs: bool = False,
                  bounded_envelope: bool = False,
                  jastrow_scale: Optional[float] = None,
                  jastrow_ae: bool = True,
                  jastrow_ee: str = "pade",
                  lattice: Optional[jnp.ndarray] = None,
                  envelope_type: str = "pp_like",
                  envelope_kwargs: Optional[dict] = None,
                  envelope=None,
                  pbc_smooth_r: bool = False,
                  y_stream: bool = True):
    """(Complex) orbitals x envelope x Y-orbitals x Jastrows (ref nn.py:356-508).

    ``y_stream=False`` drops the multiplicative Y_nlm orbital factor (and its
    parameters) — the exact published-FermiNet orbital form."""
    equivariant_layers_init, equivariant_layers_apply = equivariant_layers
    (jastrow_ee_init, jastrow_ee_apply, jastrow_ae_init, jastrow_ae_apply
     ) = jastrow_lib.get_jastrow(charges, per_electron_ae=not full_equivariance,
                                 include_ae=jastrow_ae, ee_type=jastrow_ee)
    if envelope is not None:
        # Plugin-supplied envelope (ref ferminet/train.py:455-467
        # make_envelope_fn): an (init, apply) pair or an object with
        # .init/.apply attributes.
        if isinstance(envelope, tuple):
            envelope_init, envelope_apply = envelope
        else:
            envelope_init, envelope_apply = envelope.init, envelope.apply
    elif envelope_type == "pp_like":
        envelope_init, envelope_apply = envelope_lib.make_pp_like_envelope(
            per_electron=not full_equivariance, bounded=bounded_envelope)
    else:
        from aiqmc_tpu.models import envelopes_zoo
        envelope_init, envelope_apply = envelopes_zoo.get_envelope(
            envelopes_zoo.EnvelopeType[envelope_type.upper()],
            **(envelope_kwargs or {}))

    active_spin_channels = [spin for spin in nspins if spin > 0]
    natoms = charges.shape[0]
    # Electron permutation bringing rows into [up..., down...] order; identity when
    # spins are already sorted (the reference implicitly assumes sorted order when
    # it pairs the reordered matrix rows with unreordered r_ae, ref nn.py:479-484).
    row_perm = np.concatenate([spin_up_indices, spin_down_indices]).astype(np.int32)

    def init(key: chex.PRNGKey) -> ParamTree:
        key, subkey = jax.random.split(key)
        params = {}
        dims_orbital_in, dims_y_in, params["layers"] = equivariant_layers_init(subkey)
        # Real+imaginary interleaved per determinant (x2 only if complex).
        per_orbital = 2 if complex_orbitals else 1
        nspin_orbitals = [per_orbital * determinants * sum(nspins)
                          for _ in active_spin_channels]
        orbitals = []
        for nspin_orbital in nspin_orbitals:
            key, subkey = jax.random.split(key)
            orbitals.append(network_blocks.init_linear_layer(
                subkey, in_dim=dims_orbital_in, out_dim=nspin_orbital,
                include_bias=bias_orbitals))
        key, y_key, env_key = jax.random.split(key, num=3)
        params["orbitals"] = orbitals
        if y_stream:
            params["y"] = [network_blocks.init_linear_layer(
                y_key, in_dim=dims_y_in, out_dim=determinants * nelectrons,
                include_bias=False)]
        params["jastrow_ee"] = jastrow_ee_init(
            n_parallel=n_parallel, n_antiparallel=n_antiparallel)
        params["jastrow_ae"] = jastrow_ae_init(nelectrons=nelectrons, natoms=natoms)
        if envelope is None and envelope_type == "pp_like":
            params["envelope"] = envelope_init(
                natom=natoms,
                nelectrons=(determinants * nelectrons if full_equivariance
                            else nelectrons),
                ndim=ndim)
        else:
            # Zoo/plugin convention (ref ferminet/envelopes.py): one parameter
            # set per orbital column.
            params["envelope"] = envelope_init(
                natom=natoms, norb=determinants * nelectrons, ndim=ndim)
        return params

    def apply(params, pos, spins, atoms, charges_in) -> Sequence[jnp.ndarray]:
        del spins, charges_in  # static bookkeeping is baked in at build time
        ae, ee, r_ae, r_ee = construct_input_features(pos, atoms, ndim=ndim)
        ae_raw = ae
        if lattice is not None:
            # Periodic ansatz: all displacement-derived quantities (harmonics,
            # envelope, Jastrows) use lattice-periodic displacements so
            # log|psi| is invariant under lattice translations of any electron;
            # the periodic feature layer is translation-invariant by
            # construction.
            nelec = ee.shape[0]
            eye = jnp.eye(nelec)
            if pbc_smooth_r:
                # Smooth surrogates (ref ferminet/pbc/feature_layer.py:29-44):
                # displacement -> (L^T sin(2 pi s)) / 2 pi and |r| ->
                # periodic_norm. Both match the Euclidean quantities to O(r^3)
                # at coincidence (so e-e/e-a cusps are preserved) and are
                # smooth at the Wigner-Seitz boundary, where the minimum image
                # has derivative kinks (other QMC codes tolerate them; flag
                # default keeps the minimum-image variant).
                from aiqmc_tpu.pbc.features import periodic_norm
                inv_lattice = jnp.linalg.inv(lattice)
                metric = lattice @ lattice.T
                s_ae = ae @ inv_lattice
                s_ee = ee @ inv_lattice
                ae = (jnp.sin(2 * jnp.pi * s_ae) @ lattice) / (2 * jnp.pi)
                r_ae = periodic_norm(metric, s_ae)[..., None]
                ee = ((jnp.sin(2 * jnp.pi * s_ee) @ lattice) / (2 * jnp.pi)
                      * (1.0 - eye)[..., None])
                r_ee = (periodic_norm(metric, s_ee + eye[..., None])
                        * (1.0 - eye))[..., None]
            else:
                from aiqmc_tpu.pbc.enforce import minimum_image
                ae = minimum_image(lattice, ae)
                ee_mi = minimum_image(lattice, ee)
                ee = ee_mi * (1.0 - eye)[..., None]
                r_ae = jnp.linalg.norm(ae, axis=2, keepdims=True)
                r_ee = (jnp.linalg.norm(ee + eye[..., None], axis=-1)
                        * (1.0 - eye))[..., None]
        h_to_orbitals, y_to_orbitals = equivariant_layers_apply(
            params["layers"], ae=ae, r_ae=r_ae, ee=ee, r_ee=r_ee)

        # Orbital projection per spin channel on spin-sorted rows (ref nn.py:432-447).
        h_sorted = h_to_orbitals[row_perm]
        channel_sizes = [len(spin_up_indices), len(spin_down_indices)]
        channel_sizes = [s for s in channel_sizes if s > 0]
        h_channels = jnp.split(
            h_sorted, network_blocks.array_partitions(channel_sizes), axis=0)
        orbitals = [network_blocks.linear_layer(h, **p)
                    for h, p in zip(h_channels, params["orbitals"])]
        # Complex combine (ref nn.py:456); skipped in real mode. In pair mode
        # the (re, im) components ride a leading axis of size 2 through the
        # (real-valued) envelope/Y/Jastrow factors — no complex dtype is ever
        # created, so the same code runs on TPU backends without complex64.
        if complex_orbitals:
            if complex_pairs:
                orbitals = [jnp.stack([o[..., ::2], o[..., 1::2]])
                            for o in orbitals]
            else:
                orbitals = [o[..., ::2] + 1.0j * o[..., 1::2] for o in orbitals]
        # (..., nspin_ch, ndet * nelec) -> (..., ndet, nspin_ch, nelec),
        # concat over spin channels -> full det.
        orbitals = [jnp.swapaxes(
            jnp.reshape(o, o.shape[:-1] + (determinants, -1)), -3, -2)
            for o in orbitals]
        orbitals = jnp.concatenate(orbitals, axis=-2)  # (..., ndet, nelec, nelec)

        if y_stream:
            # Y-stream orbital factor with row-normalised coefficients
            # (ref nn.py:449-452).
            w_y = params["y"][0]["w"]
            w_y = w_y / jnp.linalg.norm(w_y, axis=-1, keepdims=True)
            y_orbitals = network_blocks.linear_layer(y_to_orbitals, w_y)
            y_orbitals = y_orbitals[row_perm]  # rows follow det-matrix order
            y_orbitals = jnp.transpose(
                jnp.reshape(y_orbitals, (nelectrons, determinants, nelectrons)),
                (1, 0, 2))

        # Envelope (ref nn.py:479-485; envelope.py:26-30), vectorised.
        # Bloch (multiwave) envelopes are exactly lattice-periodic functions
        # of the RAW displacement (ref ferminet/networks.py feeds unmapped ae
        # to envelope.apply; ref ferminet/pbc/envelopes.py:67-75): feeding
        # them the smooth-mapped displacement L sin(2 pi s)/(2 pi) turns
        # cos(k.ae) into cos(|k| L sin(.)/(2 pi)) — for the first shell a
        # function that never changes sign — so the envelope could not
        # represent Bloch structure at all. Molecular envelopes keep the
        # periodic map (they consume r_ae, which must be the periodic norm).
        r_ae_sorted = r_ae[row_perm]
        env_ae = (ae_raw if envelope is None and envelope_type == "multiwave"
                  else ae)
        ae_sorted = env_ae[row_perm]
        env = envelope_apply(r_ae_sorted, ae_sorted, params["envelope"])
        if env.ndim == 1:  # per-electron scalars -> scale rows of every det
            orbitals = orbitals * env[None, :, None]
        elif env.shape[-1] == 1:  # row scalars (e.g. null envelope)
            orbitals = orbitals * env[None, :, 0, None]
        else:  # per-orbital matrix (nelec, ndet * nelec)
            env = jnp.transpose(
                jnp.reshape(env, (nelectrons, determinants, nelectrons)), (1, 0, 2))
            orbitals = orbitals * env
        if y_stream:
            orbitals = orbitals * y_orbitals

        # Jastrow factors (ref nn.py:490-504). The exp(J / nelectrons) factor
        # multiplies every ROW of the determinant matrix, so the determinant
        # carries exp(J) exactly (det(cM) = c^n det M) and the Pade cusp
        # conditions hold at the wavefunction level. (Scaling by 1 instead
        # raises the Jastrow to the n-th power and underflows the determinant
        # for large systems.)
        scale = (1.0 / nelectrons) if jastrow_scale is None else jastrow_scale
        r_ee_mat = jnp.reshape(r_ee, (nelectrons, nelectrons))
        jastrow_ee = jnp.exp(
            jastrow_ee_apply(r_ee_mat, params["jastrow_ee"], parallel_indices,
                             antiparallel_indices) * scale)
        jastrow_ae = jnp.exp(
            jastrow_ae_apply(jnp.reshape(r_ae, (nelectrons, natoms)),
                             params["jastrow_ae"]) * scale)
        orbitals = orbitals * jastrow_ee * jastrow_ae
        if complex_orbitals and complex_pairs:
            return [(orbitals[0], orbitals[1])]
        return [orbitals]

    return init, apply


def make_ai_net(nspins: Tuple[int, int],
                charges: jnp.ndarray,
                parallel_indices: np.ndarray,
                antiparallel_indices: np.ndarray,
                spin_up_indices: np.ndarray,
                spin_down_indices: np.ndarray,
                n_parallel: int,
                n_antiparallel: int,
                ndim: int,
                natoms: int,
                nelectrons: int,
                determinants: int = 1,
                bias_orbitals: bool = True,
                rescale_inputs: bool = False,
                hidden_dims: AILayers = ((4, 4), (4, 4), (4, 4)),
                hidden_dims_Ynlm: Sequence[int] = (6, 6, 6),
                full_equivariance: bool = False,
                complex_orbitals: bool = True,
                complex_pairs: bool = False,
                bounded_envelope: bool = False,
                jastrow_scale: Optional[float] = None,
                jastrow_ae: bool = True,
                jastrow_ee: str = "pade",
                regular_harmonics: bool = False,
                lattice: Optional[jnp.ndarray] = None,
                envelope_type: str = "pp_like",
                envelope_kwargs: Optional[dict] = None,
                use_schnet: bool = False,
                h_stream: str = "ainet",
                pbc_smooth_r: bool = False,
                pbc_features: str = "sincos",
                pbc_gmax: int = 1,
                pbc_gvector_smooth: bool = True,
                pbc_include_r_ae: bool = True,
                y_stream: bool = True,
                feature_layer: Optional[FeatureLayer] = None,
                envelope=None) -> Network:
    """Builds the AI-Net (ref nn.py:511-553). See module docstring for options.

    ``lattice`` (rows = primitive vectors) switches to the periodic ansatz:
    sin/cos phase features (ref ferminet/pbc/feature_layer.py) and
    minimum-image displacements for the Y_nlm stream, envelope and Jastrows.
    ``pbc_features="gvector"`` selects the AIQMC tree's own raw
    lattice-image expansion instead (ref PBC/nnPBC.py:104,
    PBC/PBCenvelope.py:52-100), with ``pbc_gmax`` images per axis.

    ``feature_layer`` / ``envelope``: plugin-supplied overrides resolved from
    config strings (ref ferminet/train.py:440-467 make_feature_layer_fn /
    make_envelope_fn importlib hooks).
    """
    spin_up_indices = np.asarray(spin_up_indices).reshape(-1)
    spin_down_indices = np.asarray(spin_down_indices).reshape(-1)
    parallel_indices = np.asarray(parallel_indices)
    antiparallel_indices = np.asarray(antiparallel_indices)

    if lattice is not None:
        lattice = jnp.asarray(lattice)
    if feature_layer is None:
        if lattice is not None:
            if pbc_features == "gvector":
                from aiqmc_tpu.pbc.features import make_gvector_feature_layer
                feature_layer = make_gvector_feature_layer(
                    natoms, ndim=ndim, rescale_inputs=rescale_inputs,
                    lattice=lattice, g_max=pbc_gmax,
                    smooth=pbc_gvector_smooth)
            elif pbc_features == "sincos":
                from aiqmc_tpu.pbc.features import make_pbc_feature_layer
                feature_layer = make_pbc_feature_layer(
                    natoms, ndim=ndim, rescale_inputs=rescale_inputs,
                    lattice=lattice, include_r_ae=pbc_include_r_ae)
            else:
                raise ValueError(
                    f"Unknown pbc_features {pbc_features!r} "
                    "(expected 'sincos' or 'gvector')")
        else:
            feature_layer = make_ainet_features(
                natoms, ndim=ndim, rescale_inputs=rescale_inputs)
    equivariant_layers = make_ai_net_layers(
        nspins, nelectrons, natoms, tuple(hidden_dims), tuple(hidden_dims_Ynlm),
        feature_layer, spin_up_indices, spin_down_indices,
        full_equivariance=full_equivariance,
        regular_harmonics=regular_harmonics,
        use_schnet=use_schnet,
        h_stream=h_stream,
        y_stream=y_stream)
    orbitals_init, orbitals_apply = make_orbitals(
        nspins=nspins, nelectrons=nelectrons, charges=charges,
        parallel_indices=parallel_indices, antiparallel_indices=antiparallel_indices,
        spin_up_indices=spin_up_indices, spin_down_indices=spin_down_indices,
        n_parallel=n_parallel, n_antiparallel=n_antiparallel,
        equivariant_layers=equivariant_layers, ndim=ndim,
        determinants=determinants, bias_orbitals=bias_orbitals,
        full_equivariance=full_equivariance, complex_orbitals=complex_orbitals,
        complex_pairs=complex_pairs,
        bounded_envelope=bounded_envelope, jastrow_scale=jastrow_scale,
        jastrow_ae=jastrow_ae, jastrow_ee=jastrow_ee,
        lattice=lattice, envelope_type=envelope_type,
        envelope_kwargs=envelope_kwargs, envelope=envelope,
        pbc_smooth_r=pbc_smooth_r, y_stream=y_stream)

    def init(key: chex.PRNGKey) -> ParamTree:
        _, subkey = jax.random.split(key)
        return orbitals_init(subkey)

    def apply(params, pos, spins, atoms, charges_in):
        orbitals = orbitals_apply(params, pos, spins, atoms, charges_in)
        if complex_orbitals and complex_pairs:
            return network_blocks.logdet_matmul_pair(orbitals)
        return network_blocks.logdet_matmul(orbitals)

    return Network(init=init, apply=apply, orbitals=orbitals_apply)


def make_log_network(signed_network) -> Callable[..., jnp.ndarray]:
    """log psi = log|psi| + i * phase, as used by the ECP ratio evaluations
    (ref main_pp_adam_muti_GPU.py:119-121)."""

    def log_network(*args, **kwargs):
        phase, mag = signed_network(*args, **kwargs)
        return mag + 1.0j * phase

    return log_network


def make_pair_log_network(signed_network) -> Callable[..., jnp.ndarray]:
    """log psi as a stacked real pair [log|psi|, phase] — the TPU-safe
    counterpart of ``make_log_network`` (no complex dtype)."""

    def log_network(*args, **kwargs):
        phase, mag = signed_network(*args, **kwargs)
        return jnp.stack([mag, phase])

    return log_network
