"""Energy loss with clipped custom-JVP gradient.

Capability parity with ref ``AIQMCrelease3/Loss/loss.py`` / ``pploss.py`` (they are
identical up to the LocalEnergy type): batch-vmapped local energies, total-variation
clipping (mean- or median-centred), and the unbiased energy gradient
< (E_L - E) d log psi > implemented as a custom JVP, with complex-conjugate terms
for complex wavefunctions.

TPU notes: cross-device reductions are plain ``jnp.mean`` / ``jnp.median`` over the
global (sharded) batch axis — under GSPMD these lower to psum/all-gather over ICI,
replacing the reference's explicit ``constants.pmean`` / ``all_gather`` pmap
collectives (ref loss.py:107-116, 206-208).
"""

from __future__ import annotations

from typing import Tuple

import chex
import jax
import jax.numpy as jnp

from aiqmc_tpu.models.network import AINetData, ParamTree

# The reference registers psi with kfac_jax here
# (kfac_jax.register_normal_predictive_distribution, ref Loss/loss.py:260-266)
# so jaxpr pattern-matching can find the predictive distribution. The native
# KFAC (optim/kfac.py) instruments layers directly via the activation tape in
# models/blocks.py, so no registration call is needed anywhere in this module.


@chex.dataclass
class AuxiliaryLossData:
    """Auxiliary data returned by total_energy (ref loss.py:28-43)."""
    variance: jax.Array
    local_energy: jax.Array
    clipped_energy: jax.Array
    grad_local_energy: jax.Array | None
    local_energy_mat: jax.Array | None


def clip_local_values(local_values: jnp.ndarray,
                      mean_local_values: jnp.ndarray,
                      clip_scale: float,
                      clip_from_median: bool,
                      center_at_clipped_value: bool,
                      complex_output: bool = False,
                      pair_output: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Total-variation clipping of local operator values (ref loss.py:73-135).

    pair_output: local_values is (batch, 2) [Re, Im] columns (TPU-safe complex
    representation); each component is clipped like the complex path does.
    """

    batch_mean = lambda values: jnp.mean(values, axis=0)

    def clip_at_total_variation(values, center, scale):
        tv = batch_mean(jnp.abs(values - center))
        return jnp.clip(values, center - scale * tv, center + scale * tv)

    if pair_output:
        if clip_from_median:
            # Im centers at 0, matching the complex path where the clip center
            # is the median of the REAL parts (whose .imag is exactly 0).
            center = jnp.stack([jnp.median(local_values[:, 0]),
                                jnp.zeros(())])
        else:
            center = mean_local_values
        clipped = clip_at_total_variation(local_values, center[None], clip_scale)
        diff_center = batch_mean(clipped) if center_at_clipped_value else mean_local_values
        return diff_center, clipped - diff_center[None]

    if clip_from_median:
        clip_center = jnp.median(local_values.real)
    else:
        clip_center = mean_local_values
    if complex_output:
        clipped_local_values = (
            clip_at_total_variation(local_values.real, clip_center.real, clip_scale)
            + 1.0j * clip_at_total_variation(
                local_values.imag, clip_center.imag, clip_scale))
    else:
        clipped_local_values = clip_at_total_variation(
            local_values, clip_center, clip_scale)
    if center_at_clipped_value:
        diff_center = batch_mean(clipped_local_values)
    else:
        diff_center = mean_local_values
    diff = clipped_local_values - diff_center
    return diff_center, diff


def _mask_nonfinite(e_l: jnp.ndarray) -> jnp.ndarray:
    """Replaces non-finite local energies by the finite-batch mean.

    A single walker at a singular/underflowed configuration yields E_L = inf or
    NaN; without masking it poisons the loss, its gradient, and (through the
    NaN-guard rollbacks) freezes training until the walker escapes. Masked
    walkers contribute zero to the gradient (their diff is exactly zero). The
    raw energies remain visible in AuxiliaryLossData.local_energy.
    """
    if jnp.iscomplexobj(e_l):
        finite = jnp.isfinite(e_l.real) & jnp.isfinite(e_l.imag)
    elif e_l.ndim == 2:  # pair representation (batch, 2)
        finite = jnp.all(jnp.isfinite(e_l), axis=-1, keepdims=True)
        count = jnp.maximum(jnp.sum(finite), 1)
        safe = jnp.where(finite, e_l, 0)
        center = jnp.sum(safe, axis=0, keepdims=True) / count
        return jnp.where(finite, e_l, center)
    else:
        finite = jnp.isfinite(e_l)
    count = jnp.maximum(jnp.sum(finite), 1)
    safe = jnp.where(finite, e_l, 0)
    center = jnp.sum(safe) / count
    return jnp.where(finite, e_l, center)


def batch_local_energy_fn(local_energy, el_chunk: int = 0):
    """Batched E_L evaluation: one vmap, or ``lax.map`` over walker chunks.

    el_chunk > 0 evaluates the batch in chunks of that many walkers inside a
    sequential ``lax.map``. Two uses: (a) bounding activation memory at large
    batch x heavy Laplacian, and (b) a different compiled program shape when a
    toolchain miscompiles the full-batch fused program (ROADMAP.md 2026-08-18:
    the forward Laplacian; scripts/probe_forward_ladder.py rung F tests this
    exact shape). The batch must divide evenly.
    """
    vmapped = jax.vmap(
        local_energy,
        in_axes=(None, 0, AINetData(positions=0, spins=None, atoms=None, charges=None)),
        out_axes=(0, 0))
    if not el_chunk:
        return vmapped

    def batched(params, keys, data):
        b = data.positions.shape[0]
        if b % el_chunk:
            raise ValueError(
                f"el_chunk={el_chunk} must divide the device batch {b}")
        n_chunks = b // el_chunk
        keys_c = keys.reshape(n_chunks, el_chunk, *keys.shape[1:])
        pos_c = data.positions.reshape(n_chunks, el_chunk,
                                       *data.positions.shape[1:])

        def one_chunk(args):
            k, p = args
            d = AINetData(positions=p, spins=data.spins, atoms=data.atoms,
                          charges=data.charges)
            return vmapped(params, k, d)

        out = jax.lax.map(one_chunk, (keys_c, pos_c))
        return jax.tree_util.tree_map(
            lambda x: x.reshape(b, *x.shape[2:]), out)

    return batched


def make_loss(network,
              local_energy,
              clip_local_energy: float = 0.0,
              clip_from_median: bool = True,
              center_at_clipped_energy: bool = True,
              complex_output: bool = False,
              mask_nonfinite_energy: bool = True,
              pair_output: bool = False,
              el_chunk: int = 0):
    """Builds total_energy(params, key, data) -> (loss, AuxiliaryLossData)
    with the unbiased custom-JVP gradient (ref loss.py:138-272).

    pair_output: complex wavefunction carried in the TPU-safe (Re, Im) pair
    representation — E_L arrives as (batch, 2) columns and ``network`` returns
    the stacked [log|psi|, phase] pair; the gradient formula is the complex
    one (ref loss.py:255-264) expanded into real arithmetic.

    el_chunk: see ``batch_local_energy_fn``.
    """
    batch_local_energy = batch_local_energy_fn(local_energy, el_chunk)
    batch_network = jax.vmap(network, in_axes=(None, 0, None, None, None), out_axes=0)

    @jax.custom_jvp
    def total_energy(params: ParamTree, key: chex.PRNGKey, data: AINetData):
        keys = jax.random.split(key, num=data.positions.shape[0])
        e_l, e_l_mat = batch_local_energy(params, keys, data)
        e_l_used = _mask_nonfinite(e_l) if mask_nonfinite_energy else e_l
        if pair_output:
            mean_pair = jnp.mean(e_l_used, axis=0)      # (2,) [Re, Im]
            loss_diff = e_l_used - mean_pair[None]
            variance = jnp.mean(jnp.sum(loss_diff * loss_diff, axis=-1))
            return mean_pair[0], AuxiliaryLossData(
                variance=variance,
                local_energy=e_l_used,
                clipped_energy=e_l_used,
                grad_local_energy=None,
                local_energy_mat=e_l_mat)
        loss = jnp.mean(e_l_used)
        loss_diff = e_l_used - loss
        variance = jnp.mean(loss_diff * jnp.conj(loss_diff))
        return loss, AuxiliaryLossData(
            variance=variance.real,
            local_energy=e_l_used,
            clipped_energy=e_l_used,
            grad_local_energy=None,
            local_energy_mat=e_l_mat)

    @total_energy.defjvp
    def total_energy_jvp(primals, tangents):  # pylint: disable=unused-variable
        params, key, data = primals
        loss, aux_data = total_energy(params, key, data)

        if pair_output:
            mean_pair = jnp.mean(aux_data.local_energy, axis=0)
            if clip_local_energy > 0.0:
                aux_data.clipped_energy, diff = clip_local_values(
                    aux_data.local_energy, mean_pair, clip_local_energy,
                    clip_from_median, center_at_clipped_energy,
                    complex_output, pair_output=True)
            else:
                diff = aux_data.local_energy - mean_pair[None]
        elif clip_local_energy > 0.0:
            aux_data.clipped_energy, diff = clip_local_values(
                aux_data.local_energy, loss, clip_local_energy, clip_from_median,
                center_at_clipped_energy, complex_output)
        else:
            diff = aux_data.local_energy - loss

        data = primals[2]
        data_tangents = tangents[2]
        primals_net = (primals[0], data.positions, data.spins, data.atoms,
                       data.charges)
        tangents_net = (tangents[0], data_tangents.positions, data_tangents.spins,
                        data_tangents.atoms, data_tangents.charges)
        psi_primal, psi_tangent = jax.jvp(batch_network, primals_net, tangents_net)

        device_batch_size = jnp.shape(aux_data.local_energy)[0]
        if pair_output:
            # Complex gradient (ref loss.py:255-264) in real-pair arithmetic:
            # term1 = 2 Re<clipped_el, conj(psi_t)>; Re term2 = <ce_r, pt_r>.
            ce = aux_data.clipped_energy
            ce = ce[None] if ce.ndim == 1 else ce       # scalar center or array
            clipped_el = diff + ce                      # (batch, 2)
            pt_r, pt_i = psi_tangent[:, 0], psi_tangent[:, 1]
            term1 = 2.0 * (jnp.dot(clipped_el[:, 0], pt_r)
                           + jnp.dot(clipped_el[:, 1], pt_i))
            term2 = jnp.dot(ce[:, 0] if ce.shape[0] > 1 else
                            jnp.broadcast_to(ce[:, 0], pt_r.shape), pt_r)
            primals_out = loss, aux_data
            tangents_out = ((term1 - 2.0 * term2) / device_batch_size, aux_data)
        elif complex_output:
            clipped_el = diff + aux_data.clipped_energy
            term1 = (jnp.dot(clipped_el, jnp.conjugate(psi_tangent)) +
                     jnp.dot(jnp.conjugate(clipped_el), psi_tangent))
            term2 = jnp.sum(aux_data.clipped_energy * psi_tangent.real)
            primals_out = loss.real, aux_data
            tangents_out = ((term1 - 2 * term2).real / device_batch_size, aux_data)
        else:
            primals_out = loss, aux_data
            tangents_out = (jnp.dot(psi_tangent, diff) / device_batch_size, aux_data)
        return primals_out, tangents_out

    return total_energy


def make_wqmc_loss(network,
                   local_energy,
                   clip_local_energy: float = 0.0,
                   clip_from_median: bool = True,
                   center_at_clipped_energy: bool = True,
                   complex_output: bool = False,
                   pair_output: bool = False,
                   el_chunk: int = 0):
    """WQMC objective with score-based tangent and outlier mask
    (ref loss.py:275-416).

    pair_output: TPU-safe complex representation — E_L is (batch, 2) [Re, Im],
    ``network`` returns stacked [log|psi|, phase]; the score and guiding use
    log|psi| (column 0) and the energy term is Re<conj(diff), dpsi>.

    el_chunk: see ``batch_local_energy_fn``.
    """
    batch_local_energy = batch_local_energy_fn(local_energy, el_chunk)
    batch_network = jax.vmap(network, in_axes=(None, 0, None, None, None), out_axes=0)

    @jax.custom_jvp
    def total_energy(params: ParamTree, key: chex.PRNGKey, data: AINetData):
        keys = jax.random.split(key, num=data.positions.shape[0])
        e_l, e_l_mat = batch_local_energy(params, keys, data)
        if pair_output:
            mean_pair = jnp.mean(e_l, axis=0)
            loss = mean_pair[0]
            loss_diff = e_l - mean_pair[None]
            variance = jnp.mean(jnp.sum(loss_diff * loss_diff, axis=-1))
        else:
            loss = jnp.mean(e_l)
            loss_diff = e_l - loss
            variance = jnp.mean(loss_diff * jnp.conj(loss_diff)).real

        def batch_local_energy_pos(pos):
            network_data = AINetData(
                positions=pos, spins=data.spins, atoms=data.atoms,
                charges=data.charges)
            out = batch_local_energy(params, keys, network_data)[0]
            return out[:, 0].sum() if pair_output else out.sum()

        grad_e_l = jax.grad(batch_local_energy_pos)(data.positions)
        grad_e_l = jnp.tanh(jax.lax.stop_gradient(grad_e_l))
        return loss, AuxiliaryLossData(
            variance=variance.real,
            local_energy=e_l,
            clipped_energy=e_l,
            grad_local_energy=grad_e_l,
            local_energy_mat=e_l_mat)

    @total_energy.defjvp
    def total_energy_jvp(primals, tangents):  # pylint: disable=unused-variable
        params, key, data = primals
        loss, aux_data = total_energy(params, key, data)
        if pair_output:
            mean_pair = jnp.mean(aux_data.local_energy, axis=0)
            if clip_local_energy > 0.0:
                aux_data.clipped_energy, diff = clip_local_values(
                    aux_data.local_energy, mean_pair, clip_local_energy,
                    clip_from_median, center_at_clipped_energy,
                    complex_output, pair_output=True)
            else:
                diff = aux_data.local_energy - mean_pair[None]
        elif clip_local_energy > 0.0:
            aux_data.clipped_energy, diff = clip_local_values(
                aux_data.local_energy, loss, clip_local_energy, clip_from_median,
                center_at_clipped_energy, complex_output)
        else:
            diff = aux_data.local_energy - loss

        def log_q(params_, pos_, spins_, atoms_, charges_):
            out = batch_network(params_, pos_, spins_, atoms_, charges_)
            if pair_output:
                out = out[:, 0]  # guiding distribution |psi|^2: log|psi| only
            return out.sum()

        score = jax.grad(log_q, argnums=1)
        primals_net = (params, data.positions, data.spins, data.atoms, data.charges)
        tangents_net = (tangents[0], tangents[2].positions, tangents[2].spins,
                        tangents[2].atoms, tangents[2].charges)
        score_primal, score_tangent = jax.jvp(score, primals_net, tangents_net)

        score_norm = jnp.linalg.norm(score_primal, axis=-1, keepdims=True)
        median = jnp.median(score_norm)
        deviation = jnp.mean(jnp.abs(score_norm - median))
        mask = score_norm < (median + 5 * deviation)
        log_q_tangent_out = (aux_data.grad_local_energy * score_tangent * mask).sum(
            axis=1)
        log_q_tangent_out *= len(mask) / mask.sum()

        _, psi_tangent = jax.jvp(batch_network, primals_net, tangents_net)
        if pair_output:
            # Re<conj(diff), dpsi> with dpsi = dlog|psi| + i dphase.
            log_q_tangent_out += (diff[:, 0] * psi_tangent[:, 0]
                                  + diff[:, 1] * psi_tangent[:, 1])
        else:
            # Conjugated form Re<conj(diff), dpsi>, the standard energy-gradient
            # formula — identical to the pair path above (a real wavefunction is
            # unaffected: conj/Re are no-ops).
            log_q_tangent_out += (jnp.conjugate(diff) * psi_tangent).real
        primals_out = loss, aux_data
        tangents_out = (log_q_tangent_out.mean(), aux_data)
        return primals_out, tangents_out

    return total_energy
