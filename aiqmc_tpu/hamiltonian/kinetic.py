"""Local kinetic energy: -1/2 (nabla^2 log|psi| + (nabla log|psi|)^2) with complex
phase terms.

Parity with ref ``AIQMCrelease3/Energy/hamiltonian.py:77-132`` (and the identical
``pphamiltonian.py:67-106``), re-designed for TPU:

The reference loops a ``lax.fori_loop`` over all 3N coordinates, pushing one
one-hot tangent through the linearised gradient per iteration — a long sequential
dependency chain of small kernels. Here the 3N tangents are pushed through the
same linearisation with a single ``vmap`` (optionally chunked to bound memory), so
the Hessian-diagonal evaluation becomes one batched computation whose matmuls
stack onto the MXU. Complex output shares one linearisation pass per component,
exactly like the reference.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from aiqmc_tpu.utils.utils import select_output


def local_kinetic_energy(f,
                         use_scan: bool = False,
                         complex_output: bool = True,
                         laplacian_chunk: Optional[int] = None,
                         pair_output: bool = False) -> Callable:
    """Returns ke(params, data) evaluating -1/2 del^2 ln|f| (+ phase terms).

    Args:
      f: network returning (phase, log|psi|).
      use_scan: kept for API parity with the reference; when True (or when
        ``laplacian_chunk`` is set) the vmapped tangent batch is processed in
        chunks via ``lax.map`` to bound activation memory.
      complex_output: include the phase-gradient terms (ref hamiltonian.py:111-130).
      laplacian_chunk: number of coordinates per chunk; None = all 3N at once.
      pair_output: with complex_output, return the complex kinetic energy as a
        stacked real pair [Re, Im] instead of a complex scalar (TPU-safe).
    """
    phase_f = select_output(f, 0)
    logabs_f = select_output(f, 1)

    def _lapl_over_f(params, data):
        n = data.positions.shape[0]
        eye = jnp.eye(n, dtype=data.positions.dtype)

        grad_f = jax.grad(logabs_f, argnums=1)

        def grad_f_closure(x):
            return grad_f(params, x, data.spins, data.atoms, data.charges)

        primal, dgrad_f = jax.linearize(grad_f_closure, data.positions)

        if complex_output:
            grad_phase = jax.grad(phase_f, argnums=1)

            def grad_phase_closure(x):
                return grad_phase(params, x, data.spins, data.atoms, data.charges)

            phase_primal, dgrad_phase = jax.linearize(
                grad_phase_closure, data.positions)

            if pair_output:
                def hess_diag(i, v):
                    return jnp.stack([dgrad_f(v)[i], dgrad_phase(v)[i]])
            else:
                def hess_diag(i, v):
                    return dgrad_f(v)[i] + 1.0j * dgrad_phase(v)[i]
        else:
            phase_primal = None

            def hess_diag(i, v):
                return dgrad_f(v)[i]

        idx = jnp.arange(n)
        if laplacian_chunk is not None or use_scan:
            chunk = laplacian_chunk or 1
            diagonal = jax.lax.map(
                lambda args: hess_diag(*args), (idx, eye), batch_size=chunk)
        else:
            diagonal = jax.vmap(hess_diag)(idx, eye)
        if complex_output and pair_output:
            # diagonal: (n, 2) stacked [d2 log|psi|, d2 phase] rows.
            re = (-0.5 * jnp.sum(diagonal[:, 0])
                  - 0.5 * jnp.sum(primal ** 2)
                  + 0.5 * jnp.sum(phase_primal ** 2))
            im = (-0.5 * jnp.sum(diagonal[:, 1])
                  - jnp.sum(primal * phase_primal))
            return jnp.stack([re, im])
        result = -0.5 * jnp.sum(diagonal)
        result -= 0.5 * jnp.sum(primal ** 2)
        if complex_output:
            result += 0.5 * jnp.sum(phase_primal ** 2)
            result -= 1.0j * jnp.sum(primal * phase_primal)
        return result

    return _lapl_over_f


def make_kinetic(f,
                 laplacian_method: str = "default",
                 orbitals_fn=None,
                 complex_output: bool = False,
                 pair_output: bool = False,
                 twist_k=None,
                 ndim: int = 3,
                 use_scan: bool = False,
                 laplacian_chunk: Optional[int] = None) -> Callable:
    """Selects the kinetic-energy evaluator for a local-energy factory.

    The single switch between the batched-tangent Laplacian (the default;
    works for every representation) and the forward Laplacian
    (``laplacian_method="forward"``; needs ``orbitals_fn`` and a real or
    (re,im)-pair wavefunction — the true complex-dtype path is unsupported).
    Shared by every Hamiltonian module (molecular, ECP, Ewald, PBC+ECP) so
    kinetic-path guards/options evolve in one place.
    """
    if laplacian_method == "forward":
        if orbitals_fn is None or (complex_output and not pair_output):
            raise ValueError("forward Laplacian needs orbitals_fn and a real "
                             "or pair-complex wavefunction")
        from aiqmc_tpu.ops.forward_laplacian import (make_forward_kinetic,
                                                     make_forward_kinetic_pair)
        if complex_output:
            return make_forward_kinetic_pair(orbitals_fn, twist_k=twist_k,
                                             ndim=ndim)
        return make_forward_kinetic(orbitals_fn)
    return local_kinetic_energy(f, use_scan=use_scan,
                                complex_output=complex_output,
                                laplacian_chunk=laplacian_chunk,
                                pair_output=pair_output)
