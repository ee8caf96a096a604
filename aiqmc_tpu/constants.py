"""Named-axis collectives (API parity with ref AIQMCrelease3/constants.py:5-9).

The framework's primary distribution mechanism is GSPMD: global-view jit over a
``Mesh(('data',))`` where plain ``jnp.mean``/``jnp.sum`` over the sharded batch
lower to ICI collectives automatically — no named axes needed. These wrappers
exist for code written in the explicit-collective style (e.g. inside
``jax.shard_map`` blocks or Pallas kernels): they apply the named-axis
collective when the axis is bound and degrade to the identity otherwise,
mirroring kfac_jax's ``psum_if_pmap`` behaviour the reference relied on.
"""

from __future__ import annotations

import functools

import jax

PMAP_AXIS_NAME = "qmc_pmap_axis"
DATA_AXIS_NAME = "data"


def _axis_bound(axis_name: str) -> bool:
    try:
        jax.lax.axis_index(axis_name)
        return True
    except NameError:
        return False


def psum_if_bound(x, axis_name: str = DATA_AXIS_NAME):
    return jax.lax.psum(x, axis_name) if _axis_bound(axis_name) else x


def pmean_if_bound(x, axis_name: str = DATA_AXIS_NAME):
    return jax.lax.pmean(x, axis_name) if _axis_bound(axis_name) else x


def all_gather_if_bound(x, axis_name: str = DATA_AXIS_NAME):
    return jax.lax.all_gather(x, axis_name) if _axis_bound(axis_name) else x


# Reference-style spellings.
pmap = functools.partial(jax.pmap, axis_name=PMAP_AXIS_NAME)
psum = functools.partial(psum_if_bound, axis_name=PMAP_AXIS_NAME)
pmean = functools.partial(pmean_if_bound, axis_name=PMAP_AXIS_NAME)
all_gather = functools.partial(all_gather_if_bound, axis_name=PMAP_AXIS_NAME)
