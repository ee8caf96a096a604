"""Multi-host coordination utilities.

Capability parity with ref ``ferminet/utils/multi_host.py:22-44``
(``check_synced``) and the seed broadcast used by every reference driver
(``multihost_utils.broadcast_one_to_all``, ref main_pp_adam_muti_GPU.py:61-63).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def broadcast_seed(seed: int) -> int:
    """Broadcasts a seed from host 0 so all hosts agree (no-op single-host)."""
    if jax.process_count() == 1:
        return int(seed)
    from jax.experimental import multihost_utils
    arr = multihost_utils.broadcast_one_to_all(jnp.asarray([seed]))
    return int(np.asarray(arr)[0])


def check_synced(tree) -> bool:
    """Asserts that a replicated pytree is identical across hosts.

    Single-host: trivially True. Multi-host: compares a fingerprint via psum.
    """
    if jax.process_count() == 1:
        return True
    from jax.experimental import multihost_utils
    leaves = jax.tree_util.tree_leaves(tree)
    fingerprint = np.asarray([float(jnp.sum(jnp.abs(leaf))) for leaf in leaves])
    gathered = multihost_utils.process_allgather(jnp.asarray(fingerprint))
    ok = bool(np.allclose(gathered, gathered[0]))
    if not ok:
        raise AssertionError("Pytree is not synchronised across hosts")
    return ok


def broadcast_tree(tree):
    """Broadcasts a pytree from process 0 to all hosts (no-op single-host).

    Used after host-local pretraining so every process enters training with
    identical parameters (ref multihost seed/mo_coeff broadcasts,
    main_pp_adam.py:64-65, ferminet/train.py:436-438)."""
    if jax.process_count() == 1:
        return tree
    from jax.experimental import multihost_utils
    return multihost_utils.broadcast_one_to_all(tree)
