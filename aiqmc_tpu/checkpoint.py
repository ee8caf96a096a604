"""Checkpoint save/restore.

Capability parity with ref ``AIQMCrelease3/checkpoint.py`` (find_last_checkpoint /
create_save_path / get_restore_path / save / restore), with the pickle fragility
fixed: the reference ``np.savez``-pickles raw JAX arrays (checkpoint.py:44-60),
which breaks across JAX versions (its own committed checkpoints no longer load).
Here parameter/optimizer pytrees are serialised with flax msgpack (pure
arrays + container structure, version-stable) and walker data fields are stored
as plain npz arrays.
"""

from __future__ import annotations

import datetime
import os
import zipfile
from typing import Optional, Tuple

import jax
import numpy as np
from absl import logging
from flax import serialization

from aiqmc_tpu.models.network import AINetData

CKPT_PREFIX = "qmcjax_ckpt_"


def find_last_checkpoint(ckpt_path: Optional[str] = None) -> Optional[str]:
    """Most recent loadable checkpoint in a directory (ref checkpoint.py:13-24)."""
    if ckpt_path and os.path.exists(ckpt_path):
        files = [f for f in os.listdir(ckpt_path)
                 if CKPT_PREFIX in f and f.endswith(".npz")]
        for file in sorted(files, reverse=True):
            fname = os.path.join(ckpt_path, file)
            with open(fname, "rb") as f:
                try:
                    np.load(f, allow_pickle=False)
                    return fname
                except (OSError, EOFError, zipfile.BadZipFile, ValueError):
                    logging.info(
                        "Error loading checkpoint %s. Trying next checkpoint...",
                        fname)
    return None


def create_save_path(save_path: Optional[str]) -> str:
    """Timestamped default save dir (ref checkpoint.py:27-33)."""
    timestamp = datetime.datetime.now().strftime("%Y_%m_%d_%H_%M_%S")
    default_save_path = os.path.join(os.getcwd(), f"AInet_{timestamp}")
    ckpt_save_path = save_path or default_save_path
    os.makedirs(ckpt_save_path, exist_ok=True)
    return ckpt_save_path


def get_restore_path(restore_path: Optional[str] = None) -> Optional[str]:
    return restore_path or None


def _to_host(tree):
    return jax.tree_util.tree_map(np.asarray, tree)


def save(save_path: str, t: int, data: AINetData, params, opt_state,
         extra: Optional[dict] = None) -> str:
    """Writes qmcjax_ckpt_{t:06d}.npz (ref checkpoint.py:44-60, stable format)."""
    ckpt_filename = os.path.join(save_path, f"{CKPT_PREFIX}{t:06d}.npz")
    logging.info("Saving checkpoint %s", ckpt_filename)
    payload = {
        "t": t,
        "positions": np.asarray(data.positions),
        "spins": np.asarray(data.spins),
        "atoms": np.asarray(data.atoms),
        "charges": np.asarray(data.charges),
        "params_msgpack": np.frombuffer(
            serialization.to_bytes(_to_host(params)), dtype=np.uint8),
        # Optimizer states may be arbitrary pytrees (optax namedtuples, custom
        # dataclasses like KfacState); store their leaves — the restore target
        # supplies the structure.
        "opt_state_msgpack": np.frombuffer(
            serialization.to_bytes(
                {str(i): leaf for i, leaf in enumerate(
                    jax.tree_util.tree_leaves(_to_host(opt_state)))}),
            dtype=np.uint8),
    }
    for key, value in (extra or {}).items():
        payload["extra_" + key] = np.asarray(value)
    # Atomic write: queue stages are routinely killed by `timeout` (see
    # CLAUDE.md chip-queue workflow) and a kill mid-savez must never leave a
    # half-written file under the final name.
    tmp_filename = ckpt_filename + ".tmp"
    with open(tmp_filename, "wb") as f:
        np.savez(f, **payload)
    os.replace(tmp_filename, ckpt_filename)
    return ckpt_filename


EMA_EXTRA_KEY = "ema_params_msgpack"


def ema_to_extra(ema_params) -> np.ndarray:
    """Serialises a Polyak-averaged param pytree for the ``extra`` payload.

    Extras are flat npz arrays, so the pytree goes through the same msgpack
    encoding as ``params_msgpack`` and is stored as a uint8 byte array under
    ``EMA_EXTRA_KEY`` (old checkpoints simply lack the key — restores stay
    compatible both ways)."""
    return np.frombuffer(serialization.to_bytes(_to_host(ema_params)),
                         dtype=np.uint8)


def ema_from_extra(extra: Optional[dict], params_template):
    """Decodes the EMA param pytree from a restore's ``extra`` dict.

    Returns None when the checkpoint predates EMA tracking (or the saving run
    had ``optim.ema_decay == 0``); the template supplies tree structure and
    leaf shapes."""
    if not extra or EMA_EXTRA_KEY not in extra:
        return None
    return serialization.from_bytes(_to_host(params_template),
                                    np.asarray(extra[EMA_EXTRA_KEY]).tobytes())


def has_ema(ckpt_dir_or_file) -> bool:
    """True when the latest checkpoint under ``ckpt_dir_or_file`` (a dir to
    scan, or a checkpoint file) carries Polyak-averaged params.

    The one-call auto-detection the DMC scripts use ("DMC from the EMA trial
    whenever the VMC run tracked one") — keep format knowledge here rather
    than in each script."""
    import os
    path = ckpt_dir_or_file
    if path and os.path.isdir(path):
        path = find_last_checkpoint(path)
    if not path or not os.path.exists(path):
        return False
    with open(path, "rb") as f:
        return "extra_" + EMA_EXTRA_KEY in np.load(f, allow_pickle=False).files


def _diagnose_param_mismatch(target_params, params_bytes) -> Optional[str]:
    """Human-readable cause when a checkpoint's param tree doesn't match.

    The known footgun: the ``jastrow_ae`` auto-default turned the a-e Jastrow
    off for pseudopotential systems, so checkpoints saved before that change
    carry ``jastrow_ae`` params the current network doesn't build (or vice
    versa). Detect it and tell the user the flag to set.
    """
    try:
        raw = serialization.msgpack_restore(params_bytes)
    except Exception:  # pylint: disable=broad-except
        return None
    if not isinstance(raw, dict) or not isinstance(target_params, dict):
        return None
    # Compare full LEAF paths (+shapes), not top-level keys: every network
    # emits a top-level 'jastrow_ae' entry (an EMPTY dict for the null
    # jastrow), so key presence alone can never catch the footgun — flax
    # from_bytes would still silently drop the checkpoint's Jastrow leaves.
    ckpt_leaves = _leaf_shapes(raw)
    net_leaves = _leaf_shapes(serialization.to_state_dict(target_params))
    if ckpt_leaves == net_leaves:
        return None
    missing = set(ckpt_leaves) - set(net_leaves)   # in ckpt, not in network
    surplus = set(net_leaves) - set(ckpt_leaves)   # in network, not in ckpt
    diff = missing | surplus
    if diff and all(p[0] == "jastrow_ae" for p in diff):
        has = bool(missing)
        want = "True" if has else "False"
        return (f"the checkpoint was saved "
                f"{'with' if has else 'without'} an atom-electron Jastrow "
                f"but the current config builds the network "
                f"{'without' if has else 'with'} one (the jastrow_ae default "
                f"is now off for use_pp systems). Set "
                f"cfg.network.jastrow_ae={want} to restore this checkpoint")
    if diff:
        fmt = lambda ps: sorted("/".join(p) for p in ps)[:8]
        return (f"checkpoint params have leaves {fmt(missing)} the network "
                f"lacks; network has leaves {fmt(surplus)} the checkpoint "
                f"lacks")
    mismatched = [("/".join(p), ckpt_leaves[p], net_leaves[p])
                  for p in ckpt_leaves if ckpt_leaves[p] != net_leaves[p]]
    path, cs, ns = mismatched[0]
    return (f"{len(mismatched)} param leaves change shape, e.g. '{path}' is "
            f"{cs} in the checkpoint but {ns} in the network (different "
            f"hidden_dims/determinants?)")


def _leaf_shapes(tree, prefix=()):
    """{leaf path tuple: shape} over nested dict/list/tuple containers."""
    if isinstance(tree, dict):
        out = {}
        for k, v in tree.items():
            out.update(_leaf_shapes(v, prefix + (str(k),)))
        return out
    if isinstance(tree, (list, tuple)):
        out = {}
        for i, v in enumerate(tree):
            out.update(_leaf_shapes(v, prefix + (str(i),)))
        return out
    return {prefix: tuple(getattr(tree, "shape", ()))}


def restore(restore_filename: str,
            batch_size: Optional[int] = None,
            target_params=None,
            target_opt_state=None,
            allow_batch_resize: bool = False
            ) -> Tuple[int, AINetData, object, object, dict]:
    """Loads a checkpoint, resuming at t+1 (ref checkpoint.py:63-71).

    If target pytrees are given, the msgpack payloads are restored into their
    exact container structure; otherwise nested dicts/lists of arrays are
    returned. The final element is the ``extra`` dict passed to ``save``
    (e.g. mcmc_width, density state — ref ferminet/checkpoint.py:92-181).
    """
    logging.info("Loading checkpoint %s", restore_filename)
    with open(restore_filename, "rb") as f:
        ckpt = np.load(f, allow_pickle=False)
        t = int(ckpt["t"]) + 1
        data = AINetData(
            positions=ckpt["positions"],
            spins=ckpt["spins"],
            atoms=ckpt["atoms"],
            charges=ckpt["charges"])
        extra = {key[len("extra_"):]: ckpt[key] for key in ckpt.files
                 if key.startswith("extra_")}
        params_bytes = ckpt["params_msgpack"].tobytes()
        opt_bytes = ckpt["opt_state_msgpack"].tobytes()
        if target_params is not None:
            # Pre-check key sets: flax from_bytes SILENTLY DROPS checkpoint
            # keys absent from the target (a checkpoint saved with jastrow_ae
            # would restore into a jastrow-less network with no error).
            cause = _diagnose_param_mismatch(target_params, params_bytes)
            if cause:
                raise ValueError(
                    f"Cannot restore {restore_filename}: {cause}.")
            params = serialization.from_bytes(target_params, params_bytes)
        else:
            params = serialization.msgpack_restore(params_bytes)
        leaf_dict = serialization.msgpack_restore(opt_bytes)
        leaves = [leaf_dict[str(i)] for i in range(len(leaf_dict))]
        if target_opt_state is not None:
            treedef = jax.tree_util.tree_structure(target_opt_state)
            try:
                opt_state = jax.tree_util.tree_unflatten(treedef, leaves)
            except ValueError:
                # Restoring under a different optimizer (e.g. evaluating a VMC
                # checkpoint with optimizer='none', or switching adam<->kfac):
                # keep the freshly initialised state; params/walkers are what
                # matter.
                logging.warning(
                    "Checkpoint optimizer state does not match the current "
                    "optimizer; reinitialising optimizer state.")
                opt_state = target_opt_state
        else:
            opt_state = leaves
    if batch_size is not None and data.positions.shape[0] != batch_size:
        if not allow_batch_resize:
            raise ValueError(
                f"Checkpoint batch size {data.positions.shape[0]} does not"
                f" match requested batch size {batch_size}. Set"
                f" cfg.log.restore_resize=True to subsample/tile walkers.")
        # Walkers are (approximately) i.i.d. |psi|^2 samples, so shrinking is
        # a plain subsample and growing is tiling; the trainer's burn-in
        # decorrelates the copies before any statistics are taken.
        pos = np.asarray(data.positions)
        reps = -(-batch_size // pos.shape[0])  # ceil
        pos = np.tile(pos, (reps, 1))[:batch_size]
        logging.warning(
            "Resized restored walker batch %d -> %d (restore_resize).",
            data.positions.shape[0], batch_size)
        data = AINetData(positions=pos, spins=data.spins, atoms=data.atoms,
                         charges=data.charges)
    return t, data, params, opt_state, extra
