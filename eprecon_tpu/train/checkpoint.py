"""Checkpoint save/restore (orbax).

Reference: main.py:343-348 (epoch-granularity torch.save of model+optimizer)
and :186-219 (RESUME latest-by-name, LOADCKPT warm start with optional
submodule-only loading). Additions over the reference: the streaming
RecurrentState / PanopticGlobalMap can be checkpointed too, so an online
reconstruction session can resume mid-scene.
"""
from __future__ import annotations

import os
import re
from typing import Any, Optional

import jax


def _ckptr():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def save_checkpoint(logdir: str, epoch: int, state: Any):
    """Save under <logdir>/model_<epoch:06d> (reference naming)."""
    path = os.path.abspath(os.path.join(logdir, f"model_{epoch:06d}"))
    _ckptr().save(path, jax.device_get(state), force=True)
    return path


def latest_checkpoint(logdir: str) -> Optional[str]:
    if not os.path.isdir(logdir):
        return None
    cands = [d for d in os.listdir(logdir) if re.fullmatch(r"model_\d{6}", d)]
    if not cands:
        return None
    return os.path.join(logdir, sorted(cands)[-1])


def restore_checkpoint(path: str, target: Any) -> Any:
    """Restore into the structure of `target` (shapes/dtypes as template).

    Format note: round 4 (commit a2c632d) wrapped the optimizer in
    optax.flatten, which changed the opt_state pytree from per-leaf Adam
    moments to one raveled vector. Checkpoints written before that cannot be
    resumed into the current structure; fail with a clear message instead of
    orbax's structure-mismatch traceback (params-only warm start via
    `loadckpt` + restore_submodule still works on old files)."""
    try:
        return _ckptr().restore(os.path.abspath(path),
                                item=jax.device_get(target))
    except ValueError as e:
        if target is not None and "opt_state" in str(e):
            raise ValueError(
                f"checkpoint {path} has an incompatible opt_state layout "
                f"(pre-flat-optimizer format, before round-4 commit "
                f"a2c632d). Full resume is not possible; warm-start params "
                f"only with `loadckpt` into a fresh optimizer.") from e
        raise


def restore_submodule(path: str, target_params: Any, prefix: str) -> Any:
    """Warm-start only params under `prefix` (reference main.py:208-219
    load_c partial-load switch)."""
    restored = _ckptr().restore(os.path.abspath(path))
    params = restored["params"] if "params" in restored else restored

    def merge(path_keys, old):
        node = params
        for k in path_keys:
            if not isinstance(node, dict) or k.key not in node:
                return old
            node = node[k.key]
        joined = "/".join(k.key for k in path_keys)
        return node if joined.startswith(prefix) else old

    return jax.tree_util.tree_map_with_path(
        lambda p, v: merge(p, v), target_params)
