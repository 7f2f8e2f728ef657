"""Orbax sharded checkpointing — the TPU-native production format.

Two checkpoint formats coexist in this framework:
  - the reference's torch layout (`model{step:09d}.pt`, train/finetune.py)
    for two-way interop with the PyTorch implementation
    (training_loop.py:309-348 semantics);
  - this module: orbax checkpoints of the FULL sharded state (params +
    optimizer moments + step) for large-scale TPU training, where each host
    writes only its addressable shards and restore can re-lay the state out
    on a DIFFERENT mesh topology (SURVEY.md §5 "checkpoint/resume": the
    TPU equivalent of torch.save is orbax on param pytrees).

Restore-with-resharding: pass the target mesh/shardings via `like=` (an
abstract or concrete pytree); orbax reads each array straight into the
requested sharding, so an 8-chip checkpoint restores onto 1 chip (or a
different data/model split) with no host-side gather.
"""
from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.StandardCheckpointer()


def save_sharded(ckpt_dir: str, step: int, params: Any,
                 opt_state: Any = None) -> str:
    """Write params (+ optional optimizer state) as one orbax checkpoint at
    `ckpt_dir/orbax_{step:09d}`. Sharded arrays are written shard-wise."""
    path = os.path.join(os.path.abspath(ckpt_dir), f"orbax_{step:09d}")
    state = {"params": params, "step": np.int64(step)}
    if opt_state is not None:
        state["opt_state"] = opt_state
    ckptr = _checkpointer()
    ckptr.save(path, state, force=True)
    ckptr.wait_until_finished()
    return path


def latest_sharded(ckpt_dir: str) -> Optional[str]:
    """Newest orbax_NNNNNNNNN directory in ckpt_dir, or None."""
    if not os.path.isdir(ckpt_dir):
        return None
    steps = []
    for f in os.listdir(ckpt_dir):
        if f.startswith("orbax_") and f[6:].isdigit():
            steps.append(int(f[6:]))
    if not steps:
        return None
    return os.path.join(ckpt_dir, f"orbax_{max(steps):09d}")


def restore_sharded(path: str, like: Any = None) -> dict:
    """Restore a checkpoint written by save_sharded.

    like: optional pytree of jax.ShapeDtypeStruct (with .sharding) or
    concrete arrays giving the TARGET shardings — restoring onto a different
    mesh than the one that saved is supported (each array is read directly
    into the requested layout). With like=None, arrays restore unsharded.
    """
    ckptr = _checkpointer()
    if like is None:
        return ckptr.restore(path)
    return ckptr.restore(path, target=like)


def abstract_like(tree: Any, mesh=None, spec_fn=None) -> Any:
    """Build a ShapeDtypeStruct pytree matching `tree`, optionally annotated
    with NamedSharding(mesh, spec_fn(path, leaf)) for resharding restores."""
    from jax.sharding import NamedSharding

    def make(path, leaf):
        leaf = jax.numpy.asarray(leaf) if isinstance(leaf, (int, float)) else leaf
        sharding = None
        if mesh is not None and spec_fn is not None:
            sharding = NamedSharding(mesh, spec_fn(path, leaf))
        return jax.ShapeDtypeStruct(np.shape(leaf), np.asarray(leaf).dtype
                                    if not hasattr(leaf, "dtype") else leaf.dtype,
                                    sharding=sharding)

    return jax.tree_util.tree_map_with_path(make, tree)
