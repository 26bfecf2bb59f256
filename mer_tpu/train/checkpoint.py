"""Checkpointing.

Logical contents match the reference's torch.save dicts
(src/train.py:163-168): {epoch, model params, optimizer state}, plus an
``extra`` slot used for early-stop state resume (the audio_mel pipeline is
the only reference pipeline that resumes min_loss_val/patience_counter,
audio_mel/train.py:143-154 — here every pipeline gets that for free).

Format is flax msgpack (readable without torch, per BASELINE.json's layout
note).  ``best_weights`` shadow-copy promotion on early stop mirrors
src/train.py:186-210.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np
from flax import serialization


def _host(tree: Any) -> Any:
    """Fetch a (possibly sharded) pytree fully to host numpy."""
    return jax.tree.map(lambda x: np.asarray(jax.device_get(x)), tree)


def save_checkpoint(path: str | os.PathLike, *, epoch: int, params: Any, opt_state: Any = None, extra: dict | None = None) -> None:
    payload = {
        "epoch": np.int64(epoch),
        # to_state_dict turns tuples/namedtuples (optax states) into dicts
        "params": serialization.to_state_dict(_host(params)),
        "opt_state": serialization.to_state_dict(_host(opt_state)) if opt_state is not None else {},
        "extra": extra or {},
    }
    path = os.path.abspath(os.fspath(path))
    os.makedirs(os.path.dirname(path), exist_ok=True)
    blob = serialization.msgpack_serialize(payload)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, path)  # atomic: a crash never leaves a torn checkpoint


def load_checkpoint(path: str | os.PathLike) -> dict:
    """Load a checkpoint as plain numpy pytrees (no target template needed)."""
    with open(path, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    payload["epoch"] = int(payload["epoch"])
    return payload


def restore_into(template: Any, restored: Any) -> Any:
    """Map a restored (dict-of-dicts numpy) tree onto a template pytree
    (params dict or optax state tuple), validating structure and shapes."""
    out = serialization.from_state_dict(template, restored)
    for t, r in zip(jax.tree_util.tree_leaves(template), jax.tree_util.tree_leaves(out)):
        if hasattr(t, "shape") and tuple(np.shape(t)) != tuple(np.shape(r)):
            raise ValueError(f"Checkpoint shape mismatch: {np.shape(r)} vs {np.shape(t)}")
    return out
