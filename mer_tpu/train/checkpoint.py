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
import threading
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
    _write_payload(path, payload)


class AsyncCheckpointer:
    """Non-blocking checkpoint writes.

    ``save`` snapshots the (device) pytrees to host synchronously — cheap
    next to serialization+disk — then serializes and writes in a background
    thread, so the train loop never stalls on a multi-GB epoch save.  Writes
    to the same path are serialized in submission order (single worker);
    ``wait()`` drains pending writes (called before reads and at shutdown).
    """

    def __init__(self):
        self._lock = threading.Lock()
        self._pending: "threading.Thread | None" = None
        self._error: BaseException | None = None

    def save(self, path, *, epoch, params, opt_state=None, extra=None) -> None:
        # snapshot with copies: host-numpy leaves must be isolated from
        # caller mutation while the background write is in flight
        copy = lambda tree: jax.tree.map(lambda x: np.array(jax.device_get(x)), tree)
        snapshot = {
            "epoch": np.int64(epoch),
            "params": serialization.to_state_dict(copy(params)),
            "opt_state": serialization.to_state_dict(copy(opt_state)) if opt_state is not None else {},
            "extra": extra or {},
        }
        self.wait()  # one in-flight write at a time keeps ordering trivial

        def _write():
            try:
                _write_payload(path, snapshot)
            except BaseException as e:  # surfaced on the next wait()
                self._error = e

        with self._lock:
            self._pending = threading.Thread(target=_write, daemon=True)
            self._pending.start()

    def wait(self) -> None:
        with self._lock:
            t, self._pending = self._pending, None
        if t is not None:
            t.join()
        if self._error is not None:
            err, self._error = self._error, None
            raise err


def _write_payload(path, payload: dict) -> None:
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
