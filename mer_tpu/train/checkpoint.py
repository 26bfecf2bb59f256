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


# ---------------------------------------------------------------------------
# Distributed (per-process sharded) checkpointing
# ---------------------------------------------------------------------------
#
# On a multi-host pod, gathering every globally-sharded array to one host
# before writing (save_checkpoint's _host) is O(model) cross-host traffic and
# O(model) host RAM on process 0.  save_checkpoint_sharded instead has EVERY
# process write only its addressable shards to its own file
# (<dir>/shard<i>-of-<n>.msgpack, atomic); replicated leaves are written once
# (process 0).  load_checkpoint_sharded merges the files back into plain
# numpy trees (verifying full coverage), so restore_into works unchanged.
# The reference has no distributed story at all (single GPU, torch.save).

_LEAF = "__ckpt_leaf__"


def _spec_key(index, shape) -> str:
    import json

    return json.dumps([list(sl.indices(d))[:2] for sl, d in zip(index, shape)])


def _shardify(tree: Any, process_index: int) -> Any:
    """Replace every array leaf of a state dict with a self-describing dict:
    either this process's addressable shards (globally sharded arrays) or
    the full value on process 0 / an '__elsewhere__' marker otherwise."""

    def leaf(x):
        if isinstance(x, jax.Array) and hasattr(x, "sharding") and not x.sharding.is_fully_replicated:
            shape = tuple(x.shape)
            shards: dict[str, np.ndarray] = {}
            for s in x.addressable_shards:
                key = _spec_key(s.index, shape)
                if key not in shards:
                    shards[key] = np.asarray(s.data)
            if not shards:
                # an array placed on a sub-mesh this process has no devices
                # in: nothing addressable here — other processes cover it
                return {_LEAF: 1, "kind": "elsewhere"}
            return {_LEAF: 1, "kind": "sharded", "shape": list(shape),
                    "dtype": str(np.asarray(next(iter(shards.values()))).dtype),
                    "shards": shards}
        if process_index == 0:
            return {_LEAF: 1, "kind": "value", "value": np.asarray(jax.device_get(x))}
        return {_LEAF: 1, "kind": "elsewhere"}

    return jax.tree.map(leaf, tree)


def save_checkpoint_sharded(
    dirpath: str | os.PathLike, *, epoch: int, params: Any, opt_state: Any = None,
    extra: dict | None = None, process_index: int | None = None,
    process_count: int | None = None,
) -> str:
    """Write this process's shard file; returns its path.  Call from EVERY
    process (each touches only addressable data — no collectives)."""
    from mer_tpu.data.process_sharding import resolve_process

    pi, pc = resolve_process(process_index, process_count)
    payload = {
        "epoch": np.int64(epoch),
        "process_index": np.int64(pi),
        "process_count": np.int64(pc),
        "params": _shardify(serialization.to_state_dict(params), pi),
        "opt_state": _shardify(serialization.to_state_dict(opt_state), pi) if opt_state is not None else {},
        "extra": extra or {},
    }
    path = os.path.join(os.path.abspath(os.fspath(dirpath)), f"shard{pi:05d}-of-{pc:05d}.msgpack")
    _write_payload(path, payload)
    return path


def _merge_leaf(leaves: list[dict]) -> np.ndarray:
    import json

    kinds = {l["kind"] for l in leaves}
    if "sharded" in kinds:
        ref = next(l for l in leaves if l["kind"] == "sharded")
        shape = tuple(int(d) for d in ref["shape"])
        out = np.empty(shape, dtype=np.dtype(ref["dtype"]) if "bfloat16" not in ref["dtype"] else _bf16())
        seen = np.zeros(shape, dtype=bool)
        for l in leaves:
            if l["kind"] != "sharded":
                continue
            for key, arr in l["shards"].items():
                idx = tuple(slice(a, b) for a, b in json.loads(key))
                out[idx] = arr
                seen[idx] = True
        if not seen.all():
            raise ValueError(f"sharded checkpoint leaf has uncovered regions (shape {shape})")
        return out
    for l in leaves:
        if l["kind"] == "value":
            return l["value"]
    raise ValueError("checkpoint leaf present only as 'elsewhere' markers — shard file(s) missing")


def _bf16():
    import ml_dtypes

    return np.dtype(ml_dtypes.bfloat16)


def _merge_trees(trees: list[Any]) -> Any:
    if all(isinstance(t, dict) and t.get(_LEAF) == 1 for t in trees):
        return _merge_leaf(trees)
    if isinstance(trees[0], dict):
        return {k: _merge_trees([t[k] for t in trees]) for k in trees[0]}
    return trees[0]


def load_checkpoint_sharded(dirpath: str | os.PathLike) -> dict:
    """Merge every shard file into the load_checkpoint payload layout
    (plain numpy trees; feed restore_into / device_put with the target
    shardings to re-place on a mesh)."""
    import glob as _glob

    files = sorted(_glob.glob(os.path.join(os.path.abspath(os.fspath(dirpath)), "shard*-of-*.msgpack")))
    if not files:
        raise FileNotFoundError(f"no shard files under {dirpath}")
    payloads = []
    for p in files:
        with open(p, "rb") as f:
            payloads.append(serialization.msgpack_restore(f.read()))
    pc = int(payloads[0]["process_count"])
    if len(files) != pc:
        raise ValueError(f"found {len(files)} shard files, checkpoint was written by {pc} processes")
    return {
        "epoch": int(payloads[0]["epoch"]),
        "params": _merge_trees([p["params"] for p in payloads]),
        "opt_state": _merge_trees([p["opt_state"] for p in payloads]),
        "extra": payloads[0].get("extra", {}),
    }


def load_checkpoint(path: str | os.PathLike) -> dict:
    """Load a checkpoint as plain numpy pytrees (no target template needed)."""
    with open(path, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    payload["epoch"] = int(payload["epoch"])
    return payload


def save_checkpoint_auto(path, *, sharded: bool = False, epoch: int, params: Any,
                         opt_state: Any = None, extra: dict | None = None) -> None:
    """Dispatch: monolithic file (default) or per-process sharded directory
    (``checkpoint.sharded: true`` in the solver configs — the multi-host
    path where gathering the full state to one host is the wrong move)."""
    if sharded:
        save_checkpoint_sharded(path, epoch=epoch, params=params,
                                opt_state=opt_state, extra=extra)
    else:
        save_checkpoint(path, epoch=epoch, params=params,
                        opt_state=opt_state, extra=extra)


def load_checkpoint_auto(path: str | os.PathLike) -> dict:
    """Load either layout: a sharded checkpoint DIRECTORY or a monolithic
    msgpack file — both return the same payload dict."""
    if os.path.isdir(path):
        return load_checkpoint_sharded(path)
    return load_checkpoint(path)


def remove_checkpoint(path: str | os.PathLike) -> None:
    """Delete either layout (file or sharded directory)."""
    import shutil

    if os.path.isdir(path):
        shutil.rmtree(path)
    elif os.path.exists(path):
        os.remove(path)


def _layer_prefix(state_dict: Any) -> str:
    """Unrolled layer-stack submodule name stem found in a state-dict tree:
    "layers" (fusion TransformerEncoder) or "layer" (RoBERTa/wav2vec2
    backbones). Defaults to "layers" when neither appears."""

    def walk(node: Any) -> str | None:
        if not isinstance(node, dict):
            return None
        for k in node:
            if isinstance(k, str) and k.startswith("layers_") and k[7:].isdigit():
                return "layers"
            if isinstance(k, str) and k.startswith("layer_") and k[6:].isdigit():
                return "layer"
        for v in node.values():
            got = walk(v)
            if got:
                return got
        return None

    return walk(state_dict) or "layers"


def restore_into(template: Any, restored: Any) -> Any:
    """Map a restored (dict-of-dicts numpy) tree onto a template pytree
    (params dict or optax state tuple), validating structure and shapes.

    Layer-stack layout (scan vs unrolled, models/layout.py) is matched
    automatically: a checkpoint written under ``tpu.scan_layers: true``
    (stacked ``layers_scan/layer`` params) loads into an unrolled model and
    vice versa, so flipping the layout config never orphans checkpoints.
    Applies to optimizer state too (Adam moments mirror the param tree)."""
    from mer_tpu.models.layout import match_layout, params_layout

    tdict = serialization.to_state_dict(template)
    t_layout = params_layout(tdict)
    if isinstance(restored, dict) and params_layout(restored) != t_layout:
        prefix = _layer_prefix(tdict if t_layout == "unrolled" else restored)
        restored = match_layout(restored, want_scan=t_layout == "scan", prefix=prefix)
    out = serialization.from_state_dict(template, restored)
    for t, r in zip(jax.tree_util.tree_leaves(template), jax.tree_util.tree_leaves(out)):
        if hasattr(t, "shape") and tuple(np.shape(t)) != tuple(np.shape(r)):
            raise ValueError(f"Checkpoint shape mismatch: {np.shape(r)} vs {np.shape(t)}")
    return out
