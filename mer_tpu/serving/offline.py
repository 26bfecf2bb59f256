"""Offline (whole-split) batch inference as scanned XLA programs.

The reference evaluates splits by iterating a DataLoader and dispatching one
forward per batch (src/test.py:51-71).  Per-batch dispatch costs host->device
round trips and launch latency; for offline evaluation/serving over a fixed
split the TPU-native shape is: group the fixed-shape batches, stack each
group in HBM, and run it as ONE ``lax.scan`` program — a single dispatch per
bucket shape, results fetched in one transfer.

Works with any jit-compatible ``predict_fn(params, batch) -> array`` — the
bf16 Flax forward and the int8 serving engines alike.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np


def recollate_batches(
    batches: list[dict], serving_batch: int = 512
) -> tuple[list[dict], list[tuple[int, tuple[int, int]]]]:
    """Merge same-shape batches into larger serving batches (identity
    re-batching: per-dialogue predictions are unchanged — the batch axis is
    independent — only the GEMM sizes grow).

    The reference evaluates at its training batch size (src/config.yaml:70
    batch_size 32; src/test.py:51 loop) — a GPU-memory artifact that leaves
    v5e's MXU starved: the same fusion forward runs at 108k utt/s per
    [32, U] batch vs 565k at [512, U] (scripts/profile_fusion_serving_batch
    .py). Merging along the batch axis (same bucket width U -> same trailing
    shape) recovers that without touching model or workload semantics.

    Returns (merged_batches, plan): plan[i] = (merged_index, (row_start,
    row_end)) for original batch i, in input order — so callers can scatter
    merged predictions back to per-batch outputs (see split_recollated).
    """
    groups: dict[tuple, list[int]] = {}

    def _dtype(v) -> str:  # never np.asarray a device array just for dtype
        return str(v.dtype) if hasattr(v, "dtype") else str(np.asarray(v).dtype)

    for i, b in enumerate(batches):
        key = tuple(sorted((k, tuple(np.shape(v)[1:]), _dtype(v)) for k, v in b.items()))
        groups.setdefault(key, []).append(i)

    merged: list[dict] = []
    plan: list[tuple[int, tuple[int, int]] | None] = [None] * len(batches)

    def _rows(b: dict) -> int:
        # leading-axis row count from any key (all keys share the batch axis
        # — the group key only fixes trailing shapes, so don't assume 'text')
        return int(np.shape(next(iter(b.values())))[0])

    def flush(chunk: list[int]) -> None:
        j = len(merged)
        merged.append(
            {
                k: np.concatenate([np.asarray(batches[i][k]) for i in chunk])
                for k in batches[chunk[0]].keys()
            }
        )
        off = 0
        for i in chunk:
            n = _rows(batches[i])
            plan[i] = (j, (off, off + n))
            off += n

    for idxs in groups.values():
        # accumulate by CUMULATIVE rows (batch sizes can vary within a shape
        # group — e.g. a ragged tail batch): never exceed serving_batch
        # unless a single batch already does
        chunk: list[int] = []
        rows = 0
        for i in idxs:
            n = _rows(batches[i])
            if chunk and rows + n > serving_batch:
                flush(chunk)
                chunk, rows = [], 0
            chunk.append(i)
            rows += n
        if chunk:
            flush(chunk)
    return merged, plan  # type: ignore[return-value]


def split_recollated(preds: list[np.ndarray], plan) -> list[np.ndarray]:
    """Inverse of :func:`recollate_batches` for per-merged-batch prediction
    arrays: returns per-original-batch predictions in input order."""
    return [preds[j][s:e] for j, (s, e) in plan]


class ScanPredictor:
    """Compile-once scanned batch inference over fixed-shape batch groups.

    Batches are grouped by their shape signature; each group runs as one
    ``lax.scan`` over the stacked [n_batches, ...] arrays (jit caches the
    compiled program per group shape, so repeated splits reuse them).

    With ``mesh``, staged arrays are sharded over the mesh's ``batch_axis``
    along each batch's leading (batch) dimension — data-parallel serving;
    GSPMD propagates the sharding through the scan (params replicate).
    """

    def __init__(self, predict_fn: Callable[[Any, dict], jnp.ndarray],
                 mesh=None, batch_axis: str = "dp"):
        self._predict = predict_fn
        self._mesh = mesh
        self._batch_axis = batch_axis

        def run(params, stacked):
            def body(carry, batch):
                return carry, self._predict(params, batch)

            _, out = jax.lax.scan(body, None, stacked)
            return out

        # one jit object; jax caches compiled programs per input shape itself
        self._run = jax.jit(run)

    def _shard(self, stacked: dict) -> dict:
        if self._mesh is None:
            return stacked
        from jax.sharding import NamedSharding, PartitionSpec as P

        def put(x):
            # [n_batches, B, ...]: scan axis replicated, batch axis sharded
            spec = P(None, self._batch_axis) if x.ndim >= 2 else P()
            return jax.device_put(x, NamedSharding(self._mesh, spec))

        return {k: put(v) for k, v in stacked.items()}

    def stage(self, batches: list[dict]) -> list[tuple[tuple, list[int], dict]]:
        """Group ``batches`` by shape signature and stack each group into
        device-resident arrays: [(shape_key, batch_indices, stacked)].  Host
        numpy inputs are stacked ON HOST first so each (group, key) pays ONE
        H2D transfer (per-batch ships would pay a round trip each on slow
        host links); the staged plan can be re-run many times."""
        groups: dict[tuple, list[int]] = {}
        for i, b in enumerate(batches):
            key = tuple(
                sorted(
                    (k, tuple(np.shape(v)), str(v.dtype if hasattr(v, "dtype") else np.asarray(v).dtype))
                    for k, v in b.items()
                )
            )
            groups.setdefault(key, []).append(i)

        def stack(vals):
            if any(isinstance(v, jax.Array) for v in vals):
                return jnp.stack([jnp.asarray(v) for v in vals])  # already on device
            return jnp.asarray(np.stack(vals))  # one ship per (group, key)

        return [
            (
                key,
                idxs,
                self._shard(
                    {k: stack([batches[i][k] for i in idxs]) for k in batches[idxs[0]].keys()}
                ),
            )
            for key, idxs in groups.items()
        ]

    def run_staged(self, params: Any, staged, n_batches: int) -> list[np.ndarray]:
        """Execute a staged plan: one dispatch per group, one fetch per
        group; per-batch host predictions in original input order."""
        out: list[np.ndarray | None] = [None] * n_batches
        pending = [(idxs, self._run(params, stacked)) for _, idxs, stacked in staged]
        for idxs, preds in pending:  # fetch after all dispatches
            preds = np.asarray(preds)
            for j, i in enumerate(idxs):
                out[i] = preds[j]
        return out  # type: ignore[return-value]

    def __call__(self, params: Any, batches: list[dict]) -> list[np.ndarray]:
        """Run every batch, returning per-batch host predictions in input
        order. ``batches`` may be host numpy or device arrays; each group is
        stacked and shipped once."""
        return self.run_staged(params, self.stage(batches), len(batches))
