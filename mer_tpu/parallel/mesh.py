"""Device meshes and sharding rules.

The reference is strictly single-device (SURVEY.md §2.2: no
torch.distributed anywhere).  Here parallelism is first-class and
TPU-native: a ``jax.sharding.Mesh`` with named axes

    dp — data parallel (batch dimension, rides ICI all-reduce for grads)
    tp — tensor parallel (attention heads / FFN columns of the encoders)

All collective insertion is left to XLA GSPMD: we annotate parameter and
batch shardings with NamedSharding/PartitionSpec and jit the train step over
the mesh (the scaling-book recipe: pick a mesh, annotate, let XLA insert
collectives).

Multi-host: ``initialize_distributed`` wraps jax.distributed.initialize for
multi-process TPU pods; on a single host it is a no-op.
"""

from __future__ import annotations

import re
from typing import Any

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed(coordinator_address: str | None = None, num_processes: int | None = None, process_id: int | None = None) -> None:
    """Multi-host init (no-op for single-process)."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def make_mesh(dp: int = -1, tp: int = 1, sp: int = 1, devices=None) -> Mesh:
    """Build a (dp, tp[, sp]) mesh. dp=-1 means all remaining devices.

    ``sp`` is the sequence/context-parallel axis: shard the frame/token axis
    of long sequences (mel frames, wav2vec2 frames, long-audio streaming —
    SURVEY.md §5 long-context). XLA GSPMD inserts the attention collectives.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    tp = max(tp, 1)
    sp = max(sp, 1)
    if dp == -1:
        dp = n // (tp * sp)
    need = dp * tp * sp
    if need > n:
        raise ValueError(f"mesh {dp}x{tp}x{sp} needs {need} devices, have {n}")
    if need < n:
        devices = devices[:need]
    if sp > 1:
        arr = mesh_utils.create_device_mesh((dp, tp, sp), devices=devices)
        return Mesh(arr, ("dp", "tp", "sp"))
    arr = mesh_utils.create_device_mesh((dp, tp), devices=devices)
    return Mesh(arr, ("dp", "tp"))


def mesh_from_config(config, devices=None) -> Mesh:
    """Build from the `tpu.mesh` config block (src/config.yaml tpu:)."""
    mesh_cfg = config.get_path("tpu.mesh", {}) or {}
    return make_mesh(
        dp=int(mesh_cfg.get("dp", -1)),
        tp=int(mesh_cfg.get("tp", 1)),
        sp=int(mesh_cfg.get("sp", 1)),
        devices=devices,
    )


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dimension over dp; replicate over tp."""
    return NamedSharding(mesh, P("dp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def sequence_sharding(mesh: Mesh) -> NamedSharding:
    """Shard [B, T, ...] activations: batch over dp, frames/tokens over sp.

    The context-parallel hook: with inputs placed this way, jitted attention
    over the T axis runs with XLA-inserted all-gathers of K/V along sp —
    the slot where a ring/blockwise kernel can later drop in."""
    if "sp" not in mesh.axis_names:
        return NamedSharding(mesh, P("dp"))
    return NamedSharding(mesh, P("dp", "sp"))


# ---------------------------------------------------------------------------
# Tensor-parallel partition rules for the fusion model's parameter tree.
#
# Megatron-style column/row split per transformer block:
#   q/k/v projections  : kernel [E, E]    -> split output (head) dim
#   attention out_proj : kernel [E, E]    -> split input dim (row parallel)
#   FFN linear1        : kernel [E, FF]   -> split output dim
#   FFN linear2        : kernel [FF, E]   -> split input dim
# Everything else (LayerNorms, modality projections, FAM linear, classifier)
# is replicated — they are tiny at d=768.
# ---------------------------------------------------------------------------

_TP_RULES: list[tuple[str, P]] = [
    # nn.scan-stacked encoder layers carry a leading layer axis (replicated)
    (r".*layers_scan/.*(q_proj|k_proj|v_proj|query|key|value)/kernel$", P(None, None, "tp")),
    (r".*layers_scan/.*(q_proj|k_proj|v_proj|query|key|value)/bias$", P(None, "tp")),
    (r".*layers_scan/.*(out_proj|attention_output)/kernel$", P(None, "tp", None)),
    (r".*layers_scan/.*(linear1|intermediate)/kernel$", P(None, None, "tp")),
    (r".*layers_scan/.*(linear1|intermediate)/bias$", P(None, "tp")),
    (r".*layers_scan/.*(linear2|output)/kernel$", P(None, "tp", None)),
    # unscanned layers
    (r".*(q_proj|k_proj|v_proj|query|key|value)/kernel$", P(None, "tp")),
    (r".*(q_proj|k_proj|v_proj|query|key|value)/bias$", P("tp")),
    (r".*(out_proj|attention_output)/kernel$", P("tp", None)),
    (r".*(linear1|intermediate)/kernel$", P(None, "tp")),
    (r".*(linear1|intermediate)/bias$", P("tp")),
    (r".*(linear2|output)/kernel$", P("tp", None)),
]


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/".join(parts)


def partition_spec_for(path_string: str) -> P:
    for pattern, spec in _TP_RULES:
        if re.match(pattern, path_string):
            return spec
    return P()


def m2fnet_param_specs(params: Any) -> Any:
    """PartitionSpec pytree matching a M2FNet (or any encoder-stack) param tree."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: partition_spec_for(_path_str(path)), params
    )


def shard_params(params: Any, mesh: Mesh) -> Any:
    """Place a param tree on the mesh per the TP rules (replicated over dp)."""
    specs = m2fnet_param_specs(params)
    return jax.tree.map(
        lambda leaf, spec: jax.device_put(leaf, NamedSharding(mesh, spec)), params, specs
    )


# ---------------------------------------------------------------------------
# ZeRO-1: optimizer-state sharding over dp.
#
# With plain data parallelism the Adam moments are replicated on every dp
# replica — 2x the param bytes of pure waste per chip (the reference, being
# single-device, has no analog; this is the scaling-book / ZeRO stage-1
# recipe expressed as GSPMD shardings).  Each moment tensor gets its
# param's TP spec PLUS a "dp" sharding on the largest still-unsharded,
# dp-divisible axis.  Everything stays ordinary jit: the optimizer update
# then computes shard-locally (each replica slices the all-reduced grads),
# and GSPMD inserts ONE all-gather of the param updates per step — the
# ZeRO-1 communication pattern — because params remain dp-replicated.
# ---------------------------------------------------------------------------


def zero1_param_specs(params: Any, mesh: Mesh) -> Any:
    """Per-param ZeRO-1 specs: the TP spec extended with a dp shard on the
    largest unsharded axis divisible by the dp size (P() when none is)."""
    dp = mesh.shape.get("dp", 1)
    tp_specs = m2fnet_param_specs(params)

    def extend(leaf, spec):
        if dp <= 1 or np.ndim(leaf) == 0:
            return spec
        names = list(spec) + [None] * (np.ndim(leaf) - len(spec))
        best, best_size = None, 0
        for ax, nm in enumerate(names):
            if nm is None and leaf.shape[ax] % dp == 0 and leaf.shape[ax] > best_size:
                best, best_size = ax, leaf.shape[ax]
        if best is None:
            return spec
        names[best] = "dp"
        return P(*names)

    return jax.tree.map(extend, params, tp_specs)


def zero1_opt_shardings(opt_state: Any, params: Any, mesh: Mesh) -> Any:
    """NamedSharding tree matching ``opt_state``'s structure.

    Optimizer states are arbitrary optax pytrees (chains, MultiSteps,
    multi_transform masks) whose moment subtrees mirror the param tree —
    match each opt leaf to its param by the longest path *suffix* (a moment
    leaf's path ends with its param's path), and fall back to replicated
    for everything else (step counters, schedules)."""
    specs = zero1_param_specs(params, mesh)
    spec_by_path = {
        _path_str(path): spec
        for path, spec in jax.tree_util.tree_flatten_with_path(specs)[0]
    }

    repl = NamedSharding(mesh, P())

    def place(path, leaf):
        parts = _path_str(path).split("/")
        for i in range(len(parts)):
            spec = spec_by_path.get("/".join(parts[i:]))
            if isinstance(spec, P):
                # shapes must agree (a schedule scalar could share a name)
                return NamedSharding(mesh, spec) if np.ndim(leaf) > 0 else repl
        return repl

    return jax.tree_util.tree_map_with_path(place, opt_state)


def shard_opt_state_zero1(opt_state: Any, params: Any, mesh: Mesh) -> Any:
    """Place an optimizer state on the mesh with ZeRO-1 dp sharding."""
    shardings = zero1_opt_shardings(opt_state, params, mesh)
    return jax.tree.map(jax.device_put, opt_state, shardings)


def constrain_opt_state_zero1(opt_state: Any, params: Any, mesh: Mesh) -> Any:
    """In-jit twin of :func:`shard_opt_state_zero1` — pins the new optimizer
    state's sharding inside the train step so GSPMD cannot re-replicate the
    moments between steps."""
    shardings = zero1_opt_shardings(opt_state, params, mesh)
    return jax.tree.map(jax.lax.with_sharding_constraint, opt_state, shardings)


def pad_batch_to_dp(batch: dict, dp: int) -> dict:
    """Pad the leading dim of every array so it divides the dp axis size."""

    def _pad(x: np.ndarray) -> np.ndarray:
        b = x.shape[0]
        rem = (-b) % dp
        if rem == 0:
            return x
        pad_block = np.zeros((rem,) + x.shape[1:], dtype=x.dtype)
        if x.dtype.kind in "iu":  # labels: pad with -1 (ignored)
            pad_block[...] = -1
        elif x.dtype.kind == "b":  # masks: True=pad everywhere else in the repo
            pad_block[...] = True
        return np.concatenate([x, pad_block], axis=0)

    out = {k: _pad(v) for k, v in batch.items()}
    if "padding_mask" in out:
        # keep one attendable key in all-pad rows
        pm = out["padding_mask"]
        empty = pm.all(axis=-1)
        pm[empty, 0] = False
        out["padding_mask"] = pm
    return out
