"""Pipeline parallelism (`pp` axis) for scanned layer stacks.

The reference is strictly single-device (SURVEY.md §2.2); the repo's meshes
already cover dp (batch), tp (Megatron splits) and sp (ring attention).
This module adds the remaining classic axis: GPipe-style pipeline
parallelism over the layer dimension of an ``nn.scan``-stacked encoder
([L, ...] parameter leaves — the layout every encoder in this repo already
uses), as pure SPMD:

- the layer axis is sharded over the mesh's ``pp`` axis (each stage holds
  L/pp layers and scans them locally — MXU-dense, no per-layer dispatch),
- activations rotate stage-to-stage with ``lax.ppermute`` over ICI,
- the batch is split into microbatches fed on a GPipe schedule
  (M + pp - 1 ticks; bubble fraction (pp-1)/(M+pp-1), so pass
  ``microbatches > pp`` to amortize),
- the whole schedule is a ``lax.scan`` inside one ``shard_map`` — fully
  differentiable (ppermute transposes to the reverse rotation, so the
  backward pass is the reverse pipeline schedule, stage pp-1 -> 0), which
  makes a jitted train step over a (dp, pp) mesh a one-liner.

Composes with dp: pass ``batch_axis="dp"`` and the microbatch rows stay
sharded over dp throughout (specs P(None, "dp") inside the shard_map);
grads for the stage-local params then all-reduce over dp exactly like the
non-pipelined solvers.

Why not GSPMD auto-sharding for this? Pipelining is a *schedule*, not a
layout — XLA cannot invent the microbatch rotation from sharding
annotations alone; shard_map + ppermute is the idiomatic JAX spelling
(same construction as ops/ring_attention.py for the sp axis).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

shard_map = jax.shard_map


def stages_for(mesh: Mesh, axis: str = "pp") -> int:
    return mesh.shape[axis]


def pipeline_apply(
    layer_params: Any,
    x: jnp.ndarray,
    layer_fn: Callable[..., jnp.ndarray],
    mesh: Mesh,
    *,
    axis: str = "pp",
    microbatches: int | None = None,
    extra: Any = None,
    batch_axis: str | None = None,
    rng: jnp.ndarray | None = None,
    remat: bool | str = False,
) -> jnp.ndarray:
    """Run ``x`` through the full stacked layer stack, pipelined over
    ``axis``.

    layer_params: pytree whose leaves are [L, ...] (nn.scan layout); L must
        divide by the pp axis size. Shard these P(axis) on the leading dim
        (this function only *annotates* inside shard_map; place the real
        arrays with jax.device_put for HBM savings).
    x: [B, ...] activations. B must divide by ``microbatches`` (default:
        the number of stages).
    layer_fn(params_l, x[, extra]) -> x: one layer's forward, params_l a
        single-layer slice of ``layer_params``.
    extra: optional pytree of per-batch side inputs (e.g. padding masks)
        with the same leading B; microbatched alongside x and passed as
        ``layer_fn``'s third argument.
    batch_axis: mesh axis the batch rows are data-parallel over, if any —
        keeps microbatch rows sharded over it end to end.
    rng: optional PRNG key for per-layer stochasticity (dropout in
        training).  When given, ``layer_fn`` is called with a trailing key
        argument, folded from (global layer index, microbatch index) — every
        (layer, microbatch) pair gets an independent stream, identical
        regardless of pp size for a fixed (L, m).
    remat: rematerialize each layer in the backward (jax.checkpoint around
        layer_fn) — per-stage activation memory drops from
        layers_per_stage x microbatches to ~1 layer's worth, at one extra
        forward in the reverse schedule (the same memory<->FLOPs trade the
        FE solvers' --remat makes in the nn.scan path).

    Output cost note: the result is returned by zeroing non-last stages and
    ``lax.psum`` over ``axis`` — every stage all-reduces the full
    [m, rows, ...] output buffer (~2(pp-1)/pp x buffer ICI bytes, vs
    (pp-1)/pp for a one-to-all broadcast from stage pp-1).  For encoder
    stacks the output is one activation tensor and this is noise next to the
    per-tick ppermutes; revisit with a ppermute-chain broadcast only if
    pipeline outputs ever dominate ICI traffic at scale.
    """
    pp = stages_for(mesh, axis)
    m = microbatches if microbatches is not None else pp
    b = x.shape[0]
    if b % m:
        raise ValueError(f"batch {b} not divisible into {m} microbatches")
    n_layers = jax.tree.leaves(layer_params)[0].shape[0]
    if n_layers % pp:
        raise ValueError(f"{n_layers} layers not divisible by pp={pp}")
    if batch_axis is not None and (b // m) % mesh.shape[batch_axis]:
        raise ValueError(
            f"microbatch rows {b}//{m}={b // m} not divisible by "
            f"{batch_axis}={mesh.shape[batch_axis]}"
        )

    xm = x.reshape(m, b // m, *x.shape[1:])
    extram = jax.tree.map(lambda e: e.reshape(m, b // m, *e.shape[1:]), extra)

    row = P(None, batch_axis) if batch_axis else P()
    param_specs = jax.tree.map(lambda _: P(axis), layer_params)
    extra_specs = jax.tree.map(lambda _: row, extram)

    per_stage = n_layers // pp
    use_rng = rng is not None
    rng_in = rng if use_rng else jnp.zeros((2,), jnp.uint32)
    if remat:
        # remat=True -> recompute everything; remat="<policy>" -> selective
        # (utils/remat.py: keep MXU outputs, recompute the elementwise chain)
        if isinstance(remat, str):
            from mer_tpu.utils.remat import resolve_remat_policy

            layer_fn = jax.checkpoint(layer_fn, policy=resolve_remat_policy(remat))
        else:
            layer_fn = jax.checkpoint(layer_fn)

    def stage_fn(local_params, x_all, extra_all, rng_key):
        d = lax.axis_index(axis)

        def local_stack(xi, ei, mb):
            def body(c, pi):
                p, i = pi
                if use_rng:
                    key = jax.random.fold_in(rng_key, (d * per_stage + i) * m + mb)
                    args = (p, c, ei, key) if extra is not None else (p, c, key)
                else:
                    args = (p, c, ei) if extra is not None else (p, c)
                return layer_fn(*args), None

            return lax.scan(body, xi, (local_params, jnp.arange(per_stage)))[0]

        perm = [(i, (i + 1) % pp) for i in range(pp)]

        def tick(carry, t):
            buf, outs = carry
            mb = t - d  # microbatch this stage works on at tick t
            mb_c = jnp.clip(mb, 0, m - 1)
            active = (mb >= 0) & (mb < m)
            # stage 0 ingests a fresh microbatch; later stages consume the
            # rotation buffer filled by their predecessor last tick
            x_in = jnp.where(
                d == 0, lax.dynamic_index_in_dim(x_all, jnp.clip(t, 0, m - 1), 0, False), buf
            )
            e_in = jax.tree.map(
                lambda e: lax.dynamic_index_in_dim(e, mb_c, 0, False), extra_all
            )
            y = local_stack(x_in, e_in, mb_c)
            y = jnp.where(active, y, buf)  # hold bubbles harmless
            write = active & (d == pp - 1)
            cur = lax.dynamic_index_in_dim(outs, mb_c, 0, False)
            outs = lax.dynamic_update_index_in_dim(
                outs, jnp.where(write, y, cur), mb_c, 0
            )
            return (lax.ppermute(y, axis, perm), outs), None

        buf0 = jnp.zeros_like(x_all[0])
        outs0 = jnp.zeros_like(x_all)
        (_, outs), _ = lax.scan(tick, (buf0, outs0), jnp.arange(m + pp - 1))
        # only the last stage's collected outputs are real; zero the rest and
        # all-reduce so every stage returns the identical result
        outs = jnp.where(d == pp - 1, outs, jnp.zeros_like(outs))
        return lax.psum(outs, axis)

    out = shard_map(
        stage_fn,
        mesh=mesh,
        in_specs=(param_specs, row, extra_specs, P()),
        out_specs=row,
        check_vma=False,
    )(layer_params, xm, extram, rng_in)
    return out.reshape(b, *x.shape[1:])


def scanned_layer_pipeline(
    layer_module,
    stacked_params: Any,
    hidden: jnp.ndarray,
    key_padding_mask: jnp.ndarray,
    mesh: Mesh,
    *,
    microbatches: int | None = None,
    batch_axis: str | None = None,
    deterministic: bool = True,
    rng: jnp.ndarray | None = None,
    remat: bool | str = False,
) -> jnp.ndarray:
    """Pipelined forward of a scanned encoder layer stack with the
    ``(hidden, key_padding_mask, deterministic)`` call signature — the
    layout of every 12-layer encoder in models/ (the ``layers_scan/layer``
    param subtree of Wav2Vec2Model / RobertaModel, leaves [L, ...]).

    ``deterministic=False`` (training) requires ``rng``: each (layer,
    microbatch) dropout draw gets an independent key via pipeline_apply's
    rng threading.  Dropout patterns differ from the non-pp nn.scan path
    (different fold-in structure) — same distribution, not the same draws.
    """
    if not deterministic:
        if rng is None:
            raise ValueError("deterministic=False requires rng for dropout")

        def layer_fn(p, h, m, key):
            return layer_module.apply({"params": p}, h, m, False, rngs={"dropout": key})

        return pipeline_apply(
            stacked_params, hidden, layer_fn, mesh,
            microbatches=microbatches, extra=key_padding_mask,
            batch_axis=batch_axis, rng=rng, remat=remat,
        )

    def layer_fn(p, h, m):
        return layer_module.apply({"params": p}, h, m, True)

    return pipeline_apply(
        stacked_params, hidden, layer_fn, mesh,
        microbatches=microbatches, extra=key_padding_mask, batch_axis=batch_axis,
        remat=remat,
    )


def pipeline_param_sharding(mesh: Mesh, axis: str = "pp"):
    """NamedSharding placing [L, ...] stacked params stage-local (the layer
    axis over pp) — each stage's HBM holds only its own layers."""
    from jax.sharding import NamedSharding

    return NamedSharding(mesh, P(axis))


def make_pp_mesh(pp: int, dp: int = 1, devices=None) -> Mesh:
    """A (dp, pp) mesh; pp innermost so stage hops ride neighbor ICI links."""
    from jax.experimental import mesh_utils

    if devices is None:
        devices = jax.devices()
    need = dp * pp
    if need > len(devices):
        raise ValueError(f"mesh {dp}x{pp} needs {need} devices, have {len(devices)}")
    arr = mesh_utils.create_device_mesh((dp, pp), devices=devices[:need])
    return Mesh(arr, ("dp", "pp"))


__all__ = ["pipeline_apply", "scanned_layer_pipeline", "pipeline_param_sharding", "make_pp_mesh", "stages_for"]
