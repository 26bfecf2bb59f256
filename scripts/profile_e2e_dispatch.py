"""Attribute the e2e stage-1 ``embed_dispatch_s`` wall on the real chip.

BENCH_LOCAL's e2e leg moves ~356 MB of waveform stacks in ~4.3 s (~85 MB/s)
while a single 32 MB buffer measures ~1.3 GB/s (h2d_link rows) — this probe
separates the candidate costs the dispatch loop bundles:

  stack_s        np.stack host memcpy of the per-batch arrays into [G,B,T]
  put_loop_s     device_put per stacked array (the shipped pattern)
  put_single_s   ONE device_put call over the whole pytree of stacks
  put_wait_s     block_until_ready after the puts (async-ness of the tunnel)
  dispatch_s     per-group jit dispatch enqueue (tiny fn, pre-compiled)

Usage: python scripts/profile_e2e_dispatch.py  (needs the TPU; ~1 min)
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import mer_tpu  # noqa: F401  (enables the compile cache)

import jax
import jax.numpy as jnp


def main():
    rng = np.random.default_rng(0)
    # MELD-test-shaped waveform groups (sorted split: ~5 duration buckets,
    # 82 batches of 32 across them, int16 wire) — matches embed_h2d_bytes
    buckets = [(38, 32, 32000), (20, 32, 64000), (12, 32, 96000),
               (7, 32, 128000), (5, 32, 160000)]
    host_batches = []
    for g, b, t in buckets:
        for _ in range(g):
            host_batches.append(
                rng.integers(-2000, 2000, size=(b, t)).astype(np.int16))

    total_mb = sum(a.nbytes for a in host_batches) / 1e6
    print(f"{len(host_batches)} batches, {total_mb:.0f} MB")

    # group + stack (the shipped phase-1 host work)
    t0 = time.perf_counter()
    stacks = []
    i = 0
    for g, b, t in buckets:
        stacks.append(np.stack(host_batches[i:i + g]))
        i += g
    stack_s = time.perf_counter() - t0
    print(f"stack_s {stack_s:.3f}")

    # warm the transfer path
    jax.block_until_ready(jax.device_put(np.zeros((1024, 1024), np.int16)))

    # (a) shipped pattern: one device_put per stack
    t0 = time.perf_counter()
    up_loop = [jax.device_put(s) for s in stacks]
    put_loop_enqueue = time.perf_counter() - t0
    jax.block_until_ready(up_loop)
    put_loop_s = time.perf_counter() - t0
    print(f"put_loop_enqueue {put_loop_enqueue:.3f}  put_loop_total {put_loop_s:.3f} "
          f"({total_mb / put_loop_s:.0f} MB/s)")
    del up_loop

    # (b) one call over the whole pytree
    t0 = time.perf_counter()
    up_single = jax.device_put(stacks)
    put_single_enqueue = time.perf_counter() - t0
    jax.block_until_ready(up_single)
    put_single_s = time.perf_counter() - t0
    print(f"put_single_enqueue {put_single_enqueue:.3f}  put_single_total {put_single_s:.3f} "
          f"({total_mb / put_single_s:.0f} MB/s)")

    # (c) per-batch puts (the pre-stacking worst case, for scale)
    t0 = time.perf_counter()
    up_many = [jax.device_put(a) for a in host_batches[:20]]
    jax.block_until_ready(up_many)
    many_s = time.perf_counter() - t0
    mb20 = sum(a.nbytes for a in host_batches[:20]) / 1e6
    print(f"put_20_batches {many_s:.3f} ({mb20 / many_s:.0f} MB/s, "
          f"{many_s / 20 * 1e3:.1f} ms/transfer)")
    del up_many

    # (e) ONE flat coalesced buffer: every stack raveled into a single
    # contiguous int16 array (np.stack writes straight into the flat view,
    # so host memcpy cost is the same as (a)'s stacking), ONE device_put,
    # then a jitted dynamic-slice+reshape per group to recover the [G,B,T]
    # stacks on device (HBM-to-HBM copy, off the host link entirely).
    total_elems = sum(s.size for s in stacks)
    t0 = time.perf_counter()
    flat = np.empty((total_elems,), np.int16)
    offs, o = [], 0
    i = 0
    for (g, b, t), s in zip(buckets, stacks):
        np.stack(host_batches[i:i + g], out=flat[o:o + g * b * t].reshape(g, b, t))
        offs.append(o)
        o += g * b * t
        i += g
    flat_build_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    dflat = jax.device_put(flat)
    flat_enqueue = time.perf_counter() - t0
    jax.block_until_ready(dflat)
    flat_put_s = time.perf_counter() - t0
    print(f"flat_build {flat_build_s:.3f}  flat_put_enqueue {flat_enqueue:.3f}  "
          f"flat_put_total {flat_put_s:.3f} ({total_mb / flat_put_s:.0f} MB/s)")

    from functools import partial

    @partial(jax.jit, static_argnums=(2, 3))
    def reslice(buf, off, size, shape):
        return jax.lax.dynamic_slice_in_dim(buf, off, size).reshape(shape)

    outs = [reslice(dflat, offs[k], buckets[k][0] * buckets[k][1] * buckets[k][2],
                    tuple(buckets[k])) for k in range(len(buckets))]
    jax.block_until_ready(outs)  # compile
    t0 = time.perf_counter()
    outs = [reslice(dflat, offs[k], buckets[k][0] * buckets[k][1] * buckets[k][2],
                    tuple(buckets[k])) for k in range(len(buckets))]
    jax.block_until_ready(outs)
    reslice_s = time.perf_counter() - t0
    print(f"flat_reslice({len(buckets)} groups, warm) {reslice_s:.3f}  "
          f"flat_end_to_end {flat_build_s + flat_put_s + reslice_s:.3f}")
    del outs, dflat

    # (d) jit dispatch enqueue cost at this shape count (tiny pre-compiled fn)
    f = jax.jit(lambda x: jnp.sum(x, dtype=jnp.int32))
    outs = [f(u) for u in up_single]  # compile each shape
    jax.block_until_ready(outs)
    t0 = time.perf_counter()
    outs = [f(u) for u in up_single]
    dispatch_enqueue = time.perf_counter() - t0
    jax.block_until_ready(outs)
    dispatch_s = time.perf_counter() - t0
    print(f"dispatch_enqueue({len(stacks)} groups) {dispatch_enqueue:.3f}  "
          f"total {dispatch_s:.3f}")


if __name__ == "__main__":
    main()
