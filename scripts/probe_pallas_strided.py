"""Probe which stride-2 row-selection primitives Mosaic supports in VMEM.

The fused wav2vec2 conv-stack kernel (all stride-2 layers) needs ONE of:

  a. strided sublane slice:   x[0::2, :] on a loaded [T, C] array
  b. minor-dims reshape:      [T, C] -> [T//2, 2C] (pairs fold into lanes)
  c. tap loop (always works): fori_loop of dynamic row slices — slow baseline

Each probe runs a tiny kernel on the real backend and checks exactness vs
numpy; a lowering failure prints the exception class instead of crashing the
script. The winner determines the kernel design in ops/w2v_conv_pallas.py.

Usage: python scripts/probe_pallas_strided.py
"""

from __future__ import annotations

import os
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

import numpy as np

import mer_tpu  # noqa: F401
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

T, C = 256, 512
X = np.arange(T * C, dtype=np.float32).reshape(T, C) % 1003.0


def run(name, kernel, out_shape, expect):
    try:
        fn = pl.pallas_call(kernel, out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32))
        got = np.asarray(jax.jit(fn)(jnp.asarray(X)))
        ok = np.array_equal(got, expect)
        print(f"{name:28s} {'OK' if ok else 'WRONG VALUES'}")
        return ok
    except Exception as e:  # lowering/runtime failure — the answer we want
        msg = str(e).splitlines()[0][:120]
        print(f"{name:28s} FAIL {type(e).__name__}: {msg}")
        return False


def main():
    print(f"backend: {jax.default_backend()}")

    def k_strided(x_ref, o_ref):
        o_ref[:] = x_ref[:][0::2, :]

    run("a. x[0::2] slice", k_strided, (T // 2, C), X[0::2])

    def k_strided_odd(x_ref, o_ref):
        o_ref[:] = x_ref[:][1::2, :]

    run("a'. x[1::2] slice", k_strided_odd, (T // 2, C), X[1::2])

    def k_reshape(x_ref, o_ref):
        o_ref[:] = x_ref[:].reshape(T // 2, 2 * C)

    run("b. reshape [T,C]->[T/2,2C]", k_reshape, (T // 2, 2 * C), X.reshape(T // 2, 2 * C))

    def k_tap(x_ref, o_ref):
        # conv-shaped use: out = x_even @ I  via explicit strided load helper
        x = pl.load(x_ref, (pl.Slice(0, T // 2, 2), slice(None)))
        o_ref[:] = x

    run("c. pl.Slice(stride=2) load", k_tap, (T // 2, C), X[0::2])

    # layer-0 kernel prerequisites (ops/w2v_conv_pallas layer0 plan):

    def k_unfold(x_ref, o_ref):
        o_ref[:] = x_ref[:].reshape(2 * T, C // 2)

    run("d. reshape [T,C]->[2T,C/2]", k_unfold, (2 * T, C // 2),
        X.reshape(2 * T, C // 2))

    def k_skinny(x_ref, o_ref):
        # [T, 16] bf16 x [16, C] GEMM — the folded conv0 tap matrix
        w = jnp.ones((16, C), jnp.bfloat16)
        o_ref[:] = jnp.dot(x_ref[:][:, :16].astype(jnp.bfloat16), w,
                           preferred_element_type=jnp.float32)

    try:
        fn = pl.pallas_call(k_skinny, out_shape=jax.ShapeDtypeStruct((T, C), jnp.float32))
        got = np.asarray(jax.jit(fn)(jnp.asarray(X)))
        exp = np.broadcast_to(
            np.asarray(jnp.asarray(X[:, :16]).astype(jnp.bfloat16).astype(jnp.float32)).sum(
                1, keepdims=True
            ),
            (T, C),
        )
        ok = np.allclose(got, exp, rtol=1e-3)
        print(f"{'e. [T,16]@[16,C] skinny GEMM':28s} {'OK' if ok else 'WRONG VALUES'}")
    except Exception as e:
        print(f"{'e. [T,16]@[16,C] skinny GEMM':28s} FAIL {type(e).__name__}: {str(e).splitlines()[0][:120]}")

    def k_accum(x_ref, o_ref):
        # grid accumulation: out revisited across grid steps
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _init():
            o_ref[:] = jnp.zeros_like(o_ref)

        o_ref[:] += jnp.sum(x_ref[:], axis=0, keepdims=True)

    try:
        fn = pl.pallas_call(
            k_accum,
            grid=(4,),
            in_specs=[pl.BlockSpec((T // 4, C), lambda i: (i, 0))],
            out_specs=pl.BlockSpec((1, C), lambda i: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((1, C), jnp.float32),
        )
        got = np.asarray(jax.jit(fn)(jnp.asarray(X)))
        ok = np.allclose(got, X.sum(0, keepdims=True), rtol=1e-5)
        print(f"{'f. grid-accumulated reduce':28s} {'OK' if ok else 'WRONG VALUES'}")
    except Exception as e:
        print(f"{'f. grid-accumulated reduce':28s} FAIL {type(e).__name__}: {str(e).splitlines()[0][:120]}")


if __name__ == "__main__":
    main()
