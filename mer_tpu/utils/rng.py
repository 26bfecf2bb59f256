"""Dropout PRNG selection.

The reference samples dropout masks through torch's global CUDA/CPU RNG
(implicit in every ``nn.Dropout``; e.g. /root/reference/src/model.py:57).
The RNG *stream* is not part of the behavioral contract — only the Bernoulli
distribution is — so the TPU build is free to pick the cheapest generator.

JAX's default threefry2x32 is a long VPU op chain per 32 output bits; the
M2FNet train step materializes ~140M mask elements per forward (12 encoder
layers x [B,U,768]/[B,U,3072] residual+FF masks + attention-prob masks + 5
FAM layers at dropout 0.4), so mask generation is pure VPU overhead on the
MXU-bound step. ``rbg`` lowers to the TPU's hardware RngBitGenerator
instruction instead. Measured on the v5e (scripts/profile_fusion_train.py):
BENCH_LOCAL.json ``fusion_train_decomposition_b256`` records the committed
rbg-vs-threefry step times that set this default (fwd 6.96 -> 5.22 ms,
full step 25.06 -> 20.41 ms at b256; ROADMAP §Done (round 5) has the
narrative).

Trade-off (the reason this is a config knob and not unconditional): XLA's
RngBitGenerator output is *implementation-defined* and may change across
compiler versions, so TPU runs under the rbg default are reproducible
within one toolchain but NOT bit-reproducible across toolchain upgrades.
threefry2x32 is stable across versions — set ``tpu.dropout_prng:
threefry2x32`` when resuming a run must replay the exact mask stream.

``dropout_key(seed)`` returns a typed key whose impl is chosen by
``impl``: "rbg", "threefry2x32", or None/"auto" = rbg on TPU, threefry
elsewhere (CPU tests keep the cross-run-stable default stream).
"""

from __future__ import annotations

import jax

_IMPLS = ("auto", "rbg", "threefry2x32")


def dropout_key(seed: int, impl: str | None = None) -> jax.Array:
    """Typed PRNG key for dropout streams. impl: None/"auto" | "rbg" |
    "threefry2x32"."""
    impl = impl or "auto"
    if impl not in _IMPLS:
        raise ValueError(f"dropout_prng must be one of {_IMPLS}, got {impl!r}")
    if impl == "auto":
        impl = "rbg" if jax.default_backend() == "tpu" else "threefry2x32"
    return jax.random.key(seed, impl=impl)
