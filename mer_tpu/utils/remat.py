"""Rematerialization policies for the encoder-layer remat path.

``remat=True`` on the models recomputes EVERYTHING in the backward
(activation memory ~1 layer, +1 full forward of FLOPs).  On TPU the usual
sweet spot is a selective policy: save the MXU (matmul) outputs — cheap to
keep, expensive to recompute — and recompute only the VPU elementwise chain
(bias/gelu/dropout/LN), which is HBM-bandwidth-cheap.  That keeps most of
the memory win at a fraction of the recompute cost, usually a net train-MFU
gain (measure with scripts/profile_fusion_train.py / the fe_train bench
rows; the reference has no remat at all — torch single-GPU).

Names accepted by ``--remat-policy``:
  full          recompute everything (same as plain remat=True)
  dots          save all dot/matmul outputs  (jax.checkpoint_policies.checkpoint_dots)
  dots_no_batch save dots without batch dims (the scan-friendly default choice)
"""

from __future__ import annotations

from typing import Any, Callable


def resolve_remat_policy(name: str | None) -> Callable[..., Any] | None:
    """Policy name -> jax.checkpoint policy callable (None = save nothing)."""
    if name is None or name == "full":
        return None
    import jax

    table = {
        "dots": jax.checkpoint_policies.checkpoint_dots,
        "dots_no_batch": jax.checkpoint_policies.checkpoint_dots_with_no_batch_dims,
    }
    if name not in table:
        raise ValueError(f"unknown remat policy {name!r}; choose from {['full', *table]}")
    return table[name]


__all__ = ["resolve_remat_policy"]
