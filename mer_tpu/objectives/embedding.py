"""Metric-learning losses for the mel feature extractor.

Parity port of the reference loss stack
(src/feature_extractors/audio_mel/losses/):

- adaptive triplet margin loss      AdaptiveTripletMarginLoss.py:16-46
- fixed triplet margin loss         torch.nn.TripletMarginLoss(margin=0.2, p=2)
- variance (VICReg hinge)           VarianceLoss.py:6-25   (torch.var -> ddof=1)
- covariance (off-diagonal^2)       CovarianceLoss.py:5-23 (torch.cov -> ddof=1)
- composite: 20*triplet + 5*cov + 1*var   M2FNetAudioEmbeddingLoss.py:22-28

All functions take [B, D] embedding batches and return scalars, and are pure
jnp so they fuse into the jitted train step.
"""

from __future__ import annotations

from functools import partial

import jax.numpy as jnp


def _pairwise_distance(x1: jnp.ndarray, x2: jnp.ndarray, p: float = 2.0, eps: float = 0.0) -> jnp.ndarray:
    """Row-wise Lp distance over the last axis (torch.norm(x1-x2, p, dim=-1))."""
    diff = x1 - x2
    if p == 2.0:
        # sqrt of sum-of-squares; eps inside sqrt guards the gradient at 0
        return jnp.sqrt(jnp.sum(diff * diff, axis=-1) + eps)
    return jnp.sum(jnp.abs(diff) ** p, axis=-1) ** (1.0 / p)


def adaptive_triplet_margin_loss(
    anchor: jnp.ndarray,
    positive: jnp.ndarray,
    negative: jnp.ndarray,
    *,
    p: float = 2.0,
    eps: float = 1e-6,
    reduction: str = "mean",
) -> jnp.ndarray:
    """M2FNet paper L_AMT (reference AdaptiveTripletMarginLoss.py:25-46).

    loss = relu(d(a,p) - (d(a,n) + d(p,n))/2 + margin(d_ap, d_an))
    margin = (1 + 2/(exp(4 d_ap) + eps)) + (1 + 2/(exp(-4 d_an + 4) + eps))
    """
    d_ap = _pairwise_distance(anchor, positive, p)
    d_an = _pairwise_distance(anchor, negative, p)
    d_pn = _pairwise_distance(positive, negative, p)

    margin_sim = 1.0 + 2.0 / (jnp.exp(4.0 * d_ap) + eps)
    margin_dissim = 1.0 + 2.0 / (jnp.exp(-4.0 * d_an + 4.0) + eps)
    margin = margin_sim + margin_dissim

    loss = jnp.maximum(d_ap - (d_an + d_pn) / 2.0 + margin, 0.0)
    if reduction == "mean":
        return loss.mean()
    if reduction == "sum":
        return loss.sum()
    return loss


def triplet_margin_loss(
    anchor: jnp.ndarray,
    positive: jnp.ndarray,
    negative: jnp.ndarray,
    *,
    margin: float = 0.2,
    p: float = 2.0,
    eps: float = 1e-6,
) -> jnp.ndarray:
    """torch.nn.TripletMarginLoss parity (fixed-margin variant,
    M2FNetAudioEmbeddingLoss.py:18). torch adds eps inside the norm."""
    d_ap = _pairwise_distance(anchor, positive, p, eps=eps)
    d_an = _pairwise_distance(anchor, negative, p, eps=eps)
    return jnp.maximum(d_ap - d_an + margin, 0.0).mean()


def variance_regularization(z: jnp.ndarray, gamma: float = 1.0, eps: float = 1e-6) -> jnp.ndarray:
    """VICReg variance hinge per branch (VarianceLoss.py:6-12).

    torch.var defaults to the unbiased estimator (ddof=1).
    """
    var_z = jnp.var(z, axis=0, ddof=1)
    d = z.shape[-1]
    return jnp.sum(jnp.maximum(gamma - jnp.sqrt(var_z + eps), 0.0)) / d


def variance_loss(za: jnp.ndarray, zp: jnp.ndarray, zn: jnp.ndarray, gamma: float = 1.0, eps: float = 1e-6) -> jnp.ndarray:
    return sum(variance_regularization(z, gamma, eps) for z in (za, zp, zn))


def covariance_regularization(z: jnp.ndarray) -> jnp.ndarray:
    """Off-diagonal squared covariance per branch (CovarianceLoss.py:5-12).

    torch.cov(z.T) uses correction=1 (divide by B-1).
    """
    b, d = z.shape
    zc = z - z.mean(axis=0, keepdims=True)
    cov = (zc.T @ zc) / (b - 1)
    cov2 = cov * cov
    off_diag = cov2.sum() - jnp.trace(cov2)
    return off_diag / d


def covariance_loss(za: jnp.ndarray, zp: jnp.ndarray, zn: jnp.ndarray) -> jnp.ndarray:
    return sum(covariance_regularization(z) for z in (za, zp, zn))


def m2fnet_audio_embedding_loss(
    anchor: jnp.ndarray,
    positive: jnp.ndarray,
    negative: jnp.ndarray,
    *,
    adaptive: bool = True,
    covariance_enabled: bool = True,
    variance_enabled: bool = True,
) -> jnp.ndarray:
    """Composite 20*triplet + 5*covariance + 1*variance
    (M2FNetAudioEmbeddingLoss.py:22-28)."""
    if adaptive:
        loss = 20.0 * adaptive_triplet_margin_loss(anchor, positive, negative)
    else:
        loss = 20.0 * triplet_margin_loss(anchor, positive, negative)
    if covariance_enabled:
        loss = loss + 5.0 * covariance_loss(anchor, positive, negative)
    if variance_enabled:
        loss = loss + 1.0 * variance_loss(anchor, positive, negative)
    return loss


def make_embedding_loss(config) -> "partial":
    """Bind the composite loss to a pipeline config
    (config_audio_mel.yaml solver.{adaptive_triplet_margin_loss,covariance_loss,variance_loss})."""
    return partial(
        m2fnet_audio_embedding_loss,
        adaptive=bool(config.solver.adaptive_triplet_margin_loss),
        covariance_enabled=bool(config.solver.covariance_loss),
        variance_enabled=bool(config.solver.variance_loss),
    )
