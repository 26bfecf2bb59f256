"""Classification losses with exact torch semantics.

The reference trains every classifier with
``torch.nn.CrossEntropyLoss(weight?, ignore_index=-1, label_smoothing=0.1)``
(fusion: src/train.py:43-50; text FE: text/train.py:46-53; wav2vec2 FE
likewise).  The padded utterance positions carry label -1
(src/dataset.py:82) and must be excluded from both the numerator and the
mean denominator.

Torch's exact semantics (verified numerically against torch 2.13):
    per-element  l_i = (1-eps) * w[t_i] * nll_i + eps * sum_c w_c * (-logp_ic) / C
    mean         sum_i l_i * valid_i / sum_i w[t_i] * valid_i
Without class weights w == 1 this reduces to the plain smoothed CE averaged
over valid elements.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def cross_entropy(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    *,
    label_smoothing: float = 0.0,
    class_weights: jnp.ndarray | None = None,
    ignore_index: int = -1,
) -> jnp.ndarray:
    """Mean cross-entropy over non-ignored positions, torch-parity.

    Args:
        logits: [..., C] float logits.
        labels: [...] int labels; positions equal to ``ignore_index`` are
            excluded from the loss and its denominator.
        label_smoothing: epsilon in [0, 1).
        class_weights: optional [C] per-class weights.
    """
    num_classes = logits.shape[-1]
    logits = logits.astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)

    valid = labels != ignore_index
    safe_labels = jnp.where(valid, labels, 0)

    nll = -jnp.take_along_axis(logp, safe_labels[..., None], axis=-1)[..., 0]

    if class_weights is None:
        w = jnp.ones((num_classes,), dtype=logp.dtype)
    else:
        w = jnp.asarray(class_weights, dtype=logp.dtype)

    wt = w[safe_labels]
    if label_smoothing > 0.0:
        smooth = -(logp * w).sum(axis=-1) / num_classes
        per = (1.0 - label_smoothing) * wt * nll + label_smoothing * smooth
    else:
        per = wt * nll

    per = jnp.where(valid, per, 0.0)
    denom = jnp.where(valid, wt, 0.0).sum()
    return per.sum() / jnp.maximum(denom, 1e-12)


def balanced_class_weights(labels: np.ndarray, num_classes: int = 7) -> np.ndarray:
    """sklearn's ``class_weight='balanced'``: n / (C * bincount) per class.

    Mirrors the reference's optional class balancing
    (src/train.py:44-48: compute_class_weight over the training labels).
    Host-side numpy — runs once at setup.
    """
    labels = np.asarray(labels)
    labels = labels[labels >= 0]
    counts = np.bincount(labels, minlength=num_classes).astype(np.float64)
    n = labels.shape[0]
    with np.errstate(divide="ignore"):
        weights = n / (num_classes * counts)
    weights[~np.isfinite(weights)] = 0.0
    return weights.astype(np.float32)
