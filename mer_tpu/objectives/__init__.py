from mer_tpu.objectives.classification import balanced_class_weights, cross_entropy
from mer_tpu.objectives.embedding import (
    adaptive_triplet_margin_loss,
    covariance_loss,
    covariance_regularization,
    m2fnet_audio_embedding_loss,
    make_embedding_loss,
    triplet_margin_loss,
    variance_loss,
    variance_regularization,
)
from mer_tpu.objectives.metrics import BatchAveragedMetrics, accuracy, weighted_f1

__all__ = [
    "cross_entropy",
    "balanced_class_weights",
    "adaptive_triplet_margin_loss",
    "triplet_margin_loss",
    "variance_loss",
    "variance_regularization",
    "covariance_loss",
    "covariance_regularization",
    "m2fnet_audio_embedding_loss",
    "make_embedding_loss",
    "accuracy",
    "weighted_f1",
    "BatchAveragedMetrics",
]
