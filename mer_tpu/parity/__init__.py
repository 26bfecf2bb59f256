"""Numeric parity validation against the live torch reference."""

from mer_tpu.parity.reference_fusion import (
    MerTpuFusion,
    TorchReferenceFusion,
    build_batches,
    load_reference_model_module,
    load_val_tables,
    make_pseudo_dialogues,
    mlp_labels,
    projection_labels,
    reference_available,
    reference_model_config,
    shipped_val_artifacts_available,
)

__all__ = [
    "MerTpuFusion",
    "TorchReferenceFusion",
    "build_batches",
    "load_reference_model_module",
    "load_val_tables",
    "make_pseudo_dialogues",
    "mlp_labels",
    "projection_labels",
    "reference_available",
    "reference_model_config",
    "shipped_val_artifacts_available",
]
