from mer_tpu.data.fusion import DEFAULT_LENGTH_BUCKETS, FusionBatcher, FusionDataset, collate_dialogues, pick_bucket
from mer_tpu.data.prefetch import DevicePrefetcher, prefetch
from mer_tpu.data.synthetic import SyntheticFusionDataset, synthetic_dialogues

__all__ = [
    "FusionDataset",
    "FusionBatcher",
    "collate_dialogues",
    "pick_bucket",
    "DEFAULT_LENGTH_BUCKETS",
    "DevicePrefetcher",
    "prefetch",
    "SyntheticFusionDataset",
    "synthetic_dialogues",
]
