from mer_tpu.mining.triplet import (
    TripletIndexSampler,
    TripletMiner,
    cdist,
    hard_triplets_from_pool,
    semihard_mask,
)

__all__ = [
    "TripletMiner",
    "TripletIndexSampler",
    "hard_triplets_from_pool",
    "semihard_mask",
    "cdist",
]
