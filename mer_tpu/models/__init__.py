from mer_tpu.models.layers import MLP, MultiheadAttention, TransformerEncoder, TransformerEncoderLayer
from mer_tpu.models.m2fnet import FusionAttentionModule, M2FNet

__all__ = [
    "MultiheadAttention",
    "TransformerEncoder",
    "TransformerEncoderLayer",
    "MLP",
    "FusionAttentionModule",
    "M2FNet",
]
