from mer_tpu.serving.quant import (
    M2FNetInt8,
    int8_dense,
    quantize_m2fnet,
    quantize_tree,
    quantize_weight,
    quantized_bytes,
)

__all__ = [
    "M2FNetInt8",
    "int8_dense",
    "quantize_m2fnet",
    "quantize_tree",
    "quantize_weight",
    "quantized_bytes",
]
