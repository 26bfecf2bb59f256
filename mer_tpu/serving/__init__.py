from mer_tpu.serving.encoders import (
    RobertaInt8,
    Wav2Vec2Int8,
    quantize_roberta,
    quantize_wav2vec2,
)
from mer_tpu.serving.offline import ScanPredictor, recollate_batches, split_recollated
from mer_tpu.serving.online import OnlineServer, ServerStats
from mer_tpu.serving.quant import (
    M2FNetInt8,
    apply_calibration,
    calibration,
    int8_dense,
    quantize_m2fnet,
    quantize_tree,
    quantize_weight,
    quantized_bytes,
)

__all__ = [
    "OnlineServer",
    "ServerStats",
    "M2FNetInt8",
    "RobertaInt8",
    "ScanPredictor",
    "Wav2Vec2Int8",
    "apply_calibration",
    "calibration",
    "int8_dense",
    "quantize_m2fnet",
    "quantize_roberta",
    "quantize_tree",
    "quantize_wav2vec2",
    "recollate_batches",
    "split_recollated",
    "quantize_weight",
    "quantized_bytes",
]
