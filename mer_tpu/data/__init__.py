from mer_tpu.data.audio_io import WaveformStore, load_wav, save_wav
from mer_tpu.data.fusion import DEFAULT_LENGTH_BUCKETS, DeviceFusionBatcher, FusionBatcher, FusionDataset, collate_dialogues, pick_bucket
from mer_tpu.data.mel_fe import MelFeatureDataset, wav_dir_for
from mer_tpu.data.prefetch import DevicePrefetcher, prefetch
from mer_tpu.data.process_sharding import local_num_batches, resolve_process, shard_batches
from mer_tpu.data.synthetic import SyntheticFusionDataset, synthetic_dialogues
from mer_tpu.data.text_fe import HFTokenizerAdapter, TextBatcher, TextFeatureDataset, ToyWhitespaceTokenizer, load_roberta_tokenizer
from mer_tpu.data.wav2vec2_fe import Wav2Vec2Batcher, Wav2Vec2FeatureDataset

__all__ = [
    "FusionDataset",
    "FusionBatcher",
    "DeviceFusionBatcher",
    "collate_dialogues",
    "pick_bucket",
    "DEFAULT_LENGTH_BUCKETS",
    "DevicePrefetcher",
    "prefetch",
    "SyntheticFusionDataset",
    "synthetic_dialogues",
    "WaveformStore",
    "load_wav",
    "save_wav",
    "MelFeatureDataset",
    "wav_dir_for",
    "TextFeatureDataset",
    "TextBatcher",
    "ToyWhitespaceTokenizer",
    "HFTokenizerAdapter",
    "load_roberta_tokenizer",
    "Wav2Vec2FeatureDataset",
    "Wav2Vec2Batcher",
    "resolve_process",
    "shard_batches",
    "local_num_batches",
]
