from mer_tpu.core.config import Config, EMOTION_LABELS, NUM_EMOTIONS, get_config, load_config
from mer_tpu.core.text import dialogue_index, get_text, get_utterance_with_context, map_emotions
from mer_tpu.core.artifacts import embeddings_path, load_embeddings, save_embeddings

__all__ = [
    "Config",
    "EMOTION_LABELS",
    "NUM_EMOTIONS",
    "get_config",
    "load_config",
    "get_text",
    "get_utterance_with_context",
    "map_emotions",
    "dialogue_index",
    "load_embeddings",
    "save_embeddings",
    "embeddings_path",
]
