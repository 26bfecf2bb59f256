"""mer_tpu — a TPU-native (JAX / Flax / pjit / Pallas) multimodal emotion
recognition framework with the full capability surface of the reference
PyTorch implementation of M2FNet (iosonopersia/Multimodal-Emotion-Recognition).

Layout
------
- ``mer_tpu.core``       config system, MELD table loading, artifact store
- ``mer_tpu.ops``        compute kernels: log-mel frontend (XLA + Pallas),
                         fused attention, resampling, augmentation
- ``mer_tpu.models``     Flax models: M2FNet fusion, ResNet18 mel encoder,
                         RoBERTa, wav2vec2
- ``mer_tpu.objectives`` losses (CE w/ ignore+smoothing, adaptive triplet /
                         variance / covariance) and metrics (acc, weighted-F1)
- ``mer_tpu.data``       dialogue/utterance datasets, length bucketing,
                         double-buffered host->device prefetch
- ``mer_tpu.mining``     device-side triplet mining (random / semi-hard / hard)
- ``mer_tpu.parallel``   device meshes, DP/TP sharding rules, multi-host init
- ``mer_tpu.train``      the shared solver engine (the reference copy-pastes
                         its training loop 4x; here it is one engine)
- ``mer_tpu.utils``      logging (wandb-optional), profiling

The package is pure JAX on the compute path; everything under a train/eval
step is a single jitted program per (bucketed) shape.
"""

__version__ = "0.1.0"

from mer_tpu.utils.cache import enable_compilation_cache as _enable_cache

_enable_cache()
del _enable_cache
