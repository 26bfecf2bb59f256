"""ResNet18 mel-spectrogram encoder (stage-1c feature extractor).

The reference uses torchvision's resnet18 (weights=None) with its 1000-way fc
kept, followed by ReLU -> Linear(1000, 300) -> L2 normalize
(audio_mel/model.py:10-23).  This is the same architecture in Flax with
TPU-native NHWC layout ([B, 1001, 128, 3] log-mel "images").

BatchNorm quirk (SURVEY.md §7.4): the reference calls ``model.eval()`` before
its training loop and never ``model.train()`` (audio_mel/train.py:231), so
BatchNorm always runs with its *initial* running statistics (mean 0, var 1)
and they are never updated.  ``bn_mode`` makes that behavior explicit:

- "eval"  (reference parity, default): always use running stats
- "train" (the statistically sane choice): update stats during training
"""

from __future__ import annotations

from functools import partial

import jax.numpy as jnp
import numpy as np
from flax import linen as nn


class BasicBlock(nn.Module):
    """torchvision BasicBlock: conv3x3-bn-relu-conv3x3-bn + skip, relu."""

    features: int
    strides: int = 1
    use_running_average: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        conv = partial(nn.Conv, use_bias=False, dtype=self.dtype)
        bn = partial(
            nn.BatchNorm, use_running_average=self.use_running_average,
            momentum=0.9, epsilon=1e-5, dtype=self.dtype,
        )

        identity = x
        out = conv(self.features, (3, 3), strides=(self.strides, self.strides), padding=1, name="conv1")(x)
        out = bn(name="bn1")(out)
        out = nn.relu(out)
        out = conv(self.features, (3, 3), padding=1, name="conv2")(out)
        out = bn(name="bn2")(out)

        if identity.shape[-1] != self.features or self.strides != 1:
            identity = conv(self.features, (1, 1), strides=(self.strides, self.strides), name="downsample_conv")(x)
            identity = bn(name="downsample_bn")(identity)

        return nn.relu(out + identity)


class ResNet18(nn.Module):
    """torchvision resnet18 topology, NHWC, with the 1000-way fc head."""

    num_classes: int = 1000
    use_running_average: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        conv = partial(nn.Conv, use_bias=False, dtype=self.dtype)
        x = conv(64, (7, 7), strides=(2, 2), padding=3, name="conv1")(x)
        x = nn.BatchNorm(
            use_running_average=self.use_running_average, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name="bn1",
        )(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        stage_sizes = [(64, 1), (128, 2), (256, 2), (512, 2)]
        for stage, (features, first_stride) in enumerate(stage_sizes):
            for block in range(2):
                x = BasicBlock(
                    features=features,
                    strides=first_stride if block == 0 else 1,
                    use_running_average=self.use_running_average,
                    dtype=self.dtype,
                    name=f"layer{stage + 1}_{block}",
                )(x)

        x = jnp.mean(x, axis=(1, 2))  # global average pool
        x = nn.Dense(self.num_classes, dtype=self.dtype, name="fc")(x)
        return x


class AudioMelFeatureExtractor(nn.Module):
    """ResNet18 -> ReLU -> Linear(1000, 300) -> L2 normalize
    (reference audio_mel/model.py:10-23).

    Input: [B, frames, n_mels, 3] NHWC log-mel images (use
    ``channels_last`` on the frontend, or transpose a reference-layout
    [B, 3, F, M] batch).
    """

    embedding_size: int = 300
    bn_mode: str = "eval"  # "eval" = reference parity, "train" = update stats
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        if x.shape[1] == 3 and x.shape[-1] != 3:
            x = jnp.transpose(x, (0, 2, 3, 1))  # accept reference NCHW layout
        use_running_average = True if self.bn_mode == "eval" else not train
        x = ResNet18(use_running_average=use_running_average, dtype=self.dtype, name="resnet18")(x)
        x = nn.relu(x)
        x = nn.Dense(self.embedding_size, dtype=self.dtype, name="projector")(x)
        # L2-normalize (and everything downstream: triplet/var/cov losses,
        # mining distances) in f32 even under bf16 compute — the embeddings
        # are tiny, the convs are where bf16 pays
        x = x.astype(jnp.float32)
        norm = jnp.linalg.norm(x, axis=-1, keepdims=True)
        return x / jnp.maximum(norm, 1e-12)


# ---------------------------------------------------------------------------
# torch (torchvision-layout) -> flax conversion
# ---------------------------------------------------------------------------


def _np_t(t) -> np.ndarray:
    if isinstance(t, np.ndarray):
        return t.astype(np.float32)
    return t.detach().cpu().numpy().astype(np.float32)


def convert_torch_mel_extractor(sd) -> tuple[dict, dict]:
    """Convert a reference AudioMelFeatureExtractor state_dict
    (``resnet18.*`` in torchvision layout + ``projector.1`` Linear,
    reference audio_mel/model.py:10-23) to this module's (params,
    batch_stats) trees.  Conv weights transpose OIHW -> HWIO."""

    def conv(k):
        return {"kernel": _np_t(sd[f"{k}.weight"]).transpose(2, 3, 1, 0)}

    def bn(k):
        return (
            {"scale": _np_t(sd[f"{k}.weight"]), "bias": _np_t(sd[f"{k}.bias"])},
            {"mean": _np_t(sd[f"{k}.running_mean"]), "var": _np_t(sd[f"{k}.running_var"])},
        )

    def linear(k):
        return {"kernel": _np_t(sd[f"{k}.weight"]).T, "bias": _np_t(sd[f"{k}.bias"])}

    params: dict = {"resnet18": {}}
    stats: dict = {"resnet18": {}}
    p, s = params["resnet18"], stats["resnet18"]
    p["conv1"] = conv("resnet18.conv1")
    p["bn1"], s["bn1"] = bn("resnet18.bn1")
    for stage in range(1, 5):
        for block in range(2):
            name = f"layer{stage}_{block}"
            tname = f"resnet18.layer{stage}.{block}"
            bp: dict = {"conv1": conv(f"{tname}.conv1"), "conv2": conv(f"{tname}.conv2")}
            bs: dict = {}
            bp["bn1"], bs["bn1"] = bn(f"{tname}.bn1")
            bp["bn2"], bs["bn2"] = bn(f"{tname}.bn2")
            if f"{tname}.downsample.0.weight" in sd:
                bp["downsample_conv"] = conv(f"{tname}.downsample.0")
                bp["downsample_bn"], bs["downsample_bn"] = bn(f"{tname}.downsample.1")
            p[name], s[name] = bp, bs
    p["fc"] = linear("resnet18.fc")
    params["projector"] = linear("projector.1")
    return params, stats
