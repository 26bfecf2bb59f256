"""M2FNet fusion model (stage 2), TPU-native Flax implementation.

Architecture parity with the reference (src/model.py:5-145):

- per-modality stacks of post-LN transformer encoders with an **additive skip
  around each whole encoder** (src/model.py:106-107, 118-119):
      x = x + Encoder(x, key_padding_mask)
- dropout -> Linear projection to d_fam -> dropout per modality
  (src/model.py:111-113, 123-125)
- Fusion Attention Modules (src/model.py:5-20): MHA with query=text,
  key=audio, value=text (that value=text asymmetry is the architecture),
  concat with the text residual, ReLU, Linear(2d->d), ReLU; applied
  ``FAM.n_layers`` times with dropout in between (src/model.py:129-131)
- concat(audio, text) -> MLP classifier Linear(2d->hidden) [-> ReLU ->
  Linear(hidden->hidden)]*(n_layers-2) -> ReLU -> Dropout -> Linear(hidden->7)
  (src/model.py:89-100)
- modality toggles AUDIO.enabled / TEXT.enabled / FAM.enabled with the same
  validation rules and single-modality fallback (src/model.py:28-35,135-140)

The whole forward is one XLA program over [B, U, D] dialogue batches;
``padding_mask`` is the boolean True=pad mask from the collate
(src/dataset.py:86-87).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from mer_tpu.models.layers import MultiheadAttention, TransformerEncoder


class FusionAttentionModule(nn.Module):
    """Cross-modal fusion attention (reference src/model.py:5-20)."""

    embedding_size: int
    n_head: int
    dropout: float
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        text: jnp.ndarray,
        audio: jnp.ndarray,
        key_padding_mask: jnp.ndarray | None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        x = MultiheadAttention(
            self.embedding_size, self.n_head, dropout=self.dropout,
            dtype=self.dtype, param_dtype=self.param_dtype, name="multihead_attention",
        )(query=text, key=audio, value=text, key_padding_mask=key_padding_mask, deterministic=deterministic)

        x = jnp.concatenate([x, text], axis=-1)
        x = nn.relu(x)
        x = nn.Dense(self.embedding_size, dtype=self.dtype, param_dtype=self.param_dtype, name="linear")(x)
        return nn.relu(x)


class M2FNet(nn.Module):
    """Stage-2 fusion classifier over dialogue-batched embeddings.

    Config mirrors the reference ``model:`` YAML block (src/config.yaml).
    """

    audio_enabled: bool = True
    text_enabled: bool = True
    fam_enabled: bool = True
    d_model_audio: int = 768
    d_model_text: int = 768
    d_model_fam: int = 768
    n_head_audio: int = 8
    n_head_text: int = 8
    n_head_fam: int = 8
    n_layers_audio: int = 6
    n_layers_text: int = 6
    n_layers_fam: int = 5
    n_transformers_audio: int = 1
    n_transformers_text: int = 1
    n_layers_classifier: int = 2
    hidden_size_classifier: int = 768
    output_size_classifier: int = 7
    dropout: float = 0.4
    scan_layers: bool = False
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @classmethod
    def from_config(cls, model_cfg, dtype=jnp.float32, param_dtype=jnp.float32, scan_layers=False) -> "M2FNet":
        """Build from the reference model config block (src/config.yaml model:)."""
        return cls(
            audio_enabled=bool(model_cfg.AUDIO.enabled),
            text_enabled=bool(model_cfg.TEXT.enabled),
            fam_enabled=bool(model_cfg.FAM.enabled),
            d_model_audio=int(model_cfg.AUDIO.embedding_size),
            d_model_text=int(model_cfg.TEXT.embedding_size),
            d_model_fam=int(model_cfg.FAM.embedding_size),
            n_head_audio=int(model_cfg.AUDIO.n_head),
            n_head_text=int(model_cfg.TEXT.n_head),
            n_head_fam=int(model_cfg.FAM.n_head),
            n_layers_audio=int(model_cfg.AUDIO.n_encoder_layers),
            n_layers_text=int(model_cfg.TEXT.n_encoder_layers),
            n_layers_fam=int(model_cfg.FAM.n_layers),
            n_transformers_audio=int(model_cfg.AUDIO.n_transformers),
            n_transformers_text=int(model_cfg.TEXT.n_transformers),
            n_layers_classifier=int(model_cfg.CLASSIFIER.n_layers),
            hidden_size_classifier=int(model_cfg.CLASSIFIER.hidden_size),
            output_size_classifier=int(model_cfg.CLASSIFIER.output_size),
            dropout=float(model_cfg.dropout),
            scan_layers=scan_layers,
            dtype=dtype,
            param_dtype=param_dtype,
        )

    def setup(self) -> None:
        if not self.audio_enabled and not self.text_enabled:
            raise ValueError("At least one of audio and text must be enabled!")
        if self.fam_enabled and not (self.audio_enabled and self.text_enabled):
            raise ValueError("Fusion Attention Module can only be used with both audio and text enabled!")

        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)

        if self.audio_enabled:
            self.audio_encoders = [
                TransformerEncoder(
                    d_model=self.d_model_audio, nhead=self.n_head_audio,
                    num_layers=self.n_layers_audio, dropout=self.dropout,
                    scan_layers=self.scan_layers, name=f"audio_encoders_{i}", **common,
                )
                for i in range(self.n_transformers_audio)
            ]
            self.audio_proj = nn.Dense(self.d_model_fam, name="audio_proj", **common)

        if self.text_enabled:
            self.text_encoders = [
                TransformerEncoder(
                    d_model=self.d_model_text, nhead=self.n_head_text,
                    num_layers=self.n_layers_text, dropout=self.dropout,
                    scan_layers=self.scan_layers, name=f"text_encoders_{i}", **common,
                )
                for i in range(self.n_transformers_text)
            ]
            self.text_proj = nn.Dense(self.d_model_fam, name="text_proj", **common)

        if self.fam_enabled:
            self.fusion_layers = [
                FusionAttentionModule(
                    embedding_size=self.d_model_fam, n_head=self.n_head_fam,
                    dropout=self.dropout, name=f"fusion_layers_{i}", **common,
                )
                for i in range(self.n_layers_fam)
            ]

        # classifier head (reference src/model.py:89-100)
        cls_in = 2 * self.d_model_fam if (self.audio_enabled and self.text_enabled) else self.d_model_fam
        del cls_in  # input size is implicit in flax Dense; kept for clarity
        heads = [nn.Dense(self.hidden_size_classifier, name="classifier_0", **common)]
        for i in range(max(self.n_layers_classifier - 2, 0)):
            heads.append(nn.Dense(self.hidden_size_classifier, name=f"classifier_{i + 1}", **common))
        heads.append(nn.Dense(self.output_size_classifier, name="classifier_out", **common))
        self.classifier = heads

        # one shared dropout module, like the reference's self.dropout (src/model.py:57)
        self.dropout_layer = nn.Dropout(self.dropout)

    def __call__(
        self,
        text: jnp.ndarray,
        audio: jnp.ndarray,
        padding_mask: jnp.ndarray,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        """Args match the reference forward (src/model.py:102): text/audio are
        [B, U, D] dialogue batches, padding_mask is [B, U] bool True=pad.
        Returns [B, U, num_classes] logits."""
        drop = lambda x: self.dropout_layer(x, deterministic=deterministic)

        if self.audio_enabled:
            for encoder in self.audio_encoders:
                audio = audio + encoder(audio, src_key_padding_mask=padding_mask, deterministic=deterministic)
            audio = drop(audio)
            audio = self.audio_proj(audio)
            audio = drop(audio)

        if self.text_enabled:
            for encoder in self.text_encoders:
                text = text + encoder(text, src_key_padding_mask=padding_mask, deterministic=deterministic)
            text = drop(text)
            text = self.text_proj(text)
            text = drop(text)

        if self.fam_enabled:
            for fusion_layer in self.fusion_layers:
                text = fusion_layer(text=text, audio=audio, key_padding_mask=padding_mask, deterministic=deterministic)
                text = drop(text)
            x = jnp.concatenate([audio, text], axis=-1)
        elif self.audio_enabled and self.text_enabled:
            x = jnp.concatenate([audio, text], axis=-1)
        else:
            x = text if self.text_enabled else audio

        # classifier: Linear [-> ReLU -> Linear]* -> ReLU -> Dropout -> Linear
        for layer in self.classifier[:-1]:
            x = layer(x)
            x = nn.relu(x)
        x = drop(x)
        x = self.classifier[-1](x)
        return x
