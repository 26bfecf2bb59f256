"""wav2vec 2.0 encoder + classifier (stage-1b audio feature extractor).

The reference fine-tunes torchaudio's WAV2VEC2_BASE bundle
(audio_wav2vec2/model.py:9) — architecturally identical to HF/fairseq
wav2vec2-base — with masked mean pooling over valid frames (:27) and a
Linear-Tanh-Linear head (:12-16).  Native Flax implementation, parity-tested
against HF transformers torch.

Architecture (base):
- conv feature extractor: 7 temporal convs (512ch; k/s = 10/5, 3/2 x4, 2/2 x2),
  GroupNorm(512, 512) after the first conv only, GELU, no bias
- feature projection: LayerNorm -> Linear(512 -> 768) -> dropout
- encoder: grouped convolutional positional embedding (k=128, groups=16,
  weight-normed in torch — folded at conversion), additive, then 12 post-LN
  transformer layers (GELU FFN 3072)
- padded frames are zeroed before the positional conv and masked as
  attention keys (HF semantics)
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from mer_tpu.ops.attention import dot_product_attention


@dataclass(frozen=True)
class Wav2Vec2Config:
    conv_dim: tuple[int, ...] = (512, 512, 512, 512, 512, 512, 512)
    conv_kernel: tuple[int, ...] = (10, 3, 3, 3, 3, 2, 2)
    conv_stride: tuple[int, ...] = (5, 2, 2, 2, 2, 2, 2)
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    num_conv_pos_embeddings: int = 128
    num_conv_pos_embedding_groups: int = 16
    layer_norm_eps: float = 1e-5
    hidden_dropout: float = 0.1
    attention_dropout: float = 0.1
    num_labels: int = 7

    @classmethod
    def base(cls) -> "Wav2Vec2Config":
        return cls()

    def feat_extract_output_lengths(self, input_lengths: jnp.ndarray) -> jnp.ndarray:
        lengths = input_lengths
        for k, s in zip(self.conv_kernel, self.conv_stride):
            lengths = (lengths - k) // s + 1
        return lengths


class _Conv1dGemm(nn.Module):
    """VALID strided temporal conv as windows+GEMM. Param-tree-compatible
    with the ``nn.Conv`` it replaces (kernel [k, Cin, Cout], no bias; same
    lecun-normal init over fan_in = k*Cin)."""

    features: int
    kernel_size: int
    stride: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        k, s = self.kernel_size, self.stride
        cin = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (k, cin, self.features)
        )
        w = _strided_windows(x.astype(self.dtype), k, s)
        return jnp.einsum(
            "btk,kd->btd", w, kernel.astype(self.dtype).reshape(k * cin, self.features)
        )


class _GroupNorm1Pass(nn.Module):
    """GroupNorm(num_groups=C, C) over time with ONE-pass statistics
    (sum/sumsq -> var = E[x^2] - mean^2) — param-tree-compatible with the
    ``nn.GroupNorm`` it replaces (scale [C] ones, bias [C] zeros; f32 stats,
    output cast to ``dtype``).  jnp.var is a mean pass plus a squared-
    deviation pass: one extra full read of the [B, 12799, 512] layer-0
    activation, worth 0.53 ms/batch on the v5e export shape
    (scripts/probe_w2v_layer0.py --xla-variants: stack 11.36 -> 10.83 ms).
    The one-pass form differs from two-pass variance only by f32 rounding
    (~1e-6 relative on this zero-mean activation; cancellation needs
    mean >> std, which GN-normalized conv outputs never have)."""

    epsilon: float
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        xf = x.astype(jnp.float32)
        n = jnp.float32(x.shape[1])
        sm = jnp.sum(xf, axis=1, keepdims=True)
        sq = jnp.sum(xf * xf, axis=1, keepdims=True)
        mean = sm / n
        var = sq / n - mean * mean
        y = (xf - mean) * jax.lax.rsqrt(var + self.epsilon)
        return (y * scale + bias).astype(self.dtype)


class ConvFeatureExtractor(nn.Module):
    """Temporal conv stack on raw waveforms [B, L] -> [B, T, C].

    ``use_gemm``: compute each conv as strided-window reshape + MXU GEMM
    instead of XLA's conv lowering (identical math and param tree; see
    _strided_windows). None = backend default = OFF — measured on the v5e
    chip (scripts/profile_w2v_conv.py, 2026-08-18): XLA conv 10.77 ms/batch
    (58.3 TFLOP/s, 29.6% bf16 peak) vs GEMM 16.50 ms (38.1 TFLOP/s) on the
    32x4s export batch — XLA's conv lowering wins 1.53x; the window
    materialization (k/s up to 2x data expansion in HBM for the k!=s layers)
    costs more than the conv-tiling it avoids. The GEMM path stays as an
    equality-tested alternative for other shape regimes.

    ``fused_glue``: layer-0-only TPU glue tuning, None = ON for TPU backends
    (measured: scripts/probe_w2v_layer0.py --xla-variants, v5e 32x4s bf16,
    stack 11.36 -> 10.46 ms, 1.086x): (a) layer 0 computed as the
    strided-windows GEMM — cin=1/k=10 makes XLA's conv tiling pad the
    contraction while the [B, T, 10] window build is 10 thin contiguous
    slices; composed with (b) it wins 0.37 ms where alone it is a wash —
    and (b) the GroupNorm via _GroupNorm1Pass (one fused sum/sumsq pass).
    Both are param-tree-identical rewrites; the stride-2 tail always stays
    on XLA's conv lowering (51% of peak — every Pallas/GEMM alternative
    measured slower, see ops/w2v_conv_pallas.py)."""

    cfg: Wav2Vec2Config
    dtype: jnp.dtype = jnp.float32
    use_gemm: bool | None = None
    fused_glue: bool | None = None

    @nn.compact
    def __call__(self, waveforms: jnp.ndarray) -> jnp.ndarray:
        use_gemm = self.use_gemm if self.use_gemm is not None else False
        fused_glue = (
            self.fused_glue if self.fused_glue is not None
            else jax.default_backend() == "tpu"
        )
        x = waveforms[:, :, None]  # [B, L, 1]
        for i, (dim, k, s) in enumerate(zip(self.cfg.conv_dim, self.cfg.conv_kernel, self.cfg.conv_stride)):
            if use_gemm or (fused_glue and i == 0):
                x = _Conv1dGemm(dim, k, s, dtype=self.dtype, name=f"conv_{i}")(x)
            else:
                x = nn.Conv(dim, (k,), strides=(s,), padding="VALID", use_bias=False,
                            dtype=self.dtype, name=f"conv_{i}")(x)
            if i == 0:
                # GroupNorm(num_groups=C, C) == per-channel norm over time
                if fused_glue:
                    x = _GroupNorm1Pass(epsilon=self.cfg.layer_norm_eps,
                                        dtype=self.dtype, name="group_norm")(x)
                else:
                    x = nn.GroupNorm(num_groups=self.cfg.conv_dim[0], epsilon=self.cfg.layer_norm_eps,
                                     dtype=self.dtype, name="group_norm")(x)
            x = nn.gelu(x, approximate=False)
        return x


def _strided_windows(x: jnp.ndarray, k: int, s: int) -> jnp.ndarray:
    """[B, L, C] -> [B, out_len, k*C] overlapping windows (stride s) built
    from contiguous slices of a stride-grouped reshape — no general gather
    (the TPU scalar path; killing it won 34x in ops/logmel.py), and no
    strided slice at all: unlike frame_signal's strided-slice-over-chunked-
    reshape (cheap — lane-aligned, few slices), here the taps land on
    CONTIGUOUS rows/columns of the [B, L//s, s*C] reshape, so plain slices
    suffice and copy at HBM bandwidth (scripts/profile_w2v_conv.py measures
    both forms).

    Window t, tap j reads sample t*s + j = row (t + j//s), column (j % s) of
    the [B, L//s, s*C] reshape; each tap is one contiguous slice."""
    b, l, c = x.shape
    out_len = (l - k) // s + 1
    if k == s:
        return x[:, : out_len * s, :].reshape(b, out_len, k * c)
    # pad UP to a whole number of stride rows covering every tap's last row
    # (never truncate first: the last valid window's tail samples can live in
    # the l % s remainder). Padded positions p >= l are provably never read:
    # any tap sample index is t*s + j <= (out_len-1)*s + k-1 <= l-1.
    rows = out_len + (k - 1) // s
    if rows * s > l:
        x = jnp.pad(x, ((0, 0), (0, rows * s - l), (0, 0)))
    xr = x[:, : rows * s, :].reshape(b, rows, s * c)
    taps = []
    for j in range(k):
        r, col = divmod(j, s)
        taps.append(xr[:, r : r + out_len, col * c : (col + 1) * c])
    return jnp.concatenate(taps, axis=-1)


def conv_stack_gemm(params: dict, waveforms: jnp.ndarray, cfg: Wav2Vec2Config,
                    dtype=jnp.float32) -> jnp.ndarray:
    """The ConvFeatureExtractor forward as explicit windows+GEMM per layer
    (identical math: VALID strided conv == [B*T, k*Cin] @ [k*Cin, Cout]).

    Same params tree as ConvFeatureExtractor (conv_i/kernel [k, Cin, Cout],
    group_norm after conv_0, exact GELU) — drop-in for the module's apply."""
    x = waveforms[:, :, None].astype(dtype)
    for i, (dim, k, s) in enumerate(zip(cfg.conv_dim, cfg.conv_kernel, cfg.conv_stride)):
        kernel = params[f"conv_{i}"]["kernel"].astype(dtype)  # [k, Cin, Cout]
        cin = kernel.shape[1]
        w = _strided_windows(x, k, s)  # [B, T, k*Cin]
        x = jnp.einsum("btk,kd->btd", w, kernel.reshape(k * cin, dim))
        if i == 0:
            gp = params["group_norm"]
            # GroupNorm(C, C) == per-channel normalization over time, f32 stats
            xf = x.astype(jnp.float32)
            mean = xf.mean(axis=1, keepdims=True)
            var = xf.var(axis=1, keepdims=True)
            xf = (xf - mean) * jax.lax.rsqrt(var + cfg.layer_norm_eps)
            x = (xf * gp["scale"] + gp["bias"]).astype(dtype)
        x = nn.gelu(x, approximate=False)
    return x


class ConvPositionalEmbedding(nn.Module):
    """Grouped conv positional embedding; torch weight-norm is folded into
    the materialized kernel at conversion time."""

    cfg: Wav2Vec2Config
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden: jnp.ndarray) -> jnp.ndarray:
        k = self.cfg.num_conv_pos_embeddings
        pad = k // 2
        x = nn.Conv(
            self.cfg.hidden_size, (k,), padding=[(pad, pad)],
            feature_group_count=self.cfg.num_conv_pos_embedding_groups,
            dtype=self.dtype, name="conv",
        )(hidden)
        if k % 2 == 0:
            x = x[:, :-1, :]
        return nn.gelu(x, approximate=False)


class Wav2Vec2EncoderLayer(nn.Module):
    cfg: Wav2Vec2Config
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden, key_padding_mask, deterministic=True):
        c = self.cfg
        head_dim = c.hidden_size // c.num_attention_heads
        b, s, _ = hidden.shape
        dense = lambda name: nn.Dense(c.hidden_size, dtype=self.dtype, name=name)
        drop = lambda x: nn.Dropout(c.hidden_dropout, deterministic=deterministic)(x)

        q = dense("q_proj")(hidden).reshape(b, s, c.num_attention_heads, head_dim).transpose(0, 2, 1, 3)
        k = dense("k_proj")(hidden).reshape(b, s, c.num_attention_heads, head_dim).transpose(0, 2, 1, 3)
        v = dense("v_proj")(hidden).reshape(b, s, c.num_attention_heads, head_dim).transpose(0, 2, 1, 3)
        rng = self.make_rng("dropout") if (not deterministic and c.attention_dropout > 0) else None
        attn = dot_product_attention(
            q, k, v, key_padding_mask=key_padding_mask,
            dropout_rate=c.attention_dropout, dropout_rng=rng, deterministic=deterministic,
        ).transpose(0, 2, 1, 3).reshape(b, s, c.hidden_size)
        attn = dense("out_proj")(attn)

        hidden = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype, name="layer_norm")(hidden + drop(attn))

        ff = nn.Dense(c.intermediate_size, dtype=self.dtype, name="intermediate")(hidden)
        ff = nn.gelu(ff, approximate=False)
        ff = drop(ff)
        ff = nn.Dense(c.hidden_size, dtype=self.dtype, name="output")(ff)
        hidden = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype, name="final_layer_norm")(hidden + drop(ff))
        return hidden


class _ScanW2VLayer(nn.Module):
    cfg: Wav2Vec2Config
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, carry, key_padding_mask, deterministic):
        out = Wav2Vec2EncoderLayer(self.cfg, dtype=self.dtype, name="layer")(carry, key_padding_mask, deterministic)
        return out, None


class Wav2Vec2Model(nn.Module):
    """Waveforms + lengths -> frame features [B, T, H] and frame lengths.

    ``scan_layers=True``: lax.scan over one compiled encoder layer."""

    cfg: Wav2Vec2Config
    dtype: jnp.dtype = jnp.float32
    scan_layers: bool = False
    remat: bool = False
    remat_policy: str | None = None  # None/full | dots | dots_no_batch (utils/remat.py)

    @nn.compact
    def __call__(self, waveforms: jnp.ndarray, lengths: jnp.ndarray, deterministic: bool = True):
        c = self.cfg
        feats = ConvFeatureExtractor(c, dtype=self.dtype, name="feature_extractor")(waveforms)

        out_lengths = c.feat_extract_output_lengths(lengths.astype(jnp.int32))
        t = feats.shape[1]
        frame_valid = jnp.arange(t)[None, :] < out_lengths[:, None]  # [B, T]

        x = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype, name="feature_projection_norm")(feats)
        x = nn.Dense(c.hidden_size, dtype=self.dtype, name="feature_projection")(x)
        x = nn.Dropout(c.hidden_dropout, deterministic=deterministic)(x)

        # zero padded frames before the positional conv (HF semantics)
        x = jnp.where(frame_valid[..., None], x, 0.0)
        x = x + ConvPositionalEmbedding(c, dtype=self.dtype, name="pos_conv_embed")(x)
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype, name="encoder_layer_norm")(x)
        x = nn.Dropout(c.hidden_dropout, deterministic=deterministic)(x)

        key_padding_mask = ~frame_valid
        x = x.astype(self.dtype)  # scan carry type must be stable
        if self.scan_layers:
            layer_cls = _ScanW2VLayer
            if self.remat:
                from mer_tpu.utils.remat import resolve_remat_policy

                layer_cls = nn.remat(layer_cls, static_argnums=(3,),
                                     policy=resolve_remat_policy(self.remat_policy))
            scanned = nn.scan(
                layer_cls,
                variable_axes={"params": 0},
                split_rngs={"params": True, "dropout": True},
                length=c.num_hidden_layers,
                in_axes=(nn.broadcast, nn.broadcast),
            )(c, dtype=self.dtype, name="layers_scan")
            x, _ = scanned(x, key_padding_mask, deterministic)
        else:
            layer_cls = Wav2Vec2EncoderLayer
            if self.remat:
                from mer_tpu.utils.remat import resolve_remat_policy

                layer_cls = nn.remat(Wav2Vec2EncoderLayer, static_argnums=(3,),
                                     policy=resolve_remat_policy(self.remat_policy))
            for i in range(c.num_hidden_layers):
                x = layer_cls(c, dtype=self.dtype, name=f"layer_{i}")(
                    x, key_padding_mask, deterministic
                )
        return x, out_lengths


class AudioERC(nn.Module):
    """wav2vec2 + masked mean pooling + Linear-Tanh-Linear head
    (reference audio_wav2vec2/model.py:5-29)."""

    cfg: Wav2Vec2Config
    dtype: jnp.dtype = jnp.float32
    scan_layers: bool = False
    remat: bool = False  # rematerialize each layer in the backward (memory<->FLOPs)
    remat_policy: str | None = None

    def setup(self):
        self.wav2vec2 = Wav2Vec2Model(
            self.cfg, dtype=self.dtype, scan_layers=self.scan_layers, remat=self.remat,
            remat_policy=self.remat_policy,
        )
        self.head_dense = nn.Dense(self.cfg.hidden_size, dtype=self.dtype)
        self.head_out = nn.Dense(self.cfg.num_labels, dtype=self.dtype)

    def pool(self, hidden, out_lengths):
        t = hidden.shape[1]
        valid = (jnp.arange(t)[None, :] < out_lengths[:, None])[..., None]
        summed = jnp.sum(jnp.where(valid, hidden, 0.0), axis=1)
        return summed / jnp.maximum(out_lengths[:, None], 1)

    def __call__(self, waveforms, lengths, deterministic: bool = True):
        hidden, out_lengths = self.wav2vec2(waveforms, lengths, deterministic)
        pooled = self.pool(hidden, out_lengths)
        x = jnp.tanh(self.head_dense(pooled))
        return self.head_out(x)

    def embed(self, waveforms, lengths, deterministic: bool = True):
        """Masked mean-pooled embeddings for export
        (reference audio_wav2vec2/embeddings.py:85)."""
        hidden, out_lengths = self.wav2vec2(waveforms, lengths, deterministic)
        return self.pool(hidden, out_lengths)


# ---------------------------------------------------------------------------
# HF torch -> flax conversion
# ---------------------------------------------------------------------------

def _np(t) -> np.ndarray:
    return t.detach().cpu().numpy().astype(np.float32)


def convert_hf_wav2vec2(sd: dict, cfg: Wav2Vec2Config, prefix: str = "", scan_layers: bool = False) -> dict:
    """Convert an HF torch Wav2Vec2Model state_dict to Wav2Vec2Model params.

    torch Conv1d weight [out, in/groups, k] -> flax [k, in/groups, out];
    the positional conv's weight-norm (weight_g/weight_v, or the
    parametrizations.* layout in torch>=2.1) is folded into a plain kernel.
    """
    g = lambda k: _np(sd[prefix + k])
    lin = lambda k: {"kernel": g(f"{k}.weight").T, "bias": g(f"{k}.bias")}
    lnp = lambda k: {"scale": g(f"{k}.weight"), "bias": g(f"{k}.bias")}

    params: dict = {"feature_extractor": {}}
    for i in range(len(cfg.conv_dim)):
        w = g(f"feature_extractor.conv_layers.{i}.conv.weight")  # [out, in, k]
        params["feature_extractor"][f"conv_{i}"] = {"kernel": np.transpose(w, (2, 1, 0))}
    params["feature_extractor"]["group_norm"] = {
        "scale": g("feature_extractor.conv_layers.0.layer_norm.weight"),
        "bias": g("feature_extractor.conv_layers.0.layer_norm.bias"),
    }

    params["feature_projection_norm"] = lnp("feature_projection.layer_norm")
    params["feature_projection"] = lin("feature_projection.projection")

    # positional conv: materialize weight-normed kernel
    pc = prefix + "encoder.pos_conv_embed.conv."
    if pc + "weight" in sd:
        w = _np(sd[pc + "weight"])
    else:
        if pc + "parametrizations.weight.original0" in sd:
            g_w = _np(sd[pc + "parametrizations.weight.original0"])
            v_w = _np(sd[pc + "parametrizations.weight.original1"])
        else:
            g_w = _np(sd[pc + "weight_g"])
            v_w = _np(sd[pc + "weight_v"])
        # fairseq weight_norm(dim=2): per-kernel-position norm over (out, in)
        norm = np.sqrt((v_w ** 2).sum(axis=(0, 1), keepdims=True))
        w = g_w * v_w / np.maximum(norm, 1e-12)
    params["pos_conv_embed"] = {
        "conv": {"kernel": np.transpose(w, (2, 1, 0)), "bias": g("encoder.pos_conv_embed.conv.bias")}
    }

    params["encoder_layer_norm"] = lnp("encoder.layer_norm")
    per_layer = []
    for i in range(cfg.num_hidden_layers):
        p = f"encoder.layers.{i}."
        per_layer.append(
            {
                "q_proj": lin(p + "attention.q_proj"),
                "k_proj": lin(p + "attention.k_proj"),
                "v_proj": lin(p + "attention.v_proj"),
                "out_proj": lin(p + "attention.out_proj"),
                "layer_norm": lnp(p + "layer_norm"),
                "intermediate": lin(p + "feed_forward.intermediate_dense"),
                "output": lin(p + "feed_forward.output_dense"),
                "final_layer_norm": lnp(p + "final_layer_norm"),
            }
        )
    if scan_layers:
        from mer_tpu.models.torch_import import stack_layers

        params["layers_scan"] = {"layer": stack_layers(per_layer)}
    else:
        for i, lp in enumerate(per_layer):
            params[f"layer_{i}"] = lp
    return params
