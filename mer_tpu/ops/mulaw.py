"""μ-law (G.711-style) 8-bit wire codec for waveform host→device transfer.

The reference ships waveforms to the GPU as float32 tensors
(``torchaudio.load`` output fed straight to the model,
/root/reference/src/feature_extractors/audio_wav2vec2/dataset.py) — on a
local PCIe GPU the transfer is free. On TPU hosts the streaming pipeline
already halves the wire with int16 PCM (pipelines/e2e.py); ``--wire mulaw``
halves it again: 8-bit μ-law companding, the standard telephony codec
(ITU-T G.711, μ=255), decoded on device with a closed-form elementwise
expansion — exp/log on the VPU, NO table lookup (TPU general gathers run
element-at-a-time on the scalar path; see ops/logmel.py::reflect_pad_batch
for the measured pathology).

Lossy by design: ~35-38 dB SNR on speech-shaped signals (quantization noise
scales with signal level — that is the point of companding). The effect on
downstream embeddings is pinned by tests/test_mulaw.py envelope tests; the
exact int16 path stays the default.

Code layout: ``code = round(y·127) + 128`` over compressed ``y ∈ [-1, 1]``
— code 128 decodes to EXACTLY 0.0, so batch padding matches the int16
path's exact-zero pads (wav2vec2's conv frontend sees padded frames before
the length mask applies). Codes span [1, 255]; 0 is unused.

Encode (host, numpy):  y = sign(x) · ln(1+μ|x|)/ln(1+μ)
Decode (device, jax):  y = (code−128)/127,  x = sign(y)·(exp(|y|·ln(1+μ))−1)/μ
"""

from __future__ import annotations

import numpy as np

MU = 255.0
_LOG1P_MU = float(np.log1p(MU))
#: the μ-law code that decodes to exactly 0.0 (use for batch padding)
MULAW_ZERO = 128


def mulaw_encode_np(x: np.ndarray) -> np.ndarray:
    """float waveform in [-1, 1] -> uint8 μ-law codes (host side, numpy)."""
    x = np.clip(x, -1.0, 1.0)
    y = np.sign(x) * np.log1p(MU * np.abs(x)) / _LOG1P_MU
    return (np.rint(y * 127.0) + 128.0).astype(np.uint8)


def mulaw_decode(codes):
    """uint8 μ-law codes -> float32 waveform (device side, jax or numpy).

    Pure elementwise (sign/expm1/abs): fuses into the consumer on TPU and
    avoids the scalar-path gather a 256-entry lookup table would cost.
    """
    import jax.numpy as jnp

    y = (codes.astype(jnp.float32) - 128.0) / 127.0
    return jnp.sign(y) * jnp.expm1(jnp.abs(y) * _LOG1P_MU) / MU


def mulaw_decode_np(codes: np.ndarray) -> np.ndarray:
    """Numpy twin of :func:`mulaw_decode` (for host-side tests/tools)."""
    y = (codes.astype(np.float32) - 128.0) / 127.0
    return (np.sign(y) * np.expm1(np.abs(y) * _LOG1P_MU) / MU).astype(np.float32)
