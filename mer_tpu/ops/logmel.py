"""On-device log-mel spectrogram frontend.

Replaces the reference's host-side librosa pipeline
(audio_mel/dataset.py:93-100 + caching/normalization at :102-115,160-178)
with an on-device XLA/Pallas implementation.  Exact recipe being reproduced:

    y = audio / abs(audio).max()
    S = librosa.feature.melspectrogram(
            y, sr=16000, n_fft=400, hop_length=160, win_length=400,
            window='hann', center=True, power=1, n_mels=128,
            fmin=0, fmax=None, htk=False, norm=1).T
    out = log(S + eps)                         # eps = np.finfo(float).eps
    out = (out - out.min()) / (out.max() - out.min())   # per clip
    out = floor(out * 255) / 255               # PNG uint8 cache quantization
                                               # (uint8 cast truncates, it does
                                               # not round — reference parity)
    pad frames to 1001, replicate to 3 channels -> [3, 1001, 128]

Implementation notes:
- STFT center=True means reflect padding (np.pad mode='reflect') by
  n_fft//2 on both sides; with batched fixed-size buffers the right-hand
  reflection is realized through index arithmetic around the true length.
- The DFT is computed as two GEMMs against cos/sin matrices (GEMM-NDFT) so
  the whole frontend runs on the MXU; rfft would run on the TPU's FFT path
  but fuses worse with the windowing and mel projection.
- The mel filterbank is the slaney-scale triangle bank with L1-normalized
  rows (librosa ``norm=1`` semantics — each filter divided by the sum of its
  weights; distinct from ``norm='slaney'`` area normalization).
- A fused Pallas kernel (mer_tpu.ops.logmel_pallas) covers the
  frames->log-mel hot path; the jnp version below is the golden reference
  and the CPU/test fallback.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

EPS_F64 = float(np.finfo(np.float64).eps)


@dataclass(frozen=True)
class MelConfig:
    sample_rate: int = 16000
    n_fft: int = 400
    hop_length: int = 160
    win_length: int = 400
    n_mels: int = 128
    fmin: float = 0.0
    fmax: float | None = None  # None -> sr/2
    max_seconds: float = 10.0  # reference AUDIO.max_duration

    @property
    def max_samples(self) -> int:
        return int(self.max_seconds * self.sample_rate)

    @property
    def max_frames(self) -> int:
        # reference: int(10 * 16000 / 160) + 1 = 1001 (audio_mel/dataset.py:171)
        return int(self.max_seconds * self.sample_rate / self.hop_length) + 1

    @property
    def n_freqs(self) -> int:
        return self.n_fft // 2 + 1


def hann_window(n: int) -> np.ndarray:
    """Periodic Hann (scipy get_window('hann', n, fftbins=True))."""
    k = np.arange(n, dtype=np.float64)
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * k / n)).astype(np.float64)


def _hz_to_mel_slaney(f: np.ndarray) -> np.ndarray:
    f = np.asarray(f, dtype=np.float64)
    f_sp = 200.0 / 3
    mels = f / f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    log_region = f >= min_log_hz
    mels = np.where(log_region, min_log_mel + np.log(np.maximum(f, min_log_hz) / min_log_hz) / logstep, mels)
    return mels


def _mel_to_hz_slaney(m: np.ndarray) -> np.ndarray:
    m = np.asarray(m, dtype=np.float64)
    f_sp = 200.0 / 3
    freqs = m * f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    log_region = m >= min_log_mel
    freqs = np.where(log_region, min_log_hz * np.exp(logstep * (m - min_log_mel)), freqs)
    return freqs


def mel_filterbank(
    sr: int = 16000,
    n_fft: int = 400,
    n_mels: int = 128,
    fmin: float = 0.0,
    fmax: float | None = None,
    norm: int | str | None = 1,
) -> np.ndarray:
    """librosa.filters.mel parity (htk=False, slaney mel scale).

    norm=1 (the reference's setting): each triangular filter row divided by
    its L1 norm.  norm='slaney': divided by half the mel band width.
    Returns [n_mels, 1 + n_fft//2] float32.
    """
    if fmax is None:
        fmax = sr / 2.0

    fftfreqs = np.linspace(0.0, sr / 2.0, 1 + n_fft // 2, dtype=np.float64)
    mel_min, mel_max = _hz_to_mel_slaney(np.asarray([fmin, fmax]))
    mel_f = _mel_to_hz_slaney(np.linspace(mel_min, mel_max, n_mels + 2))

    fdiff = np.diff(mel_f)
    ramps = mel_f[:, None] - fftfreqs[None, :]

    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))

    if norm == "slaney":
        enorm = 2.0 / (mel_f[2 : n_mels + 2] - mel_f[:n_mels])
        weights = weights * enorm[:, None]
    elif norm is not None:
        l1 = np.sum(np.abs(weights), axis=1, keepdims=True)
        weights = np.where(l1 > 0, weights / l1, weights)

    return weights.astype(np.float32)


def dft_matrices(n_fft: int, window: np.ndarray | None = None) -> tuple[np.ndarray, np.ndarray]:
    """Real-DFT cos/sin matrices [n_fft, n_freqs], window pre-folded in."""
    n_freqs = n_fft // 2 + 1
    n = np.arange(n_fft, dtype=np.float64)[:, None]
    k = np.arange(n_freqs, dtype=np.float64)[None, :]
    angle = 2.0 * np.pi * n * k / n_fft
    cos_m, sin_m = np.cos(angle), -np.sin(angle)
    if window is not None:
        cos_m = cos_m * window[:, None]
        sin_m = sin_m * window[:, None]
    return cos_m.astype(np.float32), sin_m.astype(np.float32)


# ---------------------------------------------------------------------------
# jnp (XLA) implementation — golden path, differentiable, CPU-safe
# ---------------------------------------------------------------------------

def reflect_pad_indices(max_samples: int, pad: int, length: jnp.ndarray) -> jnp.ndarray:
    """Index map realizing np.pad(y[:length], pad, mode='reflect') over a
    fixed-size buffer: positions beyond ``length`` reflect around length-1.

    Golden reference for :func:`reflect_pad_batch`.  Materializing this map as
    a full-width ``take_along_axis`` runs on the TPU's scalar gather path —
    53.6 ms for [32, 160400] on v5e vs 1.6 ms for the slice-based rewrite
    (scripts/profile_logmel_parts.py), so the production op no longer uses it.
    """
    idx = jnp.arange(-pad, max_samples + pad)
    pos = jnp.abs(idx)  # left reflection around 0
    pos = jnp.where(pos > length - 1, 2 * (length - 1) - pos, pos)  # right reflection
    return jnp.clip(pos, 0, max_samples - 1)


def reflect_pad_batch(y: jnp.ndarray, length: jnp.ndarray, max_samples: int, pad: int) -> jnp.ndarray:
    """Gather-free batched reflect padding over fixed [B, max_samples] buffers.

    Equal to gathering with :func:`reflect_pad_indices` at every position a
    *valid* STFT frame reads (positions past ``length + pad`` differ — the
    index map clamps them to sample 0, this pads zeros — but only frames
    ``>= 1 + length // hop`` read there and the caller masks those out).

    The interior of the reflect map is the identity, so instead of one
    [B, L+2p] general gather (5.1M scalar-gathered elements, 53.6 ms on v5e)
    this builds the buffer from a concatenation and patches the two edges:
    a [B, pad] gather for the left reflection, a [B, pad + n_fft] gather for
    the right reflection values, and one vmapped ``dynamic_update_slice`` to
    place the right patch at its per-clip position (1.6 ms, 34x).
    """
    b = y.shape[0]
    length = jnp.clip(length.astype(jnp.int32), 1, max_samples)
    l1 = (length - 1)[:, None]
    # left edge: exact reflect_pad_indices formula (handles clips shorter
    # than the pad width too)
    pos = jnp.abs(jnp.arange(-pad, 0))[None, :]
    pos = jnp.where(pos > l1, 2 * l1 - pos, pos)
    left = jnp.take_along_axis(y, jnp.clip(pos, 0, max_samples - 1), axis=1)
    # right reflection values for buffer positions length .. length+tail-1;
    # tail covers every sample the last valid frame and the final buffer
    # column can read (<= length + 2*pad - 1, and 2*pad == n_fft here)
    tail = 3 * pad
    src = jnp.clip(l1 - 1 - jnp.arange(tail)[None, :], 0, max_samples - 1)
    patch = jnp.take_along_axis(y, src, axis=1)  # [B, tail]
    buf = jnp.concatenate([left, y, jnp.zeros((b, tail), y.dtype)], axis=1)
    buf = jax.vmap(
        lambda row, p, l: jax.lax.dynamic_update_slice(row, p, (pad + l,))
    )(buf, patch, length)
    return buf[:, : max_samples + 2 * pad]


def frame_signal(padded: jnp.ndarray, n_frames: int, n_fft: int, hop: int) -> jnp.ndarray:
    """[.., L] -> [.., n_frames, n_fft] overlapping frames (static shapes).

    Framing is a strided re-view, not a permutation, so it decomposes into
    ``n_fft // gcd(hop, n_fft)`` strided slices of a chunked reshape — pure
    slice/concat ops XLA copies at HBM bandwidth (1.6 ms for [32, 160400] on
    v5e), where the equivalent ``jnp.take`` runs the scalar gather path
    (2.5 ms here, and growing with frame overlap).  Falls back to the gather
    when the buffer is too short to chunk evenly.
    """
    import math

    chunk = math.gcd(hop, n_fft)
    step, cover = hop // chunk, n_fft // chunk
    n_chunks = padded.shape[-1] // chunk
    need = step * (n_frames - 1) + cover
    if n_chunks >= need:
        base = padded[..., : n_chunks * chunk].reshape(*padded.shape[:-1], n_chunks, chunk)
        parts = [
            jax.lax.slice_in_dim(base, j, j + step * (n_frames - 1) + 1, stride=step, axis=-2)
            for j in range(cover)
        ]
        return jnp.concatenate(parts, axis=-1)
    starts = jnp.arange(n_frames) * hop
    offsets = jnp.arange(n_fft)
    gather_idx = starts[:, None] + offsets[None, :]
    return jnp.take(padded, gather_idx, axis=-1)


def _logmel_frames_jnp(frames: jnp.ndarray, cfg: MelConfig) -> jnp.ndarray:
    """[B, F, n_fft] windowed-DFT -> mel -> log, pure-XLA schedule.
    Differentiable; also serves as the VJP restatement for the Pallas path."""
    window = hann_window(cfg.win_length)
    cos_m, sin_m = dft_matrices(cfg.n_fft, window)
    re = jnp.einsum("bfn,nk->bfk", frames, cos_m, preferred_element_type=jnp.float32)
    im = jnp.einsum("bfn,nk->bfk", frames, sin_m, preferred_element_type=jnp.float32)
    mag = jnp.sqrt(re * re + im * im)  # power=1
    mel_w = mel_filterbank(cfg.sample_rate, cfg.n_fft, cfg.n_mels, cfg.fmin, cfg.fmax, norm=1)
    mel = jnp.einsum("bfk,mk->bfm", mag, mel_w, preferred_element_type=jnp.float32)
    return jnp.log(mel + EPS_F64)  # [B, F, M]


from functools import partial as _partial


@_partial(jax.custom_vjp, nondiff_argnums=(1,))
def _logmel_frames_kernel(frames: jnp.ndarray, cfg: MelConfig) -> jnp.ndarray:
    """Fused Pallas frames->log-mel (forward); gradients fall back to the
    jnp restatement's VJP so differentiating through the spectrogram works
    on TPU without the caller having to know to pass use_pallas=False.
    Off-TPU the kernel runs in interpret mode (testability; the jnp path is
    the default there anyway)."""
    from mer_tpu.ops.logmel_pallas import logmel_frames_pallas

    return logmel_frames_pallas(frames, cfg, interpret=jax.default_backend() != "tpu")


def _logmel_frames_kernel_fwd(frames, cfg):
    return _logmel_frames_kernel(frames, cfg), frames


def _logmel_frames_kernel_bwd(cfg, frames, g):
    _, vjp = jax.vjp(lambda f: _logmel_frames_jnp(f, cfg), frames)
    return vjp(g)


_logmel_frames_kernel.defvjp(_logmel_frames_kernel_fwd, _logmel_frames_kernel_bwd)


@partial(jax.jit, static_argnames=("cfg", "quantize_png", "channels_first", "use_pallas"))
def log_mel_spectrogram(
    audio: jnp.ndarray,
    length: jnp.ndarray,
    cfg: MelConfig = MelConfig(),
    *,
    quantize_png: bool = True,
    channels_first: bool = True,
    use_pallas: bool | None = None,
) -> jnp.ndarray:
    """Batched on-device log-mel pipeline.

    Args:
        audio: [B, max_samples] float waveforms, zero-padded past ``length``.
        length: [B] int true sample counts (after the 10 s truncation).
        quantize_png: reproduce the reference's uint8 PNG cache quantization
            (part of its observed behavior, audio_mel/dataset.py:102-115).
        channels_first: return [B, 3, max_frames, n_mels] like the reference's
            final tensor (:169,178); else [B, max_frames, n_mels, 3].
        use_pallas: run the frames->log-mel hot region through the fused
            Pallas kernel (ops/logmel_pallas.py).  ``None`` (default) picks
            the kernel on TPU — 1.3-1.6x the XLA schedule of the full op
            (2.26 vs 3.55 ms at b=32, scripts/bench_logmel_fullop.py) — and
            the jnp path elsewhere.  The kernel is forward-only, but a
            custom_vjp routes gradients through the jnp restatement, so
            differentiating through the spectrogram works either way.

    Returns float32 in [0, 1].
    """
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    b = audio.shape[0]
    pad = cfg.n_fft // 2
    audio = audio.astype(jnp.float32)
    length = jnp.maximum(length.astype(jnp.int32), 1)

    # peak normalization over the true samples (dataset.py:94)
    sample_valid = jnp.arange(cfg.max_samples)[None, :] < length[:, None]
    peak = jnp.max(jnp.where(sample_valid, jnp.abs(audio), 0.0), axis=1, keepdims=True)
    y = audio / jnp.maximum(peak, 1e-30)

    # reflect padding, gather-free (slices + edge patches): the full-width
    # index-map gather was 91% of the op's device time (53.6 of 59 ms per
    # 32-clip batch on v5e — scripts/profile_logmel_parts.py)
    padded = reflect_pad_batch(y, length, cfg.max_samples, pad)

    frames = frame_signal(padded, cfg.max_frames, cfg.n_fft, cfg.hop_length)  # [B, F, n_fft]

    n_frames = 1 + length // cfg.hop_length  # frames actually defined per clip
    frame_valid = jnp.arange(cfg.max_frames)[None, :] < n_frames[:, None]  # [B, F]

    if use_pallas:
        logmel = _logmel_frames_kernel(frames, cfg)
    else:
        logmel = _logmel_frames_jnp(frames, cfg)

    # per-clip min-max over *valid* frames only (dataset.py:162-164)
    big = jnp.float32(1e30)
    masked = jnp.where(frame_valid[..., None], logmel, big)
    mn = jnp.min(masked.reshape(b, -1), axis=1)[:, None, None]
    masked = jnp.where(frame_valid[..., None], logmel, -big)
    mx = jnp.max(masked.reshape(b, -1), axis=1)[:, None, None]
    out = (logmel - mn) / jnp.maximum(mx - mn, 1e-30)

    if quantize_png:
        # PNG round-trip: float -> *255 -> uint8 (truncation, like
        # ndarray.astype) -> /255
        out = jnp.floor(out * 255.0) / 255.0

    # zero padding beyond the valid frames (dataset.py:171-176)
    out = jnp.where(frame_valid[..., None], out, 0.0)

    # grayscale -> 3-channel RGB replicate (dataset.py:178)
    if channels_first:
        return jnp.broadcast_to(out[:, None, :, :], (b, 3, cfg.max_frames, cfg.n_mels))
    return jnp.broadcast_to(out[..., None], (b, cfg.max_frames, cfg.n_mels, 3))


def prepare_waveform_batch(waves: list[np.ndarray], cfg: MelConfig = MelConfig()) -> tuple[np.ndarray, np.ndarray]:
    """Host-side: truncate to max_seconds, zero-pad into a fixed [B, L] buffer."""
    b = len(waves)
    out = np.zeros((b, cfg.max_samples), dtype=np.float32)
    lengths = np.zeros((b,), dtype=np.int32)
    for i, w in enumerate(waves):
        w = np.asarray(w, dtype=np.float32).reshape(-1)[: cfg.max_samples]
        out[i, : w.shape[0]] = w
        lengths[i] = w.shape[0]
    return out, lengths
