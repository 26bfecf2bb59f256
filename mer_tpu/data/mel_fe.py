"""Mel feature-extractor data pipeline (stage 1c).

The reference featurizes on the host with librosa and a PNG uint8 cache
(audio_mel/dataset.py:93-180).  Here the host only decodes wavs
(data/audio_io.py); framing, DFT, mel projection, log, normalization and the
cache-parity uint8 quantization all run on device (ops/logmel.py), so there
is no spectrogram cache to manage — the frontend is orders of magnitude
faster than disk.

Augmentation (train only, when ``AUDIO.augmentation_factor > 1``) applies the
reference's transform set on device (ops/augment.py:random_augment), with
variant selection matching audio_mel/dataset.py:125-128 (variant 0 = clean).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from mer_tpu.core import get_text, map_emotions
from mer_tpu.ops.logmel import MelConfig, log_mel_spectrogram

@jax.jit
def _cache_gather(cache: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """uint8 HBM cache rows -> [n, F, M, 3] float spectrogram images."""
    gray = cache[idx].astype(jnp.float32) / 255.0
    n = idx.shape[0]
    return jnp.broadcast_to(gray[..., None], (n, gray.shape[1], gray.shape[2], 3))


_SPLIT_WAV_DIRS = {
    "train": "MELD.Raw/train_splits/wav",
    "val": "MELD.Raw/dev_splits_complete/wav",
    "test": "MELD.Raw/output_repeated_splits_test/wav",
}


def wav_dir_for(mode: str, data_root: str = "data") -> str:
    import os

    return os.path.join(os.path.abspath(data_root), _SPLIT_WAV_DIRS[mode])


class MelFeatureDataset:
    """Utterance-level dataset: row index -> waveform -> on-device log-mel.

    Exposes:
      - ``labels`` for mining / class weights
      - ``spectrogram_batch(indices, key=None)``: [n, F, M, 3] device array,
        optionally augmented (train mode, augmentation_factor > 1)
      - length/debug truncation parity (config DEBUG.enabled/num_samples,
        audio_mel/dataset.py:54-56)
    """

    def __init__(self, mode: str, config, data_root: str | None = None, waveform_store=None):
        from mer_tpu.data.audio_io import WaveformStore

        self.mode = mode
        self.config = config
        self.mel_cfg = MelConfig(
            sample_rate=int(config.AUDIO.ffmpeg_sr),
            max_seconds=float(config.AUDIO.max_duration),
        )

        df = map_emotions(get_text(mode, data_root=data_root))
        if bool(config.get_path("DEBUG.enabled", False)):
            df = df.iloc[: int(config.DEBUG.num_samples)]
        self.df = df
        self.labels = df["Emotion"].to_numpy(dtype=np.int64)
        self.dia_utt = df[["Dialogue_ID", "Utterance_ID"]].to_numpy(dtype=np.int64)

        self.augmentation_factor = max(int(config.get_path("AUDIO.augmentation_factor", 1)), 1)
        self.store = waveform_store or WaveformStore(
            wav_dir_for(mode, data_root or "data"),
            sample_rate=self.mel_cfg.sample_rate,
            max_seconds=self.mel_cfg.max_seconds,
        )
        # HBM-resident uint8 spectrogram cache (see build_device_cache) — the
        # TPU-native analog of the reference's on-disk PNG uint8 cache
        # (audio_mel/dataset.py:102-115): after a one-time build, every
        # spectrogram_batch is a pure device gather with zero host transfer.
        self._device_cache = None

    def __len__(self) -> int:
        return len(self.df)

    def get_labels(self) -> np.ndarray:
        return self.labels

    def waveform_batch(self, indices: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """Fixed-size [n, max_samples] buffer + true lengths.

        Uses the native thread-pooled batch decoder (native/wavio.cc) when
        built; falls back to the stdlib per-file reader."""
        from mer_tpu.data import native_wavio

        indices = np.asarray(indices)
        if native_wavio.available():
            paths = [self.store.path_for(*self.dia_utt[int(i)]) for i in indices]
            out, lengths = native_wavio.decode_wav_batch(
                paths, self.mel_cfg.max_samples, expect_rate=self.mel_cfg.sample_rate
            )
            bad = np.flatnonzero(lengths < 0)
            for i in bad:  # rare: fall back per file (resample path, odd formats)
                dia, utt = self.dia_utt[int(indices[i])]
                w = self.store.get(dia, utt)
                out[i, : len(w)] = w
                out[i, len(w):] = 0.0
                lengths[i] = len(w)
            return out, lengths.astype(np.int32)

        n = len(indices)
        out = np.zeros((n, self.mel_cfg.max_samples), dtype=np.float32)
        lengths = np.zeros((n,), dtype=np.int32)
        for i, idx in enumerate(indices):
            dia, utt = self.dia_utt[int(idx)]
            w = self.store.get(dia, utt)
            out[i, : len(w)] = w
            lengths[i] = len(w)
        return out, lengths

    def build_device_cache(self, chunk: int = 64, progress: bool = False) -> None:
        """Featurize the whole split once and keep the uint8 spectrograms in
        HBM ([N, max_frames, n_mels] ~ 1.3 GB for full MELD train at 10 s).

        Only valid for the un-augmented path (augmentation needs waveforms);
        augmented train runs keep streaming from the host."""
        if self.augmentation_factor > 1 and self.mode == "train":
            return  # augmented variants need waveforms; no static cache
        chunks = []
        for start in range(0, len(self), chunk):
            idx = np.arange(start, min(start + chunk, len(self)))
            spec = self._spectrogram_from_waveforms(idx)  # [n, F, M, 3] in [0,1]
            chunks.append(jnp.round(spec[..., 0] * 255.0).astype(jnp.uint8))
            if progress:
                print(f"  mel cache {start + len(idx)}/{len(self)}", end="\r")
        self._device_cache = jnp.concatenate(chunks, axis=0)
        if progress:
            print()

    def _spectrogram_from_waveforms(self, indices: np.ndarray, key: jax.Array | None = None) -> jnp.ndarray:
        waves, lengths = self.waveform_batch(indices)
        # int16 on the wire: PCM's native width, half the H2D bytes; the
        # per-clip peak normalization in the mel pipeline cancels the scale
        waves_i16 = np.clip(waves * 32768.0, -32768, 32767).astype(np.int16)
        waves_j = jnp.asarray(waves_i16).astype(jnp.float32)
        lengths_j = jnp.asarray(lengths)

        augment = (
            key is not None
            and self.mode == "train"
            and self.augmentation_factor > 1
        )
        if augment:
            from mer_tpu.ops.augment import random_augment

            # variant 0 of augmentation_factor is the clean signal
            # (audio_mel/dataset.py:125-128)
            k_var, k_aug = jax.random.split(key)
            variants = jax.random.randint(k_var, (len(indices),), 0, self.augmentation_factor)
            keys = jax.random.split(k_aug, len(indices))
            aug_w, aug_l = jax.vmap(random_augment)(keys, waves_j, lengths_j)
            use = (variants > 0)[:, None]
            waves_j = jnp.where(use, aug_w, waves_j)
            lengths_j = jnp.where(use[:, 0], aug_l, lengths_j)

        return log_mel_spectrogram(
            waves_j, lengths_j, self.mel_cfg, quantize_png=True, channels_first=False
        )

    def spectrogram_batch(self, indices: np.ndarray, key: jax.Array | None = None) -> jnp.ndarray:
        """[n, max_frames, n_mels, 3] log-mel images (NHWC for the Flax
        encoder). Served from the HBM uint8 cache when built (pure device
        gather); otherwise computed from waveforms on the fly. Augments
        (waveform path only) when a PRNG key is given on the train split."""
        wants_augment = key is not None and self.mode == "train" and self.augmentation_factor > 1
        if self._device_cache is not None and not wants_augment:
            # one jitted gather+decode call: eager indexing would cost several
            # dispatch round-trips per batch on remote-dispatch TPU setups.
            # Device index arrays pass straight through (the hard-mining loop
            # keeps its row indices in HBM — no per-step D2H sync).
            if isinstance(indices, jax.Array):
                idx = indices.astype(jnp.int32)
            else:
                idx = jnp.asarray(np.asarray(indices, dtype=np.int32))
            return _cache_gather(self._device_cache, idx)
        return self._spectrogram_from_waveforms(indices, key=key)
