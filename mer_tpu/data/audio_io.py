"""Host-side WAV loading.

The reference decodes wavs with torchaudio/sox (audio_wav2vec2/dataset.py:39,
audio_mel/dataset.py:146) normalized to [-1, 1] float.  The prep pipeline
(scripts/mp4towav.py) produces mono 16 kHz PCM16 wavs, which the stdlib
``wave`` module reads without external dependencies.  Decoding is host-side
by design — everything after (resample, augment, log-mel) runs on device.
"""

from __future__ import annotations

import os
import wave
from functools import lru_cache

import numpy as np


def load_wav(path: str | os.PathLike) -> tuple[np.ndarray, int]:
    """Read a PCM WAV file -> (float32 waveform in [-1, 1] [channels, n] ->
    mono [n], sample_rate). Parity with torchaudio.load(normalize=True)."""
    with wave.open(os.fspath(path), "rb") as f:
        sr = f.getframerate()
        n_channels = f.getnchannels()
        sampwidth = f.getsampwidth()
        raw = f.readframes(f.getnframes())

    if sampwidth == 2:
        data = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    elif sampwidth == 4:
        data = np.frombuffer(raw, dtype="<i4").astype(np.float32) / 2147483648.0
    elif sampwidth == 1:
        data = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    else:
        raise ValueError(f"Unsupported sample width {sampwidth} in {path}")

    if n_channels > 1:
        data = data.reshape(-1, n_channels).mean(axis=1)
    return data, sr


def save_wav(path: str | os.PathLike, waveform: np.ndarray, sample_rate: int) -> None:
    """Write mono float32 [-1, 1] to PCM16 WAV."""
    data = np.clip(np.asarray(waveform, dtype=np.float32), -1.0, 1.0)
    pcm = (data * 32767.0).astype("<i2")
    with wave.open(os.fspath(path), "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(sample_rate)
        f.writeframes(pcm.tobytes())


class WaveformStore:
    """Loads MELD utterance wavs by (dialogue_id, utterance_id) with an LRU
    cache; enforces the reference's sample-rate check and 10 s truncation
    (audio_mel/dataset.py:146-153)."""

    def __init__(self, audio_dir: str, sample_rate: int = 16000, max_seconds: float = 10.0,
                 cache_size: int = 2048, resample_if_needed: bool = True):
        self.audio_dir = os.path.abspath(audio_dir)
        self.sample_rate = sample_rate
        self.max_samples = int(max_seconds * sample_rate)
        self.resample_if_needed = resample_if_needed
        self._load = lru_cache(maxsize=cache_size)(self._load_uncached)

    def path_for(self, dialogue_id: int, utterance_id: int) -> str:
        return os.path.join(self.audio_dir, f"dia{dialogue_id}_utt{utterance_id}.wav")

    def _load_uncached(self, dialogue_id: int, utterance_id: int) -> np.ndarray:
        wav, sr = load_wav(self.path_for(dialogue_id, utterance_id))
        if sr != self.sample_rate:
            if not self.resample_if_needed:
                raise ValueError(f"Sample rate mismatch: {sr} != {self.sample_rate}")
            from mer_tpu.ops.resample import resample

            wav = resample(wav, sr, self.sample_rate)
        return wav[: self.max_samples].astype(np.float32)

    def get(self, dialogue_id: int, utterance_id: int) -> np.ndarray:
        return self._load(int(dialogue_id), int(utterance_id))
