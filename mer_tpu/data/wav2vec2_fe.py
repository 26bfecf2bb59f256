"""wav2vec2 feature-extractor data pipeline (stage 1b).

Reference behavior (audio_wav2vec2/dataset.py): per-utterance waveforms
loaded from ``dia{D}_utt{U}.wav``, resampled to 16 kHz if needed, truncated
to 10 s; collate zero-pads to the batch max and carries a ``lengths`` tensor.

TPU redesign: audio lengths pad to a fixed bucket ladder (2/4/6/8/10 s) so
wav2vec2's conv frontend compiles a handful of shapes instead of one per
batch; the lengths tensor drives in-model frame masking exactly like the
reference's model call (audio_wav2vec2/model.py:19-22).
"""

from __future__ import annotations

import numpy as np

from mer_tpu.core import get_text, map_emotions
from mer_tpu.data.audio_io import WaveformStore
from mer_tpu.data.mel_fe import wav_dir_for

SECONDS_BUCKETS = (2.0, 4.0, 6.0, 8.0, 10.0)


class Wav2Vec2FeatureDataset:
    def __init__(self, mode: str, data_root: str | None = None, sample_rate: int = 16000,
                 max_seconds: float = 10.0, waveform_store=None):
        self.mode = mode
        self.sample_rate = sample_rate
        self.max_seconds = max_seconds
        df = map_emotions(get_text(mode, data_root=data_root))
        self.df = df
        self.labels = df["Emotion"].to_numpy(dtype=np.int64)
        self.dia_utt = df[["Dialogue_ID", "Utterance_ID"]].to_numpy(dtype=np.int64)
        self.store = waveform_store or WaveformStore(
            wav_dir_for(mode, data_root or "data"), sample_rate=sample_rate, max_seconds=max_seconds
        )

    def __len__(self) -> int:
        return len(self.df)

    def get_labels(self) -> np.ndarray:
        return self.labels

    def waveform(self, idx: int) -> np.ndarray:
        dia, utt = self.dia_utt[int(idx)]
        return self.store.get(dia, utt)

    def waveform_batch(self, indices, width: int) -> tuple[np.ndarray, np.ndarray]:
        """Decode a batch into a fixed [n, width] float32 buffer + true
        (truncated) lengths.

        Uses the native thread-pooled batch decoder (native/wavio.cc) when
        built — the e2e stage-1 host-prep hot path; per-file stdlib reader
        otherwise, and per-file fallback for clips the native path rejects
        (resample-needed, odd formats: negative length codes)."""
        from mer_tpu.data import native_wavio

        indices = np.asarray(indices)
        if native_wavio.available():
            paths = [self.store.path_for(*self.dia_utt[int(i)]) for i in indices]
            out, lengths = native_wavio.decode_wav_batch(
                paths, width, expect_rate=self.sample_rate
            )
            for i in np.flatnonzero(lengths < 0):
                dia, utt = self.dia_utt[int(indices[i])]
                w = self.store.get(dia, utt)[:width]
                out[i, : len(w)] = w
                out[i, len(w):] = 0.0
                lengths[i] = len(w)
            return out, lengths.astype(np.int32)

        out = np.zeros((len(indices), width), np.float32)
        lengths = np.zeros((len(indices),), np.int32)
        for k, idx in enumerate(indices):
            w = self.waveform(int(idx))[:width]
            out[k, : len(w)] = w
            lengths[k] = len(w)
        return out, lengths

    def waveform_lengths(self) -> np.ndarray:
        """Clip lengths in samples (post-truncation), from WAV headers only —
        no sample data is read. Cached after the first call."""
        if getattr(self, "_lengths", None) is None:
            import wave

            out = np.zeros((len(self),), dtype=np.int64)
            for i, (dia, utt) in enumerate(self.dia_utt):
                try:
                    with wave.open(self.store.path_for(dia, utt), "rb") as f:
                        n = f.getnframes()
                        sr = f.getframerate()
                    if sr != self.sample_rate:
                        n = int(n * self.sample_rate / sr)
                    out[i] = min(n, int(self.max_seconds * self.sample_rate))
                except (OSError, wave.Error):
                    out[i] = 0
            self._lengths = out
        return self._lengths


def w2v_batch_to_inputs(batch: dict):
    """Model inputs from a batch; int16 audio (the wire format — half the
    host->device bytes) converts to float on device inside the jitted step."""
    audio = batch["audio"]
    if hasattr(audio, "dtype") and str(audio.dtype) == "int16":
        audio = audio.astype("float32") / 32768.0
    return audio, batch["lengths"]


class Wav2Vec2Batcher:
    def __init__(self, dataset: Wav2Vec2FeatureDataset, batch_size: int, shuffle: bool = False,
                 seed: int = 0, seconds_buckets: tuple[float, ...] = SECONDS_BUCKETS,
                 sort_by_length: bool = True, wire_dtype: str = "int16",
                 process_index: int | None = None, process_count: int | None = None):
        from mer_tpu.data.process_sharding import resolve_process

        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.sort_by_length = sort_by_length
        self.buckets = tuple(int(s * dataset.sample_rate) for s in seconds_buckets)
        self.wire_dtype = wire_dtype
        self.process_index, self.process_count = resolve_process(process_index, process_count)
        self._rng = np.random.default_rng(seed)

    def __len__(self) -> int:
        from mer_tpu.data.process_sharding import local_num_batches

        n_global = (len(self.dataset) + self.batch_size - 1) // self.batch_size
        return local_num_batches(n_global, self.process_index, self.process_count)

    def _bucket(self, longest: int) -> int:
        for b in self.buckets:
            if longest <= b:
                return b
        return self.buckets[-1]

    def __iter__(self):
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            self._rng.shuffle(order)
        if self.sort_by_length and self.shuffle:
            # group similar lengths into batches (less padding, fewer bucket
            # switches) while shuffling batch order for stochasticity;
            # eval (shuffle=False) keeps dataset order for metric parity
            lengths = self.dataset.waveform_lengths()[order]
            order = order[np.argsort(lengths, kind="stable")]
        batches = [order[i : i + self.batch_size] for i in range(0, n, self.batch_size)]
        if self.shuffle:
            self._rng.shuffle(batches)
        from mer_tpu.data.process_sharding import shard_batches

        batches = shard_batches(batches, self.process_index, self.process_count)
        for idx in batches:
            pad = self.batch_size - len(idx)
            full_idx = np.concatenate([idx, idx[-1:].repeat(pad)]) if pad else idx
            waves = [self.dataset.waveform(j) for j in full_idx]
            longest = max(len(w) for w in waves)
            width = self._bucket(longest)
            use_i16 = self.wire_dtype == "int16"
            audio = np.zeros((self.batch_size, width), dtype=np.int16 if use_i16 else np.float32)
            lengths = np.zeros((self.batch_size,), dtype=np.int32)
            for i, w in enumerate(waves):
                w = w[:width]
                if use_i16:
                    audio[i, : len(w)] = np.clip(w * 32768.0, -32768, 32767).astype(np.int16)
                else:
                    audio[i, : len(w)] = w
                lengths[i] = len(w)
            emotion = self.dataset.labels[full_idx].astype(np.int32).copy()
            if pad:
                emotion[len(idx):] = -1
            yield {"idx": full_idx, "audio": audio, "lengths": lengths, "emotion": emotion}
