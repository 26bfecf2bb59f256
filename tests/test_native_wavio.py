"""Native C++ batch WAV decoder vs the stdlib reader."""

import os

import numpy as np
import pytest

from mer_tpu.data import native_wavio
from mer_tpu.data.audio_io import load_wav, save_wav


@pytest.fixture(scope="module")
def wav_files(tmp_path_factory):
    d = tmp_path_factory.mktemp("wavs")
    rng = np.random.default_rng(0)
    paths, waves = [], []
    for i in range(6):
        n = int(rng.integers(1000, 20000))
        w = (0.5 * np.sin(2 * np.pi * 300 * np.arange(n) / 16000)
             + 0.1 * rng.normal(size=n)).astype(np.float32)
        p = str(d / f"clip{i}.wav")
        save_wav(p, w, 16000)
        paths.append(p)
        waves.append(w)
    return paths, waves


needs_native = pytest.mark.skipif(not native_wavio.available(), reason="native toolchain unavailable")


@needs_native
class TestNativeWavio:
    def test_matches_python_reader(self, wav_files):
        paths, _ = wav_files
        max_samples = 16000
        out, lengths = native_wavio.decode_wav_batch(paths, max_samples, expect_rate=16000)
        assert out.shape == (len(paths), max_samples)
        for i, p in enumerate(paths):
            ref, sr = load_wav(p)
            ref = ref[:max_samples]
            assert lengths[i] == len(ref)
            np.testing.assert_allclose(out[i, : len(ref)], ref, atol=1e-6)
            np.testing.assert_array_equal(out[i, len(ref):], 0.0)

    def test_truncation(self, wav_files):
        paths, waves = wav_files
        out, lengths = native_wavio.decode_wav_batch(paths, 2000)
        assert (lengths <= 2000).all()
        ref, _ = load_wav(paths[0])
        np.testing.assert_allclose(out[0, :2000], ref[:2000], atol=1e-6)

    def test_per_file_errors(self, wav_files, tmp_path):
        paths, _ = wav_files
        bad = str(tmp_path / "missing.wav")
        garbage = str(tmp_path / "garbage.wav")
        with open(garbage, "wb") as f:
            f.write(b"not a wav at all")
        out, lengths = native_wavio.decode_wav_batch([paths[0], bad, garbage], 4000)
        assert lengths[0] > 0
        assert lengths[1] == -1  # open error
        assert lengths[2] == -2  # format error

    def test_rate_mismatch_flagged(self, wav_files, tmp_path):
        w = np.zeros(100, np.float32)
        p = str(tmp_path / "wrong_rate.wav")
        save_wav(p, w, 8000)
        _, lengths = native_wavio.decode_wav_batch([p], 1000, expect_rate=16000)
        assert lengths[0] == -3

    def test_mel_dataset_uses_native(self, meld_like_root_with_wavs, tmp_path):
        from mer_tpu.core import Config
        from mer_tpu.data import MelFeatureDataset

        root, _ = meld_like_root_with_wavs
        cfg = Config(
            {
                "DEBUG": {"enabled": False},
                "AUDIO": {"ffmpeg_sr": 16000, "max_duration": 1.0, "augmentation_factor": 1},
            }
        )
        ds = MelFeatureDataset("val", cfg, data_root=root)
        batch, lengths = ds.waveform_batch(np.arange(5))
        assert batch.shape == (5, 16000)
        # cross-check vs the python reader
        for i in range(5):
            dia, utt = ds.dia_utt[i]
            ref = ds.store.get(dia, utt)
            np.testing.assert_allclose(batch[i, : len(ref)], ref, atol=1e-6)
