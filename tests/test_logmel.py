"""Golden tests for the on-device log-mel frontend against independent
implementations: scipy/np.fft for the STFT, HF transformers' mel_filter_bank
for the slaney-scale filterbank (librosa-equivalent construction)."""

import numpy as np
import pytest

import jax.numpy as jnp

from mer_tpu.ops.logmel import (
    EPS_F64,
    MelConfig,
    dft_matrices,
    frame_signal,
    hann_window,
    log_mel_spectrogram,
    mel_filterbank,
    prepare_waveform_batch,
    reflect_pad_indices,
)

SR = 16000


def _tone(seconds=1.0, f=440.0, sr=SR, seed=0):
    t = np.arange(int(seconds * sr)) / sr
    rng = np.random.default_rng(seed)
    return (0.7 * np.sin(2 * np.pi * f * t) + 0.1 * rng.normal(size=t.shape)).astype(np.float32)


def _numpy_golden_logmel(y: np.ndarray, cfg: MelConfig):
    """Independent host pipeline: np.pad reflect + np.fft.rfft + HF filterbank."""
    from transformers.audio_utils import mel_filter_bank

    y = y.astype(np.float64)
    y = y / np.abs(y).max()
    pad = cfg.n_fft // 2
    yp = np.pad(y, pad, mode="reflect")
    n_frames = 1 + len(y) // cfg.hop_length
    window = hann_window(cfg.win_length)
    frames = np.stack([yp[i * cfg.hop_length : i * cfg.hop_length + cfg.n_fft] for i in range(n_frames)])
    spec = np.abs(np.fft.rfft(frames * window, axis=1))  # power=1
    fb = mel_filter_bank(
        num_frequency_bins=cfg.n_freqs, num_mel_filters=cfg.n_mels,
        min_frequency=cfg.fmin, max_frequency=cfg.sample_rate / 2,
        sampling_rate=cfg.sample_rate, norm=None, mel_scale="slaney",
    )  # [n_freqs, n_mels], un-normalized triangles
    fb = fb / np.maximum(np.abs(fb).sum(axis=0, keepdims=True), 1e-30)  # librosa norm=1
    mel = spec @ fb
    out = np.log(mel + EPS_F64)
    out = (out - out.min()) / (out.max() - out.min())
    out = np.floor(out * 255.0) / 255.0
    return out  # [n_frames, n_mels]


class TestComponents:
    def test_hann_periodic(self):
        import scipy.signal

        np.testing.assert_allclose(hann_window(400), scipy.signal.get_window("hann", 400, fftbins=True), atol=1e-12)

    def test_mel_filterbank_matches_hf_slaney_triangles(self):
        from transformers.audio_utils import mel_filter_bank

        ours = mel_filterbank(SR, 400, 128, norm=None)  # [128, 201]
        theirs = mel_filter_bank(
            num_frequency_bins=201, num_mel_filters=128, min_frequency=0.0,
            max_frequency=8000.0, sampling_rate=SR, norm=None, mel_scale="slaney",
        ).T
        np.testing.assert_allclose(ours, theirs, atol=1e-6)

    def test_mel_filterbank_l1_norm(self):
        fb = mel_filterbank(SR, 400, 128, norm=1)
        sums = fb.sum(axis=1)
        np.testing.assert_allclose(sums[sums > 0], 1.0, atol=1e-6)

    def test_dft_matrices_match_rfft(self):
        rng = np.random.default_rng(0)
        x = rng.normal(size=(5, 400)).astype(np.float32)
        w = hann_window(400)
        cos_m, sin_m = dft_matrices(400, w)
        re = x @ cos_m
        im = x @ sin_m
        ref = np.fft.rfft(x * w, axis=1)
        np.testing.assert_allclose(re, ref.real, atol=2e-3)
        np.testing.assert_allclose(im, ref.imag, atol=2e-3)

    def test_reflect_pad_indices_match_numpy(self):
        y = np.arange(20, dtype=np.float32)
        for L in [20, 13, 7]:
            pos = np.asarray(reflect_pad_indices(20, 5, jnp.asarray(L)))
            got = y[pos][: L + 10]
            ref = np.pad(y[:L], 5, mode="reflect")
            np.testing.assert_array_equal(got, ref)

    def test_frame_signal(self):
        y = np.arange(100, dtype=np.float32)
        frames = np.asarray(frame_signal(jnp.asarray(y), n_frames=5, n_fft=16, hop=10))
        for i in range(5):
            np.testing.assert_array_equal(frames[i], y[i * 10 : i * 10 + 16])


class TestFullPipeline:
    @pytest.mark.parametrize("seconds", [1.0, 3.7])
    def test_matches_numpy_golden_within_quantization(self, seconds):
        cfg = MelConfig()
        y = _tone(seconds=seconds)
        golden = _numpy_golden_logmel(y, cfg)

        batch, lengths = prepare_waveform_batch([y], cfg)
        out = np.asarray(log_mel_spectrogram(jnp.asarray(batch), jnp.asarray(lengths), cfg))
        assert out.shape == (1, 3, cfg.max_frames, cfg.n_mels)
        got = out[0, 0, : golden.shape[0], :]
        # agreement within one uint8 quantization step (SURVEY.md §7.3#1)
        assert np.abs(got - golden).max() <= (1.0 / 255.0) + 1e-6
        # padding region is zero
        np.testing.assert_array_equal(out[0, 0, golden.shape[0] :, :], 0.0)
        # channels identical
        np.testing.assert_array_equal(out[0, 0], out[0, 1])

    def test_truncation_to_ten_seconds(self):
        cfg = MelConfig()
        y = _tone(seconds=12.0)
        batch, lengths = prepare_waveform_batch([y], cfg)
        assert lengths[0] == cfg.max_samples
        out = np.asarray(log_mel_spectrogram(jnp.asarray(batch), jnp.asarray(lengths), cfg))
        assert out.shape == (1, 3, 1001, 128)
        # all 1001 frames valid for a full-length clip
        assert np.abs(out[0, 0, -1]).sum() > 0

    def test_batch_of_mixed_lengths(self):
        cfg = MelConfig()
        waves = [_tone(1.0, 440.0, seed=1), _tone(2.5, 220.0, seed=2), _tone(0.2, 880.0, seed=3)]
        batch, lengths = prepare_waveform_batch(waves, cfg)
        out = np.asarray(log_mel_spectrogram(jnp.asarray(batch), jnp.asarray(lengths), cfg))
        for i, w in enumerate(waves):
            golden = _numpy_golden_logmel(w, cfg)
            got = out[i, 0, : golden.shape[0], :]
            assert np.abs(got - golden).max() <= (1.0 / 255.0) + 1e-6

    def test_values_in_unit_range(self):
        cfg = MelConfig()
        batch, lengths = prepare_waveform_batch([_tone(0.5)], cfg)
        out = np.asarray(log_mel_spectrogram(jnp.asarray(batch), jnp.asarray(lengths), cfg))
        assert out.min() >= 0.0 and out.max() <= 1.0


class TestReflectPadBatch:
    """reflect_pad_batch (the gather-free production pad) must equal the
    reflect_pad_indices golden gather at every sample a valid frame reads,
    across pathological lengths (1, < pad, = max) and batch mixes."""

    def _check(self, max_samples, pad, hop, lengths):
        from mer_tpu.ops.logmel import reflect_pad_batch

        rng = np.random.default_rng(0)
        b = len(lengths)
        y = np.zeros((b, max_samples), np.float32)
        for i, L in enumerate(lengths):
            y[i, :L] = rng.normal(size=L)
        got = np.asarray(
            reflect_pad_batch(jnp.asarray(y), jnp.asarray(np.asarray(lengths, np.int32)),
                              max_samples, pad)
        )
        assert got.shape == (b, max_samples + 2 * pad)
        n_fft = 2 * pad
        for i, L in enumerate(lengths):
            pos = np.asarray(reflect_pad_indices(max_samples, pad, jnp.asarray(int(L))))
            ref = y[i][pos]
            n_frames = 1 + L // hop
            max_read = min((n_frames - 1) * hop + n_fft, max_samples + 2 * pad)
            np.testing.assert_array_equal(got[i, :max_read], ref[:max_read], err_msg=f"L={L}")

    def test_mel_config_shapes(self):
        cfg = MelConfig()
        self._check(cfg.max_samples, cfg.n_fft // 2, cfg.hop_length,
                    [1, 5, 150, 199, 200, 201, 16000, cfg.max_samples - 1, cfg.max_samples])

    def test_small_buffer(self):
        self._check(64, 8, 4, [1, 3, 7, 8, 9, 20, 63, 64])


class TestFrameSignalFallback:
    def test_gather_fallback_when_buffer_too_short(self):
        # n_frames * hop exceeds what the chunked reshape can cover -> the
        # slice path must fall back to the gather and still index correctly
        y = np.arange(40, dtype=np.float32)
        frames = np.asarray(frame_signal(jnp.asarray(y), n_frames=4, n_fft=16, hop=10))
        for i in range(3):  # frames fully inside the buffer
            np.testing.assert_array_equal(frames[i], y[i * 10 : i * 10 + 16])

    def test_batched_2d(self):
        rng = np.random.default_rng(1)
        y = rng.normal(size=(3, 100)).astype(np.float32)
        frames = np.asarray(frame_signal(jnp.asarray(y), n_frames=5, n_fft=16, hop=10))
        assert frames.shape == (3, 5, 16)
        for bi in range(3):
            for i in range(5):
                np.testing.assert_array_equal(frames[bi, i], y[bi, i * 10 : i * 10 + 16])
