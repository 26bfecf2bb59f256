"""Tests for resampling and augmentation ops."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mer_tpu.ops.augment import add_gaussian_snr, pitch_shift, random_augment, shift, time_stretch
from mer_tpu.ops.resample import resample

SR = 16000


def _tone(f=440.0, seconds=1.0, sr=SR):
    t = np.arange(int(seconds * sr)) / sr
    return np.sin(2 * np.pi * f * t).astype(np.float32)


def _dominant_freq(x: np.ndarray, sr: int) -> float:
    spec = np.abs(np.fft.rfft(x * np.hanning(len(x))))
    return np.fft.rfftfreq(len(x), 1 / sr)[int(np.argmax(spec))]


class TestResample:
    def test_identity(self):
        x = _tone()
        np.testing.assert_array_equal(resample(x, SR, SR), x)

    @pytest.mark.parametrize("orig,new", [(44100, 16000), (8000, 16000), (22050, 16000)])
    def test_preserves_tone_frequency(self, orig, new):
        x = _tone(f=440.0, sr=orig)
        y = resample(x, orig, new)
        expected_len = int(np.ceil(new * len(x) / orig))
        assert abs(len(y) - expected_len) <= 1
        got = _dominant_freq(y[200:-200], new)
        assert abs(got - 440.0) < 5.0

    def test_matches_scipy_polyphase_in_passband(self):
        import scipy.signal

        # bandlimited mixture well inside the target passband (filters only
        # differ in their transition band near Nyquist)
        t = np.arange(8000) / 44100
        x = sum(np.sin(2 * np.pi * f * t + i) for i, f in enumerate([300, 1200, 3000])).astype(np.float32)
        y = resample(x, 44100, 16000)
        ref = scipy.signal.resample_poly(x, 160, 441)
        n = min(len(y), len(ref)) - 100
        err = np.sqrt(np.mean((y[50:n] - ref[50:n]) ** 2)) / np.sqrt(np.mean(ref[50:n] ** 2))
        assert err < 0.02


class TestAugment:
    def setup_method(self):
        self.wave = jnp.asarray(np.pad(_tone(seconds=0.5), (0, 8000)))
        self.length = jnp.asarray(8000)

    def test_gaussian_snr_changes_signal_keeps_padding(self):
        out = add_gaussian_snr(jax.random.PRNGKey(0), self.wave, self.length)
        out = np.asarray(out)
        assert not np.allclose(out[:8000], np.asarray(self.wave)[:8000])
        np.testing.assert_array_equal(out[8000:], 0.0)

    def test_snr_level(self):
        x = jnp.asarray(_tone(seconds=1.0))
        out = np.asarray(add_gaussian_snr(jax.random.PRNGKey(1), x, jnp.asarray(len(x)), 20.0, 20.0))
        noise = out - np.asarray(x)
        snr = 10 * np.log10(np.mean(np.asarray(x) ** 2) / np.mean(noise**2))
        assert abs(snr - 20.0) < 1.0

    def test_shift_preserves_energy(self):
        out = np.asarray(shift(jax.random.PRNGKey(2), self.wave, self.length))
        np.testing.assert_allclose(np.sum(out**2), float(np.sum(np.asarray(self.wave) ** 2)), rtol=1e-3)
        np.testing.assert_array_equal(out[8000:], 0.0)

    def test_time_stretch_rate_one_roundtrips(self):
        out, new_len = time_stretch(self.wave, self.length, jnp.asarray(1.0))
        assert int(new_len) == 8000
        x, y = np.asarray(self.wave)[500:7500], np.asarray(out)[500:7500]
        corr = np.corrcoef(x, y)[0, 1]
        assert corr > 0.98

    def test_time_stretch_changes_length_not_pitch(self):
        out, new_len = time_stretch(self.wave, self.length, jnp.asarray(1.25))
        assert abs(int(new_len) - 6400) <= 1
        seg = np.asarray(out)[500 : int(new_len) - 500]
        assert abs(_dominant_freq(seg, SR) - 440.0) < 10.0

    def test_pitch_shift_moves_frequency(self):
        out = pitch_shift(self.wave, self.length, jnp.asarray(4.0))
        seg = np.asarray(out)[500:7500]
        expected = 440.0 * 2 ** (4 / 12)
        assert abs(_dominant_freq(seg, SR) - expected) < 15.0

    def test_random_augment_shapes_and_determinism(self):
        out1, len1 = random_augment(jax.random.PRNGKey(3), self.wave, self.length)
        out2, len2 = random_augment(jax.random.PRNGKey(3), self.wave, self.length)
        np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
        assert out1.shape == self.wave.shape
        out3, _ = random_augment(jax.random.PRNGKey(4), self.wave, self.length)
        assert not np.allclose(np.asarray(out1), np.asarray(out3))


class TestPhaseVocoderIndependentRestatement:
    """audiomentations/librosa are not installed in this environment, so the
    phase-vocoder stretch cannot be anchored against them directly.  This is
    the next-strongest anchor: an independent float64 numpy implementation of
    the published librosa phase-vocoder algorithm (magnitude interpolation +
    phase accumulation over an STFT at n_fft=2048/hop=512), written separately
    from ops/augment.py, compared waveform-level.  PARITY.md §Deliberate
    records the residual gap (no library-level comparison possible offline)."""

    N_FFT, HOP = 2048, 512

    def _np_stft(self, wave):
        from mer_tpu.ops.logmel import hann_window

        pad = self.N_FFT // 2
        padded = np.pad(wave.astype(np.float64), (pad, pad), mode="reflect")
        n_frames = 1 + len(wave) // self.HOP
        win = hann_window(self.N_FFT)
        frames = np.stack([
            padded[i * self.HOP: i * self.HOP + self.N_FFT] * win for i in range(n_frames)
        ])
        return np.fft.rfft(frames, axis=-1)

    def _np_istft(self, spec, out_len):
        from mer_tpu.ops.logmel import hann_window

        win = hann_window(self.N_FFT)
        frames = np.fft.irfft(spec, n=self.N_FFT, axis=-1) * win
        n_frames = spec.shape[0]
        total = self.N_FFT + self.HOP * (n_frames - 1)
        sig = np.zeros(total)
        win2 = np.zeros(total)
        for i in range(n_frames):
            sig[i * self.HOP: i * self.HOP + self.N_FFT] += frames[i]
            win2[i * self.HOP: i * self.HOP + self.N_FFT] += win * win
        sig = sig / np.maximum(win2, 1e-8)
        pad = self.N_FFT // 2
        return sig[pad: pad + out_len]

    def _np_stretch(self, wave, rate):
        spec = self._np_stft(wave)
        n_frames, k = spec.shape
        phi_advance = np.linspace(0.0, np.pi * self.HOP, k)
        steps = np.arange(n_frames) * rate
        out = np.zeros((n_frames, k), complex)
        phase = np.angle(spec[0])
        for t, step in enumerate(steps):
            i0 = min(int(np.floor(step)), n_frames - 1)
            i1 = min(i0 + 1, n_frames - 1)
            a = step - i0
            mag = (1 - a) * np.abs(spec[i0]) + a * np.abs(spec[i1])
            out[t] = mag * np.exp(1j * phase)
            dphase = np.angle(spec[i1]) - np.angle(spec[i0]) - phi_advance
            dphase -= 2 * np.pi * np.round(dphase / (2 * np.pi))
            phase = phase + phi_advance + dphase
        return self._np_istft(out, len(wave))

    @pytest.mark.parametrize("rate", [0.8, 1.0, 1.25])
    def test_jax_stretch_matches_numpy_restatement(self, rate):
        from mer_tpu.ops.augment import time_stretch

        rng = np.random.default_rng(0)
        t = np.arange(16000) / 16000.0
        wave = (0.5 * np.sin(2 * np.pi * 440 * t) + 0.2 * np.sin(2 * np.pi * 997 * t)
                + 0.02 * rng.normal(size=16000)).astype(np.float32)

        want = self._np_stretch(wave, rate)
        got, new_len = time_stretch(jnp.asarray(wave), jnp.int32(16000), jnp.float32(rate))
        got = np.asarray(got)

        n = min(int(new_len), len(want))
        # compare over the valid region, away from edge frames
        a, b = want[256: n - 256], got[256: n - 256]
        err = np.abs(a - b).max() / max(np.abs(a).max(), 1e-9)
        assert err < 5e-3, f"rate={rate}: waveform-level mismatch {err:.2e}"
