"""Pallas log-mel kernel vs the golden XLA path (interpreter mode on CPU)."""

import numpy as np

import jax.numpy as jnp

from mer_tpu.ops.logmel import EPS_F64, MelConfig, dft_matrices, hann_window, mel_filterbank
from mer_tpu.ops.logmel_pallas import logmel_frames_pallas


def _golden_frames_logmel(frames: np.ndarray, cfg: MelConfig) -> np.ndarray:
    window = hann_window(cfg.win_length)
    cos_m, sin_m = dft_matrices(cfg.n_fft, window)
    re = frames @ cos_m
    im = frames @ sin_m
    mag = np.sqrt(re * re + im * im)
    mel_w = mel_filterbank(cfg.sample_rate, cfg.n_fft, cfg.n_mels, cfg.fmin, cfg.fmax, norm=1)
    return np.log(mag @ mel_w.T + EPS_F64)


class TestLogmelPallas:
    def test_matches_golden(self):
        cfg = MelConfig()
        rng = np.random.default_rng(0)
        frames = rng.normal(size=(2, 300, cfg.n_fft)).astype(np.float32) * 0.1
        golden = _golden_frames_logmel(frames, cfg)
        out = np.asarray(logmel_frames_pallas(jnp.asarray(frames), cfg, interpret=True))
        assert out.shape == (2, 300, cfg.n_mels)
        np.testing.assert_allclose(out, golden, rtol=1e-4, atol=1e-4)

    def test_full_1001_frames(self):
        cfg = MelConfig()
        rng = np.random.default_rng(1)
        frames = rng.normal(size=(1, cfg.max_frames, cfg.n_fft)).astype(np.float32)
        golden = _golden_frames_logmel(frames, cfg)
        out = np.asarray(logmel_frames_pallas(jnp.asarray(frames), cfg, interpret=True))
        np.testing.assert_allclose(out, golden, rtol=1e-4, atol=1e-4)

    def test_grad_through_kernel_path_falls_back(self):
        """use_pallas=True must be differentiable: the custom_vjp routes the
        backward pass through the jnp restatement (ADVICE r3: previously an
        opaque Pallas trace error)."""
        import jax

        from mer_tpu.ops.logmel import _logmel_frames_jnp, _logmel_frames_kernel

        cfg = MelConfig()
        rng = np.random.default_rng(2)
        frames = jnp.asarray(rng.normal(size=(1, 32, cfg.n_fft)).astype(np.float32) * 0.1)

        g_kernel = jax.grad(lambda f: _logmel_frames_kernel(f, cfg).sum())(frames)
        g_jnp = jax.grad(lambda f: _logmel_frames_jnp(f, cfg).sum())(frames)
        np.testing.assert_allclose(np.asarray(g_kernel), np.asarray(g_jnp), rtol=1e-5, atol=1e-5)
