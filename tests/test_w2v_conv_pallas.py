"""Fused wav2vec2 conv-stack kernel vs the module's XLA path.

The kernel (ops/w2v_conv_pallas.py) must compute exactly the
ConvFeatureExtractor function (reference audio_wav2vec2/model.py:9 conv
frontend): layer-0 conv + GroupNorm + GELU in XLA, layers 1..6 fused.
Interpret mode on CPU exercises the full tiling/halo logic."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mer_tpu.models.wav2vec2 import ConvFeatureExtractor, Wav2Vec2Config
from mer_tpu.ops.w2v_conv_pallas import (
    conv_stack_fused, conv_stack_gnfused, conv_stack_l0fused,
)

cfg = Wav2Vec2Config.base()


def _ref_and_params(b, n_samples, dtype, seed=0):
    rng = np.random.default_rng(seed)
    wav = jnp.asarray(rng.normal(size=(b, n_samples)).astype(np.float32))
    model = ConvFeatureExtractor(cfg, dtype=dtype)
    params = model.init(jax.random.PRNGKey(0), wav[:1])["params"]
    ref = model.apply({"params": params}, wav)
    return wav, params, ref


@pytest.mark.parametrize("n_samples", [16000, 64000])
def test_matches_xla_conv_stack_f32(n_samples):
    wav, params, ref = _ref_and_params(2, n_samples, jnp.float32)
    out = conv_stack_fused(params, wav, cfg, dtype=jnp.float32, interpret=True)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_matches_xla_conv_stack_bf16():
    wav, params, ref = _ref_and_params(2, 48000, jnp.bfloat16)
    out = conv_stack_fused(params, wav, cfg, dtype=jnp.bfloat16, interpret=True)
    a = np.asarray(ref).astype(np.float64)
    b = np.asarray(out).astype(np.float64)
    rel = np.abs(a - b).max() / max(np.abs(a).max(), 1e-9)
    assert rel < 2e-2, rel  # bf16 accumulation-order tolerance


def test_partial_last_tile_and_small_tile():
    # t_out not a multiple of tile, and tile=16 geometry
    wav, params, ref = _ref_and_params(1, 40000, jnp.float32)
    out = conv_stack_fused(params, wav, cfg, dtype=jnp.float32, tile=16, interpret=True)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_rejects_non_base_geometry():
    bad = Wav2Vec2Config(conv_kernel=(10, 3, 3, 3, 3, 3, 2))
    with pytest.raises(ValueError):
        conv_stack_fused({}, jnp.zeros((1, 16000)), bad)


# -- layer-0 fused variant (two-pass GN with conv recompute) ------------------


@pytest.mark.parametrize("n_samples", [16000, 64000])
def test_l0fused_matches_xla_f32(n_samples):
    # f32 tolerance is looser than the pure-GEMM kernel's: the GN variance
    # comes from sumsq/T - mean^2 (one-pass form) vs jnp.var's two-pass
    wav, params, ref = _ref_and_params(2, n_samples, jnp.float32)
    out = conv_stack_l0fused(params, wav, cfg, dtype=jnp.float32, interpret=True)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_l0fused_matches_xla_bf16():
    wav, params, ref = _ref_and_params(2, 48000, jnp.bfloat16)
    out = conv_stack_l0fused(params, wav, cfg, dtype=jnp.bfloat16, interpret=True)
    a = np.asarray(ref).astype(np.float64)
    b = np.asarray(out).astype(np.float64)
    rel = np.abs(a - b).max() / max(np.abs(a).max(), 1e-9)
    assert rel < 2e-2, rel


def test_l0fused_partial_tile_and_odd_t0():
    # lengths that leave T0 odd and a ragged last tile exercise the
    # even/odd masking in the stats pass
    for n_samples in (16000, 40000, 40005):
        wav, params, ref = _ref_and_params(1, n_samples, jnp.float32)
        out = conv_stack_l0fused(params, wav, cfg, dtype=jnp.float32,
                                 tile=1024, interpret=True)
        assert out.shape == ref.shape
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4)


# -- GN-only fused variant (convs stay in XLA) --------------------------------


@pytest.mark.parametrize("n_samples", [16000, 40000, 40005, 64000])
def test_gnfused_matches_xla_f32(n_samples):
    wav, params, ref = _ref_and_params(2, n_samples, jnp.float32)
    out = conv_stack_gnfused(params, wav, cfg, dtype=jnp.float32, interpret=True)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_gnfused_matches_xla_bf16():
    wav, params, ref = _ref_and_params(2, 48000, jnp.bfloat16)
    out = conv_stack_gnfused(params, wav, cfg, dtype=jnp.bfloat16, interpret=True)
    a = np.asarray(ref).astype(np.float64)
    b = np.asarray(out).astype(np.float64)
    rel = np.abs(a - b).max() / max(np.abs(a).max(), 1e-9)
    assert rel < 2e-2, rel


def test_l0fused_rejects_non_base_layer0():
    bad = Wav2Vec2Config(conv_kernel=(8, 3, 3, 3, 3, 2, 2))
    with pytest.raises(ValueError):
        conv_stack_l0fused({}, jnp.zeros((1, 16000)), bad)
