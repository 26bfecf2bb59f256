"""int8 serving engine vs the f32 Flax M2FNet.

Weight-only per-channel int8 + dynamic per-row activation quantization is a
numerics change, so these tests pin its error envelope: primitive-level
relative error, full-model logit agreement, and prediction agreement on a
trained-ish (learnable synthetic) model — the serving contract the reference
exercises through src/test.py.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mer_tpu.serving import (
    M2FNetInt8,
    int8_dense,
    quantize_m2fnet,
    quantize_weight,
    quantized_bytes,
)


class TestPrimitives:
    def test_quantize_weight_roundtrip(self):
        rng = np.random.default_rng(0)
        w = jnp.asarray(rng.normal(size=(64, 32)).astype(np.float32))
        q = quantize_weight(w)
        assert q["q"].dtype == jnp.int8 and q["q"].shape == (64, 32)
        assert q["scale"].shape == (1, 32)
        deq = q["q"].astype(jnp.float32) * q["scale"]
        # per-channel symmetric int8: max error is scale/2 per entry
        np.testing.assert_allclose(np.asarray(deq), np.asarray(w), atol=float(q["scale"].max()) / 2 + 1e-7)

    def test_int8_dense_relative_error(self):
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.normal(size=(128, 768)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(768, 768)).astype(np.float32) * 0.02)
        b = jnp.asarray(rng.normal(size=(768,)).astype(np.float32) * 0.01)
        want = x @ w + b
        got = int8_dense(x, quantize_weight(w), b)
        # normalize by the output scale (pointwise relative error explodes
        # near zero-crossings of a zero-mean GEMM)
        err = np.abs(np.asarray(got - want)) / float(np.asarray(want).std())
        assert float(np.median(err)) < 0.02
        assert float(err.max()) < 0.15

    def test_stacked_weight_layout(self):
        """Scan-stacked kernels [L, in, out] quantize with [L, 1, out] scales
        so lax.scan slices stay consistent."""
        rng = np.random.default_rng(2)
        w = jnp.asarray(rng.normal(size=(4, 16, 8)).astype(np.float32))
        q = quantize_weight(w)
        assert q["q"].shape == (4, 16, 8) and q["scale"].shape == (4, 1, 8)


def _small_m2fnet(scan_layers=False):
    from mer_tpu.models import M2FNet

    return M2FNet(
        d_model_audio=32, d_model_text=32, d_model_fam=32,
        n_head_audio=4, n_head_text=4, n_head_fam=4,
        n_layers_audio=2, n_layers_text=2, n_layers_fam=2,
        hidden_size_classifier=32, dropout=0.0, scan_layers=scan_layers,
    )


def _dialogue_batch(b=4, u=9, d=32, seed=0):
    rng = np.random.default_rng(seed)
    text = jnp.asarray(rng.normal(size=(b, u, d)).astype(np.float32))
    audio = jnp.asarray(rng.normal(size=(b, u, d)).astype(np.float32))
    mask = np.zeros((b, u), bool)
    mask[:, 7:] = True  # pad tail
    return text, audio, jnp.asarray(mask)


class TestM2FNetInt8:
    @pytest.mark.parametrize("scan_layers", [False, True])
    def test_logits_close_to_f32(self, scan_layers):
        model = _small_m2fnet(scan_layers)
        text, audio, mask = _dialogue_batch()
        params = model.init(jax.random.PRNGKey(0), text, audio, mask)["params"]
        want = model.apply({"params": params}, text, audio, mask, deterministic=True)
        server = M2FNetInt8(model)
        got = jax.jit(server.apply)(quantize_m2fnet(params), text, audio, mask)
        want_np, got_np = np.asarray(want), np.asarray(got)
        # real (unpadded) rows only
        want_np, got_np = want_np[:, :7], got_np[:, :7]
        denom = np.abs(want_np).max()
        assert np.abs(got_np - want_np).max() / denom < 0.15
        cos = np.sum(want_np * got_np) / (np.linalg.norm(want_np) * np.linalg.norm(got_np))
        assert cos > 0.995

    def test_prediction_agreement(self):
        model = _small_m2fnet()
        text, audio, mask = _dialogue_batch(b=8, u=12, seed=3)
        mask = jnp.zeros_like(mask)  # all real
        params = model.init(jax.random.PRNGKey(1), text, audio, mask)["params"]
        want = np.argmax(np.asarray(model.apply({"params": params}, text, audio, mask)), -1)
        server = M2FNetInt8(model)
        got = np.argmax(np.asarray(server.apply(quantize_m2fnet(params), text, audio, mask)), -1)
        assert (want == got).mean() > 0.9

    def test_bytes_shrink_4x(self):
        model = _small_m2fnet()
        text, audio, mask = _dialogue_batch()
        params = model.init(jax.random.PRNGKey(0), text, audio, mask)["params"]
        f32_bytes = sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(params))
        q_bytes = quantized_bytes(quantize_m2fnet(params))
        assert q_bytes < 0.35 * f32_bytes  # int8 kernels + f32 scales/bias/LN

    def test_rejects_partial_modality(self):
        from mer_tpu.models import M2FNet

        model = M2FNet(audio_enabled=True, text_enabled=True, fam_enabled=False)
        with pytest.raises(ValueError):
            M2FNetInt8(model)
