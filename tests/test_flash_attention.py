"""Fused attention kernel vs the reference jnp implementation."""

import numpy as np

import jax
import pytest

import jax.numpy as jnp

from mer_tpu.ops.attention import _attention_reference
from mer_tpu.ops.flash_attention import flash_attention


def _qkv(b=2, h=4, sq=130, sk=130, dh=24, seed=0):
    rng = np.random.default_rng(seed)
    mk = lambda s: jnp.asarray(rng.normal(size=(b, h, s, dh)).astype(np.float32))
    return mk(sq), mk(sk), mk(sk)


class TestFlashAttention:
    @pytest.mark.parametrize("use_mask", [False, True])
    def test_matches_reference(self, use_mask):
        q, k, v = _qkv()
        mask = None
        if use_mask:
            rng = np.random.default_rng(1)
            mask = rng.random((2, 130)) < 0.3
            mask[:, 0] = False
            mask = jnp.asarray(mask)

        ref = _attention_reference(
            q, k, v, key_padding_mask=mask, dropout_rate=0.0, dropout_rng=None, deterministic=True
        )
        got = flash_attention(q, k, v, key_padding_mask=mask, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-5)

    def test_cross_attention_lengths(self):
        q, _, _ = _qkv(sq=64, dh=32, seed=2)
        _, k, v = _qkv(sk=200, dh=32, seed=3)
        ref = _attention_reference(
            q, k, v, key_padding_mask=None, dropout_rate=0.0, dropout_rng=None, deterministic=True
        )
        got = flash_attention(q, k, v, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-5)

    def test_roberta_shape(self):
        """512 tokens, 12 heads, dh=64 — the text FE's actual attention shape."""
        q, k, v = _qkv(b=1, h=12, sq=512, sk=512, dh=64, seed=4)
        rng = np.random.default_rng(5)
        mask = jnp.asarray(rng.random((1, 512)) < 0.2)
        ref = _attention_reference(
            q, k, v, key_padding_mask=mask, dropout_rate=0.0, dropout_rng=None, deterministic=True
        )
        got = flash_attention(q, k, v, key_padding_mask=mask, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=5e-5)


class TestFlashAttentionGrad:
    def test_grad_matches_reference(self):
        """jax.grad through the kernel (custom VJP recomputes via reference)."""
        q, k, v = _qkv(b=1, h=2, sq=64, sk=64, dh=16, seed=7)
        rng = np.random.default_rng(8)
        mask = jnp.asarray(rng.random((1, 64)) < 0.2)

        def loss_flash(q, k, v):
            return (flash_attention(q, k, v, key_padding_mask=mask, interpret=True) ** 2).sum()

        def loss_ref(q, k, v):
            return (
                _attention_reference(
                    q, k, v, key_padding_mask=mask, dropout_rate=0.0,
                    dropout_rng=None, deterministic=True,
                ) ** 2
            ).sum()

        g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
        g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-4)


class TestStreamingKernel:
    """K/V-streaming online-softmax path (used above STREAM_THRESHOLD keys)."""

    def _bias(self, mask):
        return jnp.where(mask, -1e30, 0.0).astype(jnp.float32)

    @pytest.mark.parametrize("sk", [512, 1024, 1300])
    def test_matches_reference(self, sk):
        from mer_tpu.ops.flash_attention import _flash_impl

        q, _, _ = _qkv(b=1, h=2, sq=256, sk=256, dh=32, seed=10)
        _, k, v = _qkv(b=1, h=2, sq=sk, sk=sk, dh=32, seed=11)
        rng = np.random.default_rng(12)
        mask = rng.random((1, sk)) < 0.25
        mask[:, 0] = False
        mask_j = jnp.asarray(mask)

        ref = _attention_reference(
            q, k, v, key_padding_mask=mask_j, dropout_rate=0.0, dropout_rng=None, deterministic=True
        )
        got = _flash_impl(q, k, v, self._bias(mask_j), interpret=True, force_stream=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4)

    def test_stream_equals_single_pass(self):
        from mer_tpu.ops.flash_attention import _flash_impl

        q, k, v = _qkv(b=2, h=2, sq=128, sk=1024, dh=64, seed=13)
        bias = jnp.zeros((2, 1024), jnp.float32)
        single = _flash_impl(q, k, v, bias, interpret=True, force_stream=False)
        stream = _flash_impl(q, k, v, bias, interpret=True, force_stream=True)
        np.testing.assert_allclose(np.asarray(stream), np.asarray(single), rtol=2e-4, atol=2e-4)


class TestFusedBackward:
    """The fused Pallas backward kernel vs the jnp-reference VJP."""

    def _ref_grads(self, q, k, v, bias, g):
        import math

        def ref(q, k, v):
            dh = q.shape[-1]
            s = jnp.einsum("bhqd,bhkd->bhqk", q * (1.0 / math.sqrt(dh)), k)
            s = s + bias[:, None, None, :]
            p = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(q.dtype)
            return jnp.einsum("bhqk,bhkd->bhqd", p, v)

        _, vjp = jax.vjp(ref, q, k, v)
        return vjp(g)

    @pytest.mark.parametrize("use_mask", [False, True])
    def test_matches_reference_vjp(self, use_mask):
        from mer_tpu.ops.flash_attention import _flash_bwd_fused, _flash_impl

        rng = np.random.default_rng(0)
        b, h, s, dh = 2, 3, 160, 48
        q, k, v, g = (jnp.asarray(rng.normal(size=(b, h, s, dh)).astype(np.float32)) for _ in range(4))
        if use_mask:
            mask = jnp.asarray(rng.random((b, s)) < 0.25)
            bias = jnp.where(mask, -1e30, 0.0).astype(jnp.float32)
        else:
            bias = jnp.zeros((b, s), jnp.float32)

        out, lse = _flash_impl(q, k, v, bias, interpret=True, return_stats=True)
        dq, dk, dv = _flash_bwd_fused(q, k, v, bias, out, lse, g, interpret=True)
        rq, rk, rv = self._ref_grads(q, k, v, bias, g)
        np.testing.assert_allclose(np.asarray(dq), np.asarray(rq), rtol=2e-4, atol=2e-5)
        np.testing.assert_allclose(np.asarray(dk), np.asarray(rk), rtol=2e-4, atol=2e-5)
        np.testing.assert_allclose(np.asarray(dv), np.asarray(rv), rtol=2e-4, atol=2e-5)

    def test_cross_attention_lengths(self):
        from mer_tpu.ops.flash_attention import _flash_bwd_fused, _flash_impl

        rng = np.random.default_rng(1)
        b, h, sq, sk, dh = 1, 2, 96, 200, 32
        q = jnp.asarray(rng.normal(size=(b, h, sq, dh)).astype(np.float32))
        k = jnp.asarray(rng.normal(size=(b, h, sk, dh)).astype(np.float32))
        v = jnp.asarray(rng.normal(size=(b, h, sk, dh)).astype(np.float32))
        g = jnp.asarray(rng.normal(size=(b, h, sq, dh)).astype(np.float32))
        bias = jnp.zeros((b, sk), jnp.float32)

        out, lse = _flash_impl(q, k, v, bias, interpret=True, return_stats=True)
        dq, dk, dv = _flash_bwd_fused(q, k, v, bias, out, lse, g, interpret=True)
        rq, rk, rv = self._ref_grads(q, k, v, bias, g)
        np.testing.assert_allclose(np.asarray(dq), np.asarray(rq), rtol=2e-4, atol=2e-5)
        np.testing.assert_allclose(np.asarray(dk), np.asarray(rk), rtol=2e-4, atol=2e-5)
        np.testing.assert_allclose(np.asarray(dv), np.asarray(rv), rtol=2e-4, atol=2e-5)

    def test_grad_through_flash_attention_uses_fused_kernel(self):
        """jax.grad through flash_attention at a fused-zone shape must match
        the pure-jnp gradient (the public VJP path end-to-end)."""
        from mer_tpu.ops.attention import _attention_reference
        from mer_tpu.ops.flash_attention import flash_attention

        rng = np.random.default_rng(2)
        b, h, s, dh = 2, 2, 130, 24
        q, k, v = (jnp.asarray(rng.normal(size=(b, h, s, dh)).astype(np.float32)) for _ in range(3))
        mask = jnp.asarray(rng.random((b, s)) < 0.2)

        def loss_flash(q, k, v):
            return (flash_attention(q, k, v, key_padding_mask=mask, interpret=True) ** 2).sum()

        def loss_ref(q, k, v):
            o = _attention_reference(
                q, k, v, key_padding_mask=mask, dropout_rate=0.0,
                dropout_rng=None, deterministic=True,
            )
            return (o ** 2).sum()

        gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
        gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for a, b_ in zip(gf, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=5e-4, atol=5e-5)


class TestTiledBackward:
    """The K-tiled streaming backward (saved-logsumexp) vs the jnp VJP."""

    @pytest.mark.parametrize("use_mask", [False, True])
    def test_matches_reference_vjp(self, use_mask):
        from mer_tpu.ops.flash_attention import _flash_bwd_tiled, _flash_impl

        rng = np.random.default_rng(3)
        b, h, sq, sk, dh = 1, 2, 256, 1024, 32  # 2 k-tiles at BLOCK_K=512
        q = jnp.asarray(rng.normal(size=(b, h, sq, dh)).astype(np.float32))
        k = jnp.asarray(rng.normal(size=(b, h, sk, dh)).astype(np.float32))
        v = jnp.asarray(rng.normal(size=(b, h, sk, dh)).astype(np.float32))
        g = jnp.asarray(rng.normal(size=(b, h, sq, dh)).astype(np.float32))
        if use_mask:
            mask = jnp.asarray(rng.random((b, sk)) < 0.25)
            bias = jnp.where(mask, -1e30, 0.0).astype(jnp.float32)
        else:
            bias = jnp.zeros((b, sk), jnp.float32)

        out, lse = _flash_impl(q, k, v, bias, interpret=True, return_stats=True)
        dq, dk, dv = _flash_bwd_tiled(q, k, v, bias, out, lse, g, interpret=True)
        tb = TestFusedBackward()
        rq, rk, rv = tb._ref_grads(q, k, v, bias, g)
        np.testing.assert_allclose(np.asarray(dq), np.asarray(rq), rtol=2e-4, atol=2e-5)
        np.testing.assert_allclose(np.asarray(dk), np.asarray(rk), rtol=2e-4, atol=2e-5)
        np.testing.assert_allclose(np.asarray(dv), np.asarray(rv), rtol=2e-4, atol=2e-5)

    def test_streaming_fwd_stats_match_single_pass(self):
        from mer_tpu.ops.flash_attention import _flash_impl

        rng = np.random.default_rng(4)
        b, h, s, dh = 1, 2, 1024, 32
        q, k, v = (jnp.asarray(rng.normal(size=(b, h, s, dh)).astype(np.float32)) for _ in range(3))
        bias = jnp.zeros((b, s), jnp.float32)
        out_s, lse_s = _flash_impl(q, k, v, bias, interpret=True, force_stream=True, return_stats=True)
        out_1, lse_1 = _flash_impl(q, k, v, bias, interpret=True, force_stream=False, return_stats=True)
        np.testing.assert_allclose(np.asarray(out_s), np.asarray(out_1), rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(lse_s), np.asarray(lse_1), rtol=1e-5, atol=1e-6)


class TestFlashAttentionWithLse:
    """The stats-returning entry consumed by ring attention: lse correctness
    and full gradients including the lse cotangent."""

    def _bias(self, b, sk, frac=0.0, seed=1):
        if not frac:
            return jnp.zeros((b, sk), jnp.float32)
        rng = np.random.default_rng(seed)
        mask = rng.random((b, sk)) < frac
        mask[:, 0] = False
        return jnp.where(jnp.asarray(mask), -1e30, 0.0).astype(jnp.float32)

    def test_lse_matches_logsumexp(self):
        from mer_tpu.ops.flash_attention import flash_attention_with_lse

        q, k, v = _qkv(b=2, h=2, sq=64, sk=96, dh=16, seed=6)
        bias = self._bias(2, 96, frac=0.3)
        out, lse = flash_attention_with_lse(q, k, v, bias, True)
        scale = 1.0 / np.sqrt(16)
        s = jnp.einsum("bhqd,bhkd->bhqk", q * scale, k) + bias[:, None, None, :]
        want_lse = jax.scipy.special.logsumexp(s, axis=-1)
        want_out = jnp.einsum("bhqk,bhkd->bhqd", jax.nn.softmax(s, axis=-1), v)
        np.testing.assert_allclose(np.asarray(lse), np.asarray(want_lse), rtol=2e-4, atol=2e-5)
        np.testing.assert_allclose(np.asarray(out), np.asarray(want_out), rtol=2e-4, atol=2e-5)

    @pytest.mark.parametrize("sk", [96, 2200])  # fused bwd vs K-tiled bwd
    def test_grad_through_out_and_lse(self, sk):
        """A loss reading BOTH outputs exercises the g_lse -> delta fold in
        whichever backward kernel the size dispatches to."""
        from mer_tpu.ops.flash_attention import flash_attention_with_lse

        q, k, v = _qkv(b=1, h=2, sq=48, sk=sk, dh=16, seed=7)
        bias = self._bias(1, sk, frac=0.2, seed=8)
        scale = 1.0 / np.sqrt(16)

        def loss_kernel(q, k, v):
            out, lse = flash_attention_with_lse(q, k, v, bias, True)
            return jnp.sum(out ** 2) + jnp.sum(jnp.sin(lse))

        def loss_ref(q, k, v):
            s = jnp.einsum("bhqd,bhkd->bhqk", q * scale, k) + bias[:, None, None, :]
            lse = jax.scipy.special.logsumexp(s, axis=-1)
            out = jnp.einsum("bhqk,bhkd->bhqd", jax.nn.softmax(s, axis=-1), v)
            return jnp.sum(out ** 2) + jnp.sum(jnp.sin(lse))

        g_k = jax.grad(loss_kernel, argnums=(0, 1, 2))(q, k, v)
        g_r = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for gk, gr in zip(g_k, g_r):
            np.testing.assert_allclose(np.asarray(gk), np.asarray(gr), rtol=1e-3, atol=1e-4)


class TestFlashAttentionBf16:
    """Serving-path numerics: bf16 q/k/v through the kernel = bf16 MXU
    matmuls with f32 accumulation (preferred_element_type) and f32 softmax
    temporaries. Tolerances sized for bf16's ~3 decimal digits."""

    def test_bf16_matches_f32_reference(self):
        q, k, v = _qkv(b=2, h=4, sq=256, sk=256, dh=64, seed=11)
        rng = np.random.default_rng(12)
        mask = jnp.asarray(rng.random((2, 256)) < 0.2)
        want = _attention_reference(
            q, k, v, key_padding_mask=mask, dropout_rate=0.0, dropout_rng=None, deterministic=True
        )
        got = flash_attention(
            q.astype(jnp.bfloat16), k.astype(jnp.bfloat16), v.astype(jnp.bfloat16),
            key_padding_mask=mask, interpret=True,
        )
        assert got.dtype == jnp.bfloat16
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(want), rtol=2e-2, atol=2e-2
        )

    def test_bf16_grads_finite_and_close(self):
        q, k, v = _qkv(b=1, h=2, sq=128, sk=128, dh=32, seed=13)

        def loss(fn, q, k, v):
            return jnp.sum(fn(q, k, v).astype(jnp.float32) ** 2)

        g_bf16 = jax.grad(
            lambda q, k, v: loss(lambda *a: flash_attention(*a, interpret=True), q, k, v),
            argnums=(0, 1, 2),
        )(q.astype(jnp.bfloat16), k.astype(jnp.bfloat16), v.astype(jnp.bfloat16))
        g_f32 = jax.grad(
            lambda q, k, v: loss(
                lambda *a: _attention_reference(
                    *a, key_padding_mask=None, dropout_rate=0.0, dropout_rng=None, deterministic=True
                ), q, k, v),
            argnums=(0, 1, 2),
        )(q, k, v)
        for gb, gf in zip(g_bf16, g_f32):
            assert gb.dtype == jnp.bfloat16
            gb = np.asarray(gb, np.float32)
            gf = np.asarray(gf)
            assert np.all(np.isfinite(gb))
            denom = max(np.abs(gf).max(), 1e-6)
            assert np.abs(gb - gf).max() / denom < 0.05
