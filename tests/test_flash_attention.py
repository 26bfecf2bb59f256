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
