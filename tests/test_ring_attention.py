"""Ring attention over the sp axis vs full attention (8-device CPU mesh)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mer_tpu.ops.attention import _attention_reference
from mer_tpu.ops.ring_attention import ring_attention, sequence_parallel_attention
from mer_tpu.parallel import make_mesh


def _qkv(b=2, h=4, s=64, dh=16, seed=0):
    rng = np.random.default_rng(seed)
    mk = lambda: jnp.asarray(rng.normal(size=(b, h, s, dh)).astype(np.float32))
    return mk(), mk(), mk()


def _full(q, k, v, mask=None):
    return _attention_reference(
        q, k, v, key_padding_mask=mask, dropout_rate=0.0, dropout_rng=None, deterministic=True
    )


class TestRingAttention:
    @pytest.mark.parametrize("sp", [2, 4, 8])
    def test_matches_full_attention(self, sp):
        mesh = make_mesh(dp=1, tp=1, sp=sp)
        q, k, v = _qkv(s=64)
        got = ring_attention(q, k, v, mesh=mesh)
        want = _full(q, k, v)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)

    def test_with_key_padding_mask(self):
        mesh = make_mesh(dp=2, tp=1, sp=4)
        q, k, v = _qkv(b=2, s=64, seed=1)
        rng = np.random.default_rng(2)
        mask = jnp.asarray(rng.random((2, 64)) < 0.3)
        got = ring_attention(q, k, v, mesh=mesh, key_padding_mask=mask)
        want = _full(q, k, v, mask=mask)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)

    def test_executes_sharded_with_collectives(self):
        """The compiled program must contain a collective-permute (the ring),
        and accept sp-sharded inputs without resharding to replicated."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        mesh = make_mesh(dp=1, tp=1, sp=8)
        q, k, v = _qkv(b=1, h=2, s=128, dh=8, seed=3)
        fn = jax.jit(lambda q, k, v: ring_attention(q, k, v, mesh=mesh))
        seq4 = NamedSharding(mesh, P(None, None, "sp", None))
        q_s = jax.device_put(q, seq4)
        k_s = jax.device_put(k, seq4)
        hlo = fn.lower(q_s, k_s, v).compile().as_text()
        assert "collective-permute" in hlo
        got = fn(q_s, k_s, v)
        want = _full(q, k, v)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)

    def test_rejects_indivisible_sequence(self):
        mesh = make_mesh(dp=1, tp=1, sp=8)
        q, k, v = _qkv(s=60)
        with pytest.raises(ValueError):
            ring_attention(q, k, v, mesh=mesh)

    def test_grad_flows(self):
        mesh = make_mesh(dp=1, tp=1, sp=4)
        q, k, v = _qkv(b=1, h=2, s=32, dh=8, seed=4)

        def loss_ring(q, k, v):
            return jnp.sum(ring_attention(q, k, v, mesh=mesh) ** 2)

        def loss_full(q, k, v):
            return jnp.sum(_full(q, k, v) ** 2)

        g_ring = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
        g_full = jax.grad(loss_full, argnums=(0, 1, 2))(q, k, v)
        for gr, gf in zip(g_ring, g_full):
            np.testing.assert_allclose(np.asarray(gr), np.asarray(gf), rtol=5e-5, atol=5e-5)


class TestDispatch:
    def test_falls_back_without_sp(self):
        q, k, v = _qkv(s=32)
        got = sequence_parallel_attention(q, k, v, mesh=None)
        want = _full(q, k, v)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-6)

    def test_uses_ring_with_sp_mesh(self):
        mesh = make_mesh(dp=1, tp=1, sp=8)
        q, k, v = _qkv(s=64, seed=5)
        got = sequence_parallel_attention(q, k, v, mesh=mesh)
        want = _full(q, k, v)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


class TestRingAttentionKernelComposed:
    """The Pallas streaming kernel inside the shard_map ring body
    (use_kernel=True, interpret mode on the CPU mesh): each local block runs
    flash_attention_with_lse and blocks merge by logsumexp weighting."""

    @pytest.mark.parametrize("sp", [2, 4])
    def test_matches_full_attention(self, sp):
        mesh = make_mesh(dp=1, tp=1, sp=sp)
        q, k, v = _qkv(b=1, h=2, s=64, dh=16, seed=7)
        got = ring_attention(q, k, v, mesh=mesh, use_kernel=True, interpret=True)
        want = _full(q, k, v)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-5)

    def test_with_key_padding_mask(self):
        mesh = make_mesh(dp=1, tp=1, sp=4)
        q, k, v = _qkv(b=2, h=2, s=64, dh=16, seed=8)
        rng = np.random.default_rng(9)
        mask = rng.random((2, 64)) < 0.3
        mask[:, 0] = False  # keep one attendable key per row
        mask = jnp.asarray(mask)
        got = ring_attention(q, k, v, mesh=mesh, key_padding_mask=mask, use_kernel=True, interpret=True)
        want = _full(q, k, v, mask=mask)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-5)

    def test_grad_matches_full_attention(self):
        """Backward through kernel blocks + logsumexp merge + ppermute
        reversal: the lse cotangent rides the Pallas backward's delta term."""
        mesh = make_mesh(dp=1, tp=1, sp=4)
        q, k, v = _qkv(b=1, h=2, s=32, dh=8, seed=10)

        def loss_ring(q, k, v):
            out = ring_attention(q, k, v, mesh=mesh, use_kernel=True, interpret=True)
            return jnp.sum(out ** 2)

        def loss_full(q, k, v):
            return jnp.sum(_full(q, k, v) ** 2)

        g_ring = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
        g_full = jax.grad(loss_full, argnums=(0, 1, 2))(q, k, v)
        for gr, gf in zip(g_ring, g_full):
            np.testing.assert_allclose(np.asarray(gr), np.asarray(gf), rtol=5e-4, atol=5e-5)
