"""Dropout PRNG selection (mer_tpu/utils/rng.py).

The reference's dropout masks come from torch's global RNG (implicit in
nn.Dropout, /root/reference/src/model.py:57) — only the Bernoulli
distribution is contract, not the stream, so the TPU build picks the
cheapest generator per backend (rbg hardware instruction on TPU).
"""

import jax
import jax.numpy as jnp
import pytest

from mer_tpu.utils.rng import dropout_key


class TestDropoutKey:
    def test_explicit_impls(self):
        assert str(dropout_key(0, "rbg").dtype) == "key<rbg>"
        assert str(dropout_key(0, "threefry2x32").dtype) == "key<fry>"

    def test_auto_on_cpu_is_threefry(self):
        # tests run on the CPU backend (conftest): auto must pick the
        # cross-version-stable default stream there
        assert jax.default_backend() == "cpu"
        assert str(dropout_key(0, None).dtype) == "key<fry>"
        assert str(dropout_key(0, "auto").dtype) == "key<fry>"

    def test_invalid_impl_raises(self):
        with pytest.raises(ValueError, match="dropout_prng"):
            dropout_key(0, "philox")

    def test_streams_fold_and_sample(self):
        # both impls must thread through the solver's fold_in(step) pattern
        for impl in ("rbg", "threefry2x32"):
            k = dropout_key(7, impl)
            a = jax.random.uniform(jax.random.fold_in(k, 1), (16,))
            b = jax.random.uniform(jax.random.fold_in(k, 2), (16,))
            assert a.shape == (16,)
            assert not jnp.allclose(a, b)  # distinct per-step masks

    def test_deterministic_per_seed(self):
        for impl in ("rbg", "threefry2x32"):
            x = jax.random.uniform(dropout_key(3, impl), (8,))
            y = jax.random.uniform(dropout_key(3, impl), (8,))
            assert jnp.array_equal(x, y)
