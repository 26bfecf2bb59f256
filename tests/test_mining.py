"""Triplet mining tests: device hard-mining vs a brute-force numpy
re-statement of the reference semantics, sampler distributions, ResNet model."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mer_tpu.mining import TripletIndexSampler, TripletMiner, cdist, hard_triplets_from_pool, semihard_mask


def _numpy_hard_reference(emb: np.ndarray, labels: np.ndarray, batch_size: int):
    """Brute-force restatement of the reference's hard mining
    (audio_mel/dataset.py:330-358)."""
    n = emb.shape[0]
    d = np.sqrt(((emb[:, None, :] - emb[None, :, :]) ** 2).sum(-1))
    same = labels[:, None] == labels[None, :]
    eye = np.eye(n, dtype=bool)

    pos_mask = np.where(same & ~eye, 1.0, 0.0)
    p_idx = np.argmax(d * pos_mask, axis=1)
    neg_bias = np.where(same | eye, np.inf, 0.0)
    n_idx = np.argmin(d + neg_bias, axis=1)
    losses = d[np.arange(n), p_idx] - d[np.arange(n), n_idx]
    a_idx = np.argsort(-losses)[:batch_size]
    return set(zip(a_idx.tolist(), p_idx[a_idx].tolist(), n_idx[a_idx].tolist()))


class TestCdist:
    def test_matches_torch(self):
        torch = pytest.importorskip("torch")
        x = np.random.default_rng(0).normal(size=(10, 16)).astype(np.float32)
        ours = np.asarray(cdist(jnp.asarray(x), jnp.asarray(x)))
        ref = torch.cdist(torch.tensor(x), torch.tensor(x), p=2).numpy()
        np.testing.assert_allclose(ours, ref, atol=1e-4)


class TestHardMining:
    def test_matches_reference_semantics(self):
        rng = np.random.default_rng(0)
        emb = rng.normal(size=(96, 32)).astype(np.float32)
        labels = rng.integers(0, 7, size=96)
        a, p, n = hard_triplets_from_pool(jnp.asarray(emb), jnp.asarray(labels), 32)
        got = set(zip(np.asarray(a).tolist(), np.asarray(p).tolist(), np.asarray(n).tolist()))
        ref = _numpy_hard_reference(emb, labels, 32)
        assert got == ref

    def test_constraints_hold(self):
        rng = np.random.default_rng(1)
        emb = rng.normal(size=(64, 8)).astype(np.float32)
        labels = rng.integers(0, 4, size=64)
        a, p, n = map(np.asarray, hard_triplets_from_pool(jnp.asarray(emb), jnp.asarray(labels), 16))
        assert (labels[a] == labels[p]).all()
        assert (a != p).all()
        assert (labels[a] != labels[n]).all()


class TestSemihardMask:
    def test_rule(self):
        a = jnp.zeros((3, 2))
        p = jnp.asarray([[0.5, 0.0], [0.5, 0.0], [3.0, 0.0]])
        n = jnp.asarray([[1.0, 0.0], [9.0, 0.0], [1.0, 0.0]])
        ok = np.asarray(semihard_mask(a, p, n, margin=1.0))
        # d_ap=0.5,d_an=1.0 -> semi-hard; d_an=9 too easy... (outside margin);
        # d_ap=3 > d_an=1 -> hard, not semi-hard
        np.testing.assert_array_equal(ok, [True, False, False])


class TestSamplers:
    def test_class_uniform_corrects_imbalance(self):
        labels = np.array([0] * 990 + [1] * 5 + [2] * 5)
        s = TripletIndexSampler(labels, num_classes=7, seed=0)
        idx = s.sample_class_uniform(3000)
        counts = np.bincount(labels[idx], minlength=3)
        # each non-empty class ~1/3 of draws despite 99% imbalance
        assert abs(counts[0] / 3000 - 1 / 3) < 0.05

    def test_random_triplets_constraints(self):
        labels = np.random.default_rng(0).integers(0, 7, size=200)
        s = TripletIndexSampler(labels, seed=1)
        a, p, n = s.sample_random_triplets(64)
        assert (labels[a] == labels[p]).all()
        assert (labels[a] != labels[n]).all()
        assert (a != p).all()


class TestMinerEndToEnd:
    def _embed_table(self, n=300, d=16, seed=0):
        rng = np.random.default_rng(seed)
        table = rng.normal(size=(n, d)).astype(np.float32)
        return table, lambda idx: jnp.asarray(table[np.asarray(idx)])

    def test_hard_mine(self):
        labels = np.random.default_rng(2).integers(0, 7, size=300)
        table, embed = self._embed_table()
        miner = TripletMiner(labels, embed, len_triplet_picking=100, seed=0)
        a, p, n = miner.mine(32, "hard")
        assert len(a) == 32
        assert (labels[a] == labels[p]).all()
        assert (labels[a] != labels[n]).all()

    def test_semihard_mine(self):
        labels = np.random.default_rng(3).integers(0, 7, size=300)
        table, embed = self._embed_table(seed=1)
        miner = TripletMiner(labels, embed, seed=0)
        a, p, n = miner.mine(16, "semi-hard", margin=10.0)  # generous margin -> accepts
        assert len(a) == 16
        assert (labels[a] == labels[p]).all()

    def test_random_mine(self):
        labels = np.random.default_rng(4).integers(0, 7, size=100)
        miner = TripletMiner(labels, lambda idx: None, seed=0)
        a, p, n = miner.mine(8, "random")
        assert len(a) == 8


class TestResNetModel:
    def test_shapes_and_l2_norm(self):
        from mer_tpu.models.resnet import AudioMelFeatureExtractor

        model = AudioMelFeatureExtractor()
        x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 64, 128, 3)).astype(np.float32))
        variables = model.init(jax.random.PRNGKey(0), x)
        out = model.apply(variables, x)
        assert out.shape == (2, 300)
        np.testing.assert_allclose(np.linalg.norm(np.asarray(out), axis=-1), 1.0, rtol=1e-5)

    def test_accepts_reference_nchw_layout(self):
        from mer_tpu.models.resnet import AudioMelFeatureExtractor

        model = AudioMelFeatureExtractor()
        x = jnp.asarray(np.random.default_rng(1).normal(size=(2, 3, 64, 128)).astype(np.float32))
        variables = model.init(jax.random.PRNGKey(0), x)
        out = model.apply(variables, x)
        assert out.shape == (2, 300)

    def test_bn_train_mode_updates_stats(self):
        from mer_tpu.models.resnet import AudioMelFeatureExtractor

        model = AudioMelFeatureExtractor(bn_mode="train")
        x = jnp.asarray(np.random.default_rng(2).normal(size=(2, 32, 32, 3)).astype(np.float32) + 3.0)
        variables = model.init(jax.random.PRNGKey(0), x, train=False)
        _, updated = model.apply(variables, x, train=True, mutable=["batch_stats"])
        before = variables["batch_stats"]["resnet18"]["bn1"]["mean"]
        after = updated["batch_stats"]["resnet18"]["bn1"]["mean"]
        assert not np.allclose(np.asarray(before), np.asarray(after))
