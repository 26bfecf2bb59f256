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


class TestSemihardDeviation:
    """Quantifies the one documented deviation from the reference's semi-hard
    loop (audio_mel/dataset.py:242-296, spin-until-accept): the batched
    rejection sampler with a bounded-rounds random fallback.  Shows (a) the
    fallback never fires at realistic acceptance rates, (b) it fires — and is
    counted — when NO semi-hard triplet exists (where the reference would
    hang forever), and (c) the accepted-triplet distribution matches a direct
    restatement of the reference's sequential rejection sampling."""

    def _setup(self, n=200, d=8, seed=0):
        rng = np.random.default_rng(seed)
        table = rng.normal(size=(n, d)).astype(np.float32)
        labels = rng.integers(0, 7, size=n)
        return table, labels, (lambda idx: jnp.asarray(table[np.asarray(idx)]))

    def test_fallback_never_fires_at_realistic_acceptance(self):
        table, labels, embed = self._setup()
        miner = TripletMiner(labels, embed, seed=0)
        for _ in range(30):
            a, p, n = miner.mine(16, "semi-hard", margin=1.0)
            assert len(a) == 16
        assert miner.stats["semihard_fallback"] == 0
        assert miner.stats["semihard_accepted"] == 30 * 16

    def test_fallback_fires_and_counts_when_impossible(self):
        # margin=0 makes d_an < d_ap + margin unsatisfiable given d_ap < d_an:
        # the semi-hard band is empty, the reference's loop would never return
        table, labels, embed = self._setup(seed=1)
        miner = TripletMiner(labels, embed, seed=0)
        a, p, n = miner.mine(8, "semi-hard", margin=0.0)
        assert len(a) == 8  # degrade gracefully, still a full batch
        assert miner.stats["semihard_fallback"] == 8

    def test_accepted_distribution_matches_sequential_reference(self):
        """Both samplers accept iid proposals through the same predicate, so
        the accepted-triplet law must be identical; verify empirically via
        the d(a,n)-d(a,p) violation statistic (KS distance on ~800 accepted
        triplets per side)."""
        table, labels, embed = self._setup(seed=2)
        margin = 1.0

        def violation(a, p, n):
            d_ap = np.linalg.norm(table[a] - table[p], axis=-1)
            d_an = np.linalg.norm(table[a] - table[n], axis=-1)
            return d_an - d_ap

        # ours: batched rejection
        miner = TripletMiner(labels, embed, seed=10)
        got = []
        while len(got) < 800:
            a, p, n = miner.mine(32, "semi-hard", margin=margin)
            got.extend(violation(a, p, n).tolist())
        assert miner.stats["semihard_fallback"] == 0

        # reference restatement: one proposal at a time, spin until accepted
        # (audio_mel/dataset.py:242-296)
        seq_sampler = TripletIndexSampler(labels, seed=99)
        want = []
        while len(want) < 800:
            a, p, n = seq_sampler.sample_random_triplets(1)
            d_ap = np.linalg.norm(table[a[0]] - table[p[0]])
            d_an = np.linalg.norm(table[a[0]] - table[n[0]])
            if d_ap < d_an < d_ap + margin:
                want.append(d_an - d_ap)

        got, want = np.sort(got[:800]), np.sort(want[:800])
        # two-sample KS distance; critical value at alpha=0.001 for n=m=800
        # is ~0.0975 — deterministic seeds keep this far from flaky
        grid = np.concatenate([got, want])
        ks = np.max(np.abs(
            np.searchsorted(got, grid, side="right") / len(got)
            - np.searchsorted(want, grid, side="right") / len(want)
        ))
        assert ks < 0.0975, f"accepted-triplet distributions diverge: KS={ks:.4f}"
