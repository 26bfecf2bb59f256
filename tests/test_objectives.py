"""Objective parity tests against torch / sklearn (both host-side, CPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from mer_tpu.objectives import (
    BatchAveragedMetrics,
    accuracy,
    adaptive_triplet_margin_loss,
    balanced_class_weights,
    covariance_loss,
    cross_entropy,
    m2fnet_audio_embedding_loss,
    triplet_margin_loss,
    variance_loss,
    weighted_f1,
)

torch = pytest.importorskip("torch")


def _rand(shape, seed=0):
    return np.random.default_rng(seed).normal(size=shape).astype(np.float32)


class TestCrossEntropy:
    @pytest.mark.parametrize("smoothing", [0.0, 0.1])
    @pytest.mark.parametrize("weighted", [False, True])
    def test_matches_torch(self, smoothing, weighted):
        rng = np.random.default_rng(3)
        logits = rng.normal(size=(4, 9, 7)).astype(np.float32)
        labels = rng.integers(0, 7, size=(4, 9))
        labels[:, 6:] = -1  # padded tail like the fusion collate (src/dataset.py:82)
        w = (rng.random(7).astype(np.float32) + 0.5) if weighted else None

        ours = cross_entropy(
            jnp.asarray(logits),
            jnp.asarray(labels),
            label_smoothing=smoothing,
            class_weights=None if w is None else jnp.asarray(w),
        )

        ref = torch.nn.functional.cross_entropy(
            torch.tensor(logits).permute(0, 2, 1),  # [B, C, U] like src/train.py:229
            torch.tensor(labels),
            weight=None if w is None else torch.tensor(w),
            ignore_index=-1,
            label_smoothing=smoothing,
        )
        assert np.allclose(float(ours), float(ref), rtol=1e-5, atol=1e-6)

    def test_all_ignored_is_finite(self):
        logits = jnp.zeros((2, 3, 7))
        labels = -jnp.ones((2, 3), dtype=jnp.int32)
        assert np.isfinite(float(cross_entropy(logits, labels, label_smoothing=0.1)))

    def test_balanced_class_weights_matches_sklearn(self):
        sklearn_cw = pytest.importorskip("sklearn.utils.class_weight")
        labels = np.random.default_rng(0).integers(0, 7, size=500)
        ours = balanced_class_weights(labels, 7)
        ref = sklearn_cw.compute_class_weight(class_weight="balanced", classes=np.arange(7), y=labels)
        np.testing.assert_allclose(ours, ref.astype(np.float32), rtol=1e-6)


class TestEmbeddingLosses:
    def setup_method(self):
        self.a = _rand((16, 32), 1)
        self.p = _rand((16, 32), 2)
        self.n = _rand((16, 32), 3)

    def _torch_adaptive(self, a, p, n, eps=1e-6):
        # independent re-statement of the paper formula
        # (reference AdaptiveTripletMarginLoss.py:25-46)
        a, p, n = map(torch.tensor, (a, p, n))
        d_ap = torch.norm(a - p, p=2, dim=-1)
        d_an = torch.norm(a - n, p=2, dim=-1)
        d_pn = torch.norm(p - n, p=2, dim=-1)
        margin = (1 + 2 / (torch.exp(4 * d_ap) + eps)) + (1 + 2 / (torch.exp(-4 * d_an + 4) + eps))
        return torch.relu(d_ap - (d_an + d_pn) / 2 + margin).mean()

    def test_adaptive_triplet_matches_formula(self):
        ours = adaptive_triplet_margin_loss(jnp.asarray(self.a), jnp.asarray(self.p), jnp.asarray(self.n))
        ref = self._torch_adaptive(self.a, self.p, self.n)
        assert np.allclose(float(ours), float(ref), rtol=1e-5)

    def test_fixed_triplet_matches_torch(self):
        ours = triplet_margin_loss(jnp.asarray(self.a), jnp.asarray(self.p), jnp.asarray(self.n), margin=0.2)
        ref = torch.nn.TripletMarginLoss(margin=0.2, p=2)(
            torch.tensor(self.a), torch.tensor(self.p), torch.tensor(self.n)
        )
        assert np.allclose(float(ours), float(ref), rtol=1e-4)

    def test_variance_matches_torch(self):
        ours = variance_loss(jnp.asarray(self.a), jnp.asarray(self.p), jnp.asarray(self.n))
        total = 0.0
        for z in (self.a, self.p, self.n):
            zt = torch.tensor(z)
            var = torch.var(zt, dim=0)
            total += (torch.relu(1.0 - torch.sqrt(var + 1e-6)).sum() / z.shape[-1]).item()
        assert np.allclose(float(ours), total, rtol=1e-5)

    def test_covariance_matches_torch(self):
        ours = covariance_loss(jnp.asarray(self.a), jnp.asarray(self.p), jnp.asarray(self.n))
        total = 0.0
        for z in (self.a, self.p, self.n):
            zt = torch.tensor(z)
            cov = torch.cov(zt.T) ** 2
            cov.diagonal()[:] = 0.0
            total += (cov.sum() / z.shape[-1]).item()
        # f32 accumulation-order differences between XLA and torch matmuls
        assert np.allclose(float(ours), total, rtol=1e-3)

    def test_composite_weighting(self):
        full = m2fnet_audio_embedding_loss(jnp.asarray(self.a), jnp.asarray(self.p), jnp.asarray(self.n))
        t = adaptive_triplet_margin_loss(jnp.asarray(self.a), jnp.asarray(self.p), jnp.asarray(self.n))
        c = covariance_loss(jnp.asarray(self.a), jnp.asarray(self.p), jnp.asarray(self.n))
        v = variance_loss(jnp.asarray(self.a), jnp.asarray(self.p), jnp.asarray(self.n))
        assert np.allclose(float(full), 20 * float(t) + 5 * float(c) + float(v), rtol=1e-5)


class TestMetrics:
    def test_matches_sklearn(self):
        sk = pytest.importorskip("sklearn.metrics")
        rng = np.random.default_rng(7)
        y_true = rng.integers(0, 7, size=300)
        y_pred = rng.integers(0, 7, size=300)
        assert np.allclose(accuracy(y_true, y_pred), sk.accuracy_score(y_true, y_pred))
        assert np.allclose(weighted_f1(y_true, y_pred), sk.f1_score(y_true, y_pred, average="weighted"))

    def test_missing_classes(self):
        sk = pytest.importorskip("sklearn.metrics")
        y_true = np.array([0, 0, 1, 1])
        y_pred = np.array([0, 1, 1, 6])
        assert np.allclose(weighted_f1(y_true, y_pred), sk.f1_score(y_true, y_pred, average="weighted"))

    def test_batch_averaged_semantics(self):
        """Reference averages per-batch metrics over batches (src/test.py:70-74)."""
        m = BatchAveragedMetrics()
        t1, p1 = np.array([0, 1, -1]), np.array([0, 0, 0])
        t2, p2 = np.array([2, 2]), np.array([2, 2])
        m.update(t1, p1)
        m.update(t2, p2)
        assert np.allclose(m.batch_averaged_accuracy, (0.5 + 1.0) / 2)
        assert np.allclose(m.pooled_accuracy, 3 / 4)
