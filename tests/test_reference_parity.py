"""Numeric parity against the LIVE torch reference implementation.

These tests execute the reference's own src/model.py (torch, CPU) on the
REAL shipped val-split embedding artifacts (embeddings/*/val.pkl,
src/dataset.py:14-17) and assert that mer_tpu produces the same logits,
losses, metrics and training trajectories on identical batches — the
"architecturally identical -> numerically proven" bridge (see
mer_tpu/parity/reference_fusion.py for the pseudo-dialogue / derived-label
protocol used because the MELD CSVs are not mounted).
"""

import numpy as np
import pytest

from mer_tpu.parity import (
    MerTpuFusion,
    TorchReferenceFusion,
    build_batches,
    load_val_tables,
    make_pseudo_dialogues,
    projection_labels,
    reference_available,
    reference_model_config,
    shipped_val_artifacts_available,
)

pytestmark = pytest.mark.skipif(
    not (reference_available() and shipped_val_artifacts_available()),
    reason="reference tree with shipped val.pkl artifacts not mounted",
)


@pytest.fixture(scope="module")
def val_data():
    text, audio = load_val_tables()
    assert text.shape == (1108, 768) and audio.shape == (1108, 768)
    labels = projection_labels(text, seed=0)
    groups = make_pseudo_dialogues(len(text), seed=0)
    return text, audio, labels, groups


@pytest.fixture(scope="module")
def full_size_pair():
    """Reference-config-sized (768d, 6 enc layers, 5 FAM) torch model at
    random init + the converted mer_tpu model."""
    cfg = reference_model_config(dropout=0.4)
    ref = TorchReferenceFusion(cfg, seed=0)
    ours = MerTpuFusion(cfg, ref.state_dict(), scan_layers=True)
    return ref, ours


class TestLogitParity:
    def test_full_model_logits_match(self, val_data, full_size_pair):
        """Full-size M2FNet forward (eval mode) on real val embeddings:
        logits must agree to float32 accumulation noise."""
        text, audio, labels, groups = val_data
        ref, ours = full_size_pair
        batches = build_batches(text, audio, labels, groups, batch_size=8)[:2]
        for batch in batches:
            lt = ref.logits(batch)
            lj = ours.logits(batch)
            assert lt.shape == lj.shape
            keep = ~batch["padding_mask"]
            np.testing.assert_allclose(lj[keep], lt[keep], rtol=2e-3, atol=2e-4)

    def test_eval_loss_matches(self, val_data, full_size_pair):
        """Reference CE(ignore_index=-1, label_smoothing=0.1) vs ours on the
        same batch (src/train.py:48-50, 229)."""
        from mer_tpu.objectives.classification import cross_entropy

        import jax.numpy as jnp

        text, audio, labels, groups = val_data
        ref, ours = full_size_pair
        batch = build_batches(text, audio, labels, groups, batch_size=8)[0]
        want = ref.loss(batch)
        got = float(
            cross_entropy(
                jnp.asarray(ours.logits(batch)), jnp.asarray(batch["emotion"]),
                label_smoothing=0.1, ignore_index=-1,
            )
        )
        np.testing.assert_allclose(got, want, rtol=1e-5)


class TestMetricParity:
    def test_batch_averaged_metrics_match_reference_sklearn(self, val_data, full_size_pair):
        """Our metric path vs the reference's sklearn batch-averaged
        accuracy/weighted-F1 (src/test.py:51-74) on the same model+data."""
        text, audio, labels, groups = val_data
        ref, ours = full_size_pair
        batches = build_batches(text, audio, labels, groups, batch_size=8)[:5]
        want = ref.evaluate(batches)
        got = ours.evaluate(batches)
        np.testing.assert_allclose(got["accuracy"], want["accuracy"], atol=1e-8)
        np.testing.assert_allclose(got["weighted_f1"], want["weighted_f1"], atol=1e-8)


class TestTrainingTrajectoryParity:
    def test_step_losses_track_torch_adam(self, val_data):
        """10 optimizer steps from identical init on identical real-data
        batches: torch Adam-L2 vs mer_tpu's fused train step must produce the
        same loss trajectory (dropout=0 for determinism)."""
        text, audio, labels, groups = val_data
        cfg = reference_model_config(dropout=0.0)
        ref = TorchReferenceFusion(cfg, seed=0)
        ours = MerTpuFusion(cfg, ref.state_dict(), scan_layers=True)

        batches = build_batches(text, audio, labels, groups, batch_size=4, shuffle_seed=1)[:10]
        torch_losses = ref.train_steps(batches, lr=5e-5, weight_decay=0.01)
        jax_losses = ours.train_steps(batches, lr=5e-5, weight_decay=0.01)
        np.testing.assert_allclose(jax_losses, torch_losses, rtol=2e-3)

        # post-training logits on a held-out batch must still agree
        held_out = build_batches(text, audio, labels, groups, batch_size=4, shuffle_seed=2)[-1]
        lt = ref.logits(held_out)
        lj = ours.logits(held_out)
        keep = ~held_out["padding_mask"]
        np.testing.assert_allclose(lj[keep], lt[keep], rtol=5e-3, atol=2e-3)
