"""End-to-end tests of the three feature-extractor pipelines on the tiny
synthetic MELD root: data shapes, freeze/unfreeze training, mel metric
learning, embedding export."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mer_tpu.core import Config
from mer_tpu.data.wav2vec2_fe import w2v_batch_to_inputs
from mer_tpu.data import (
    MelFeatureDataset,
    TextBatcher,
    TextFeatureDataset,
    ToyWhitespaceTokenizer,
    Wav2Vec2Batcher,
    Wav2Vec2FeatureDataset,
)
from mer_tpu.models.resnet import AudioMelFeatureExtractor
from mer_tpu.models.roberta import RobertaConfig, TextERC
from mer_tpu.models.wav2vec2 import AudioERC, Wav2Vec2Config
from mer_tpu.train import FESolver, MelSolver


def _text_config(tmp_path, epochs=3, num_frozen=2):
    return Config(
        {
            "checkpoint": {"save_path": str(tmp_path / "text" / "c.ckpt"), "save_checkpoint": True},
            "solver": {
                "loss_fn": "CE", "balance_classes": False,
                "warmup_epochs": 1, "num_frozen_epochs": num_frozen,
                "frozen_lr": 1e-3, "finetuning_lr": 1e-4, "weight_decay": 0.01,
                "epochs": epochs,
                "early_stopping": {"enabled": True, "patience": 5, "restore_best_weights": True},
            },
            "wandb": {"enabled": False},
        }
    )


def _mel_config(tmp_path, root, epochs=2):
    return Config(
        {
            "DEBUG": {"enabled": True, "num_samples": 24, "train": True},
            "AUDIO": {"ffmpeg_sr": 16000, "wav2vec_sr": 16000, "max_duration": 1.0, "augmentation_factor": 1},
            "checkpoint": {
                "save_path": str(tmp_path / "mel" / "c.ckpt"),
                "load_path": str(tmp_path / "mel" / "c.ckpt"),
                "save_checkpoint": True, "load_checkpoint": False,
            },
            "solver": {
                "len_triplet_picking": 16,
                "adaptive_triplet_margin_loss": True, "covariance_loss": True, "variance_loss": True,
                "lr": 1e-4, "weight_decay": 0.0, "epochs": epochs,
                "scheduler": {"enabled": True, "scheduler_fn": "ExponentialLR", "gamma": 0.98},
                "early_stopping": {"enabled": True, "patience": 10, "restore_best_weights": True},
            },
            "train": {"data_loader": {"shuffle": True, "batch_size": 4}},
            "val": {"data_loader": {"shuffle": False, "batch_size": 4}},
            "test": {"data_loader": {"shuffle": False, "batch_size": 4}},
            "wandb": {"enabled": False},
        }
    )


SMALL_ROBERTA = RobertaConfig(
    vocab_size=1000, hidden_size=32, num_hidden_layers=1, num_attention_heads=4,
    intermediate_size=64, max_position_embeddings=520, num_labels=7,
)
SMALL_W2V = Wav2Vec2Config(
    conv_dim=(16, 16, 16), conv_kernel=(10, 3, 2), conv_stride=(5, 2, 2),
    hidden_size=32, num_hidden_layers=1, num_attention_heads=4, intermediate_size=64,
    num_conv_pos_embeddings=16, num_conv_pos_embedding_groups=4,
)


class TestTextPipeline:
    def test_dataset_and_batcher(self, meld_like_root):
        root, sizes = meld_like_root
        ds = TextFeatureDataset("val", ToyWhitespaceTokenizer(), data_root=root)
        assert len(ds) == sizes["val"]
        assert all("</s>" in t for t in ds.texts)
        batcher = TextBatcher(ds, batch_size=8, shuffle=False)
        batches = list(batcher)
        assert len(batches) == len(batcher)
        for b in batches:
            assert b["text"].shape == (8, 64)  # smallest bucket
            assert b["attention_mask"].shape == (8, 64)
        seen = sum(int((b["emotion"] != -1).sum()) for b in batches)
        assert seen == sizes["val"]

    def test_freeze_then_finetune(self, meld_like_root, tmp_path):
        root, _ = meld_like_root
        tok = ToyWhitespaceTokenizer(vocab_size=SMALL_ROBERTA.vocab_size)
        train_ds = TextFeatureDataset("train", tok, data_root=root)
        val_ds = TextFeatureDataset("val", tok, data_root=root)
        train_b = TextBatcher(train_ds, batch_size=8, shuffle=True, seed=0)
        val_b = TextBatcher(val_ds, batch_size=8)

        cfg = _text_config(tmp_path, epochs=3, num_frozen=2)
        model = TextERC(SMALL_ROBERTA)
        solver = FESolver(
            model, cfg, backbone_key="roberta",
            batch_to_inputs=lambda b: (b["text"], b["attention_mask"]),
        )

        # manual two-epoch check of freezing semantics
        example = next(iter(train_b))
        state = solver.init_state(example, steps_per_epoch=len(train_b))
        backbone_before = jax.tree.map(np.asarray, state["params"]["roberta"])
        head_before = jax.tree.map(np.asarray, state["params"]["classifier_head"])

        rng = jax.random.PRNGKey(0)
        state, _ = solver.train_epoch(state, train_b, epoch=0, rng=rng)  # frozen
        backbone_mid = state["params"]["roberta"]
        diff_backbone = max(
            float(np.abs(a - np.asarray(b)).max())
            for a, b in zip(jax.tree.leaves(backbone_before), jax.tree.leaves(backbone_mid))
        )
        assert diff_backbone == 0.0  # backbone untouched in frozen phase
        diff_head = max(
            float(np.abs(a - np.asarray(b)).max())
            for a, b in zip(jax.tree.leaves(head_before), jax.tree.leaves(state["params"]["classifier_head"]))
        )
        assert diff_head > 0.0  # head trained

        state, _ = solver.train_epoch(state, train_b, epoch=2, rng=rng)  # unfrozen
        diff_backbone2 = max(
            float(np.abs(a - np.asarray(b)).max())
            for a, b in zip(jax.tree.leaves(backbone_before), jax.tree.leaves(state["params"]["roberta"]))
        )
        assert diff_backbone2 > 0.0  # backbone now training

    def test_full_fit_and_test(self, meld_like_root, tmp_path):
        root, _ = meld_like_root
        tok = ToyWhitespaceTokenizer(vocab_size=SMALL_ROBERTA.vocab_size)
        train_b = TextBatcher(TextFeatureDataset("train", tok, data_root=root), batch_size=8, shuffle=True)
        val_b = TextBatcher(TextFeatureDataset("val", tok, data_root=root), batch_size=8)
        cfg = _text_config(tmp_path, epochs=2, num_frozen=1)
        solver = FESolver(
            TextERC(SMALL_ROBERTA), cfg, backbone_key="roberta",
            batch_to_inputs=lambda b: (b["text"], b["attention_mask"]),
        )
        state, history = solver.fit(train_b, val_b)
        assert len(history["loss_values"]) == 2
        result = solver.test(val_b, state["params"])
        assert 0.0 <= result["accuracy"] <= 1.0
        import os

        assert os.path.exists(cfg.checkpoint.save_path)


class TestWav2Vec2Pipeline:
    def test_dataset_and_batcher(self, meld_like_root_with_wavs):
        root, sizes = meld_like_root_with_wavs
        ds = Wav2Vec2FeatureDataset("val", data_root=root)
        assert len(ds) == sizes["val"]
        batcher = Wav2Vec2Batcher(ds, batch_size=4, seconds_buckets=(1.0, 2.0))
        for b in batcher:
            assert b["audio"].shape == (4, 16000)  # 1 s bucket fits 0.75 s clips
            assert (b["lengths"] > 0).all()

    def test_waveform_batch_matches_per_file(self, meld_like_root_with_wavs, monkeypatch):
        """waveform_batch (native thread-pooled decoder, e2e host-prep hot
        path) must equal the per-file reader exactly, and its stdlib
        fallback must equal the native path."""
        root, _ = meld_like_root_with_wavs
        ds = Wav2Vec2FeatureDataset("val", data_root=root)
        idx = np.arange(min(6, len(ds)))
        width = 16000

        buf, lengths = ds.waveform_batch(idx, width)
        assert buf.shape == (len(idx), width) and buf.dtype == np.float32
        for k, i in enumerate(idx):
            w = ds.waveform(int(i))[:width]
            assert lengths[k] == len(w)
            np.testing.assert_array_equal(buf[k, : len(w)], w)
            np.testing.assert_array_equal(buf[k, len(w):], 0.0)

        from mer_tpu.data import native_wavio

        monkeypatch.setattr(native_wavio, "available", lambda: False)
        buf2, lengths2 = ds.waveform_batch(idx, width)
        np.testing.assert_array_equal(buf2, buf)
        np.testing.assert_array_equal(lengths2, lengths)

    def test_one_epoch_training(self, meld_like_root_with_wavs, tmp_path):
        root, _ = meld_like_root_with_wavs
        train_b = Wav2Vec2Batcher(
            Wav2Vec2FeatureDataset("train", data_root=root), batch_size=4, seconds_buckets=(1.0,)
        )
        val_b = Wav2Vec2Batcher(
            Wav2Vec2FeatureDataset("val", data_root=root), batch_size=4, seconds_buckets=(1.0,)
        )
        cfg = Config(
            {
                "checkpoint": {"save_path": str(tmp_path / "w2v" / "c.ckpt"), "save_checkpoint": True},
                "solver": {
                    "loss_fn": "CE", "balance_classes": False, "num_frozen_epochs": 1,
                    "finetuning": {"warmup_epochs": 1, "lr": 1e-4, "weight_decay": 5e-5},
                    "frozen": {"lr": 1e-3, "weight_decay": 0.01},
                    "epochs": 1,
                    "early_stopping": {"enabled": True, "patience": 3, "restore_best_weights": True},
                },
                "wandb": {"enabled": False},
            }
        )
        solver = FESolver(
            AudioERC(SMALL_W2V), cfg, backbone_key="wav2vec2",
            batch_to_inputs=w2v_batch_to_inputs,
        )
        state, history = solver.fit(train_b, val_b)
        assert np.isfinite(history["loss_values"][0])


class TestMelPipeline:
    def test_dataset_spectrograms(self, meld_like_root_with_wavs, tmp_path):
        root, _ = meld_like_root_with_wavs
        cfg = _mel_config(tmp_path, root)
        ds = MelFeatureDataset("val", cfg, data_root=root)
        spec = ds.spectrogram_batch(np.arange(3))
        assert spec.shape == (3, 101, 128, 3)  # 1 s max_duration -> 101 frames
        assert float(spec.max()) <= 1.0 and float(spec.min()) >= 0.0

    def test_mel_solver_trains_and_exports(self, meld_like_root_with_wavs, tmp_path):
        root, _ = meld_like_root_with_wavs
        cfg = _mel_config(tmp_path, root, epochs=1)
        train_ds = MelFeatureDataset("train", cfg, data_root=root)
        val_ds = MelFeatureDataset("val", cfg, data_root=root)
        model = AudioMelFeatureExtractor(embedding_size=16)
        solver = MelSolver(model, cfg, train_ds, val_ds, seed=0)
        state, history = solver.fit()
        assert np.isfinite(history["loss_values"][0])
        emb = solver.export_embeddings(val_ds, state.params, batch_size=4)
        assert emb.shape == (len(val_ds), 16)
        np.testing.assert_allclose(np.linalg.norm(emb, axis=1), 1.0, rtol=1e-4)


    def test_device_rows_matches_host_path(self, meld_like_root_with_wavs, tmp_path):
        """The zero-sync device-rows hard-mining path must train identically
        to the host-index path (same sampler stream, same selections)."""
        root, _ = meld_like_root_with_wavs
        losses = []
        for device_mining in [True, False]:
            cfg = _mel_config(tmp_path, root, epochs=1)
            cfg = cfg.override(solver__device_mining=device_mining)
            train_ds = MelFeatureDataset("train", cfg, data_root=root)
            val_ds = MelFeatureDataset("val", cfg, data_root=root)
            solver = MelSolver(AudioMelFeatureExtractor(embedding_size=16), cfg, train_ds, val_ds, seed=0)
            state = solver.init_state()
            state, loss = solver.train_epoch(state, 0, jax.random.PRNGKey(7))
            losses.append(loss)
        np.testing.assert_allclose(losses[0], losses[1], rtol=1e-5)


class TestMinerAdvances:
    def test_mining_rng_advances_across_steps(self, meld_like_root_with_wavs, tmp_path):
        """Regression: the solver must reuse ONE miner so the sampler RNG
        advances — a fresh fixed-seed miner per step would mine the identical
        candidate pool every step (reference advances global random state,
        audio_mel/dataset.py:202-358)."""
        root, _ = meld_like_root_with_wavs
        cfg = _mel_config(tmp_path, root, epochs=1)
        train_ds = MelFeatureDataset("train", cfg, data_root=root)
        val_ds = MelFeatureDataset("val", cfg, data_root=root)
        solver = MelSolver(AudioMelFeatureExtractor(embedding_size=16), cfg, train_ds, val_ds, seed=0)
        state = solver.init_state()
        m1 = solver._miner(train_ds, state.params)
        t1 = m1.mine(4, "random")
        m2 = solver._miner(train_ds, state.params)
        assert m2 is m1  # persistent, not re-created
        t2 = m2.mine(4, "random")
        assert any(not np.array_equal(a, b) for a, b in zip(t1, t2)), (
            "two consecutive mining calls returned identical triplets — RNG reset"
        )


class TestStageChaining:
    """Full pipeline contract: stage-1 training + export feeds stage-2 fusion
    through the on-disk artifact layout (reference C24->C25->C27->C29)."""

    def test_mel_export_feeds_fusion_training(self, meld_like_root_with_wavs, tmp_path):
        root, _ = meld_like_root_with_wavs
        cfg = _mel_config(tmp_path, root, epochs=1)
        cfg = cfg.override(DEBUG__num_samples=10_000)  # use all synthetic rows

        # stage 1c: train briefly and export embeddings for every split
        model = AudioMelFeatureExtractor(embedding_size=16)
        solver = MelSolver(
            model, cfg,
            MelFeatureDataset("train", cfg, data_root=root),
            MelFeatureDataset("val", cfg, data_root=root),
        )
        state, _ = solver.fit()

        from mer_tpu.core import save_embeddings

        emb_dir = tmp_path / "embeddings" / "audio_mel"
        for mode in ["train", "val"]:
            ds = MelFeatureDataset(mode, cfg, data_root=root)
            table = solver.export_embeddings(ds, state.params, batch_size=4)
            save_embeddings(emb_dir / f"{mode}.pkl", table)

        # stage 2: fusion consumes the artifacts (same table on both modality
        # slots; model dims follow the artifact dim)
        from mer_tpu.data import FusionBatcher, FusionDataset
        from mer_tpu.models import M2FNet
        from mer_tpu.train import Solver

        fusion_cfg = Config(
            {
                "embeddings": {"text": str(emb_dir), "audio": str(emb_dir)},
                "checkpoint": {"save_path": str(tmp_path / "fusion.ckpt"), "save_checkpoint": False},
                "solver": {
                    "lr": 1e-3, "weight_decay": 0.0, "epochs": 1,
                    "scheduler": {"enabled": False},
                    "early_stopping": {"enabled": False},
                },
                "wandb": {"enabled": False},
                "tpu": {"seed": 0},
            }
        )
        fusion_model = M2FNet(
            d_model_audio=16, d_model_text=16, d_model_fam=16,
            n_head_audio=2, n_head_text=2, n_head_fam=2,
            n_layers_audio=1, n_layers_text=1, n_layers_fam=1,
            hidden_size_classifier=16,
        )
        train_b = FusionBatcher(FusionDataset("train", fusion_cfg, data_root=root), 4, shuffle=True)
        val_b = FusionBatcher(FusionDataset("val", fusion_cfg, data_root=root), 4)
        fusion_solver = Solver(fusion_model, fusion_cfg)
        fstate, history = fusion_solver.fit(train_b, val_b)
        assert np.isfinite(history["loss_values"][0])
        result = fusion_solver.test(val_b, fstate.params)
        assert 0.0 <= result["weighted_f1"] <= 1.0


class TestAsyncMining:
    def test_async_epoch_trains(self, meld_like_root_with_wavs, tmp_path):
        root, _ = meld_like_root_with_wavs
        cfg = _mel_config(tmp_path, root, epochs=1)
        cfg = cfg.override(solver__async_mining=True)
        train_ds = MelFeatureDataset("train", cfg, data_root=root)
        val_ds = MelFeatureDataset("val", cfg, data_root=root)
        solver = MelSolver(AudioMelFeatureExtractor(embedding_size=16), cfg, train_ds, val_ds, seed=0)
        assert solver.async_mining
        state, history = solver.fit()
        assert np.isfinite(history["loss_values"][0])


class TestWav2Vec2Bucketing:
    def test_header_lengths_match_data(self, meld_like_root_with_wavs):
        root, _ = meld_like_root_with_wavs
        ds = Wav2Vec2FeatureDataset("val", data_root=root)
        lengths = ds.waveform_lengths()
        for i in range(min(5, len(ds))):
            assert lengths[i] == len(ds.waveform(i))

    def test_sorted_batches_cover_all(self, meld_like_root_with_wavs):
        root, sizes = meld_like_root_with_wavs
        ds = Wav2Vec2FeatureDataset("train", data_root=root)
        batcher = Wav2Vec2Batcher(ds, batch_size=4, shuffle=True, seed=0,
                                  seconds_buckets=(0.5, 1.0), sort_by_length=True)
        seen = sum(int((b["emotion"] != -1).sum()) for b in batcher)
        assert seen == sizes["train"]


class TestAugmentedMelPath:
    def test_augmentation_factor_streams_waveforms(self, meld_like_root_with_wavs, tmp_path):
        """augmentation_factor > 1 uses the on-the-fly augment path (no HBM
        cache) and produces valid, clip-dependent spectrograms."""
        root, _ = meld_like_root_with_wavs
        cfg = _mel_config(tmp_path, root, epochs=1)
        cfg = cfg.override(AUDIO__augmentation_factor=3)
        ds = MelFeatureDataset("train", cfg, data_root=root)
        ds.build_device_cache()
        assert ds._device_cache is None  # augmented train split: no static cache

        key = jax.random.PRNGKey(0)
        spec1 = np.asarray(ds.spectrogram_batch(np.arange(4), key=key))
        spec2 = np.asarray(ds.spectrogram_batch(np.arange(4), key=jax.random.PRNGKey(9)))
        assert spec1.shape == (4, 101, 128, 3)
        assert np.isfinite(spec1).all()
        assert spec1.min() >= 0.0 and spec1.max() <= 1.0
        # different keys -> different augmented variants (some clip augmented)
        assert not np.allclose(spec1, spec2)

    def test_val_split_never_augments(self, meld_like_root_with_wavs, tmp_path):
        root, _ = meld_like_root_with_wavs
        cfg = _mel_config(tmp_path, root, epochs=1)
        cfg = cfg.override(AUDIO__augmentation_factor=3)
        ds = MelFeatureDataset("val", cfg, data_root=root)
        s1 = np.asarray(ds.spectrogram_batch(np.arange(3), key=jax.random.PRNGKey(1)))
        s2 = np.asarray(ds.spectrogram_batch(np.arange(3), key=jax.random.PRNGKey(2)))
        np.testing.assert_array_equal(s1, s2)


class TestClassWeights:
    def test_balanced_weights_path(self, meld_like_root, tmp_path):
        from mer_tpu.objectives import balanced_class_weights

        root, _ = meld_like_root
        tok = ToyWhitespaceTokenizer(vocab_size=SMALL_ROBERTA.vocab_size)
        ds = TextFeatureDataset("train", tok, data_root=root)
        weights = balanced_class_weights(ds.get_labels())
        assert weights.shape == (7,)
        train_b = TextBatcher(ds, batch_size=8, shuffle=True)
        val_b = TextBatcher(TextFeatureDataset("val", tok, data_root=root), batch_size=8)
        cfg = _text_config(tmp_path, epochs=1, num_frozen=1)
        solver = FESolver(
            TextERC(SMALL_ROBERTA), cfg, backbone_key="roberta",
            batch_to_inputs=lambda b: (b["text"], b["attention_mask"]),
            class_weights=weights,
        )
        state, history = solver.fit(train_b, val_b)
        assert np.isfinite(history["loss_values"][0])


class TestScannedExport:
    def test_scanned_export_equals_per_batch_loop(self, meld_like_root):
        """fe_common.scanned_export_table (the exporters' default: one scan
        dispatch per shape bucket, one fetch total) writes the same [N, D]
        table as the reference-shaped per-batch loop
        (reference text/embeddings.py:69-93)."""
        import os
        import sys

        sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "src", "feature_extractors"))
        from fe_common import export_embedding_table, scanned_export_table

        root, _ = meld_like_root
        tok = ToyWhitespaceTokenizer(vocab_size=SMALL_ROBERTA.vocab_size)
        ds = TextFeatureDataset("train", tok, data_root=root)
        model = TextERC(SMALL_ROBERTA)
        dl = TextBatcher(ds, batch_size=4, buckets=(8, 16, 32, 64))
        b0 = next(iter(dl))
        params = model.init(
            jax.random.PRNGKey(0), jnp.asarray(b0["text"]), jnp.asarray(b0["attention_mask"])
        )["params"]
        embed = jax.jit(
            lambda p, ids, m: model.apply({"params": p}, ids, m, method=TextERC.embed)
        )

        batches = []
        for b in TextBatcher(ds, batch_size=4, buckets=(8, 16, 32, 64)):
            emb = embed(params, jnp.asarray(b["text"]), jnp.asarray(b["attention_mask"]))
            valid = b["emotion"] != -1
            batches.append((b["idx"][valid], np.asarray(emb)[valid]))
        ref = export_embedding_table(batches, len(ds), model.cfg.hidden_size)

        got = scanned_export_table(
            embed, params, TextBatcher(ds, batch_size=4, buckets=(8, 16, 32, 64)),
            ("text", "attention_mask"), len(ds), model.cfg.hidden_size,
        )
        assert got.shape == ref.shape
        np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-6)
