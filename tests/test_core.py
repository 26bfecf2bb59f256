"""Tests for mer_tpu.core: config schema, MELD table loading, artifacts."""

import os
import pickle

import numpy as np
import pytest

from mer_tpu.core import (
    Config,
    EMOTION_LABELS,
    dialogue_index,
    get_text,
    get_utterance_with_context,
    load_config,
    load_embeddings,
    map_emotions,
    save_embeddings,
)

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


class TestConfig:
    def test_attribute_access(self):
        c = Config({"solver": {"lr": 5e-5, "scheduler": {"enabled": False}}})
        assert c.solver.lr == 5e-5
        assert c.solver.scheduler.enabled is False

    def test_get_path_default(self):
        c = Config({"a": {"b": 1}})
        assert c.get_path("a.b") == 1
        assert c.get_path("a.missing", 42) == 42

    def test_override(self):
        c = Config({"solver": {"lr": 1.0}})
        c2 = c.override(solver__lr=2.0)
        assert c.solver.lr == 1.0 and c2.solver.lr == 2.0

    def test_fusion_yaml_schema(self):
        """Our shipped fusion config has the reference's schema
        (reference src/config.yaml keys)."""
        c = load_config(os.path.join(REPO_ROOT, "src", "config.yaml"))
        assert c.model.AUDIO.embedding_size == 768
        assert c.model.TEXT.n_encoder_layers == 6
        assert c.model.FAM.n_layers == 5
        assert c.model.CLASSIFIER.output_size == 7
        assert c.solver.lr == 5e-5
        assert c.solver.early_stopping.patience == 3
        assert c.train.data_loader.batch_size == 32
        assert c.checkpoint.save_path
        assert c.embeddings.text and c.embeddings.audio


class TestGetText:
    def test_corrupted_rows_dropped_and_cp1252_fixed(self, meld_like_root):
        root, sizes = meld_like_root
        for mode in ["train", "val", "test"]:
            df = get_text(mode, data_root=root)
            assert len(df) == sizes[mode]
            assert list(df.columns) == ["Utterance", "Emotion", "Dialogue_ID", "Utterance_ID"]
            # contiguous index after filtering
            assert list(df.index) == list(range(len(df)))
            # cp1252 right-quote byte replaced
            assert not df["Utterance"].str.contains("\x92").any()
            assert df["Utterance"].str.contains("’").any()

        train = get_text("train", data_root=root)
        assert not (((train["Dialogue_ID"] == 125) & (train["Utterance_ID"] == 3)).any())

    def test_map_emotions(self, meld_like_root):
        root, _ = meld_like_root
        df = map_emotions(get_text("val", data_root=root))
        assert set(df["Emotion"].unique()).issubset(set(EMOTION_LABELS.values()))

    def test_context_window(self, meld_like_root):
        root, _ = meld_like_root
        df = get_text("train", data_root=root)
        # find a dialogue with >= 3 utterances
        counts = df.groupby("Dialogue_ID").size()
        dia = counts[counts >= 3].index[0]
        rows = df[df["Dialogue_ID"] == dia].sort_values("Utterance_ID")
        idx_first = rows.index[0]
        idx_mid = rows.index[1]
        idx_last = rows.index[-1]
        sep = "</s>"
        first = get_utterance_with_context(df, idx_first, sep)
        mid = get_utterance_with_context(df, idx_mid, sep)
        last = get_utterance_with_context(df, idx_last, sep)
        assert first.startswith(f"{sep} ") and first.count(sep) == 2
        assert mid.count(sep) == 2 and not mid.startswith(sep) and not mid.endswith(sep)
        assert last.endswith(f" {sep}") and last.count(sep) == 2

    def test_dialogue_index_sorted(self, meld_like_root):
        root, _ = meld_like_root
        df = get_text("val", data_root=root)
        index = dialogue_index(df)
        assert sum(len(v) for v in index.values()) == len(df)
        for dia, rows in index.items():
            utts = df.loc[rows, "Utterance_ID"].to_list()
            assert utts == sorted(utts)
            assert (df.loc[rows, "Dialogue_ID"] == dia).all()


class TestArtifacts:
    def test_roundtrip_numpy(self, tmp_path):
        path = tmp_path / "e" / "val.pkl"
        arr = np.random.default_rng(0).normal(size=(11, 16)).astype(np.float32)
        save_embeddings(path, arr, torch_compatible=False)
        out = load_embeddings(path)
        np.testing.assert_array_equal(arr, out)

    def test_roundtrip_torch_compatible(self, tmp_path):
        torch = pytest.importorskip("torch")
        path = tmp_path / "val.pkl"
        arr = np.random.default_rng(1).normal(size=(5, 8)).astype(np.float32)
        save_embeddings(path, arr, torch_compatible=True)
        with open(path, "rb") as f:
            obj = pickle.load(f)
        assert isinstance(obj, torch.Tensor)  # consumable by the reference's src/dataset.py
        np.testing.assert_allclose(load_embeddings(path), arr)

    def test_reads_reference_shipped_artifact(self):
        """The mounted reference ships embeddings/*/val.pkl tables
        ([1108, D], SURVEY.md C32) — our reader must ingest them."""
        ref = "/root/reference/embeddings/audio_mel/val.pkl"
        if not os.path.exists(ref):
            pytest.skip("reference artifacts not mounted")
        arr = load_embeddings(ref)
        assert arr.shape == (1108, 300)
        assert arr.dtype == np.float32
