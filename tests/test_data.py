"""Tests for the fusion data pipeline: collate semantics, bucketing, prefetch."""

import numpy as np

import jax

from mer_tpu.data import (
    DEFAULT_LENGTH_BUCKETS,
    FusionBatcher,
    SyntheticFusionDataset,
    collate_dialogues,
    pick_bucket,
    prefetch,
)


def _dialogue(u, d=8, seed=0, base=0.0):
    rng = np.random.default_rng(seed)
    return {
        "dialogue_id": seed,
        "text": rng.normal(size=(u, d)).astype(np.float32) + base,
        "audio": rng.normal(size=(u, d)).astype(np.float32) + base,
        "emotion": rng.integers(0, 7, size=u).astype(np.int64),
    }


class TestCollate:
    def test_padding_semantics(self):
        """Features pad with 0, labels with -1, mask True=pad
        (reference src/dataset.py:71-89)."""
        ds = [_dialogue(3, seed=1), _dialogue(5, seed=2)]
        batch = collate_dialogues(ds, batch_size=2, buckets=(8,))
        assert batch["text"].shape == (2, 8, 8)
        assert batch["emotion"].shape == (2, 8)
        np.testing.assert_array_equal(batch["emotion"][0, 3:], -1)
        np.testing.assert_array_equal(batch["text"][0, 3:], 0.0)
        assert batch["padding_mask"][0, 3:].all()
        assert not batch["padding_mask"][0, :3].any()
        np.testing.assert_array_equal(batch["emotion"][0, :3], ds[0]["emotion"])

    def test_batch_padding_keeps_one_valid_key(self):
        ds = [_dialogue(3, seed=1)]
        batch = collate_dialogues(ds, batch_size=4, buckets=(8,))
        assert batch["text"].shape[0] == 4
        # all-padding rows get one attendable key but keep label -1
        assert (batch["emotion"][1:] == -1).all()
        assert not batch["padding_mask"][1:, 0].any()

    def test_bucket_selection(self):
        assert pick_bucket(3, DEFAULT_LENGTH_BUCKETS) == 8
        assert pick_bucket(9, DEFAULT_LENGTH_BUCKETS) == 16
        assert pick_bucket(33, DEFAULT_LENGTH_BUCKETS) == 33
        assert pick_bucket(40, DEFAULT_LENGTH_BUCKETS) == 40  # escape hatch


class TestBatcher:
    def test_covers_all_dialogues_with_static_shapes(self):
        ds = SyntheticFusionDataset(n_dialogues=37, d_text=8, d_audio=8, seed=0)
        batcher = FusionBatcher(ds, batch_size=8, shuffle=True, seed=1)
        seen = 0
        shapes = set()
        for batch in batcher:
            assert batch["text"].shape[0] == 8
            shapes.add(batch["text"].shape)
            seen += int((batch["emotion"] != -1).any(axis=1).sum())
        assert seen == 37
        assert len(batcher) == 5
        # bucketing keeps the number of distinct shapes small
        assert len(shapes) <= len(DEFAULT_LENGTH_BUCKETS)

    def test_label_multiset_preserved(self):
        ds = SyntheticFusionDataset(n_dialogues=20, d_text=4, d_audio=4, seed=3)
        batcher = FusionBatcher(ds, batch_size=4, shuffle=True, seed=2)
        labels = np.concatenate([b["emotion"][b["emotion"] != -1] for b in batcher])
        np.testing.assert_array_equal(np.sort(labels), np.sort(ds.get_labels()))

    def test_shuffle_changes_order_between_epochs(self):
        ds = SyntheticFusionDataset(n_dialogues=32, d_text=4, d_audio=4, seed=4)
        batcher = FusionBatcher(ds, batch_size=4, shuffle=True, seed=3, sort_by_length=False)
        e1 = [b["emotion"].tobytes() for b in batcher]
        e2 = [b["emotion"].tobytes() for b in batcher]
        assert e1 != e2

    def test_no_shuffle_deterministic(self):
        ds = SyntheticFusionDataset(n_dialogues=16, d_text=4, d_audio=4, seed=5)
        batcher = FusionBatcher(ds, batch_size=4, shuffle=False)
        e1 = [b["emotion"].tobytes() for b in batcher]
        e2 = [b["emotion"].tobytes() for b in batcher]
        assert e1 == e2


class TestPrefetch:
    def test_yields_device_arrays_in_order(self):
        ds = SyntheticFusionDataset(n_dialogues=10, d_text=4, d_audio=4, seed=6)
        batcher = FusionBatcher(ds, batch_size=4, shuffle=False)
        host = list(batcher)
        dev = list(prefetch(batcher, buffer_size=2))
        assert len(host) == len(dev)
        for h, d in zip(host, dev):
            assert isinstance(d["text"], jax.Array)
            np.testing.assert_array_equal(h["emotion"], np.asarray(d["emotion"]))

    def test_propagates_errors(self):
        def bad():
            yield {"x": np.zeros(2)}
            raise RuntimeError("boom")

        import pytest

        with pytest.raises(RuntimeError, match="boom"):
            list(prefetch(bad()))

    def test_sharded_placement(self):
        from jax.sharding import NamedSharding, PartitionSpec as P

        from mer_tpu.parallel import make_mesh

        mesh = make_mesh(dp=8, tp=1)
        sharding = NamedSharding(mesh, P("dp"))
        ds = SyntheticFusionDataset(n_dialogues=16, d_text=4, d_audio=4, seed=7)
        batcher = FusionBatcher(ds, batch_size=8, shuffle=False)
        for batch in prefetch(batcher, sharding=sharding):
            assert batch["text"].sharding.is_equivalent_to(sharding, batch["text"].ndim)


class TestFusionDatasetArtifacts:
    """Stage-1 -> stage-2 contract: FusionDataset loads exported pickles and
    aligns rows to the MELD table (reference src/dataset.py:14-65)."""

    def test_load_and_align(self, meld_like_root, tmp_path):
        from mer_tpu.core import Config, get_text, save_embeddings
        from mer_tpu.data import FusionDataset

        root, sizes = meld_like_root
        n = sizes["val"]
        rng = np.random.default_rng(0)
        # row i of each table encodes i so alignment is checkable
        text_emb = np.tile(np.arange(n, dtype=np.float32)[:, None], (1, 8))
        audio_emb = np.tile(np.arange(n, dtype=np.float32)[:, None], (1, 6)) + 0.5
        save_embeddings(tmp_path / "text" / "val.pkl", text_emb)
        save_embeddings(tmp_path / "audio" / "val.pkl", audio_emb)

        config = Config({"embeddings": {"text": str(tmp_path / "text"), "audio": str(tmp_path / "audio")}})
        ds = FusionDataset("val", config, data_root=root)

        df = get_text("val", data_root=root)
        total_utts = sum(d["emotion"].shape[0] for d in ds._dialogues)
        assert total_utts == n
        for d in ds._dialogues:
            rows = df.index[df["Dialogue_ID"] == d["dialogue_id"]].to_numpy()
            # utterances sorted by Utterance_ID within dialogue
            expected = df.loc[rows].sort_values("Utterance_ID").index.to_numpy()
            np.testing.assert_array_equal(d["text"][:, 0], expected.astype(np.float32))
            np.testing.assert_array_equal(d["audio"][:, 0], expected.astype(np.float32) + 0.5)

    def test_row_count_mismatch_raises(self, meld_like_root, tmp_path):
        import pytest

        from mer_tpu.core import Config, save_embeddings
        from mer_tpu.data import FusionDataset

        root, sizes = meld_like_root
        save_embeddings(tmp_path / "t" / "val.pkl", np.zeros((sizes["val"] + 1, 4), np.float32))
        save_embeddings(tmp_path / "a" / "val.pkl", np.zeros((sizes["val"], 4), np.float32))
        config = Config({"embeddings": {"text": str(tmp_path / "t"), "audio": str(tmp_path / "a")}})
        with pytest.raises(ValueError, match="mismatch"):
            FusionDataset("val", config, data_root=root)

    def test_missing_artifact_error_is_actionable(self, meld_like_root, tmp_path):
        import pytest

        from mer_tpu.core import Config
        from mer_tpu.data import FusionDataset

        root, _ = meld_like_root
        config = Config({"embeddings": {"text": str(tmp_path / "nope"), "audio": str(tmp_path / "nope")}})
        with pytest.raises(FileNotFoundError, match="feature-extractor exporters"):
            FusionDataset("val", config, data_root=root)


class TestDeviceFusionBatcher:
    def test_matches_host_batcher_semantics(self):
        from mer_tpu.data import DeviceFusionBatcher

        ds = SyntheticFusionDataset(n_dialogues=21, d_text=8, d_audio=8, seed=11)
        host = FusionBatcher(ds, batch_size=8, shuffle=False, sort_by_length=True)
        dev = DeviceFusionBatcher(ds, batch_size=8, shuffle=False, sort_by_length=True)
        hb, db = list(host), list(dev)
        assert len(hb) == len(db)
        for h, d in zip(hb, db):
            assert isinstance(d["text"], jax.Array)
            np.testing.assert_array_equal(h["emotion"], np.asarray(d["emotion"]))
            np.testing.assert_allclose(h["text"], np.asarray(d["text"]), atol=1e-6)
            np.testing.assert_array_equal(h["padding_mask"], np.asarray(d["padding_mask"]))

    def test_shuffle_and_coverage(self):
        from mer_tpu.data import DeviceFusionBatcher

        ds = SyntheticFusionDataset(n_dialogues=19, d_text=4, d_audio=4, seed=12)
        dev = DeviceFusionBatcher(ds, batch_size=4, shuffle=True, seed=5)
        labels = np.concatenate([np.asarray(b["emotion"])[np.asarray(b["emotion"]) != -1] for b in dev])
        np.testing.assert_array_equal(np.sort(labels), np.sort(ds.get_labels()))

    def test_trains_with_solver(self, tmp_path):
        from mer_tpu.core import Config
        from mer_tpu.data import DeviceFusionBatcher
        from mer_tpu.models import M2FNet
        from mer_tpu.train import Solver

        cfg = Config(
            {
                "checkpoint": {"save_checkpoint": False},
                "solver": {
                    "lr": 1e-3, "weight_decay": 0.0, "epochs": 4,
                    "scheduler": {"enabled": False}, "early_stopping": {"enabled": False},
                },
                "wandb": {"enabled": False},
                "tpu": {"seed": 0},
            }
        )
        # dropout 0 so the loss trend is deterministic (2 steps/epoch is too
        # few to average out dropout noise)
        model = M2FNet(
            d_model_audio=8, d_model_text=8, d_model_fam=8,
            n_head_audio=2, n_head_text=2, n_head_fam=2,
            n_layers_audio=1, n_layers_text=1, n_layers_fam=1,
            hidden_size_classifier=8, dropout=0.0,
        )
        ds = SyntheticFusionDataset(n_dialogues=16, d_text=8, d_audio=8, seed=13)
        train_b = DeviceFusionBatcher(ds, batch_size=8, shuffle=True)
        val_b = DeviceFusionBatcher(ds, batch_size=8)
        solver = Solver(model, cfg)
        state, history = solver.fit(train_b, val_b)
        assert history["loss_values"][-1] < history["loss_values"][0]


class TestProcessSharding:
    """Multi-host data loading: every process must see a disjoint, exhaustive
    round-robin shard of the identical global batch list
    (mer_tpu/data/process_sharding.py)."""

    def _coverage(self, make_batcher, n_processes, id_key="emotion"):
        """Collect per-process batches; return (per-process id lists, union)."""
        per_proc = []
        for p in range(n_processes):
            b = make_batcher(p, n_processes)
            sigs = [bytes(np.asarray(batch[id_key]).tobytes()) for batch in b]
            assert len(sigs) == len(b)  # __len__ reflects the local shard
            per_proc.append(sigs)
        return per_proc

    def _assert_partition(self, per_proc, global_sigs):
        flat = [s for sigs in per_proc for s in sigs]
        assert len(flat) == len(set(flat)), "processes overlap"
        assert sorted(flat) == sorted(global_sigs), "union != global batch list"

    def test_fusion_batcher_partition(self):
        ds = SyntheticFusionDataset(n_dialogues=37, d_text=8, d_audio=8, seed=0)
        global_sigs = [
            bytes(np.asarray(b["emotion"]).tobytes())
            for b in FusionBatcher(ds, batch_size=4, shuffle=True, seed=9)
        ]
        per_proc = self._coverage(
            lambda p, n: FusionBatcher(
                ds, batch_size=4, shuffle=True, seed=9, process_index=p, process_count=n
            ),
            n_processes=4,
        )
        self._assert_partition(per_proc, global_sigs)

    def test_device_fusion_batcher_partition(self):
        from mer_tpu.data import DeviceFusionBatcher

        ds = SyntheticFusionDataset(n_dialogues=21, d_text=8, d_audio=8, seed=1)
        global_sigs = [
            bytes(np.asarray(b["emotion"]).tobytes())
            for b in DeviceFusionBatcher(ds, batch_size=4, shuffle=True, seed=9)
        ]
        per_proc = self._coverage(
            lambda p, n: DeviceFusionBatcher(
                ds, batch_size=4, shuffle=True, seed=9, process_index=p, process_count=n
            ),
            n_processes=3,
        )
        self._assert_partition(per_proc, global_sigs)

    def test_text_batcher_partition(self, meld_like_root):
        from mer_tpu.data import TextBatcher, TextFeatureDataset, ToyWhitespaceTokenizer

        root, _ = meld_like_root
        ds = TextFeatureDataset("train", ToyWhitespaceTokenizer(), data_root=root)
        mk = lambda p, n: TextBatcher(
            ds, batch_size=4, shuffle=True, seed=9, process_index=p, process_count=n
        )
        global_sigs = [
            bytes(np.asarray(b["idx"]).tobytes())
            for b in TextBatcher(ds, batch_size=4, shuffle=True, seed=9)
        ]
        per_proc = self._coverage(mk, n_processes=2, id_key="idx")
        self._assert_partition(per_proc, global_sigs)

    def test_wav2vec2_batcher_partition(self, meld_like_root_with_wavs):
        from mer_tpu.data import Wav2Vec2Batcher, Wav2Vec2FeatureDataset

        root, _ = meld_like_root_with_wavs
        ds = Wav2Vec2FeatureDataset("train", data_root=root)
        global_sigs = [
            bytes(np.asarray(b["idx"]).tobytes())
            for b in Wav2Vec2Batcher(ds, batch_size=4, shuffle=True, seed=9, seconds_buckets=(1.0,))
        ]
        per_proc = self._coverage(
            lambda p, n: Wav2Vec2Batcher(
                ds, batch_size=4, shuffle=True, seed=9, seconds_buckets=(1.0,),
                process_index=p, process_count=n,
            ),
            n_processes=3,
            id_key="idx",
        )
        self._assert_partition(per_proc, global_sigs)

    def test_resolve_process_validation(self):
        import pytest

        from mer_tpu.data import resolve_process

        assert resolve_process(0, 1) == (0, 1)
        assert resolve_process(2, 4) == (2, 4)
        assert resolve_process(None, None) == (0, 1)  # single-process jax runtime
        with pytest.raises(ValueError):
            resolve_process(4, 4)
        with pytest.raises(ValueError):
            resolve_process(0, 0)
