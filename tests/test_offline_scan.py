"""ScanPredictor (serving/offline.py): scanned whole-split inference must
produce exactly the per-batch dispatch results, across mixed bucket shapes
and for both the Flax forward and the int8 engine."""

import numpy as np

import jax
import jax.numpy as jnp

from mer_tpu.models import M2FNet
from mer_tpu.serving import M2FNetInt8, ScanPredictor, quantize_m2fnet

D = 32


def _model():
    return M2FNet(
        d_model_audio=D, d_model_text=D, d_model_fam=D,
        n_head_audio=4, n_head_text=4, n_head_fam=4,
        n_layers_audio=1, n_layers_text=1, n_layers_fam=1,
        hidden_size_classifier=D, dropout=0.0, scan_layers=True,
    )


def _batches(seed=0):
    """Mixed bucket widths (8 and 16) interleaved, like a bucketed epoch."""
    rng = np.random.default_rng(seed)
    out = []
    for i, u in enumerate([8, 16, 8, 16, 8]):
        emotion = rng.integers(0, 7, size=(4, u)).astype(np.int32)
        emotion[:, u - 2 :] = -1
        out.append(
            {
                "text": rng.normal(size=(4, u, D)).astype(np.float32),
                "audio": rng.normal(size=(4, u, D)).astype(np.float32),
                "padding_mask": emotion == -1,
            }
        )
    return out


class TestScanPredictor:
    def test_matches_per_batch_flax(self):
        model = _model()
        batches = _batches()
        b0 = batches[0]
        params = model.init(
            jax.random.PRNGKey(0),
            jnp.asarray(b0["text"]), jnp.asarray(b0["audio"]), jnp.asarray(b0["padding_mask"]),
        )["params"]

        def predict(p, b):
            return jnp.argmax(
                model.apply({"params": p}, b["text"], b["audio"], b["padding_mask"]), -1
            )

        per_batch = [
            np.asarray(jax.jit(predict)(params, jax.tree.map(jnp.asarray, b))) for b in batches
        ]
        scanned = ScanPredictor(predict)(params, batches)
        assert len(scanned) == len(batches)
        for want, got in zip(per_batch, scanned):
            np.testing.assert_array_equal(want, got)

    def test_matches_per_batch_int8(self):
        model = _model()
        batches = _batches(seed=3)
        b0 = batches[0]
        params = model.init(
            jax.random.PRNGKey(1),
            jnp.asarray(b0["text"]), jnp.asarray(b0["audio"]), jnp.asarray(b0["padding_mask"]),
        )["params"]
        qp = quantize_m2fnet(params)
        server = M2FNetInt8(model)

        def predict(p, b):
            return jnp.argmax(server.apply(p, b["text"], b["audio"], b["padding_mask"]), -1)

        per_batch = [
            np.asarray(jax.jit(predict)(qp, jax.tree.map(jnp.asarray, b))) for b in batches
        ]
        scanned = ScanPredictor(predict)(qp, batches)
        for want, got in zip(per_batch, scanned):
            np.testing.assert_array_equal(want, got)

    def test_mesh_sharded_matches_single_device(self):
        """Data-parallel serving: staged arrays sharded over dp must give
        identical predictions to the unsharded path."""
        from mer_tpu.parallel import make_mesh

        mesh = make_mesh(dp=8)
        model = _model()
        rng = np.random.default_rng(7)
        batches = []
        for u in [8, 16, 8]:
            emotion = rng.integers(0, 7, size=(8, u)).astype(np.int32)
            emotion[:, u - 2 :] = -1
            batches.append(
                {
                    "text": rng.normal(size=(8, u, D)).astype(np.float32),
                    "audio": rng.normal(size=(8, u, D)).astype(np.float32),
                    "padding_mask": emotion == -1,
                }
            )
        b0 = batches[0]
        params = model.init(
            jax.random.PRNGKey(2),
            jnp.asarray(b0["text"]), jnp.asarray(b0["audio"]), jnp.asarray(b0["padding_mask"]),
        )["params"]

        def predict(p, b):
            return jnp.argmax(
                model.apply({"params": p}, b["text"], b["audio"], b["padding_mask"]), -1
            )

        single = ScanPredictor(predict)(params, batches)
        sharded_sp = ScanPredictor(predict, mesh=mesh)
        staged = sharded_sp.stage(batches)
        # the staged arrays really are dp-sharded (not fully replicated)
        some = staged[0][2]["text"]
        assert not some.sharding.is_fully_replicated
        assert "dp" in str(getattr(some.sharding, "spec", ""))
        sharded = sharded_sp.run_staged(params, staged, len(batches))
        for want, got in zip(single, sharded):
            np.testing.assert_array_equal(want, got)

    def test_program_cache_reused(self):
        model = _model()
        batches = _batches()
        b0 = batches[0]
        params = model.init(
            jax.random.PRNGKey(0),
            jnp.asarray(b0["text"]), jnp.asarray(b0["audio"]), jnp.asarray(b0["padding_mask"]),
        )["params"]

        def predict(p, b):
            return jnp.argmax(
                model.apply({"params": p}, b["text"], b["audio"], b["padding_mask"]), -1
            )

        sp = ScanPredictor(predict)
        sp(params, batches)
        misses_first = sp._run._cache_size()
        assert misses_first == 2  # one compiled program per bucket shape
        sp(params, batches)
        assert sp._run._cache_size() == misses_first  # second epoch reuses them

    def test_ragged_batch_sizes_grouped_separately(self):
        """A smaller final batch forms its own shape group and round-trips."""
        model = _model()
        batches = _batches()
        small = {k: v[:2] for k, v in batches[0].items()}
        batches = batches + [small]
        b0 = batches[0]
        params = model.init(
            jax.random.PRNGKey(0),
            jnp.asarray(b0["text"]), jnp.asarray(b0["audio"]), jnp.asarray(b0["padding_mask"]),
        )["params"]

        def predict(p, b):
            return jnp.argmax(
                model.apply({"params": p}, b["text"], b["audio"], b["padding_mask"]), -1
            )

        out = ScanPredictor(predict)(params, batches)
        assert out[-1].shape[0] == 2
        want = np.asarray(jax.jit(predict)(params, jax.tree.map(jnp.asarray, small)))
        np.testing.assert_array_equal(want, out[-1])


class TestRecollate:
    """recollate_batches (serving/offline.py): identity re-batching — merging
    same-shape batches into bigger serving batches must reproduce the
    per-batch predictions exactly (the batch axis is independent)."""

    def test_plan_round_trip(self):
        from mer_tpu.serving import recollate_batches, split_recollated

        batches = _batches()
        merged, plan = recollate_batches(batches, serving_batch=8)  # 2 per merge
        # 3 batches of u=8 -> 2 merged (8 + 4 rows); 2 of u=16 -> 1 merged
        assert len(merged) == 3
        fake_preds = [np.arange(int(m["text"].shape[0]))[:, None] + 100 * j
                      for j, m in enumerate(merged)]
        back = split_recollated(fake_preds, plan)
        assert len(back) == len(batches)
        off = {}
        for b, p in zip(batches, back):
            assert p.shape[0] == b["text"].shape[0]

    def test_predictions_identical(self):
        from mer_tpu.serving import ScanPredictor, recollate_batches, split_recollated

        model = _model()
        batches = _batches(seed=7)
        b0 = batches[0]
        params = model.init(
            jax.random.PRNGKey(0),
            jnp.asarray(b0["text"]), jnp.asarray(b0["audio"]), jnp.asarray(b0["padding_mask"]),
        )["params"]

        def predict(p, b):
            return jnp.argmax(
                model.apply({"params": p}, b["text"], b["audio"], b["padding_mask"]), -1
            )

        per_batch = ScanPredictor(predict)(params, batches)
        merged, plan = recollate_batches(batches, serving_batch=64)
        merged_preds = ScanPredictor(predict)(params, merged)
        back = split_recollated(merged_preds, plan)
        for want, got in zip(per_batch, back):
            np.testing.assert_array_equal(want, got)


class TestRecollateRagged:
    """Mixed batch sizes inside one shape group (e.g. a ragged tail batch):
    merges are capped by CUMULATIVE rows, not batch count (review finding:
    per_merge derived from the first batch's size let a small-first group
    blow far past serving_batch)."""

    def test_cumulative_row_cap(self):
        from mer_tpu.serving import recollate_batches, split_recollated

        batches = _batches()  # 3 of b=4 u=8 + 2 of b=4 u=16 (same trailing)
        small = {k: v[:1] for k, v in batches[0].items()}  # ragged b=1 FIRST
        mixed = [small] + batches
        merged, plan = recollate_batches(mixed, serving_batch=8)
        for m in merged:
            assert m["text"].shape[0] <= 8, m["text"].shape
        # round trip still exact
        fake = [np.arange(int(m["text"].shape[0])) + 1000 * j for j, m in enumerate(merged)]
        back = split_recollated(fake, plan)
        assert [p.shape[0] for p in back] == [b["text"].shape[0] for b in mixed]
        seen = sorted(np.concatenate([p % 1000 for p in back]).tolist())
        total = sum(b["text"].shape[0] for b in mixed)
        assert len(seen) == total

    def test_single_oversize_batch_kept_whole(self):
        from mer_tpu.serving import recollate_batches

        batches = _batches()
        merged, plan = recollate_batches(batches, serving_batch=2)  # < any batch
        assert len(merged) == len(batches)
        for b, (j, (s, e)) in zip(batches, plan):
            assert (s, e) == (0, b["text"].shape[0])

    def test_no_text_key_required(self):
        """Row counts derive from any key, not a hardcoded 'text' (ADVICE r3)."""
        from mer_tpu.serving import recollate_batches, split_recollated

        rng = np.random.default_rng(0)
        batches = [
            {"features": rng.normal(size=(3, 5)).astype(np.float32),
             "mask": np.ones((3, 5), bool)}
            for _ in range(4)
        ]
        merged, plan = recollate_batches(batches, serving_batch=6)
        assert len(merged) == 2 and all(m["features"].shape[0] == 6 for m in merged)
        fake = [np.arange(6), np.arange(6) + 100]
        back = split_recollated(fake, plan)
        assert [p.shape[0] for p in back] == [3, 3, 3, 3]
