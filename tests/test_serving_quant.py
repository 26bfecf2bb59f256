"""int8 serving engine vs the f32 Flax M2FNet.

Weight-only per-channel int8 + dynamic per-row activation quantization is a
numerics change, so these tests pin its error envelope: primitive-level
relative error, full-model logit agreement, and prediction agreement on a
trained-ish (learnable synthetic) model — the serving contract the reference
exercises through src/test.py.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mer_tpu.serving import (
    M2FNetInt8,
    int8_dense,
    quantize_m2fnet,
    quantize_weight,
    quantized_bytes,
)


class TestPrimitives:
    def test_quantize_weight_roundtrip(self):
        rng = np.random.default_rng(0)
        w = jnp.asarray(rng.normal(size=(64, 32)).astype(np.float32))
        q = quantize_weight(w)
        assert q["q"].dtype == jnp.int8 and q["q"].shape == (64, 32)
        assert q["scale"].shape == (1, 32)
        deq = q["q"].astype(jnp.float32) * q["scale"]
        # per-channel symmetric int8: max error is scale/2 per entry
        np.testing.assert_allclose(np.asarray(deq), np.asarray(w), atol=float(q["scale"].max()) / 2 + 1e-7)

    def test_int8_dense_relative_error(self):
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.normal(size=(128, 768)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(768, 768)).astype(np.float32) * 0.02)
        b = jnp.asarray(rng.normal(size=(768,)).astype(np.float32) * 0.01)
        want = x @ w + b
        got = int8_dense(x, quantize_weight(w), b)
        # normalize by the output scale (pointwise relative error explodes
        # near zero-crossings of a zero-mean GEMM)
        err = np.abs(np.asarray(got - want)) / float(np.asarray(want).std())
        assert float(np.median(err)) < 0.02
        assert float(err.max()) < 0.15

    def test_stacked_weight_layout(self):
        """Scan-stacked kernels [L, in, out] quantize with [L, 1, out] scales
        so lax.scan slices stay consistent."""
        rng = np.random.default_rng(2)
        w = jnp.asarray(rng.normal(size=(4, 16, 8)).astype(np.float32))
        q = quantize_weight(w)
        assert q["q"].shape == (4, 16, 8) and q["scale"].shape == (4, 1, 8)


def _small_m2fnet(scan_layers=False):
    from mer_tpu.models import M2FNet

    return M2FNet(
        d_model_audio=32, d_model_text=32, d_model_fam=32,
        n_head_audio=4, n_head_text=4, n_head_fam=4,
        n_layers_audio=2, n_layers_text=2, n_layers_fam=2,
        hidden_size_classifier=32, dropout=0.0, scan_layers=scan_layers,
    )


def _dialogue_batch(b=4, u=9, d=32, seed=0):
    rng = np.random.default_rng(seed)
    text = jnp.asarray(rng.normal(size=(b, u, d)).astype(np.float32))
    audio = jnp.asarray(rng.normal(size=(b, u, d)).astype(np.float32))
    mask = np.zeros((b, u), bool)
    mask[:, 7:] = True  # pad tail
    return text, audio, jnp.asarray(mask)


class TestM2FNetInt8:
    @pytest.mark.parametrize("scan_layers", [False, True])
    def test_logits_close_to_f32(self, scan_layers):
        model = _small_m2fnet(scan_layers)
        text, audio, mask = _dialogue_batch()
        params = model.init(jax.random.PRNGKey(0), text, audio, mask)["params"]
        want = model.apply({"params": params}, text, audio, mask, deterministic=True)
        server = M2FNetInt8(model)
        got = jax.jit(server.apply)(quantize_m2fnet(params), text, audio, mask)
        want_np, got_np = np.asarray(want), np.asarray(got)
        # real (unpadded) rows only
        want_np, got_np = want_np[:, :7], got_np[:, :7]
        denom = np.abs(want_np).max()
        assert np.abs(got_np - want_np).max() / denom < 0.15
        cos = np.sum(want_np * got_np) / (np.linalg.norm(want_np) * np.linalg.norm(got_np))
        assert cos > 0.995

    def test_prediction_agreement(self):
        model = _small_m2fnet()
        text, audio, mask = _dialogue_batch(b=8, u=12, seed=3)
        mask = jnp.zeros_like(mask)  # all real
        params = model.init(jax.random.PRNGKey(1), text, audio, mask)["params"]
        want = np.argmax(np.asarray(model.apply({"params": params}, text, audio, mask)), -1)
        server = M2FNetInt8(model)
        got = np.argmax(np.asarray(server.apply(quantize_m2fnet(params), text, audio, mask)), -1)
        assert (want == got).mean() > 0.9

    def test_bytes_shrink_4x(self):
        model = _small_m2fnet()
        text, audio, mask = _dialogue_batch()
        params = model.init(jax.random.PRNGKey(0), text, audio, mask)["params"]
        f32_bytes = sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(params))
        q_bytes = quantized_bytes(quantize_m2fnet(params))
        assert q_bytes < 0.35 * f32_bytes  # int8 kernels + f32 scales/bias/LN

    def test_rejects_partial_modality(self):
        from mer_tpu.models import M2FNet

        model = M2FNet(audio_enabled=True, text_enabled=True, fam_enabled=False)
        with pytest.raises(ValueError):
            M2FNetInt8(model)


class TestWeightOnlyW8:
    """w8 serving mode: int8 weights in HBM (the 2x-vs-bf16 traffic cut)
    dequantized into bf16 GEMMs — no activation quantization math or error
    (quant.py::int8_dense weight_only)."""

    @pytest.mark.parametrize("scan_layers", [False, True])
    def test_w8_forward_tighter_than_a8w8(self, scan_layers):
        model = _small_m2fnet(scan_layers)
        text, audio, mask = _dialogue_batch()
        params = model.init(jax.random.PRNGKey(0), text, audio, mask)["params"]
        want = np.asarray(model.apply({"params": params}, text, audio, mask, deterministic=True))
        server = M2FNetInt8(model)

        qp = quantize_m2fnet(params)
        wp = quantize_m2fnet(params, weight_only=True)
        got_a8 = np.asarray(jax.jit(server.apply)(jax.device_put(qp), text, audio, mask))
        got_w8 = np.asarray(jax.jit(server.apply)(jax.device_put(wp), text, audio, mask))

        w = want[:, :7]
        err_a8 = np.abs(got_a8[:, :7] - w).max()
        err_w8 = np.abs(got_w8[:, :7] - w).max()
        assert err_w8 < 0.15 * np.abs(w).max()
        # removing activation quantization must not make the error worse
        assert err_w8 <= err_a8 * 1.05

    def test_w8_weight_bytes_match_a8w8(self):
        """w8 stores the same int8 kernels — the HBM footprint claim."""
        model = _small_m2fnet()
        text, audio, mask = _dialogue_batch()
        params = model.init(jax.random.PRNGKey(0), text, audio, mask)["params"]
        from mer_tpu.serving import quantized_bytes

        assert quantized_bytes(quantize_m2fnet(params, weight_only=True)) == \
            quantized_bytes(quantize_m2fnet(params))

    def test_w8_marker_survives_device_put_and_rebuild(self):
        model = _small_m2fnet(scan_layers=True)
        text, audio, mask = _dialogue_batch()
        params = model.init(jax.random.PRNGKey(0), text, audio, mask)["params"]
        wp = jax.tree.map(lambda x: jnp.asarray(x), jax.device_put(quantize_m2fnet(params, weight_only=True)))
        node = wp["audio_encoders_0"]["layers_scan"]["layer"]["linear1"]
        assert node["w8"] == ()
        out = M2FNetInt8(model).apply(wp, text, audio, mask)
        assert np.isfinite(np.asarray(out)).all()


class TestStaticCalibration:
    """Post-training static activation scales (quant.py::calibration) — the
    QAT-lite path: per-tensor scales from a calibration set replace the
    per-row dynamic abs-max reduction at serving time."""

    @pytest.mark.parametrize("scan_layers", [False, True])
    def test_static_matches_f32_envelope(self, scan_layers):
        from mer_tpu.serving import apply_calibration, calibration

        model = _small_m2fnet(scan_layers)
        text, audio, mask = _dialogue_batch()
        params = model.init(jax.random.PRNGKey(0), text, audio, mask)["params"]
        want = np.asarray(model.apply({"params": params}, text, audio, mask, deterministic=True))
        server = M2FNetInt8(model)
        qp = quantize_m2fnet(params)

        with calibration() as sink:
            server.apply(qp, text, audio, mask)  # eager observer pass
        assert sink, "no sites observed"
        qp_static = apply_calibration(qp, sink)

        # every quantized site got a static scale (calibration covered all)
        def count(node, pred):
            if isinstance(node, dict):
                return pred(node) + sum(count(v, pred) for v in node.values())
            return 0

        n_sites = count(qp_static, lambda n: "kernel_q" in n)
        n_static = count(qp_static, lambda n: "act_scale" in n)
        assert n_sites == n_static > 0

        got = np.asarray(jax.jit(server.apply)(qp_static, text, audio, mask))
        want_v, got_v = want[:, :7], got[:, :7]
        assert np.abs(got_v - want_v).max() / np.abs(want_v).max() < 0.15
        cos = np.sum(want_v * got_v) / (np.linalg.norm(want_v) * np.linalg.norm(got_v))
        assert cos > 0.995

    def test_stacked_act_scale_layout(self):
        """Scan-stacked nodes get [L] act_scale arrays the scan slices."""
        from mer_tpu.serving import apply_calibration, calibration

        model = _small_m2fnet(scan_layers=True)
        text, audio, mask = _dialogue_batch()
        params = model.init(jax.random.PRNGKey(0), text, audio, mask)["params"]
        server = M2FNetInt8(model)
        qp = quantize_m2fnet(params)
        with calibration() as sink:
            server.apply(qp, text, audio, mask)
        qp_static = apply_calibration(qp, sink)
        stacked = qp_static["audio_encoders_0"]["layers_scan"]["layer"]["linear1"]
        assert stacked["act_scale"].shape == (2,)  # n_layers_audio = 2
        assert stacked["kernel_q"]["q"].ndim == 3

    def test_path_keyed_calibration_survives_tree_rebuild(self):
        """calibration(qp) keys sites by tree path, so the scales still bake
        into a REBUILT copy of the tree (device_put / jax.tree.map change
        node identity — the failure mode of identity keying)."""
        from mer_tpu.serving import apply_calibration, calibration

        model = _small_m2fnet(scan_layers=True)
        text, audio, mask = _dialogue_batch()
        params = model.init(jax.random.PRNGKey(0), text, audio, mask)["params"]
        server = M2FNetInt8(model)
        qp = quantize_m2fnet(params)
        with calibration(qp) as sink:
            server.apply(qp, text, audio, mask)
        assert all(not isinstance(k, int) for k in sink)  # re-keyed by path

        rebuilt = jax.tree.map(lambda x: jnp.asarray(np.asarray(x)), qp)
        qp_static = apply_calibration(rebuilt, sink)

        def count(node, pred):
            if isinstance(node, dict):
                return pred(node) + sum(count(v, pred) for v in node.values())
            return 0

        assert count(qp_static, lambda n: "act_scale" in n) == count(qp_static, lambda n: "kernel_q" in n)

    def test_partial_match_raises(self):
        """Identity-keyed sink applied to a rebuilt tree must raise, not
        silently leave sites dynamic (ADVICE r2: partially rebuilt trees)."""
        from mer_tpu.serving import apply_calibration, calibration

        model = _small_m2fnet()
        text, audio, mask = _dialogue_batch()
        params = model.init(jax.random.PRNGKey(0), text, audio, mask)["params"]
        server = M2FNetInt8(model)
        qp = quantize_m2fnet(params)
        with calibration() as sink:  # identity-keyed (no tree passed)
            server.apply(qp, text, audio, mask)
        rebuilt = jax.tree.map(lambda x: jnp.asarray(np.asarray(x)), qp)
        with pytest.raises(ValueError, match="did not match"):
            apply_calibration(rebuilt, sink)
        # explicit opt-in accepts the partial (here: empty) bake
        out = apply_calibration(rebuilt, sink, allow_partial=True)
        assert np.isfinite(np.asarray(server.apply(out, text, audio, mask))).all()

    def test_uncalibrated_sites_stay_dynamic(self):
        from mer_tpu.serving import apply_calibration

        model = _small_m2fnet()
        text, audio, mask = _dialogue_batch()
        params = model.init(jax.random.PRNGKey(0), text, audio, mask)["params"]
        qp = quantize_m2fnet(params)
        qp2 = apply_calibration(qp, {})  # empty sink: nothing calibrated
        assert not any(
            "act_scale" in n for n in jax.tree.leaves(
                jax.tree.map(lambda x: x, qp2), is_leaf=lambda n: isinstance(n, dict) and "kernel_q" in n
            ) if isinstance(n, dict)
        )
        # forward still works (dynamic path)
        server = M2FNetInt8(model)
        out = server.apply(qp2, text, audio, mask)
        assert np.isfinite(np.asarray(out)).all()


class TestRobertaInt8:
    """FE-backbone engine (serving/encoders.py) vs the f32 Flax TextERC —
    the embedding-export serving contract (reference text/embeddings.py)."""

    @pytest.mark.parametrize("scan_layers", [False, True])
    def test_embed_and_logits_close(self, scan_layers):
        from mer_tpu.models.roberta import RobertaConfig, TextERC
        from mer_tpu.serving import RobertaInt8, quantize_roberta

        cfg = RobertaConfig(
            vocab_size=200, hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
            intermediate_size=64, max_position_embeddings=40,
        )
        model = TextERC(cfg, scan_layers=scan_layers)
        rng = np.random.default_rng(0)
        ids = jnp.asarray(rng.integers(2, 200, size=(4, 12)).astype(np.int32))
        mask = np.ones((4, 12), np.int32)
        mask[2, 8:] = 0  # padded tail on one row
        mask = jnp.asarray(mask)
        params = model.init(jax.random.PRNGKey(0), ids, mask)["params"]

        want_emb = np.asarray(model.apply({"params": params}, ids, mask, method=TextERC.embed))
        want_log = np.asarray(model.apply({"params": params}, ids, mask))
        server = RobertaInt8(model)
        qp = quantize_roberta(params)
        got_emb = np.asarray(jax.jit(server.embed)(qp, ids, mask))
        got_log = np.asarray(server.apply(qp, ids, mask))

        for want, got in [(want_emb, got_emb), (want_log, got_log)]:
            cos = np.sum(want * got) / (np.linalg.norm(want) * np.linalg.norm(got))
            assert cos > 0.99
            assert np.abs(got - want).max() / np.abs(want).max() < 0.25

    def test_embedding_tables_not_quantized(self):
        from mer_tpu.models.roberta import RobertaConfig, TextERC
        from mer_tpu.serving import quantize_roberta

        cfg = RobertaConfig(
            vocab_size=50, hidden_size=16, num_hidden_layers=1, num_attention_heads=2,
            intermediate_size=32, max_position_embeddings=20,
        )
        model = TextERC(cfg)
        params = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 4), jnp.int32), jnp.ones((1, 4), jnp.int32)
        )["params"]
        qp = quantize_roberta(params)
        assert qp["roberta"]["word_embeddings"]["embedding"].dtype == jnp.float32
        assert qp["roberta"]["layer_0"]["intermediate"]["kernel_q"]["q"].dtype == jnp.int8


class TestWav2Vec2Int8:
    @pytest.mark.parametrize("scan_layers", [False, True])
    def test_embed_and_logits_close(self, scan_layers):
        from mer_tpu.models.wav2vec2 import AudioERC, Wav2Vec2Config
        from mer_tpu.serving import Wav2Vec2Int8, quantize_wav2vec2

        cfg = Wav2Vec2Config(
            conv_dim=(16, 16), conv_kernel=(10, 3), conv_stride=(5, 2),
            hidden_size=32, num_hidden_layers=2, num_attention_heads=4, intermediate_size=64,
            num_conv_pos_embeddings=16, num_conv_pos_embedding_groups=4,
        )
        model = AudioERC(cfg, scan_layers=scan_layers)
        rng = np.random.default_rng(1)
        waves = jnp.asarray(rng.normal(size=(3, 1600)).astype(np.float32) * 0.1)
        lengths = jnp.asarray(np.array([1600, 1200, 800], np.int32))
        params = model.init(jax.random.PRNGKey(0), waves, lengths)["params"]

        want_emb = np.asarray(model.apply({"params": params}, waves, lengths, method=AudioERC.embed))
        want_log = np.asarray(model.apply({"params": params}, waves, lengths))
        server = Wav2Vec2Int8(model)
        qp = quantize_wav2vec2(params)
        got_emb = np.asarray(jax.jit(server.embed)(qp, waves, lengths))
        got_log = np.asarray(server.apply(qp, waves, lengths))

        for want, got in [(want_emb, got_emb), (want_log, got_log)]:
            cos = np.sum(want * got) / (np.linalg.norm(want) * np.linalg.norm(got))
            assert cos > 0.99
            assert np.abs(got - want).max() / np.abs(want).max() < 0.25

    def test_conv_frontend_stays_float(self):
        from mer_tpu.models.wav2vec2 import AudioERC, Wav2Vec2Config
        from mer_tpu.serving import quantize_wav2vec2

        cfg = Wav2Vec2Config(
            conv_dim=(8, 8), conv_kernel=(10, 3), conv_stride=(5, 2),
            hidden_size=16, num_hidden_layers=1, num_attention_heads=2, intermediate_size=32,
            num_conv_pos_embeddings=8, num_conv_pos_embedding_groups=2,
        )
        model = AudioERC(cfg)
        params = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 800)), jnp.full((1,), 800)
        )["params"]
        qp = quantize_wav2vec2(params)
        w2v = qp["wav2vec2"]
        assert w2v["feature_extractor"]["conv_0"]["kernel"].dtype == jnp.float32
        assert w2v["pos_conv_embed"]["conv"]["kernel"].dtype == jnp.float32
        assert w2v["layer_0"]["q_proj"]["kernel_q"]["q"].dtype == jnp.int8


class TestPartialStackedCalibration:
    """A scan-stacked site calibrated for only SOME of its layers must raise
    (review finding: it used to count as matched and silently stay on
    dynamic quantization)."""

    def test_partial_stack_raises(self):
        import jax.numpy as jnp

        from mer_tpu.serving import apply_calibration
        from mer_tpu.serving.quant import quantize_tree

        rng = np.random.default_rng(0)
        tree = {"enc": {"dense": {"kernel": rng.normal(size=(3, 8, 8)).astype(np.float32)}}}
        qp = quantize_tree(tree)
        path = ("enc", "dense")
        sink = {(path, 0): 1.0, (path, 1): 1.0}  # layer 2 never observed
        with pytest.raises(ValueError, match="subset of their layers"):
            apply_calibration(qp, sink)
        out = apply_calibration(qp, sink, allow_partial=True)
        assert "act_scale" not in out["enc"]["dense"]  # stays dynamic, loudly opted into
