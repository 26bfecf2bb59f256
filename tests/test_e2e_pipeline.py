"""End-to-end streaming pipeline test with tiny models on the synthetic MELD
root, plus fusion-checkpoint import index math."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mer_tpu.data import TextFeatureDataset, ToyWhitespaceTokenizer, Wav2Vec2FeatureDataset
from mer_tpu.core import get_text, map_emotions
from mer_tpu.models.m2fnet import M2FNet
from mer_tpu.models.roberta import RobertaConfig, TextERC
from mer_tpu.models.wav2vec2 import AudioERC, Wav2Vec2Config
from mer_tpu.pipelines import E2EModels, StreamingPipeline, mixed_utterance_batches

D = 32

ROBERTA = RobertaConfig(
    vocab_size=1000, hidden_size=D, num_hidden_layers=1, num_attention_heads=4,
    intermediate_size=64, max_position_embeddings=520,
)
W2V = Wav2Vec2Config(
    conv_dim=(16, 16), conv_kernel=(10, 3), conv_stride=(5, 2),
    hidden_size=D, num_hidden_layers=1, num_attention_heads=4, intermediate_size=64,
    num_conv_pos_embeddings=16, num_conv_pos_embedding_groups=4,
)


class TestStreamingPipeline:
    def test_full_run(self, meld_like_root_with_wavs):
        root, sizes = meld_like_root_with_wavs
        tok = ToyWhitespaceTokenizer(vocab_size=1000)
        text_ds = TextFeatureDataset("val", tok, data_root=root)
        w2v_ds = Wav2Vec2FeatureDataset("val", data_root=root)
        df = map_emotions(get_text("val", data_root=root))

        rng = jax.random.PRNGKey(0)
        text_model = TextERC(ROBERTA)
        audio_model = AudioERC(W2V)
        fusion_model = M2FNet(
            d_model_audio=D, d_model_text=D, d_model_fam=D,
            n_head_audio=4, n_head_text=4, n_head_fam=4,
            n_layers_audio=1, n_layers_text=1, n_layers_fam=1,
            hidden_size_classifier=D,
        )
        models = E2EModels(
            text_model,
            text_model.init(rng, jnp.zeros((2, 8), jnp.int32), jnp.ones((2, 8), jnp.int32))["params"],
            audio_model,
            audio_model.init(rng, jnp.zeros((2, 16000)), jnp.full((2,), 16000))["params"],
            fusion_model,
            fusion_model.init(
                rng, jnp.zeros((2, 4, D)), jnp.zeros((2, 4, D)), jnp.zeros((2, 4), bool)
            )["params"],
        )
        pipeline = StreamingPipeline(models, utterance_batch=8, dialogue_batch=4)
        batches = mixed_utterance_batches(text_ds, w2v_ds, batch_size=8, seconds_buckets=(1.0,))
        result = pipeline.run(batches, df)  # device-resident handoff (default)
        assert result["n_utterances"] == sizes["val"]
        assert 0.0 <= result["accuracy"] <= 1.0
        assert result["utterances_per_sec"] > 0
        # per-stage breakdown (tunnel-bound vs compute-bound attribution)
        stages = result["stages"]
        for key in ("embed_host_prep_s", "embed_dispatch_s", "embed_fetch_s",
                    "stage1_embed_s", "group_s", "stage2_fusion_s"):
            assert stages[key] >= 0.0
        assert stages["stage1_embed_s"] + stages["group_s"] + stages["stage2_fusion_s"] <= result["seconds"] + 0.1

        # the host-table path must produce the same metrics: the device
        # gather handoff is a transport change, not a numerics change
        batches2 = mixed_utterance_batches(text_ds, w2v_ds, batch_size=8, seconds_buckets=(1.0,))
        host_result = pipeline.run(batches2, df, device_resident=False)
        assert host_result["n_utterances"] == result["n_utterances"]
        np.testing.assert_allclose(host_result["accuracy"], result["accuracy"], atol=1e-9)
        np.testing.assert_allclose(host_result["weighted_f1"], result["weighted_f1"], atol=1e-9)

        # ... and so must the per-batch streaming stage 1 (scan_stage1=False):
        # scan grouping is a dispatch-count change, not a numerics change
        batches2b = mixed_utterance_batches(text_ds, w2v_ds, batch_size=8, seconds_buckets=(1.0,))
        stream_result = pipeline.run(batches2b, df, scan_stage1=False)
        assert stream_result["n_utterances"] == result["n_utterances"]
        np.testing.assert_allclose(stream_result["accuracy"], result["accuracy"], atol=1e-9)
        np.testing.assert_allclose(stream_result["weighted_f1"], result["weighted_f1"], atol=1e-9)

        # ... and length-sorted batching (the default; 2.2x wire/compute
        # saver at MELD-test shape) vs corpus order, across a two-width
        # bucket ladder so sorting actually changes batch compositions AND
        # pad widths: a batch-composition change, not a numerics change
        for sort in (True, False):
            b4 = mixed_utterance_batches(text_ds, w2v_ds, batch_size=8,
                                         seconds_buckets=(0.5, 1.0), sort_by_length=sort)
            r4 = pipeline.run(b4, df)
            assert r4["n_utterances"] == result["n_utterances"]
            np.testing.assert_allclose(r4["accuracy"], result["accuracy"], atol=1e-9)
            np.testing.assert_allclose(r4["weighted_f1"], result["weighted_f1"], atol=1e-9)

        # int8 engine mode: full pipeline through the quantized serving
        # engines (per-model error envelopes are pinned in test_serving_quant)
        pipeline8 = StreamingPipeline(models, utterance_batch=8, dialogue_batch=4, engine="int8")
        batches3 = mixed_utterance_batches(text_ds, w2v_ds, batch_size=8, seconds_buckets=(1.0,))
        result8 = pipeline8.run(batches3, df)
        assert result8["n_utterances"] == sizes["val"]
        assert 0.0 <= result8["accuracy"] <= 1.0


class TestCoalescedUpload:
    def test_coalesced_tables_bit_equal(self, meld_like_root_with_wavs):
        """The coalesced one-transfer-per-dtype upload is a transport change,
        not a numerics change: the reslice feeds the SAME [G, B, ...] stacks
        to the same scan programs, so the embedding tables and position maps
        must be bit-identical to the per-stack device_put path."""
        root, _ = meld_like_root_with_wavs
        tok = ToyWhitespaceTokenizer(vocab_size=1000)
        text_ds = TextFeatureDataset("val", tok, data_root=root)
        w2v_ds = Wav2Vec2FeatureDataset("val", data_root=root)

        rng = jax.random.PRNGKey(0)
        text_model = TextERC(ROBERTA)
        audio_model = AudioERC(W2V)
        fusion_model = M2FNet(
            d_model_audio=D, d_model_text=D, d_model_fam=D,
            n_head_audio=4, n_head_text=4, n_head_fam=4,
            n_layers_audio=1, n_layers_text=1, n_layers_fam=1,
            hidden_size_classifier=D,
        )
        models = E2EModels(
            text_model,
            text_model.init(rng, jnp.zeros((2, 8), jnp.int32), jnp.ones((2, 8), jnp.int32))["params"],
            audio_model,
            audio_model.init(rng, jnp.zeros((2, 16000)), jnp.full((2,), 16000))["params"],
            fusion_model,
            fusion_model.init(
                rng, jnp.zeros((2, 4, D)), jnp.zeros((2, 4, D)), jnp.zeros((2, 4), bool)
            )["params"],
        )
        tables = {}
        for coalesce in (True, False):
            pipeline = StreamingPipeline(models, utterance_batch=8, dialogue_batch=4,
                                         coalesce_h2d=coalesce)
            # two-width ladder so stage 1 sees multiple shape groups per modality
            batches = mixed_utterance_batches(text_ds, w2v_ds, batch_size=8,
                                              seconds_buckets=(0.5, 1.0))
            tables[coalesce] = pipeline.embed_utterances_scanned(list(batches))
        for a, b, name in zip(tables[True], tables[False],
                              ("table_t", "table_a", "pos_t", "pos_a")):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=name)


class TestStreamingPipelineMel:
    def test_mel_branch_matches_offline_exports(self, meld_like_root_with_wavs):
        """`--audio mel` streaming: on-device log-mel -> ResNet18 -> 300-d
        audio table into fusion (the reference's embeddings-dir switch,
        src/config.yaml:6-8 + audio_mel/embeddings.py:61-80, streamed).
        The streamed audio table must match the offline mel exporter's
        output on the same split, and the fused metrics must match a fusion
        pass over those offline tables."""
        from mer_tpu.core import Config
        from mer_tpu.data import MelFeatureDataset
        from mer_tpu.models.resnet import AudioMelFeatureExtractor
        from mer_tpu.ops.logmel import MelConfig

        root, sizes = meld_like_root_with_wavs
        tok = ToyWhitespaceTokenizer(vocab_size=1000)
        text_ds = TextFeatureDataset("val", tok, data_root=root)
        w2v_ds = Wav2Vec2FeatureDataset("val", data_root=root)
        df = map_emotions(get_text("val", data_root=root))

        mel_cfg = MelConfig(max_seconds=1.0)
        rng = jax.random.PRNGKey(0)
        text_model = TextERC(ROBERTA)
        audio_model = AudioMelFeatureExtractor()
        mel_vars = audio_model.init(rng, jnp.zeros((2, mel_cfg.max_frames, mel_cfg.n_mels, 3)))
        fusion_model = M2FNet(
            d_model_audio=300, d_model_text=D, d_model_fam=D,
            n_head_audio=6, n_head_text=4, n_head_fam=4,  # 6 divides 300
            n_layers_audio=1, n_layers_text=1, n_layers_fam=1,
            hidden_size_classifier=D,
        )
        models = E2EModels(
            text_model,
            text_model.init(rng, jnp.zeros((2, 8), jnp.int32), jnp.ones((2, 8), jnp.int32))["params"],
            audio_model,
            mel_vars["params"],
            fusion_model,
            fusion_model.init(
                rng, jnp.zeros((2, 4, D)), jnp.zeros((2, 4, 300)), jnp.zeros((2, 4), bool)
            )["params"],
            audio_batch_stats=mel_vars["batch_stats"],
        )
        pipeline = StreamingPipeline(models, utterance_batch=8, dialogue_batch=4, mel_cfg=mel_cfg)

        # streaming run (device-resident handoff)
        batches = mixed_utterance_batches(text_ds, w2v_ds, batch_size=8, seconds_buckets=(1.0,))
        result = pipeline.run(batches, df)
        assert result["n_utterances"] == sizes["val"]
        assert 0.0 <= result["accuracy"] <= 1.0

        # streamed tables, dataset-row order
        batches2 = mixed_utterance_batches(text_ds, w2v_ds, batch_size=8, seconds_buckets=(1.0,))
        text_tab, audio_tab = pipeline.embed_utterances(batches2)

        # offline exporter path: MelFeatureDataset (same ops/logmel frontend,
        # float wav ingest) -> same ResNet -> [N, 300] table
        cfg = Config({
            "DEBUG": {"enabled": False},
            "AUDIO": {"ffmpeg_sr": 16000, "wav2vec_sr": 16000, "max_duration": 1.0,
                      "augmentation_factor": 1},
        })
        mel_ds = MelFeatureDataset("val", cfg, data_root=root)
        spec = mel_ds.spectrogram_batch(np.arange(len(mel_ds)))
        offline_tab = np.asarray(audio_model.apply(mel_vars, jnp.asarray(spec)))
        # int16 wire quantization vs float ingest: sub-uint8-bin differences
        assert np.abs(offline_tab - audio_tab).max() < 2e-2

        # fusion over the offline tables must reproduce the streamed metrics
        from mer_tpu.core import dialogue_index
        labels = df["Emotion"].to_numpy()
        dialogues = [
            {"text": text_tab[np.asarray(rows)], "audio": offline_tab[np.asarray(rows)],
             "emotion": labels[np.asarray(rows)].astype(np.int64)}
            for rows in dialogue_index(df).values()
        ]
        y_true, y_pred = pipeline.predict_dialogues(dialogues)
        from mer_tpu.objectives.metrics import BatchAveragedMetrics
        m = BatchAveragedMetrics()
        m.update(y_true, y_pred, mask=np.ones_like(y_true, bool))
        np.testing.assert_allclose(m.pooled_accuracy, result["accuracy"], atol=1e-6)
        np.testing.assert_allclose(m.pooled_weighted_f1, result["weighted_f1"], atol=1e-6)

    def test_mel_requires_batch_stats_and_rejects_int8(self):
        from mer_tpu.models.resnet import AudioMelFeatureExtractor

        rng = jax.random.PRNGKey(0)
        text_model = TextERC(ROBERTA)
        audio_model = AudioMelFeatureExtractor()
        mel_vars = audio_model.init(rng, jnp.zeros((2, 101, 128, 3)))
        fusion_model = M2FNet(
            d_model_audio=300, d_model_text=D, d_model_fam=D,
            n_head_audio=6, n_head_text=4, n_head_fam=4,
            n_layers_audio=1, n_layers_text=1, n_layers_fam=1,
            hidden_size_classifier=D,
        )
        common = dict(
            text_model=text_model,
            text_params=text_model.init(
                rng, jnp.zeros((2, 8), jnp.int32), jnp.ones((2, 8), jnp.int32))["params"],
            audio_model=audio_model,
            audio_params=mel_vars["params"],
            fusion_model=fusion_model,
            fusion_params=fusion_model.init(
                rng, jnp.zeros((2, 4, D)), jnp.zeros((2, 4, 300)), jnp.zeros((2, 4), bool)
            )["params"],
        )
        with pytest.raises(ValueError, match="batch_stats"):
            StreamingPipeline(E2EModels(**common))
        with pytest.raises(ValueError, match="int8"):
            StreamingPipeline(
                E2EModels(**common, audio_batch_stats=mel_vars["batch_stats"]), engine="int8"
            )


class TestDeviceResidentRaggedBatches:
    def test_ragged_stream_positions_correct(self, meld_like_root_with_wavs):
        """The device-resident handoff must map rows correctly when the
        utterance stream carries ragged batch sizes (running-offset math,
        not first-batch-size multiplication)."""
        root, _ = meld_like_root_with_wavs
        tok = ToyWhitespaceTokenizer(vocab_size=1000)
        text_ds = TextFeatureDataset("val", tok, data_root=root)
        w2v_ds = Wav2Vec2FeatureDataset("val", data_root=root)
        df = map_emotions(get_text("val", data_root=root))

        rng = jax.random.PRNGKey(0)
        text_model = TextERC(ROBERTA)
        audio_model = AudioERC(W2V)
        fusion_model = M2FNet(
            d_model_audio=D, d_model_text=D, d_model_fam=D,
            n_head_audio=4, n_head_text=4, n_head_fam=4,
            n_layers_audio=1, n_layers_text=1, n_layers_fam=1,
            hidden_size_classifier=D,
        )
        models = E2EModels(
            text_model,
            text_model.init(rng, jnp.zeros((2, 8), jnp.int32), jnp.ones((2, 8), jnp.int32))["params"],
            audio_model,
            audio_model.init(rng, jnp.zeros((2, 16000)), jnp.full((2,), 16000))["params"],
            fusion_model,
            fusion_model.init(
                rng, jnp.zeros((2, 4, D)), jnp.zeros((2, 4, D)), jnp.zeros((2, 4), bool)
            )["params"],
        )
        pipeline = StreamingPipeline(models, utterance_batch=8, dialogue_batch=4)

        def ragged(batches):
            """Truncate every batch's padding rows: ragged real batch sizes."""
            for b in batches:
                n = int((b["emotion"] != -1).sum()) or 1
                yield {k: v[:n] for k, v in b.items()}

        full = list(mixed_utterance_batches(text_ds, w2v_ds, batch_size=8, seconds_buckets=(1.0,)))
        want = pipeline.run(iter(full), df)
        got = pipeline.run(ragged(full), df)
        assert got["n_utterances"] == want["n_utterances"]
        np.testing.assert_allclose(got["accuracy"], want["accuracy"], atol=1e-9)
        np.testing.assert_allclose(got["weighted_f1"], want["weighted_f1"], atol=1e-9)


class TestFusionCheckpointImport:
    def test_classifier_sequential_index_math(self):
        """The reference's output_layer is an nn.Sequential whose Linear
        positions depend on n_layers_classifier (src/model.py:89-100); the
        converter must map them to classifier_0..N/classifier_out."""
        torch = pytest.importorskip("torch")
        from mer_tpu.models.torch_import import convert_m2fnet_state_dict

        d, h = 16, 4
        for n_layers_cls in [2, 3, 4]:
            # construct a torch state dict structurally identical to the
            # reference model at tiny size
            tmods = {}
            enc = torch.nn.TransformerEncoder(
                torch.nn.TransformerEncoderLayer(d_model=d, nhead=h, batch_first=True),
                num_layers=1, norm=torch.nn.LayerNorm(d),
            )
            sd = {}
            for mod_name in ["audio_encoders.0", "text_encoders.0"]:
                for k, v in enc.state_dict().items():
                    sd[f"{mod_name}.{k}"] = v
            for name in ["audio_proj", "text_proj"]:
                lin = torch.nn.Linear(d, d)
                for k, v in lin.state_dict().items():
                    sd[f"{name}.{k}"] = v
            mha = torch.nn.MultiheadAttention(d, h, batch_first=True)
            lin = torch.nn.Linear(2 * d, d)
            for k, v in mha.state_dict().items():
                sd[f"fusion_layers.0.multihead_attention.{k}"] = v
            for k, v in lin.state_dict().items():
                sd[f"fusion_layers.0.linear.{k}"] = v

            # classifier Sequential with reference layout
            seq = [torch.nn.Linear(2 * d, d)]
            for _ in range(n_layers_cls - 2):
                seq += [torch.nn.ReLU(), torch.nn.Linear(d, d)]
            seq += [torch.nn.ReLU(), torch.nn.Dropout(0.4), torch.nn.Linear(d, 7)]
            head = torch.nn.Sequential(*seq)
            for k, v in head.state_dict().items():
                sd[f"output_layer.{k}"] = v

            model = M2FNet(
                d_model_audio=d, d_model_text=d, d_model_fam=d,
                n_head_audio=h, n_head_text=h, n_head_fam=h,
                n_layers_audio=1, n_layers_text=1, n_layers_fam=1,
                n_layers_classifier=n_layers_cls, hidden_size_classifier=d,
            )
            params = convert_m2fnet_state_dict(sd, model)

            # converted params must drop cleanly into the flax model and match
            # shapes of a fresh init
            rng = jax.random.PRNGKey(0)
            x = jnp.zeros((2, 3, d))
            mask = jnp.zeros((2, 3), bool)
            init_params = model.init(rng, x, x, mask)["params"]
            init_flat = jax.tree_util.tree_flatten_with_path(init_params)[0]
            conv_flat = jax.tree_util.tree_flatten_with_path(params)[0]
            init_shapes = {jax.tree_util.keystr(k): v.shape for k, v in init_flat}
            conv_shapes = {jax.tree_util.keystr(k): np.asarray(v).shape for k, v in conv_flat}
            assert init_shapes == conv_shapes

            out = model.apply({"params": params}, x, x, mask)
            assert out.shape == (2, 3, 7)
