"""μ-law wire codec: round-trip properties + pipeline embedding envelope.

The μ-law wire option (ops/mulaw.py) is lossy by design; these tests pin
(a) the codec's own quantization envelope and (b) the downstream effect on
the streaming pipeline's embeddings and metrics versus the exact int16
wire. The reference has no wire format at all (local-GPU float32 tensors,
/root/reference/src/feature_extractors/audio_wav2vec2/dataset.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mer_tpu.ops.mulaw import (
    MULAW_ZERO, mulaw_decode, mulaw_decode_np, mulaw_encode_np,
)


def _speech_like(n=16000, seed=0):
    """Speech-shaped test signal: mixed tones under a syllabic envelope at a
    realistic level (~ -20 dBFS RMS)."""
    t = np.arange(n) / 16000.0
    rng = np.random.default_rng(seed)
    sig = (np.sin(2 * np.pi * 220 * t) + 0.5 * np.sin(2 * np.pi * 733 * t)
           + 0.2 * rng.normal(size=n))
    envelope = 0.5 + 0.5 * np.sin(2 * np.pi * 3 * t)
    x = (sig * envelope).astype(np.float32)
    return (0.1 * x / np.sqrt(np.mean(x**2))).astype(np.float32)


class TestCodec:
    def test_zero_code_is_exact_silence(self):
        assert mulaw_encode_np(np.zeros(4, np.float32)).tolist() == [MULAW_ZERO] * 4
        assert mulaw_decode_np(np.full(4, MULAW_ZERO, np.uint8)).tolist() == [0.0] * 4

    def test_code_range_and_symmetry(self):
        x = np.linspace(-1, 1, 4097, dtype=np.float32)
        codes = mulaw_encode_np(x)
        assert codes.min() >= 1 and codes.max() == 255
        # sign symmetry: enc(-x) mirrors enc(x) around the zero code
        np.testing.assert_array_equal(
            codes[::-1].astype(np.int32) - MULAW_ZERO,
            MULAW_ZERO - codes.astype(np.int32),
        )
        # decode is monotone in the code
        dec = mulaw_decode_np(np.arange(1, 256, dtype=np.uint8))
        assert np.all(np.diff(dec) > 0)
        assert dec.min() >= -1.0 and dec.max() <= 1.0

    def test_round_trip_snr(self):
        x = _speech_like()
        err = mulaw_decode_np(mulaw_encode_np(x)) - x
        snr_db = 10 * np.log10(np.mean(x**2) / np.mean(err**2))
        # classic mu-law SDR for speech-shaped input; the companding gain
        # holds it ~constant across levels
        assert snr_db > 33.0, f"mu-law round-trip SNR {snr_db:.1f} dB"
        # ... and at 20 dB lower level (companding keeps SNR, linear 8-bit
        # quantization would lose ~20 dB)
        xq = (x / 10.0).astype(np.float32)
        errq = mulaw_decode_np(mulaw_encode_np(xq)) - xq
        snrq = 10 * np.log10(np.mean(xq**2) / np.mean(errq**2))
        assert snrq > 30.0, f"low-level mu-law SNR {snrq:.1f} dB"

    def test_jax_decode_matches_numpy(self):
        codes = np.arange(1, 256, dtype=np.uint8)
        np.testing.assert_allclose(
            np.asarray(jax.jit(mulaw_decode)(jnp.asarray(codes))),
            mulaw_decode_np(codes), rtol=0, atol=2e-7,
        )

    def test_clipping(self):
        x = np.array([-2.0, -1.0, 1.0, 2.0], np.float32)
        codes = mulaw_encode_np(x)
        assert codes.tolist() == [1, 1, 255, 255]


class TestPipelineEnvelope:
    def test_wire_mismatch_raises_and_metrics_match(self, meld_like_root_with_wavs):
        from mer_tpu.core import get_text, map_emotions
        from mer_tpu.data import (
            TextFeatureDataset, ToyWhitespaceTokenizer, Wav2Vec2FeatureDataset,
        )
        from mer_tpu.models.m2fnet import M2FNet
        from mer_tpu.models.roberta import RobertaConfig, TextERC
        from mer_tpu.models.wav2vec2 import AudioERC, Wav2Vec2Config
        from mer_tpu.pipelines import (
            E2EModels, StreamingPipeline, mixed_utterance_batches,
        )

        D = 32
        root, sizes = meld_like_root_with_wavs
        tok = ToyWhitespaceTokenizer(vocab_size=1000)
        text_ds = TextFeatureDataset("val", tok, data_root=root)
        w2v_ds = Wav2Vec2FeatureDataset("val", data_root=root)
        df = map_emotions(get_text("val", data_root=root))

        rng = jax.random.PRNGKey(0)
        text_model = TextERC(RobertaConfig(
            vocab_size=1000, hidden_size=D, num_hidden_layers=1,
            num_attention_heads=4, intermediate_size=64,
            max_position_embeddings=520,
        ))
        audio_model = AudioERC(Wav2Vec2Config(
            conv_dim=(16, 16), conv_kernel=(10, 3), conv_stride=(5, 2),
            hidden_size=D, num_hidden_layers=1, num_attention_heads=4,
            intermediate_size=64, num_conv_pos_embeddings=16,
            num_conv_pos_embedding_groups=4,
        ))
        fusion_model = M2FNet(
            d_model_audio=D, d_model_text=D, d_model_fam=D,
            n_head_audio=4, n_head_text=4, n_head_fam=4,
            n_layers_audio=1, n_layers_text=1, n_layers_fam=1,
            hidden_size_classifier=D,
        )
        models = E2EModels(
            text_model,
            text_model.init(rng, jnp.zeros((2, 8), jnp.int32),
                            jnp.ones((2, 8), jnp.int32))["params"],
            audio_model,
            audio_model.init(rng, jnp.zeros((2, 16000)), jnp.full((2,), 16000))["params"],
            fusion_model,
            fusion_model.init(rng, jnp.zeros((2, 4, D)), jnp.zeros((2, 4, D)),
                              jnp.zeros((2, 4), bool))["params"],
        )

        exact = StreamingPipeline(models, utterance_batch=8, dialogue_batch=4)
        mulaw = StreamingPipeline(models, utterance_batch=8, dialogue_batch=4,
                                  wire="mulaw")

        # mismatched generator dtype fails loudly, both directions
        with pytest.raises(ValueError, match="wire"):
            mulaw.run(mixed_utterance_batches(text_ds, w2v_ds, batch_size=8,
                                              seconds_buckets=(1.0,)), df)
        with pytest.raises(ValueError, match="wire"):
            exact.run(mixed_utterance_batches(text_ds, w2v_ds, batch_size=8,
                                              seconds_buckets=(1.0,),
                                              wire="mulaw"), df)

        # stage-1 embedding envelope: mu-law wire vs exact int16 wire
        def tables(p, wire):
            b = mixed_utterance_batches(text_ds, w2v_ds, batch_size=8,
                                        seconds_buckets=(1.0,), wire=wire)
            return p.embed_utterances(b)

        te, ae = tables(exact, "int16")
        tm, am = tables(mulaw, "mulaw")
        # text path never touches the wire format
        np.testing.assert_allclose(tm, te, atol=1e-6)
        # audio path: quantization perturbation propagated through a
        # random-init wav2vec2 — small relative to the embedding scale
        rel = np.linalg.norm(am - ae) / np.linalg.norm(ae)
        assert rel < 0.05, f"mu-law audio-embedding envelope {rel:.4f}"

        # end-to-end metrics on the toy split are insensitive at this
        # envelope (same argmax decisions)
        r_exact = exact.run(
            mixed_utterance_batches(text_ds, w2v_ds, batch_size=8,
                                    seconds_buckets=(1.0,)), df)
        r_mulaw = mulaw.run(
            mixed_utterance_batches(text_ds, w2v_ds, batch_size=8,
                                    seconds_buckets=(1.0,), wire="mulaw"), df)
        assert r_mulaw["n_utterances"] == r_exact["n_utterances"]
        np.testing.assert_allclose(r_mulaw["accuracy"], r_exact["accuracy"], atol=1e-9)
