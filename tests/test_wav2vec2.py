"""wav2vec2 parity tests vs HF transformers torch (small random config)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mer_tpu.models.wav2vec2 import AudioERC, Wav2Vec2Config, Wav2Vec2Model, convert_hf_wav2vec2

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

SMALL = Wav2Vec2Config(
    conv_dim=(16, 16, 16), conv_kernel=(10, 3, 2), conv_stride=(5, 2, 2),
    hidden_size=32, num_hidden_layers=2, num_attention_heads=4, intermediate_size=64,
    num_conv_pos_embeddings=16, num_conv_pos_embedding_groups=4,
)


def _hf_model():
    cfg = transformers.Wav2Vec2Config(
        conv_dim=list(SMALL.conv_dim), conv_kernel=list(SMALL.conv_kernel),
        conv_stride=list(SMALL.conv_stride), hidden_size=SMALL.hidden_size,
        num_hidden_layers=SMALL.num_hidden_layers, num_attention_heads=SMALL.num_attention_heads,
        intermediate_size=SMALL.intermediate_size,
        num_conv_pos_embeddings=SMALL.num_conv_pos_embeddings,
        num_conv_pos_embedding_groups=SMALL.num_conv_pos_embedding_groups,
        do_stable_layer_norm=False, feat_extract_norm="group", conv_bias=False,
        num_feat_extract_layers=len(SMALL.conv_dim),
    )
    return transformers.Wav2Vec2Model(cfg).eval()


def _waves(b=2, l=800, seed=0):
    rng = np.random.default_rng(seed)
    waves = rng.normal(size=(b, l)).astype(np.float32) * 0.1
    lengths = np.array([l, l - 250], dtype=np.int64)
    waves[1, lengths[1]:] = 0.0
    return waves, lengths


class TestLengths:
    def test_output_lengths_match_hf(self):
        hf = _hf_model()
        lens = np.array([800, 550, 123])
        ref = hf._get_feat_extract_output_lengths(torch.tensor(lens)).numpy()
        ours = np.asarray(SMALL.feat_extract_output_lengths(jnp.asarray(lens)))
        np.testing.assert_array_equal(ours, ref)


class TestWav2Vec2Parity:
    def test_encoder_matches_hf_full_length(self):
        hf = _hf_model()
        waves, _ = _waves()
        with torch.no_grad():
            ref = hf(torch.tensor(waves)).last_hidden_state.numpy()

        params = convert_hf_wav2vec2(hf.state_dict(), SMALL)
        lengths = jnp.full((2,), waves.shape[1], jnp.int32)
        ours, out_lens = Wav2Vec2Model(SMALL).apply(
            {"params": params}, jnp.asarray(waves), lengths, deterministic=True
        )
        assert np.asarray(out_lens)[0] == ref.shape[1]
        np.testing.assert_allclose(np.asarray(ours), ref, rtol=5e-4, atol=5e-4)

    def test_encoder_matches_hf_with_padding(self):
        hf = _hf_model()
        waves, lengths = _waves(seed=1)
        attn = np.zeros_like(waves, dtype=np.int64)
        for i, l in enumerate(lengths):
            attn[i, :l] = 1
        with torch.no_grad():
            ref = hf(torch.tensor(waves), attention_mask=torch.tensor(attn)).last_hidden_state.numpy()

        params = convert_hf_wav2vec2(hf.state_dict(), SMALL)
        ours, out_lens = Wav2Vec2Model(SMALL).apply(
            {"params": params}, jnp.asarray(waves), jnp.asarray(lengths), deterministic=True
        )
        out_lens = np.asarray(out_lens)
        got = np.asarray(ours)
        # compare only valid frames (padded-frame outputs are never consumed)
        for i in range(2):
            np.testing.assert_allclose(got[i, : out_lens[i]], ref[i, : out_lens[i]], rtol=1e-3, atol=1e-3)

    def test_audio_erc_shapes_and_pooling(self):
        waves, lengths = _waves(seed=2)
        model = AudioERC(SMALL)
        variables = model.init(jax.random.PRNGKey(0), jnp.asarray(waves), jnp.asarray(lengths))
        logits = model.apply(variables, jnp.asarray(waves), jnp.asarray(lengths))
        assert logits.shape == (2, 7)
        emb = model.apply(variables, jnp.asarray(waves), jnp.asarray(lengths), method=AudioERC.embed)
        assert emb.shape == (2, SMALL.hidden_size)

    def test_pooling_ignores_padding(self):
        """Mean pooling over valid frames only (reference audio_wav2vec2/model.py:27)."""
        waves, lengths = _waves(seed=3)
        model = AudioERC(SMALL)
        variables = model.init(jax.random.PRNGKey(0), jnp.asarray(waves), jnp.asarray(lengths))
        emb1 = model.apply(variables, jnp.asarray(waves), jnp.asarray(lengths), method=AudioERC.embed)
        waves2 = waves.copy()
        waves2[1, lengths[1]:] = 5.0  # garbage in the padded sample region
        emb2 = model.apply(variables, jnp.asarray(waves2), jnp.asarray(lengths), method=AudioERC.embed)
        np.testing.assert_allclose(np.asarray(emb1[0]), np.asarray(emb2[0]), atol=1e-6)
        # note: clip 1's *conv* receptive fields straddle the boundary, so
        # only the fully-valid clip is bitwise stable — that is also true of
        # the reference implementation.


class TestConvStackGemm:
    """conv_stack_gemm == ConvFeatureExtractor (the windows+GEMM rewrite of
    the temporal conv stack must be a drop-in for the XLA conv lowering)."""

    def test_matches_module_f32(self):
        from mer_tpu.models.wav2vec2 import ConvFeatureExtractor, conv_stack_gemm

        waves, _ = _waves(b=3, l=1000, seed=4)
        module = ConvFeatureExtractor(SMALL)
        params = module.init(jax.random.PRNGKey(1), jnp.asarray(waves))["params"]
        ref = np.asarray(module.apply({"params": params}, jnp.asarray(waves)))
        got = np.asarray(conv_stack_gemm(params, jnp.asarray(waves), SMALL))
        assert got.shape == ref.shape
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)

    @pytest.mark.parametrize("length", [3217, 1045, 1052, 1059, 1066, 64000])
    def test_matches_module_base_config_windows(self, length):
        """Full base-config kernel/stride schedule (incl. the k=10/s=5 first
        layer and k=2/s=2 tail) at awkward lengths. 1045..1066 are lengths
        where a window's tail samples land in the l % s remainder at a layer
        whose final frame SURVIVES to the output — a truncate-before-reshape
        bug in _strided_windows corrupted exactly these (review finding);
        64000 is the standard 4 s clip, which hits that condition at
        layers 1-4."""
        from mer_tpu.models.wav2vec2 import ConvFeatureExtractor, conv_stack_gemm

        cfg = Wav2Vec2Config(conv_dim=(8,) * 7)
        rng = np.random.default_rng(5)
        waves = jnp.asarray(rng.normal(size=(2, length)).astype(np.float32))
        module = ConvFeatureExtractor(cfg)
        params = module.init(jax.random.PRNGKey(2), waves)["params"]
        ref = np.asarray(module.apply({"params": params}, waves))
        got = np.asarray(conv_stack_gemm(params, waves, cfg))
        assert got.shape == ref.shape
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)

    @pytest.mark.parametrize("l,k,s", [(159, 3, 2), (158, 3, 2), (23, 10, 5), (24, 2, 2)])
    def test_strided_windows_every_sample(self, l, k, s):
        """_strided_windows == brute-force window gather at lengths where
        the last window reads into the l % s remainder."""
        from mer_tpu.models.wav2vec2 import _strided_windows

        rng = np.random.default_rng(7)
        c = 3
        x = jnp.asarray(rng.normal(size=(2, l, c)).astype(np.float32))
        out_len = (l - k) // s + 1
        ref = np.stack(
            [np.asarray(x)[:, t * s : t * s + k, :].reshape(2, k * c) for t in range(out_len)],
            axis=1,
        )
        got = np.asarray(_strided_windows(x, k, s))
        np.testing.assert_array_equal(got, ref)

    def test_module_gemm_mode_interchangeable(self):
        """use_gemm=True is a drop-in: same param tree, same outputs."""
        from mer_tpu.models.wav2vec2 import ConvFeatureExtractor

        waves, _ = _waves(b=2, l=900, seed=6)
        ref_mod = ConvFeatureExtractor(SMALL)
        gemm_mod = ConvFeatureExtractor(SMALL, use_gemm=True)
        params = ref_mod.init(jax.random.PRNGKey(3), jnp.asarray(waves))["params"]
        gemm_params = gemm_mod.init(jax.random.PRNGKey(3), jnp.asarray(waves))["params"]
        assert jax.tree.structure(params) == jax.tree.structure(gemm_params)
        ref = np.asarray(ref_mod.apply({"params": params}, jnp.asarray(waves)))
        got = np.asarray(gemm_mod.apply({"params": params}, jnp.asarray(waves)))
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)

    def test_module_fused_glue_interchangeable(self):
        """fused_glue=True (the TPU default: layer-0 strided-window GEMM +
        one-pass GroupNorm stats) is a drop-in: same param tree, same
        outputs to f32-rounding of the variance formulation."""
        from mer_tpu.models.wav2vec2 import ConvFeatureExtractor

        waves, _ = _waves(b=2, l=900, seed=7)
        ref_mod = ConvFeatureExtractor(SMALL, fused_glue=False)
        fused_mod = ConvFeatureExtractor(SMALL, fused_glue=True)
        params = ref_mod.init(jax.random.PRNGKey(3), jnp.asarray(waves))["params"]
        fused_params = fused_mod.init(jax.random.PRNGKey(3), jnp.asarray(waves))["params"]
        assert jax.tree.structure(params) == jax.tree.structure(fused_params)
        ref = np.asarray(ref_mod.apply({"params": params}, jnp.asarray(waves)))
        got = np.asarray(fused_mod.apply({"params": params}, jnp.asarray(waves)))
        np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)

        # bf16 compute dtype: same comparison at bf16 tolerance
        ref16 = ConvFeatureExtractor(SMALL, fused_glue=False, dtype=jnp.bfloat16)
        got16 = ConvFeatureExtractor(SMALL, fused_glue=True, dtype=jnp.bfloat16)
        a = np.asarray(ref16.apply({"params": params}, jnp.asarray(waves))).astype(np.float64)
        b = np.asarray(got16.apply({"params": params}, jnp.asarray(waves))).astype(np.float64)
        rel = np.abs(a - b).max() / max(np.abs(a).max(), 1e-9)
        assert rel < 2e-2, rel
