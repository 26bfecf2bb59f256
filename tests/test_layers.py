"""Numerical parity tests: Flax transformer blocks vs torch built-ins.

Weights are copied torch -> flax via mer_tpu.models.torch_import, then
outputs are compared on the same inputs (eval mode / deterministic).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mer_tpu.models import M2FNet, MultiheadAttention, TransformerEncoder, TransformerEncoderLayer
from mer_tpu.models.torch_import import (
    convert_encoder,
    convert_encoder_layer,
    convert_linear,
    convert_mha,
)

torch = pytest.importorskip("torch")

B, S, E, H = 3, 10, 32, 4


def _mask(rng, b=B, s=S):
    m = rng.random((b, s)) < 0.3
    m[:, 0] = False  # at least one valid key per row
    return m


class TestMultiheadAttention:
    @pytest.mark.parametrize("use_mask", [False, True])
    def test_matches_torch(self, use_mask):
        rng = np.random.default_rng(0)
        q = rng.normal(size=(B, S, E)).astype(np.float32)
        k = rng.normal(size=(B, S, E)).astype(np.float32)
        v = rng.normal(size=(B, S, E)).astype(np.float32)
        mask = _mask(rng) if use_mask else None

        t_mha = torch.nn.MultiheadAttention(E, H, batch_first=True, dropout=0.4).eval()
        with torch.no_grad():
            ref, _ = t_mha(
                torch.tensor(q), torch.tensor(k), torch.tensor(v),
                key_padding_mask=None if mask is None else torch.tensor(mask),
            )

        params = convert_mha(t_mha.state_dict(), "", E)
        ours = MultiheadAttention(E, H, dropout=0.4).apply(
            {"params": params}, jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
            key_padding_mask=None if mask is None else jnp.asarray(mask),
            deterministic=True,
        )
        np.testing.assert_allclose(np.asarray(ours), ref.numpy(), rtol=2e-4, atol=2e-5)

    def test_cross_attention_value_ne_key(self):
        """The FAM uses query=text, key=audio, value=text (src/model.py:14)."""
        rng = np.random.default_rng(1)
        text = rng.normal(size=(B, S, E)).astype(np.float32)
        audio = rng.normal(size=(B, S, E)).astype(np.float32)
        mask = _mask(rng)

        t_mha = torch.nn.MultiheadAttention(E, H, batch_first=True).eval()
        with torch.no_grad():
            ref, _ = t_mha(
                torch.tensor(text), torch.tensor(audio), torch.tensor(text),
                key_padding_mask=torch.tensor(mask),
            )
        params = convert_mha(t_mha.state_dict(), "", E)
        ours = MultiheadAttention(E, H).apply(
            {"params": params}, jnp.asarray(text), jnp.asarray(audio), jnp.asarray(text),
            key_padding_mask=jnp.asarray(mask), deterministic=True,
        )
        np.testing.assert_allclose(np.asarray(ours), ref.numpy(), rtol=2e-4, atol=2e-5)


class TestTransformerEncoderLayer:
    def test_matches_torch(self):
        rng = np.random.default_rng(2)
        x = rng.normal(size=(B, S, E)).astype(np.float32)
        mask = _mask(rng)

        t_layer = torch.nn.TransformerEncoderLayer(
            d_model=E, nhead=H, dropout=0.4, batch_first=True
        ).eval()
        with torch.no_grad():
            ref = t_layer(torch.tensor(x), src_key_padding_mask=torch.tensor(mask))

        params = convert_encoder_layer(t_layer.state_dict(), "", E)
        ours = TransformerEncoderLayer(d_model=E, nhead=H, dropout=0.4).apply(
            {"params": params}, jnp.asarray(x), src_key_padding_mask=jnp.asarray(mask),
            deterministic=True,
        )
        np.testing.assert_allclose(np.asarray(ours), ref.numpy(), rtol=2e-4, atol=1e-4)


class TestTransformerEncoder:
    def test_matches_torch_with_final_norm(self):
        """Matches the reference's encoder construction exactly
        (src/model.py:61-65: TransformerEncoder(layer, norm=LayerNorm, num_layers))."""
        rng = np.random.default_rng(3)
        x = rng.normal(size=(B, S, E)).astype(np.float32)
        mask = _mask(rng)
        n_layers = 3

        layer = torch.nn.TransformerEncoderLayer(d_model=E, nhead=H, dropout=0.4, batch_first=True)
        norm = torch.nn.LayerNorm(E)
        t_enc = torch.nn.TransformerEncoder(encoder_layer=layer, norm=norm, num_layers=n_layers).eval()
        with torch.no_grad():
            ref = t_enc(torch.tensor(x), src_key_padding_mask=torch.tensor(mask))

        params = convert_encoder(t_enc.state_dict(), "", E, n_layers)
        ours = TransformerEncoder(d_model=E, nhead=H, num_layers=n_layers, dropout=0.4).apply(
            {"params": params}, jnp.asarray(x), src_key_padding_mask=jnp.asarray(mask),
            deterministic=True,
        )
        np.testing.assert_allclose(np.asarray(ours), ref.numpy(), rtol=5e-4, atol=5e-4)


class TestM2FNetModel:
    def _small(self):
        return M2FNet(
            d_model_audio=E, d_model_text=E, d_model_fam=E,
            n_head_audio=H, n_head_text=H, n_head_fam=H,
            n_layers_audio=2, n_layers_text=2, n_layers_fam=2,
            hidden_size_classifier=16, dropout=0.1,
        )

    def test_shapes_and_finite(self):
        rng = np.random.default_rng(4)
        model = self._small()
        text = jnp.asarray(rng.normal(size=(B, S, E)).astype(np.float32))
        audio = jnp.asarray(rng.normal(size=(B, S, E)).astype(np.float32))
        mask = jnp.asarray(_mask(rng))
        params = model.init(jax.random.PRNGKey(0), text, audio, mask)
        out = model.apply(params, text, audio, mask)
        assert out.shape == (B, S, 7)
        assert np.isfinite(np.asarray(out)).all()

    def test_padding_invariance(self):
        """Logits at valid positions must not depend on padded-position values."""
        rng = np.random.default_rng(5)
        model = self._small()
        text = rng.normal(size=(1, S, E)).astype(np.float32)
        audio = rng.normal(size=(1, S, E)).astype(np.float32)
        mask = np.zeros((1, S), dtype=bool)
        mask[0, 6:] = True  # last 4 positions are padding

        params = model.init(jax.random.PRNGKey(0), jnp.asarray(text), jnp.asarray(audio), jnp.asarray(mask))
        out1 = model.apply(params, jnp.asarray(text), jnp.asarray(audio), jnp.asarray(mask))

        text2, audio2 = text.copy(), audio.copy()
        text2[0, 6:] = 123.0
        audio2[0, 6:] = -77.0
        out2 = model.apply(params, jnp.asarray(text2), jnp.asarray(audio2), jnp.asarray(mask))
        np.testing.assert_allclose(np.asarray(out1[0, :6]), np.asarray(out2[0, :6]), rtol=1e-5, atol=1e-5)

    def test_modality_toggles(self):
        rng = np.random.default_rng(6)
        text = jnp.asarray(rng.normal(size=(B, S, E)).astype(np.float32))
        audio = jnp.asarray(rng.normal(size=(B, S, E)).astype(np.float32))
        mask = jnp.asarray(np.zeros((B, S), dtype=bool))

        for audio_en, text_en, fam_en in [(True, False, False), (False, True, False), (True, True, False)]:
            model = M2FNet(
                audio_enabled=audio_en, text_enabled=text_en, fam_enabled=fam_en,
                d_model_audio=E, d_model_text=E, d_model_fam=E,
                n_head_audio=H, n_head_text=H, n_head_fam=H,
                n_layers_audio=1, n_layers_text=1, n_layers_fam=1,
                hidden_size_classifier=16,
            )
            params = model.init(jax.random.PRNGKey(0), text, audio, mask)
            out = model.apply(params, text, audio, mask)
            assert out.shape == (B, S, 7)

        with pytest.raises(ValueError):
            M2FNet(audio_enabled=False, text_enabled=False).init(
                jax.random.PRNGKey(0), text, audio, mask
            )
        with pytest.raises(ValueError):
            M2FNet(audio_enabled=True, text_enabled=False, fam_enabled=True).init(
                jax.random.PRNGKey(0), text, audio, mask
            )

    def test_from_config_defaults(self):
        import os

        from mer_tpu.core import load_config

        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        cfg = load_config(os.path.join(repo, "src", "config.yaml"))
        model = M2FNet.from_config(cfg.model)
        assert model.d_model_fam == 768 and model.n_layers_fam == 5 and model.n_layers_audio == 6

    def test_dropout_stochastic_in_train_mode(self):
        rng = np.random.default_rng(7)
        model = self._small()
        text = jnp.asarray(rng.normal(size=(B, S, E)).astype(np.float32))
        audio = jnp.asarray(rng.normal(size=(B, S, E)).astype(np.float32))
        mask = jnp.asarray(np.zeros((B, S), dtype=bool))
        params = model.init(jax.random.PRNGKey(0), text, audio, mask)
        o1 = model.apply(params, text, audio, mask, deterministic=False, rngs={"dropout": jax.random.PRNGKey(1)})
        o2 = model.apply(params, text, audio, mask, deterministic=False, rngs={"dropout": jax.random.PRNGKey(2)})
        assert not np.allclose(np.asarray(o1), np.asarray(o2))
