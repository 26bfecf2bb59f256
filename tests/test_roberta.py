"""RoBERTa parity tests vs HF transformers torch (random small config, no
pretrained downloads needed)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mer_tpu.models.roberta import (
    RobertaClassificationHead,
    RobertaConfig,
    RobertaModel,
    TextERC,
    convert_hf_classification_head,
    convert_hf_roberta,
    create_position_ids,
)

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


SMALL = RobertaConfig(
    vocab_size=100, hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
    intermediate_size=64, max_position_embeddings=40, num_labels=7,
)


def _hf_config():
    return transformers.RobertaConfig(
        vocab_size=SMALL.vocab_size, hidden_size=SMALL.hidden_size,
        num_hidden_layers=SMALL.num_hidden_layers, num_attention_heads=SMALL.num_attention_heads,
        intermediate_size=SMALL.intermediate_size, max_position_embeddings=SMALL.max_position_embeddings,
        type_vocab_size=1, pad_token_id=1, num_labels=SMALL.num_labels,
    )


def _inputs(b=2, s=12, seed=0):
    rng = np.random.default_rng(seed)
    ids = rng.integers(3, SMALL.vocab_size, size=(b, s))
    ids[:, 0] = 0  # <s>
    attention = np.ones((b, s), dtype=np.int64)
    ids[0, 9:] = 1  # pad
    attention[0, 9:] = 0
    return ids.astype(np.int64), attention


class TestPositionIds:
    def test_matches_hf_rule(self):
        ids, _ = _inputs()
        ours = np.asarray(create_position_ids(jnp.asarray(ids), 1))
        from transformers.models.roberta.modeling_roberta import create_position_ids_from_input_ids

        ref = create_position_ids_from_input_ids(torch.tensor(ids), 1).numpy()
        np.testing.assert_array_equal(ours, ref)


class TestRobertaParity:
    def test_encoder_matches_hf(self):
        hf = transformers.RobertaModel(_hf_config(), add_pooling_layer=False).eval()
        ids, attn = _inputs()
        with torch.no_grad():
            ref = hf(torch.tensor(ids), torch.tensor(attn)).last_hidden_state.numpy()

        params = convert_hf_roberta(hf.state_dict(), SMALL)
        ours = RobertaModel(SMALL).apply(
            {"params": params}, jnp.asarray(ids), jnp.asarray(attn), deterministic=True
        )
        # padded positions of sequence 0 are never consumed downstream; HF
        # computes them attending over all-masked... compare valid region
        got = np.asarray(ours)
        np.testing.assert_allclose(got[1], ref[1], rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(got[0, :9], ref[0, :9], rtol=2e-4, atol=2e-4)

    def test_classification_head_matches_hf(self):
        from transformers.models.roberta.modeling_roberta import (
            RobertaClassificationHead as HFHead,
        )

        hf_head = HFHead(_hf_config()).eval()
        rng = np.random.default_rng(1)
        hidden = rng.normal(size=(3, 8, SMALL.hidden_size)).astype(np.float32)
        with torch.no_grad():
            ref = hf_head(torch.tensor(hidden)).numpy()

        params = convert_hf_classification_head(hf_head.state_dict(), prefix="")
        ours = RobertaClassificationHead(SMALL).apply({"params": params}, jnp.asarray(hidden))
        np.testing.assert_allclose(np.asarray(ours), ref, rtol=2e-4, atol=2e-5)

    def test_text_erc_end_to_end(self):
        """Full TextERC (backbone + head) vs HF composition."""
        hf = transformers.RobertaModel(_hf_config(), add_pooling_layer=False).eval()
        from transformers.models.roberta.modeling_roberta import (
            RobertaClassificationHead as HFHead,
        )

        hf_head = HFHead(_hf_config()).eval()
        ids, attn = _inputs(seed=2)
        with torch.no_grad():
            ref = hf_head(hf(torch.tensor(ids), torch.tensor(attn)).last_hidden_state).numpy()

        params = {
            "roberta": convert_hf_roberta(hf.state_dict(), SMALL),
            "classifier_head": convert_hf_classification_head(hf_head.state_dict(), prefix=""),
        }
        model = TextERC(SMALL)
        ours = model.apply({"params": params}, jnp.asarray(ids), jnp.asarray(attn))
        np.testing.assert_allclose(np.asarray(ours), ref, rtol=5e-4, atol=5e-4)

        # CLS embedding export path
        emb = model.apply({"params": params}, jnp.asarray(ids), jnp.asarray(attn), method=TextERC.embed)
        assert emb.shape == (2, SMALL.hidden_size)

    def test_config_presets(self):
        assert RobertaConfig.base().hidden_size == 768
        assert RobertaConfig.large().num_hidden_layers == 24
