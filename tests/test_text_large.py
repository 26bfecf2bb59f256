"""roberta-large variant smoke coverage (reference README.md:30 documents a
`text_large` embeddings variant; SURVEY C32).  Pretrained weights are
unavailable offline, so this pins the config plumbing and a random-init
end-to-end forward at the large dims."""

import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mer_tpu.core import Config
from mer_tpu.models.roberta import RobertaConfig, TextERC

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO_ROOT, "src", "feature_extractors"))


class TestVariantResolution:
    def _args(self, **kw):
        base = {"variant": None, "random_init": True, "toy_tokenizer": True,
                "pretrained": None, "remat": False, "bf16": False, "f32": False}
        base.update(kw)
        return type("A", (), base)()

    def test_flag_selects_large(self):
        import fe_common

        model, tokenizer, pretrained = fe_common.load_text_model_and_tokenizer(
            self._args(variant="roberta-large")
        )
        assert model.cfg.hidden_size == 1024
        assert model.cfg.num_hidden_layers == 24
        assert pretrained is None  # random-init

    def test_config_knob_selects_large(self):
        """The reference's knob: test.pretrained_model (text/config.yaml)."""
        import fe_common

        cfg = Config({"test": {"pretrained_model": "roberta-large"},
                      "tpu": {"compute_dtype": "float32"}})
        model, _, _ = fe_common.load_text_model_and_tokenizer(self._args(), config=cfg)
        assert model.cfg.hidden_size == 1024

    def test_default_is_base(self):
        import fe_common

        model, _, _ = fe_common.load_text_model_and_tokenizer(self._args())
        assert model.cfg.hidden_size == 768
        assert model.cfg.num_hidden_layers == 12


class TestLargeForwardSmoke:
    def test_random_init_large_embeds_and_classifies(self):
        """Full roberta-large dims end-to-end: init -> [CLS] embed (1024-d,
        the text_large artifact width) -> 7-class logits."""
        cfg = RobertaConfig.large()
        assert (cfg.hidden_size, cfg.num_hidden_layers, cfg.num_attention_heads,
                cfg.intermediate_size) == (1024, 24, 16, 4096)
        model = TextERC(cfg, scan_layers=True)
        ids = jnp.asarray(np.random.default_rng(0).integers(3, 1000, size=(2, 12)), jnp.int32)
        mask = jnp.ones((2, 12), jnp.int32)
        params = model.init(jax.random.PRNGKey(0), ids, mask)["params"]
        # scan-stacked: 24 layers on the leading axis
        assert params["roberta"]["layers_scan"]["layer"]["attention_output"]["kernel"].shape == (24, 1024, 1024)

        emb = model.apply({"params": params}, ids, mask, method=TextERC.embed)
        assert emb.shape == (2, 1024)  # the text_large embedding width
        logits = model.apply({"params": params}, ids, mask)
        assert logits.shape == (2, 7)
        assert np.isfinite(np.asarray(logits)).all()
