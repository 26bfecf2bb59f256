"""Scan<->unrolled parameter-layout conversion (mer_tpu/models/layout.py).

The two layouts of every encoder stack must be interchangeable: a checkpoint
written under one loads under the other with identical numerics. The
reference has a single fixed layout (torch; /root/reference/src/model.py:59),
so these tests are framework-infrastructure tests with no reference analog.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mer_tpu.models import M2FNet
from mer_tpu.models.layers import TransformerEncoder
from mer_tpu.models.layout import (
    match_layout,
    params_layout,
    stack_unrolled_params,
    unstack_scan_params,
)


def _tree_allclose(a, b):
    la, lb = jax.tree.leaves(a), jax.tree.leaves(b)
    assert len(la) == len(lb)
    assert jax.tree.structure(a) == jax.tree.structure(b)
    for x, y in zip(la, lb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=0, atol=0)


@pytest.fixture(scope="module")
def encoder_pair():
    kw = dict(d_model=32, nhead=4, num_layers=3, dim_feedforward=64, dropout=0.0)
    enc_scan = TransformerEncoder(scan_layers=True, **kw)
    enc_unrolled = TransformerEncoder(scan_layers=False, **kw)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 5, 32)).astype(np.float32))
    p_scan = enc_scan.init(jax.random.PRNGKey(0), x)["params"]
    return enc_scan, enc_unrolled, x, p_scan


class TestEncoderLayout:
    def test_unstack_matches_scan_output(self, encoder_pair):
        enc_scan, enc_unrolled, x, p_scan = encoder_pair
        p_unrolled = unstack_scan_params(p_scan, prefix="layers")
        y_scan = enc_scan.apply({"params": p_scan}, x)
        y_unrolled = enc_unrolled.apply({"params": p_unrolled}, x)
        np.testing.assert_allclose(np.asarray(y_scan), np.asarray(y_unrolled), atol=1e-6)

    def test_roundtrip_exact(self, encoder_pair):
        _, _, _, p_scan = encoder_pair
        p_rt = stack_unrolled_params(unstack_scan_params(p_scan, "layers"), "layers")
        _tree_allclose(p_scan, p_rt)

    def test_unrolled_structure_matches_init(self, encoder_pair):
        enc_scan, enc_unrolled, x, p_scan = encoder_pair
        p_ref = enc_unrolled.init(jax.random.PRNGKey(1), x)["params"]
        p_conv = unstack_scan_params(p_scan, "layers")
        assert jax.tree.structure(p_ref) == jax.tree.structure(p_conv)

    def test_layout_detection_and_match(self, encoder_pair):
        _, _, _, p_scan = encoder_pair
        assert params_layout(p_scan) == "scan"
        p_unrolled = unstack_scan_params(p_scan, "layers")
        assert params_layout(p_unrolled) == "unrolled"
        # no-op cases return the tree unchanged
        assert match_layout(p_scan, want_scan=True) is p_scan
        assert match_layout(p_unrolled, want_scan=False) is p_unrolled
        # conversion cases
        _tree_allclose(match_layout(p_unrolled, want_scan=True), p_scan)
        y = match_layout(p_scan, want_scan=False)
        _tree_allclose(y, p_unrolled)


class TestM2FNetLayout:
    def test_full_model_logits_equal_across_layouts(self):
        rng = np.random.default_rng(1)
        b, u, d = 2, 4, 32
        kw = dict(
            d_model_audio=d, d_model_text=d, d_model_fam=d,
            n_head_audio=4, n_head_text=4, n_head_fam=4,
            n_layers_audio=2, n_layers_text=2, n_layers_fam=2,
            hidden_size_classifier=d, dropout=0.0,
        )
        m_scan = M2FNet(scan_layers=True, **kw)
        m_unrolled = M2FNet(scan_layers=False, **kw)
        text = jnp.asarray(rng.normal(size=(b, u, d)).astype(np.float32))
        audio = jnp.asarray(rng.normal(size=(b, u, d)).astype(np.float32))
        pad = jnp.ones((b, u), bool)
        p_scan = m_scan.init(jax.random.PRNGKey(0), text, audio, pad)["params"]
        p_unrolled = unstack_scan_params(p_scan, "layers")
        y_scan = m_scan.apply({"params": p_scan}, text, audio, pad)
        y_unrolled = m_unrolled.apply({"params": p_unrolled}, text, audio, pad)
        np.testing.assert_allclose(np.asarray(y_scan), np.asarray(y_unrolled), atol=1e-6)
        # and back
        _tree_allclose(stack_unrolled_params(p_unrolled, "layers"), p_scan)

    def test_non_stack_suffixed_keys_untouched(self):
        # classifier_0/classifier_1 and fusion_layers_{i} must not be
        # mistaken for an unrolled "layers_{i}" stack
        tree = {
            "classifier_0": {"kernel": np.ones((2, 2))},
            "classifier_1": {"kernel": np.ones((2, 2))},
            "fusion_layers_0": {"w": np.ones(3)},
        }
        out = stack_unrolled_params(tree, "layers")
        assert set(out) == set(tree)


class TestRestoreAcrossLayouts:
    def test_checkpoint_roundtrip_scan_to_unrolled_and_back(self, tmp_path):
        """A checkpoint saved under one layout restores into the other via
        restore_into's automatic layout matching (params AND Adam moments),
        with identical numerics — flipping tpu.scan_layers between save and
        load must never orphan a checkpoint."""
        import optax

        from mer_tpu.train.checkpoint import load_checkpoint, restore_into, save_checkpoint

        rng = np.random.default_rng(3)
        kw = dict(d_model=32, nhead=4, num_layers=3, dim_feedforward=64, dropout=0.0)
        x = jnp.asarray(rng.normal(size=(2, 5, 32)).astype(np.float32))
        enc_scan = TransformerEncoder(scan_layers=True, **kw)
        enc_unrolled = TransformerEncoder(scan_layers=False, **kw)
        p_scan = enc_scan.init(jax.random.PRNGKey(0), x)["params"]
        opt = optax.adam(1e-3)
        s_scan = opt.init(p_scan)

        path = tmp_path / "enc.ckpt"
        save_checkpoint(path, epoch=4, params=p_scan, opt_state=s_scan)
        restored = load_checkpoint(path)

        p_tmpl = enc_unrolled.init(jax.random.PRNGKey(1), x)["params"]
        p_un = restore_into(p_tmpl, restored["params"])
        s_un = restore_into(opt.init(p_tmpl), restored["opt_state"])
        np.testing.assert_allclose(
            np.asarray(enc_unrolled.apply({"params": p_un}, x)),
            np.asarray(enc_scan.apply({"params": p_scan}, x)),
            atol=1e-6,
        )
        # Adam moments followed the params through the layout flip
        # (layout conversion happens on the state_dict form; NamedTuple
        # optax nodes themselves are not dicts)
        from flax import serialization

        sd_un = serialization.to_state_dict(jax.device_get(s_un))
        sd_scan_conv = unstack_scan_params(
            jax.tree.map(np.asarray, serialization.to_state_dict(jax.device_get(s_scan))), "layers")
        _tree_allclose(sd_un, sd_scan_conv)
        # and back: the unrolled save restores into the scan template
        save_checkpoint(path, epoch=5, params=p_un, opt_state=s_un)
        restored2 = load_checkpoint(path)
        p_rt = restore_into(p_scan, restored2["params"])
        _tree_allclose(p_rt, jax.tree.map(np.asarray, p_scan))
        s_rt = restore_into(s_scan, restored2["opt_state"])
        _tree_allclose(jax.tree.leaves(s_rt), jax.tree.leaves(jax.device_get(s_scan)))


class TestBackbonePrefix:
    def test_roberta_prefix_layer(self):
        from mer_tpu.models.roberta import RobertaConfig, RobertaModel

        cfg = RobertaConfig(
            vocab_size=64, hidden_size=32, num_hidden_layers=2,
            num_attention_heads=4, intermediate_size=64, max_position_embeddings=16,
        )
        m_scan = RobertaModel(cfg, scan_layers=True)
        m_unrolled = RobertaModel(cfg, scan_layers=False)
        ids = jnp.asarray(np.random.default_rng(0).integers(2, 60, size=(2, 8)), jnp.int32)
        mask = jnp.ones_like(ids)
        p_scan = m_scan.init(jax.random.PRNGKey(0), ids, mask)["params"]
        p_unrolled = unstack_scan_params(p_scan, prefix="layer")
        y_scan = m_scan.apply({"params": p_scan}, ids, mask)
        y_unrolled = m_unrolled.apply({"params": p_unrolled}, ids, mask)
        np.testing.assert_allclose(np.asarray(y_scan), np.asarray(y_unrolled), atol=1e-6)
        _tree_allclose(stack_unrolled_params(p_unrolled, "layer"), p_scan)
