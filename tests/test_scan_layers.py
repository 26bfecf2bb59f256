"""nn.scan-based encoders must be numerically identical to the unrolled ones
given the same (stacked) weights."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mer_tpu.models import M2FNet, TransformerEncoder
from mer_tpu.models.roberta import RobertaConfig, RobertaModel
from mer_tpu.models.torch_import import stack_layers
from mer_tpu.models.wav2vec2 import Wav2Vec2Config, Wav2Vec2Model

E, H, L = 32, 4, 3


def _stack_from_unrolled(unrolled: dict, n_layers: int, layer_prefix: str) -> dict:
    per_layer = [jax.tree.map(np.asarray, unrolled[f"{layer_prefix}{i}"]) for i in range(n_layers)]
    return {"layer": stack_layers(per_layer)}


class TestScanEquivalence:
    def test_transformer_encoder(self):
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(2, 6, E)).astype(np.float32))
        mask = jnp.asarray(rng.random((2, 6)) < 0.3)

        unrolled = TransformerEncoder(d_model=E, nhead=H, num_layers=L, dropout=0.1)
        params = unrolled.init(jax.random.PRNGKey(0), x, mask)["params"]
        ref = unrolled.apply({"params": params}, x, src_key_padding_mask=mask)

        scan_params = {
            "layers_scan": _stack_from_unrolled(params, L, "layers_"),
            "norm": params["norm"],
        }
        scanned = TransformerEncoder(d_model=E, nhead=H, num_layers=L, dropout=0.1, scan_layers=True)
        got = scanned.apply({"params": scan_params}, x, src_key_padding_mask=mask)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)

    def test_roberta(self):
        cfg = RobertaConfig(
            vocab_size=100, hidden_size=E, num_hidden_layers=L, num_attention_heads=H,
            intermediate_size=64, max_position_embeddings=40,
        )
        rng = np.random.default_rng(1)
        ids = jnp.asarray(rng.integers(3, 100, size=(2, 10)).astype(np.int32))
        attn = jnp.ones((2, 10), jnp.int32)

        unrolled = RobertaModel(cfg)
        params = unrolled.init(jax.random.PRNGKey(0), ids, attn)["params"]
        ref = unrolled.apply({"params": params}, ids, attn)

        scan_params = {k: v for k, v in params.items() if not k.startswith("layer_")}
        scan_params["layers_scan"] = _stack_from_unrolled(params, L, "layer_")
        got = RobertaModel(cfg, scan_layers=True).apply({"params": scan_params}, ids, attn)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)

    def test_wav2vec2(self):
        cfg = Wav2Vec2Config(
            conv_dim=(16, 16), conv_kernel=(10, 3), conv_stride=(5, 2),
            hidden_size=E, num_hidden_layers=L, num_attention_heads=H, intermediate_size=64,
            num_conv_pos_embeddings=16, num_conv_pos_embedding_groups=4,
        )
        rng = np.random.default_rng(2)
        waves = jnp.asarray(rng.normal(size=(2, 800)).astype(np.float32))
        lengths = jnp.asarray([800, 600])

        unrolled = Wav2Vec2Model(cfg)
        params = unrolled.init(jax.random.PRNGKey(0), waves, lengths)["params"]
        ref, ref_len = unrolled.apply({"params": params}, waves, lengths)

        scan_params = {k: v for k, v in params.items() if not k.startswith("layer_")}
        scan_params["layers_scan"] = _stack_from_unrolled(params, L, "layer_")
        got, got_len = Wav2Vec2Model(cfg, scan_layers=True).apply({"params": scan_params}, waves, lengths)
        np.testing.assert_array_equal(np.asarray(ref_len), np.asarray(got_len))
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)

    def test_m2fnet_scan_init_and_forward(self):
        model = M2FNet(
            d_model_audio=E, d_model_text=E, d_model_fam=E,
            n_head_audio=H, n_head_text=H, n_head_fam=H,
            n_layers_audio=2, n_layers_text=2, n_layers_fam=1,
            hidden_size_classifier=E, scan_layers=True,
        )
        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.normal(size=(2, 5, E)).astype(np.float32))
        mask = jnp.zeros((2, 5), bool)
        params = model.init(jax.random.PRNGKey(0), x, x, mask)
        out = model.apply(params, x, x, mask)
        assert out.shape == (2, 5, 7)

    def test_tp_specs_cover_scanned_tree(self):
        from jax.sharding import PartitionSpec as P

        from mer_tpu.parallel import m2fnet_param_specs

        model = M2FNet(
            d_model_audio=E, d_model_text=E, d_model_fam=E,
            n_head_audio=H, n_head_text=H, n_head_fam=H,
            n_layers_audio=2, n_layers_text=2, n_layers_fam=1,
            hidden_size_classifier=E, scan_layers=True,
        )
        rng = np.random.default_rng(4)
        x = jnp.asarray(rng.normal(size=(2, 5, E)).astype(np.float32))
        mask = jnp.zeros((2, 5), bool)
        params = model.init(jax.random.PRNGKey(0), x, x, mask)["params"]
        specs = m2fnet_param_specs(params)
        # every sharded spec must have rank <= its leaf rank and shard a
        # dimension divisible by a typical tp size
        flat_p = jax.tree_util.tree_flatten_with_path(params)[0]
        flat_s = {jax.tree_util.keystr(k): s for k, s in jax.tree_util.tree_flatten_with_path(specs)[0]}
        n_tp = 0
        for key, leaf in flat_p:
            spec = flat_s[jax.tree_util.keystr(key)]
            assert len(spec) <= leaf.ndim, (key, spec, leaf.shape)
            for dim, axis in enumerate(spec):
                if axis == "tp":
                    assert leaf.shape[dim] % 2 == 0
                    n_tp += 1
        assert n_tp > 0


class TestRematEquivalence:
    """remat=True must change memory, never numerics: loss and grads equal."""

    @pytest.mark.parametrize("scan_layers", [True, False])
    def test_roberta_remat_grads_equal(self, scan_layers):
        from mer_tpu.models.roberta import RobertaConfig, TextERC

        cfg = RobertaConfig(
            vocab_size=300, hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
            intermediate_size=64, max_position_embeddings=40,
        )
        rng = np.random.default_rng(0)
        ids = jnp.asarray(rng.integers(2, 300, size=(2, 9)).astype(np.int32))
        mask = jnp.ones((2, 9), jnp.int32)
        labels = jnp.asarray([1, 4])

        grads = {}
        params = None
        for remat in [False, True]:
            model = TextERC(cfg, scan_layers=scan_layers, remat=remat)
            if params is None:
                params = model.init(jax.random.PRNGKey(0), ids, mask)["params"]

            def loss_fn(p):
                logits = model.apply({"params": p}, ids, mask)
                return -jnp.mean(
                    jnp.take_along_axis(jax.nn.log_softmax(logits), labels[:, None], axis=1)
                )

            loss, g = jax.jit(jax.value_and_grad(loss_fn))(params)
            grads[remat] = (float(loss), g)

        np.testing.assert_allclose(grads[False][0], grads[True][0], rtol=1e-6)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(a, b, rtol=2e-3, atol=1e-5),
            grads[False][1], grads[True][1],
        )

    def test_wav2vec2_remat_grads_equal(self):
        from mer_tpu.models.wav2vec2 import AudioERC, Wav2Vec2Config

        cfg = Wav2Vec2Config(
            conv_dim=(8, 8), conv_kernel=(10, 3), conv_stride=(5, 2),
            hidden_size=16, num_hidden_layers=2, num_attention_heads=2, intermediate_size=32,
            num_conv_pos_embeddings=8, num_conv_pos_embedding_groups=2,
        )
        rng = np.random.default_rng(1)
        waves = jnp.asarray(rng.normal(size=(2, 800)).astype(np.float32) * 0.1)
        lengths = jnp.asarray(np.array([800, 600], np.int32))
        labels = jnp.asarray([0, 6])

        grads = {}
        params = None
        for remat in [False, True]:
            model = AudioERC(cfg, scan_layers=True, remat=remat)
            if params is None:
                params = model.init(jax.random.PRNGKey(1), waves, lengths)["params"]

            def loss_fn(p):
                logits = model.apply({"params": p}, waves, lengths)
                return -jnp.mean(
                    jnp.take_along_axis(jax.nn.log_softmax(logits), labels[:, None], axis=1)
                )

            loss, g = jax.jit(jax.value_and_grad(loss_fn))(params)
            grads[remat] = (float(loss), g)

        np.testing.assert_allclose(grads[False][0], grads[True][0], rtol=1e-6)
        # remat recomputes the forward inside the backward; XLA refuses
        # bit-identical guarantees there, so compare at float tolerance
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(a, b, rtol=2e-3, atol=1e-5),
            grads[False][1], grads[True][1],
        )


class TestRematPolicies:
    """Selective remat policies (utils/remat.py) change what the backward
    saves, never the numerics — grads equal across full/dots/dots_no_batch,
    both in the nn.remat model path and through the pp pipeline."""

    def test_roberta_policy_grads_equal(self):
        from mer_tpu.models.roberta import RobertaConfig, TextERC

        cfg = RobertaConfig(
            vocab_size=300, hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
            intermediate_size=64, max_position_embeddings=40,
        )
        rng = np.random.default_rng(2)
        ids = jnp.asarray(rng.integers(2, 300, size=(2, 9)).astype(np.int32))
        mask = jnp.ones((2, 9), jnp.int32)

        grads = {}
        params = None
        for policy in [None, "dots", "dots_no_batch"]:
            model = TextERC(cfg, scan_layers=True, remat=True, remat_policy=policy)
            if params is None:
                params = model.init(jax.random.PRNGKey(0), ids, mask)["params"]
            loss_fn = lambda p, m=model: jnp.mean(m.apply({"params": p}, ids, mask) ** 2)
            grads[policy] = jax.jit(jax.grad(loss_fn))(params)
        for policy in ["dots", "dots_no_batch"]:
            jax.tree.map(
                lambda a, b: np.testing.assert_allclose(a, b, rtol=2e-3, atol=1e-5),
                grads[None], grads[policy],
            )

    def test_unknown_policy_rejected(self):
        from mer_tpu.utils.remat import resolve_remat_policy

        with pytest.raises(ValueError, match="unknown remat policy"):
            resolve_remat_policy("everything")
        assert resolve_remat_policy(None) is None
        assert resolve_remat_policy("full") is None

    def test_pipeline_policy_grads_equal(self):
        from mer_tpu.parallel import make_pp_mesh, text_erc_logits_pp
        from mer_tpu.models.roberta import RobertaConfig, TextERC

        cfg = RobertaConfig(
            vocab_size=64, hidden_size=32, num_hidden_layers=4,
            num_attention_heads=4, intermediate_size=64,
            max_position_embeddings=40, num_labels=7,
        )
        model = TextERC(cfg, scan_layers=True)
        rng = np.random.default_rng(3)
        ids = jnp.asarray(rng.integers(2, 64, size=(8, 10)).astype(np.int32))
        mask = jnp.ones((8, 10), jnp.int32)
        params = model.init(jax.random.PRNGKey(0), ids, mask)["params"]
        mesh = make_pp_mesh(pp=2, dp=4)

        def loss(p, remat):
            return jnp.mean(text_erc_logits_pp(p, cfg, mesh, ids, mask, remat=remat) ** 2)

        g_ref = jax.jit(jax.grad(lambda p: loss(p, False)))(params)
        for remat in [True, "dots", "dots_no_batch"]:
            g = jax.jit(jax.grad(lambda p: loss(p, remat)))(params)
            jax.tree.map(
                lambda a, b: np.testing.assert_allclose(a, b, rtol=2e-3, atol=1e-5),
                g_ref, g,
            )
