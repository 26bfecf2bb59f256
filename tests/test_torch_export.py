"""Flax -> torch checkpoint export (models/torch_export.py).

Proves the reverse interchange direction: params trained here load into the
LIVE reference torch M2FNet (strict state_dict load) and produce the same
logits, and the export/import pair roundtrips exactly.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mer_tpu.models import M2FNet
from mer_tpu.models.torch_export import export_m2fnet_state_dict, save_reference_checkpoint
from mer_tpu.models.torch_import import convert_m2fnet_state_dict

D, H = 32, 4


def _model(scan_layers=False, n_layers_classifier=2):
    return M2FNet(
        d_model_audio=D, d_model_text=D, d_model_fam=D,
        n_head_audio=H, n_head_text=H, n_head_fam=H,
        n_layers_audio=2, n_layers_text=2, n_layers_fam=2,
        n_layers_classifier=n_layers_classifier, hidden_size_classifier=D,
        dropout=0.0, scan_layers=scan_layers,
    )


def _init(model, seed=0):
    x = jnp.zeros((2, 5, D))
    mask = jnp.zeros((2, 5), bool)
    return model.init(jax.random.PRNGKey(seed), x, x, mask)["params"]


class TestRoundtrip:
    @pytest.mark.parametrize("scan_layers", [False, True])
    @pytest.mark.parametrize("n_layers_classifier", [2, 3])
    def test_export_import_identity(self, scan_layers, n_layers_classifier):
        model = _model(scan_layers, n_layers_classifier)
        params = _init(model)
        sd = export_m2fnet_state_dict(params, model)
        back = convert_m2fnet_state_dict(sd, model)

        flat_a = jax.tree_util.tree_flatten_with_path(jax.tree.map(np.asarray, params))[0]
        flat_b = jax.tree_util.tree_flatten_with_path(back)[0]
        assert len(flat_a) == len(flat_b)
        for (ka, va), (kb, vb) in zip(flat_a, flat_b):
            assert jax.tree_util.keystr(ka) == jax.tree_util.keystr(kb)
            np.testing.assert_array_equal(va, vb, err_msg=jax.tree_util.keystr(ka))


class TestLoadsIntoLiveReference:
    def test_strict_load_and_logit_parity(self, tmp_path):
        torch = pytest.importorskip("torch")
        from mer_tpu.parity import reference_available, reference_model_config
        from mer_tpu.parity.reference_fusion import load_reference_model_module

        if not reference_available():
            pytest.skip("reference tree not mounted")

        cfg = reference_model_config(
            d=D, n_head=H, n_encoder_layers=2, n_fam_layers=2,
            hidden_size=D, n_classifier_layers=2, dropout=0.0,
        )
        model = M2FNet.from_config(cfg, scan_layers=True)
        params = _init(model, seed=3)

        path = str(tmp_path / "m2fnet_exported.pth")
        save_reference_checkpoint(path, params, model, epoch=7)

        ckpt = torch.load(path, map_location="cpu", weights_only=True)
        assert ckpt["epoch"] == 7
        ref = load_reference_model_module().M2FNet(cfg)
        # strict: every reference key must be present with the right shape
        ref.load_state_dict(ckpt["model_state_dict"], strict=True)
        ref.eval()

        rng = np.random.default_rng(0)
        text = rng.normal(size=(3, 6, D)).astype(np.float32)
        audio = rng.normal(size=(3, 6, D)).astype(np.float32)
        mask = np.zeros((3, 6), bool)
        mask[:, 5:] = True

        with torch.no_grad():
            want = ref(
                torch.from_numpy(text), torch.from_numpy(audio), torch.from_numpy(mask)
            ).numpy()
        got = np.asarray(
            model.apply(
                {"params": params}, jnp.asarray(text), jnp.asarray(audio), jnp.asarray(mask),
                deterministic=True,
            )
        )
        keep = ~mask
        np.testing.assert_allclose(got[keep], want[keep], rtol=2e-4, atol=2e-5)
