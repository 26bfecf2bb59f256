"""Pipeline parallelism (parallel/pipeline.py) on the virtual CPU mesh:
forward/grad equality vs the sequential layer scan, microbatch schedules,
mask side-inputs, dp composition, and a full jitted train step."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh

from mer_tpu.parallel.pipeline import make_pp_mesh, pipeline_apply

D = 16
L = 8


def _layer_fn(p, x, mask=None):
    """One residual MLP 'encoder layer'; mask (True=pad) zeroes pad rows."""
    h = jnp.tanh(x @ p["w1"] + p["b1"])
    out = x + h @ p["w2"]
    if mask is not None:
        out = jnp.where(mask[..., None], 0.0, out)
    return out


def _stacked_params(seed=0):
    rng = np.random.default_rng(seed)
    return {
        "w1": jnp.asarray(rng.normal(size=(L, D, 2 * D)).astype(np.float32) * 0.2),
        "b1": jnp.asarray(rng.normal(size=(L, 2 * D)).astype(np.float32) * 0.1),
        "w2": jnp.asarray(rng.normal(size=(L, 2 * D, D)).astype(np.float32) * 0.2),
    }


def _sequential(params, x, mask=None):
    def body(c, p):
        return _layer_fn(p, c, mask), None

    return lax.scan(body, x, params)[0]


def _x(b=8, t=4, seed=1):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.normal(size=(b, t, D)).astype(np.float32))


@pytest.mark.parametrize("pp,m", [(2, 2), (4, 4), (4, 8), (8, 8)])
def test_forward_matches_sequential(pp, m):
    mesh = make_pp_mesh(pp=pp)
    params, x = _stacked_params(), _x(b=8)
    ref = np.asarray(_sequential(params, x))
    got = np.asarray(
        jax.jit(
            lambda p, xx: pipeline_apply(p, xx, _layer_fn, mesh, microbatches=m)
        )(params, x)
    )
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-6)


def test_forward_with_mask_extra():
    mesh = make_pp_mesh(pp=4)
    params, x = _stacked_params(2), _x(b=8, seed=3)
    mask = jnp.asarray(np.random.default_rng(4).random((8, 4)) < 0.3)
    ref = np.asarray(_sequential(params, x, mask))
    got = np.asarray(
        pipeline_apply(params, x, _layer_fn, mesh, microbatches=8, extra=mask)
    )
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-6)


def test_grads_match_sequential():
    """Autodiff through the pipeline = the reverse-schedule backward."""
    mesh = make_pp_mesh(pp=4)
    params, x = _stacked_params(5), _x(b=8, seed=6)

    def loss_pp(p, xx):
        return jnp.sum(pipeline_apply(p, xx, _layer_fn, mesh, microbatches=4) ** 2)

    def loss_ref(p, xx):
        return jnp.sum(_sequential(p, xx) ** 2)

    gp, gx = jax.jit(jax.grad(loss_pp, argnums=(0, 1)))(params, x)
    rp, rx = jax.grad(loss_ref, argnums=(0, 1))(params, x)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(rx), rtol=1e-5, atol=1e-5)
    for k in params:
        np.testing.assert_allclose(
            np.asarray(gp[k]), np.asarray(rp[k]), rtol=1e-5, atol=1e-5, err_msg=k
        )


def test_dp_composition():
    """(dp=2, pp=4): microbatch rows stay dp-sharded through the pipeline."""
    mesh = make_pp_mesh(pp=4, dp=2)
    params, x = _stacked_params(7), _x(b=8, seed=8)
    ref = np.asarray(_sequential(params, x))
    got = np.asarray(
        jax.jit(
            lambda p, xx: pipeline_apply(
                p, xx, _layer_fn, mesh, microbatches=4, batch_axis="dp"
            )
        )(params, x)
    )
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-6)


def test_full_train_step_on_dp_pp_mesh():
    """One jitted SGD step over (dp=2, pp=4): grads of a CE-style loss on
    the pipelined forward, params updated, loss finite and equal to the
    sequential step's."""
    mesh = make_pp_mesh(pp=4, dp=2)
    params, x = _stacked_params(9), _x(b=8, seed=10)
    y = jnp.asarray(np.random.default_rng(11).normal(size=(8, 4, D)).astype(np.float32))

    def make_step(fwd):
        def step(p, xx, yy):
            def loss_fn(pp_):
                return jnp.mean((fwd(pp_, xx) - yy) ** 2)

            loss, g = jax.value_and_grad(loss_fn)(p)
            return jax.tree.map(lambda a, b: a - 0.1 * b, p, g), loss

        return jax.jit(step)

    pp_step = make_step(
        lambda p, xx: pipeline_apply(p, xx, _layer_fn, mesh, microbatches=4, batch_axis="dp")
    )
    ref_step = make_step(_sequential)

    p1, l1 = pp_step(params, x, y)
    p0, l0 = ref_step(params, x, y)
    assert np.isfinite(float(l1))
    np.testing.assert_allclose(float(l1), float(l0), rtol=1e-6)
    for k in params:
        np.testing.assert_allclose(
            np.asarray(p1[k]), np.asarray(p0[k]), rtol=1e-5, atol=1e-6, err_msg=k
        )


def test_rejects_indivisible():
    mesh = make_pp_mesh(pp=4)
    params, x = _stacked_params(), _x(b=6)
    with pytest.raises(ValueError, match="microbatches"):
        pipeline_apply(params, x, _layer_fn, mesh, microbatches=4)
    params3 = jax.tree.map(lambda a: a[:6], params)
    with pytest.raises(ValueError, match="pp"):
        pipeline_apply(params3, _x(b=8), _layer_fn, mesh, microbatches=4)


class TestRealEncoderLayers:
    """scanned_layer_pipeline over the repo's actual encoder layers equals
    the nn.scan execution of the same stacked params."""

    @staticmethod
    def _stack_and_run(layer_module, init_layer_params, b, s, d, pp, seed):
        rng = np.random.default_rng(seed)
        stacked = jax.tree.map(
            lambda leaf: jnp.stack([leaf + 0.01 * i for i in range(L)]), init_layer_params
        )
        hidden = jnp.asarray(rng.normal(size=(b, s, d)).astype(np.float32))
        mask = jnp.asarray(rng.random((b, s)) < 0.2)

        def body(c, p):
            return layer_module.apply({"params": p}, c, mask, True), None

        ref = np.asarray(lax.scan(body, hidden, stacked)[0])
        from mer_tpu.parallel import scanned_layer_pipeline

        mesh = make_pp_mesh(pp=pp)
        got = np.asarray(
            jax.jit(
                lambda sp, h, m: scanned_layer_pipeline(
                    layer_module, sp, h, m, mesh, microbatches=b // 1
                )
            )(stacked, hidden, mask)
        )
        np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)

    def test_wav2vec2_encoder_layer(self):
        from mer_tpu.models.wav2vec2 import Wav2Vec2Config, Wav2Vec2EncoderLayer

        cfg = Wav2Vec2Config(hidden_size=32, num_attention_heads=4, intermediate_size=64)
        layer = Wav2Vec2EncoderLayer(cfg)
        hidden = jnp.zeros((2, 5, 32))
        p0 = layer.init(jax.random.PRNGKey(0), hidden, jnp.zeros((2, 5), bool))["params"]
        self._stack_and_run(layer, p0, b=8, s=5, d=32, pp=4, seed=20)

    def test_roberta_layer(self):
        from mer_tpu.models.roberta import RobertaConfig, RobertaLayer

        cfg = RobertaConfig(
            hidden_size=32, num_attention_heads=4, intermediate_size=64,
            num_hidden_layers=L, vocab_size=64, max_position_embeddings=16,
        )
        layer = RobertaLayer(cfg)
        hidden = jnp.zeros((2, 5, 32))
        p0 = layer.init(jax.random.PRNGKey(1), hidden, jnp.zeros((2, 5), bool))["params"]
        self._stack_and_run(layer, p0, b=8, s=5, d=32, pp=4, seed=21)


class TestFESolverPP:
    """--pp wired into FESolver (VERDICT r3 #4): the split pp forwards
    (parallel/pp_forward.py) equal the monolithic model.apply, and a full
    FESolver fine-tune train step over a (dp, pp) mesh equals the dp-only
    solver at equal global batch (dropout rates 0 for exactness)."""

    @staticmethod
    def _fe_config(tmp_path):
        from mer_tpu.core.config import Config

        return Config(
            {
                "checkpoint": {"save_path": str(tmp_path / "c.ckpt"), "save_checkpoint": False},
                "solver": {
                    "loss_fn": "CE", "balance_classes": False,
                    "warmup_epochs": 0, "num_frozen_epochs": 0,
                    "frozen_lr": 1e-3, "finetuning_lr": 1e-3, "weight_decay": 0.01,
                    "epochs": 1,
                    "early_stopping": {"enabled": False, "patience": 1, "restore_best_weights": False},
                },
                "wandb": {"enabled": False},
            }
        )

    @staticmethod
    def _text_setup():
        from mer_tpu.models.roberta import RobertaConfig, TextERC

        cfg = RobertaConfig(
            vocab_size=64, hidden_size=32, num_hidden_layers=4,
            num_attention_heads=4, intermediate_size=64,
            max_position_embeddings=40, num_labels=7,
            hidden_dropout=0.0, attention_dropout=0.0,
        )
        model = TextERC(cfg, scan_layers=True)
        rng = np.random.default_rng(0)
        batch = {
            "text": rng.integers(2, 64, size=(8, 10)).astype(np.int32),
            "attention_mask": np.ones((8, 10), np.int32),
            "emotion": rng.integers(0, 7, size=(8,)).astype(np.int32),
        }
        return cfg, model, batch

    def test_text_pp_forward_equals_model(self):
        from mer_tpu.parallel import text_erc_logits_pp

        cfg, model, batch = self._text_setup()
        ids, mask = jnp.asarray(batch["text"]), jnp.asarray(batch["attention_mask"])
        params = model.init(jax.random.PRNGKey(0), ids, mask)["params"]
        ref = model.apply({"params": params}, ids, mask, deterministic=True)
        mesh = make_pp_mesh(pp=2, dp=4)
        got = jax.jit(lambda p, i, m: text_erc_logits_pp(p, cfg, mesh, i, m))(params, ids, mask)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)

    def test_audio_pp_forward_equals_model(self):
        from mer_tpu.models.wav2vec2 import AudioERC, Wav2Vec2Config
        from mer_tpu.parallel import audio_erc_logits_pp

        cfg = Wav2Vec2Config(
            conv_dim=(16, 16, 16), conv_kernel=(10, 3, 2), conv_stride=(5, 2, 2),
            hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
            intermediate_size=64, num_conv_pos_embeddings=16,
            num_conv_pos_embedding_groups=4, hidden_dropout=0.0, attention_dropout=0.0,
        )
        model = AudioERC(cfg, scan_layers=True)
        rng = np.random.default_rng(1)
        waves = jnp.asarray(rng.normal(size=(8, 400)).astype(np.float32) * 0.1)
        lengths = jnp.asarray(rng.integers(200, 400, size=(8,)).astype(np.int32))
        params = model.init(jax.random.PRNGKey(0), waves, lengths)["params"]
        ref = model.apply({"params": params}, waves, lengths, deterministic=True)
        mesh = make_pp_mesh(pp=2, dp=4)
        got = jax.jit(lambda p, w, l: audio_erc_logits_pp(p, cfg, mesh, w, l))(params, waves, lengths)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)

    def test_text_train_step_equality_vs_dp_only(self, tmp_path):
        """Equal global batch, equal seeds, dropout 0: the pp train step must
        produce identical losses and parameters to the plain solver."""
        from mer_tpu.parallel import text_erc_logits_pp
        from mer_tpu.train import FESolver

        cfg, model, batch = self._text_setup()
        config = self._fe_config(tmp_path)
        inputs_fn = lambda b: (b["text"], b["attention_mask"])

        solver0 = FESolver(model, config, backbone_key="roberta",
                           batch_to_inputs=inputs_fn, seed=0)
        state0 = solver0.init_state(batch, steps_per_epoch=2)

        mesh = make_pp_mesh(pp=2, dp=4)

        def pp_fn(params, ids, m, *, deterministic, rng):
            return text_erc_logits_pp(
                params, cfg, mesh, ids, m,
                deterministic=deterministic, rng=rng, batch_axis="dp")

        solver1 = FESolver(model, config, backbone_key="roberta",
                           batch_to_inputs=inputs_fn, seed=0,
                           mesh=mesh, pp_logits_fn=pp_fn)
        state1 = solver1.init_state(batch, steps_per_epoch=2)

        dev = jax.tree.map(jnp.asarray, batch)
        key = jax.random.PRNGKey(0)
        for _ in range(2):
            state0, l0 = solver0._step_finetune(state0, dev, key)
            state1, l1 = solver1._step_finetune(state1, dev, key)
            np.testing.assert_allclose(float(l0), float(l1), rtol=1e-5)
        for (p0, l0), (p1, l1) in zip(
            jax.tree_util.tree_leaves_with_path(state0["params"]),
            jax.tree_util.tree_leaves_with_path(state1["params"]),
        ):
            if "key'), DictKey(key='bias'" in str(p0):
                # attention key bias is softmax-shift-invariant: its gradient
                # is numerical noise, which Adam normalizes to lr-scale
                # updates — raw comparison is meaningless there.  The logits
                # check below covers it functionally.
                continue
            np.testing.assert_allclose(
                np.asarray(l0), np.asarray(l1), rtol=2e-5, atol=2e-5,
                err_msg=str(p0))
        # functional equality of the updated models (covers every param that
        # can influence the forward)
        out0 = model.apply({"params": state0["params"]}, dev["text"],
                           dev["attention_mask"], deterministic=True)
        out1 = model.apply({"params": state1["params"]}, dev["text"],
                           dev["attention_mask"], deterministic=True)
        np.testing.assert_allclose(np.asarray(out0), np.asarray(out1), rtol=5e-5, atol=5e-5)

    def test_text_pp_eval_step(self, tmp_path):
        """The pp eval path (deterministic, no rng) runs and matches."""
        from mer_tpu.parallel import text_erc_logits_pp
        from mer_tpu.train import FESolver

        cfg, model, batch = self._text_setup()
        config = self._fe_config(tmp_path)
        inputs_fn = lambda b: (b["text"], b["attention_mask"])
        mesh = make_pp_mesh(pp=2, dp=4)

        def pp_fn(params, ids, m, *, deterministic, rng):
            return text_erc_logits_pp(
                params, cfg, mesh, ids, m,
                deterministic=deterministic, rng=rng, batch_axis="dp")

        solver = FESolver(model, config, backbone_key="roberta",
                          batch_to_inputs=inputs_fn, seed=0,
                          mesh=mesh, pp_logits_fn=pp_fn)
        state = solver.init_state(batch, steps_per_epoch=1)
        dev = jax.tree.map(jnp.asarray, batch)
        loss, preds = solver._eval_step(state["params"], dev)
        assert np.isfinite(float(loss)) and preds.shape == (8,)

    def test_pp_dropout_train_step_runs(self, tmp_path):
        """Dropout > 0 through the pipelined stack: rng threading produces a
        finite loss and changed params (distribution-level check only — the
        fold-in structure deliberately differs from nn.scan's)."""
        from mer_tpu.models.roberta import RobertaConfig, TextERC
        from mer_tpu.parallel import text_erc_logits_pp
        from mer_tpu.train import FESolver

        cfg = RobertaConfig(
            vocab_size=64, hidden_size=32, num_hidden_layers=4,
            num_attention_heads=4, intermediate_size=64,
            max_position_embeddings=40, num_labels=7,
            hidden_dropout=0.1, attention_dropout=0.1,
        )
        model = TextERC(cfg, scan_layers=True)
        rng = np.random.default_rng(0)
        batch = {
            "text": rng.integers(2, 64, size=(8, 10)).astype(np.int32),
            "attention_mask": np.ones((8, 10), np.int32),
            "emotion": rng.integers(0, 7, size=(8,)).astype(np.int32),
        }
        config = self._fe_config(tmp_path)
        mesh = make_pp_mesh(pp=2, dp=4)

        def pp_fn(params, ids, m, *, deterministic, rng):
            return text_erc_logits_pp(
                params, cfg, mesh, ids, m,
                deterministic=deterministic, rng=rng, batch_axis="dp")

        solver = FESolver(model, config, backbone_key="roberta",
                          batch_to_inputs=lambda b: (b["text"], b["attention_mask"]),
                          seed=0, mesh=mesh, pp_logits_fn=pp_fn)
        state = solver.init_state(batch, steps_per_epoch=1)
        before = jax.tree.map(np.asarray, state["params"])
        dev = jax.tree.map(jnp.asarray, batch)
        # two steps: the warmup schedule runs the FIRST optimizer step at
        # lr=0 (HF parity — train/solver.py::constant_with_warmup)
        state, loss = solver._step_finetune(state, dev, jax.random.PRNGKey(0))
        state, loss = solver._step_finetune(state, dev, jax.random.PRNGKey(0))
        assert np.isfinite(float(loss))
        after = jax.tree.map(np.asarray, state["params"])
        changed = any(
            not np.allclose(b, a)
            for b, a in zip(jax.tree.leaves(before), jax.tree.leaves(after))
        )
        assert changed

    def test_wav2vec2_train_step_equality_vs_dp_only(self, tmp_path):
        """Same contract for the audio backbone: FESolver pp train step ==
        dp-only at equal global batch (dropout 0)."""
        from mer_tpu.models.wav2vec2 import AudioERC, Wav2Vec2Config
        from mer_tpu.parallel import audio_erc_logits_pp
        from mer_tpu.train import FESolver

        cfg = Wav2Vec2Config(
            conv_dim=(16, 16, 16), conv_kernel=(10, 3, 2), conv_stride=(5, 2, 2),
            hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
            intermediate_size=64, num_conv_pos_embeddings=16,
            num_conv_pos_embedding_groups=4, hidden_dropout=0.0, attention_dropout=0.0,
        )
        model = AudioERC(cfg, scan_layers=True)
        rng = np.random.default_rng(3)
        batch = {
            "waveforms": (rng.normal(size=(8, 400)) * 0.1).astype(np.float32),
            "lengths": rng.integers(200, 400, size=(8,)).astype(np.int32),
            "emotion": rng.integers(0, 7, size=(8,)).astype(np.int32),
        }
        config = self._fe_config(tmp_path)
        inputs_fn = lambda b: (b["waveforms"], b["lengths"])

        solver0 = FESolver(model, config, backbone_key="wav2vec2",
                           batch_to_inputs=inputs_fn, seed=0)
        state0 = solver0.init_state(batch, steps_per_epoch=2)

        mesh = make_pp_mesh(pp=2, dp=4)

        def pp_fn(params, w, l, *, deterministic, rng):
            return audio_erc_logits_pp(
                params, cfg, mesh, w, l,
                deterministic=deterministic, rng=rng, batch_axis="dp")

        solver1 = FESolver(model, config, backbone_key="wav2vec2",
                           batch_to_inputs=inputs_fn, seed=0,
                           mesh=mesh, pp_logits_fn=pp_fn)
        state1 = solver1.init_state(batch, steps_per_epoch=2)

        dev = jax.tree.map(jnp.asarray, batch)
        key = jax.random.PRNGKey(0)
        for _ in range(2):
            state0, l0 = solver0._step_finetune(state0, dev, key)
            state1, l1 = solver1._step_finetune(state1, dev, key)
            np.testing.assert_allclose(float(l0), float(l1), rtol=1e-5)
        out0 = model.apply({"params": state0["params"]}, dev["waveforms"],
                           dev["lengths"], deterministic=True)
        out1 = model.apply({"params": state1["params"]}, dev["waveforms"],
                           dev["lengths"], deterministic=True)
        np.testing.assert_allclose(np.asarray(out0), np.asarray(out1), rtol=5e-5, atol=5e-5)

    def test_remat_grad_equality(self):
        """remat=True through the pipelined stack: identical gradients, one
        extra forward in the reverse schedule (memory<->FLOPs only)."""
        from mer_tpu.parallel import text_erc_logits_pp

        cfg, model, batch = self._text_setup()
        ids, mask = jnp.asarray(batch["text"]), jnp.asarray(batch["attention_mask"])
        params = model.init(jax.random.PRNGKey(0), ids, mask)["params"]
        mesh = make_pp_mesh(pp=2, dp=4)

        def loss(p, remat):
            out = text_erc_logits_pp(p, cfg, mesh, ids, mask, remat=remat)
            return jnp.mean(out ** 2)

        g0 = jax.jit(jax.grad(lambda p: loss(p, False)))(params)
        g1 = jax.jit(jax.grad(lambda p: loss(p, True)))(params)
        for (k0, l0), (k1, l1) in zip(
            jax.tree_util.tree_leaves_with_path(g0),
            jax.tree_util.tree_leaves_with_path(g1),
        ):
            np.testing.assert_allclose(
                np.asarray(l0), np.asarray(l1), rtol=1e-5, atol=1e-6, err_msg=str(k0))
