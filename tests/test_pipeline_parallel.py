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
