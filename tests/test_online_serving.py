"""OnlineServer (serving/online.py): dynamic micro-batching correctness —
per-request predictions equal the direct model forward regardless of how
requests were batched; latency budget and shape-bucket reuse behave."""

import threading
import time

import numpy as np

import jax
import jax.numpy as jnp

from mer_tpu.models import M2FNet
from mer_tpu.serving import OnlineServer

D = 32


def _small_model():
    model = M2FNet(
        d_model_audio=D, d_model_text=D, d_model_fam=D,
        n_head_audio=4, n_head_text=4, n_head_fam=4,
        n_layers_audio=2, n_layers_text=2, n_layers_fam=2,
        hidden_size_classifier=D, scan_layers=True,
    )
    text = jnp.zeros((2, 4, D))
    params = model.init(jax.random.PRNGKey(0), text, text, jnp.zeros((2, 4), bool))["params"]

    @jax.jit
    def predict(p, text, audio, mask):
        return jnp.argmax(model.apply({"params": p}, text, audio, mask, deterministic=True), -1)

    return model, params, predict


def _requests(n, rng):
    out = []
    for _ in range(n):
        u = int(rng.integers(1, 9))
        out.append((rng.normal(size=(u, D)).astype(np.float32),
                    rng.normal(size=(u, D)).astype(np.float32)))
    return out


class TestOnlineServer:
    def test_predictions_match_direct_forward(self):
        model, params, predict = _small_model()
        rng = np.random.default_rng(0)
        reqs = _requests(20, rng)

        with OnlineServer(lambda t, a, m: predict(params, t, a, m),
                          max_batch=8, max_wait_ms=20.0,
                          length_buckets=(4, 8, 16)) as server:
            futures = [server.submit(t, a) for t, a in reqs]
            got = [f.result(timeout=60) for f in futures]

        for (t, a), pred in zip(reqs, got):
            u = t.shape[0]
            # direct forward at the request's own padded shape
            tb = np.zeros((1, 8, D), np.float32); tb[0, :u] = t
            ab = np.zeros((1, 8, D), np.float32); ab[0, :u] = a
            mb = np.ones((1, 8), bool); mb[0, :u] = False
            ref = np.asarray(predict(params, tb, ab, mb))[0, :u]
            np.testing.assert_array_equal(np.asarray(pred), ref)

    def test_batches_form_under_load(self):
        model, params, predict = _small_model()
        rng = np.random.default_rng(1)
        reqs = _requests(32, rng)
        server = OnlineServer(lambda t, a, m: predict(params, t, a, m),
                              max_batch=16, max_wait_ms=50.0,
                              length_buckets=(8,))
        try:
            futures = [server.submit(t, a) for t, a in reqs]
            for f in futures:
                f.result(timeout=60)
            stats = server.stats.snapshot()
        finally:
            server.close()
        assert stats["requests"] == 32
        # concurrent submits must coalesce: far fewer batches than requests
        assert stats["batches"] < 32
        assert stats["mean_batch_size"] > 1.0
        assert 0 < stats["occupancy"] <= 1.0
        assert stats["latency_ms_p99"] >= stats["latency_ms_p50"] > 0

    def test_latency_budget_ships_partial_batch(self):
        model, params, predict = _small_model()
        rng = np.random.default_rng(2)
        (t, a), = _requests(1, rng)
        with OnlineServer(lambda tt, aa, m: predict(params, tt, aa, m),
                          max_batch=64, max_wait_ms=10.0,
                          length_buckets=(8,)) as server:
            t0 = time.perf_counter()
            f = server.submit(t, a)
            f.result(timeout=60)  # a lone request must not wait for 63 peers
            # generous bound: budget 10 ms + one small forward + CI slack
            assert time.perf_counter() - t0 < 30.0

    def test_predict_error_fails_futures_not_server(self):
        calls = {"n": 0}

        def flaky(t, a, m):
            calls["n"] += 1
            if calls["n"] == 1:
                raise RuntimeError("boom")
            return np.zeros(t.shape[:2], np.int32)

        rng = np.random.default_rng(3)
        with OnlineServer(flaky, max_batch=1, max_wait_ms=1.0,
                          length_buckets=(8,)) as server:
            (t, a), = _requests(1, rng)
            f1 = server.submit(t, a)
            try:
                f1.result(timeout=60)
                raised = False
            except RuntimeError:
                raised = True
            assert raised
            f2 = server.submit(t, a)  # server survives and keeps serving
            assert f2.result(timeout=60).shape == (t.shape[0],)

    def test_backlog_still_coalesces(self):
        """Overload regime: while a batch runs, every waiter ages past the
        latency budget — the collector must still drain ready requests into
        full batches instead of degenerating to batch-size 1."""
        import threading as _t

        seen_sizes = []
        lock = _t.Lock()

        def slow_predict(t, a, m):
            with lock:
                seen_sizes.append(t.shape[0])
            time.sleep(0.02)  # every queued request exceeds max_wait_ms=1
            return np.zeros(t.shape[:2], np.int32)

        rng = np.random.default_rng(4)
        reqs = _requests(48, rng)
        with OnlineServer(slow_predict, max_batch=16, max_wait_ms=1.0,
                          length_buckets=(8,)) as server:
            futures = [server.submit(t, a) for t, a in reqs]
            for f in futures:
                f.result(timeout=60)
        # after the first (possibly small) batch, the backlog must coalesce
        assert max(seen_sizes) > 1, seen_sizes
        assert len(seen_sizes) < 48, seen_sizes

    def test_mixed_feature_dim_rejected(self):
        def predict(t, a, m):
            return np.zeros(t.shape[:2], np.int32)

        rng = np.random.default_rng(5)
        with OnlineServer(predict, max_batch=4, max_wait_ms=5.0,
                          length_buckets=(8,)) as server:
            server.submit(rng.normal(size=(3, D)).astype(np.float32),
                          rng.normal(size=(3, D)).astype(np.float32))
            import pytest as _pytest

            with _pytest.raises(ValueError, match="feature dim"):
                server.submit(rng.normal(size=(3, D * 2)).astype(np.float32),
                              rng.normal(size=(3, D * 2)).astype(np.float32))

    def test_occupancy_counts_length_padding(self):
        def predict(t, a, m):
            return np.zeros(t.shape[:2], np.int32)

        rng = np.random.default_rng(6)
        with OnlineServer(predict, max_batch=1, max_wait_ms=1.0,
                          length_buckets=(8,)) as server:
            f = server.submit(rng.normal(size=(2, D)).astype(np.float32),
                              rng.normal(size=(2, D)).astype(np.float32))
            f.result(timeout=60)
            stats = server.stats.snapshot()
        # 2 real utterances in a [1, 8] padded program
        np.testing.assert_allclose(stats["occupancy"], 2 / 8)

    def test_filler_rows_keep_attendable_key(self):
        """Batch-bucket filler rows must not produce all-padding masks (the
        offline collate's softmax guard, data/fusion.py)."""
        masks = []

        def predict(t, a, m):
            masks.append(np.asarray(m).copy())
            return np.zeros(t.shape[:2], np.int32)

        rng = np.random.default_rng(7)
        reqs = _requests(3, rng)  # pads to batch bucket 4
        with OnlineServer(predict, max_batch=4, max_wait_ms=50.0,
                          length_buckets=(8,)) as server:
            futures = [server.submit(t, a) for t, a in reqs]
            for f in futures:
                f.result(timeout=60)
        for m in masks:
            assert (~m).any(axis=1).all(), "some row has no attendable key"

    def test_int8_engine_through_server(self):
        """The int8 serving engine (M2FNetInt8) composes with the online
        server — per-request int8 predictions equal the direct int8 batch."""
        import jax

        from mer_tpu.serving import M2FNetInt8, quantize_m2fnet

        model, params, _ = _small_model()
        qp = jax.device_put(quantize_m2fnet(params))
        server_engine = M2FNetInt8(model)

        @jax.jit
        def predict_int8(p, text, audio, mask):
            return jnp.argmax(server_engine.apply(p, text, audio, mask), -1)

        rng = np.random.default_rng(8)
        reqs = _requests(6, rng)
        with OnlineServer(lambda t, a, m: predict_int8(qp, t, a, m),
                          max_batch=4, max_wait_ms=20.0,
                          length_buckets=(8,)) as server:
            futures = [server.submit(t, a) for t, a in reqs]
            got = [f.result(timeout=60) for f in futures]
        for (t, a), pred in zip(reqs, got):
            u = t.shape[0]
            tb = np.zeros((1, 8, D), np.float32); tb[0, :u] = t
            ab = np.zeros((1, 8, D), np.float32); ab[0, :u] = a
            mb = np.ones((1, 8), bool); mb[0, :u] = False
            ref = np.asarray(predict_int8(qp, tb, ab, mb))[0, :u]
            np.testing.assert_array_equal(np.asarray(pred), ref)
