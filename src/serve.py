"""Online serving entry point: load a fusion checkpoint and run the dynamic
micro-batching server (mer_tpu/serving/online.py) against a stream of
single-dialogue requests.

The reference's only inference surface is the offline split loop
(/root/reference/src/test.py:51-74); this is the production-serving
counterpart: requests arrive one dialogue at a time, the server coalesces
them into static-bucket micro-batches under a latency budget.

Usage (demo mode drives the MELD-test-shaped synthetic stream and prints a
throughput/latency report):
    python src/serve.py --synthetic [--int8] [--max-batch 64] [--max-wait-ms 5]

Programmatic use:
    from serve import build_server
    server = build_server(params_path, int8=True)
    future = server.submit(text_rows, audio_rows)   # [u, 768] each
    preds = future.result()
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

import numpy as np


def make_predict_fn(model, params, int8: bool):
    """jitted (text, audio, mask) -> [b, u] predictions; bf16 or int8 engine."""
    import jax
    import jax.numpy as jnp

    if int8:
        from mer_tpu.serving import M2FNetInt8, quantize_m2fnet

        qp = jax.device_put(quantize_m2fnet(params))
        server = M2FNetInt8(model)

        @jax.jit
        def predict(text, audio, mask):
            return jnp.argmax(server.apply(qp, text, audio, mask), -1)
    else:
        p = jax.device_put(jax.tree.map(lambda x: jnp.asarray(x, jnp.bfloat16), params))

        @jax.jit
        def predict(text, audio, mask):
            return jnp.argmax(
                model.apply({"params": p}, text, audio, mask, deterministic=True), -1)

    return lambda t, a, m: np.asarray(predict(t, a, m))


def main(argv=None):
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default=os.path.join(REPO_ROOT, "src", "config.yaml"))
    ap.add_argument("--synthetic", action="store_true",
                    help="demo: random-init params + MELD-test-shaped request stream")
    ap.add_argument("--int8", action="store_true", help="serve the int8 engine")
    ap.add_argument("--max-batch", type=int, default=64)
    ap.add_argument("--max-wait-ms", type=float, default=5.0)
    ap.add_argument("--requests", type=int, default=280,
                    help="demo request count (MELD test = 280 dialogues)")
    args = ap.parse_args(argv)

    import jax

    from mer_tpu.core import load_config
    from mer_tpu.models import M2FNet
    from mer_tpu.serving import OnlineServer

    config = load_config(args.config)
    model = M2FNet.from_config(config.model, scan_layers=True)
    d = int(config.model.TEXT.embedding_size)

    import jax.numpy as jnp

    example = jnp.zeros((1, 8, d))
    if args.synthetic:
        params = model.init(jax.random.PRNGKey(0), example, example, jnp.zeros((1, 8), bool))["params"]
    else:
        from mer_tpu.train import load_checkpoint_auto
        from mer_tpu.train.checkpoint import restore_into

        ckpt_path = os.path.abspath(str(config.checkpoint.load_path))
        if not os.path.exists(ckpt_path):
            raise FileNotFoundError(f"Checkpoint not found at {ckpt_path} — train first (src/train.py)")
        template = model.init(jax.random.PRNGKey(0), example, example, jnp.zeros((1, 8), bool))["params"]
        params = restore_into(template, load_checkpoint_auto(ckpt_path)["params"])

    predict = make_predict_fn(model, params, args.int8)

    rng = np.random.default_rng(1234)
    reqs = []
    for _ in range(args.requests):
        u = max(1, min(33, int(rng.poisson(9.3))))  # MELD dialogue-length stats
        reqs.append((rng.normal(size=(u, d)).astype(np.float32),
                     rng.normal(size=(u, d)).astype(np.float32)))

    # warm the static bucket programs before timing
    with OnlineServer(predict, max_batch=args.max_batch, max_wait_ms=args.max_wait_ms) as w:
        [f.result(timeout=1200) for f in [w.submit(t, a) for t, a in reqs[: args.max_batch]]]

    server = OnlineServer(predict, max_batch=args.max_batch, max_wait_ms=args.max_wait_ms)
    try:
        t0 = time.perf_counter()
        futures = [server.submit(t, a) for t, a in reqs]
        n_utt = 0
        for (t, _), f in zip(reqs, futures):
            n_utt += len(f.result(timeout=1200))
        dt = time.perf_counter() - t0
        stats = server.stats.snapshot()
    finally:
        server.close()

    report = {
        "mode": "int8" if args.int8 else "bf16",
        "dialogues_per_s": round(len(reqs) / dt, 1),
        "utterances_per_s": round(n_utt / dt, 1),
        **{k: round(v, 3) if isinstance(v, float) else v for k, v in stats.items()},
    }
    print("online serving:", json.dumps(report))
    return report


if __name__ == "__main__":
    main()
