"""Extended benchmark suite — measures every pipeline stage on the real TPU
and writes BENCH_LOCAL.json. (`bench.py` remains the driver's single-line
headline; this is the full evidence set.)

Covers the BASELINE.json configs that are runnable without the MELD corpus:
  1. fusion inference (headline, = bench.py)
  2. fusion training step (fwd+bwd+Adam)
  3. log-mel frontend (XLA and Pallas paths)
  4. mel metric-learning step (hard mining + composite loss)
  5. end-to-end streaming (wav + text -> encoders -> fusion)
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO_ROOT)

import numpy as np


def bench_fusion(results: dict) -> None:
    import jax
    import jax.numpy as jnp

    from bench import BATCH, bench_tpu, _workload
    from mer_tpu.data import prefetch
    from mer_tpu.models import M2FNet
    from mer_tpu.train import Solver
    from mer_tpu.core import load_config

    from mer_tpu.utils.profiling import V5E_PEAK_BF16, m2fnet_forward_flops, mfu

    batcher, n_utt = _workload()
    device_resident, streaming = bench_tpu(batcher, n_utt)
    results["fusion_inference_device_resident_utt_per_s"] = round(device_resident, 1)
    results["fusion_inference_streaming_utt_per_s"] = round(streaming, 1)

    # MFU: analytic matmul FLOPs of the actual staged batch shapes vs the
    # v5e bf16 peak (197 TFLOP/s). "Fast" is measured against the hardware
    # ceiling, not only the torch-CPU baseline.
    from mer_tpu.models import M2FNet as _M2FNet

    _shape_model = _M2FNet()  # headline dims (d=768, 6+6 enc, 5 FAM)
    split_flops = sum(
        m2fnet_forward_flops(_shape_model, b["text"].shape[0], b["text"].shape[1])
        for b in batcher
    )
    tflops, frac = mfu(split_flops, n_utt / device_resident, V5E_PEAK_BF16)
    results["fusion_inference_tflops"] = round(tflops, 1)
    results["fusion_inference_mfu_pct"] = round(frac * 100, 1)

    # headline serving mode MFU (VERDICT r3 #9): the bigbatch-512 path moved
    # utt/s — record whether it moved MFU too (identity re-batching preserves
    # the split FLOPs, so the same analytic numerator applies)
    from bench import bench_scanned

    (big_bf16, big_int8, big_w8), big_spread = bench_scanned(batcher, n_utt, serving_batch=512)
    results["fusion_inference_bigbatch_bf16_utt_per_s"] = round(big_bf16, 1)
    results["fusion_inference_bigbatch_int8_utt_per_s"] = round(big_int8, 1)
    results["fusion_inference_bigbatch_w8_utt_per_s"] = round(big_w8, 1)
    results["fusion_inference_bigbatch_spread_pct"] = [round(s, 2) for s in big_spread]
    tflops, frac = mfu(split_flops, n_utt / big_bf16, V5E_PEAK_BF16)
    results["fusion_inference_bigbatch_bf16_mfu_pct"] = round(frac * 100, 1)
    results["fusion_inference_bigbatch_bf16_tflops"] = round(tflops, 1)

    from mer_tpu.data import DeviceFusionBatcher
    from mer_tpu.data.synthetic import SyntheticFusionDataset

    cfg = load_config(os.path.join(REPO_ROOT, "src", "config.yaml"))
    # the production layout (tpu.scan_layers; unrolled is the measured v5e
    # training default — the scanned stack's backward pays a lax.scan
    # overhead, see fusion_train_layout below)
    scan_cfg = bool(cfg.get_path("tpu.scan_layers", True))
    model = M2FNet.from_config(cfg.model, dtype=jnp.bfloat16, scan_layers=scan_cfg)
    solver = Solver(model, cfg)
    ds = SyntheticFusionDataset(n_dialogues=280, seed=1234, learnable=False)
    dev_batcher = DeviceFusionBatcher(ds, batch_size=BATCH, shuffle=True, seed=0)
    state = solver.init_state(next(iter(dev_batcher)), steps_per_epoch=len(dev_batcher))
    solver._build_steps()
    from mer_tpu.utils.rng import dropout_key

    # the production dropout stream (Solver.fit: dropout_key(tpu.seed + 1,
    # tpu.dropout_prng)) — read both from the loaded config so a config
    # override cannot silently diverge bench from production
    rng = dropout_key(int(cfg.get_path("tpu.seed", 0)) + 1,
                      cfg.get_path("tpu.dropout_prng", None))

    # per-step dispatch path (the round-1 number, kept for comparison)
    for b in dev_batcher:
        state, loss = solver._train_step(state, b, rng)
    _ = float(loss)
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        for b in dev_batcher:
            state, loss = solver._train_step(state, b, rng)
        _ = float(loss)  # chained: forces the full epoch
        times.append(time.perf_counter() - t0)
    results["fusion_train_stepwise_utt_per_s"] = round(n_utt / min(times), 1)

    # scanned-epoch path (one XLA program per bucket group — the production
    # train_epoch path for HBM-resident data; removes dispatch latency)
    state, _ = solver.train_epoch(state, dev_batcher, rng)  # compile
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        state, loss_train = solver.train_epoch(state, dev_batcher, rng)
        times.append(time.perf_counter() - t0)  # train_epoch returns a float: chained
    results["fusion_train_utt_per_s"] = round(n_utt / min(times), 1)

    # train MFU: fwd + bwd ~= 3x forward matmul FLOPs over the epoch's
    # bucket shapes (the Adam update adds HBM traffic, not matmul FLOPs —
    # at this batch size it is the bound, see ROADMAP §train-gap)
    from mer_tpu.utils.profiling import m2fnet_forward_flops, mfu

    epoch_flops = 3 * sum(
        m2fnet_forward_flops(model, int(idx.shape[1]), bucket) * idx.shape[0]
        for bucket, idx in dev_batcher.epoch_index_plan()
    )
    tflops, frac = mfu(epoch_flops, min(times))
    results["fusion_train_tflops"] = round(tflops, 1)
    results["fusion_train_mfu_pct"] = round(frac * 100, 1)

    # TPU-tuned batch: the reference's batch 32 (src/config.yaml:58) is a
    # GPU-memory artifact; at b=32 the v5e step is small-GEMM + optimizer-
    # bandwidth bound (fwd 2.35 ms / in-step Adam ~3 ms = the 7-pass f32
    # param+moment HBM floor — scripts/profile_fusion_train.py). Batch 256
    # amortizes the Adam traffic over 8x the tokens: same solver semantics,
    # ~3x utt/s (scripts/profile_fusion_train_batch.py sweep).
    ds_tuned = SyntheticFusionDataset(n_dialogues=2048, seed=1234, learnable=False)
    tuned_batcher = DeviceFusionBatcher(ds_tuned, batch_size=256, shuffle=True, seed=0)
    n_utt_tuned = int(sum(d["emotion"].shape[0] for d in ds_tuned._dialogues))
    solver_t = Solver(model, cfg)
    state_t = solver_t.init_state(next(iter(tuned_batcher)), steps_per_epoch=len(tuned_batcher))
    solver_t._build_steps()
    state_t, _ = solver_t.train_epoch(state_t, tuned_batcher, rng)  # compile
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        state_t, _ = solver_t.train_epoch(state_t, tuned_batcher, rng)
        times.append(time.perf_counter() - t0)
    results["fusion_train_tuned_utt_per_s"] = round(n_utt_tuned / min(times), 1)
    epoch_flops_tuned = 3 * sum(
        m2fnet_forward_flops(model, int(idx.shape[1]), bucket) * idx.shape[0]
        for bucket, idx in tuned_batcher.epoch_index_plan()
    )
    tflops, frac = mfu(epoch_flops_tuned, min(times))
    results["fusion_train_tuned_tflops"] = round(tflops, 1)
    results["fusion_train_tuned_mfu_pct"] = round(frac * 100, 1)
    wall_tuned = min(times)

    # layer-stack layout head-to-head at the tuned shape: the evidence
    # behind the tpu.scan_layers=false default (same epoch program, only
    # the layout flips). The scanned stack's backward re-enters the layer
    # via lax.scan and pays per-iteration stacking/slicing of the [L, ...]
    # grads; the unrolled stack lets XLA schedule all layers' backwards as
    # one graph.
    model_alt = M2FNet.from_config(cfg.model, dtype=jnp.bfloat16, scan_layers=not scan_cfg)
    solver_a = Solver(model_alt, cfg)
    state_a = solver_a.init_state(next(iter(tuned_batcher)), steps_per_epoch=len(tuned_batcher))
    solver_a._build_steps()
    state_a, _ = solver_a.train_epoch(state_a, tuned_batcher, rng)  # compile
    times_a = []
    for _ in range(3):
        t0 = time.perf_counter()
        state_a, _ = solver_a.train_epoch(state_a, tuned_batcher, rng)
        times_a.append(time.perf_counter() - t0)
    _, frac_a = mfu(epoch_flops_tuned, min(times_a))
    this_layout = "unroll" if not scan_cfg else "scan"
    alt_layout = "scan" if not scan_cfg else "unroll"
    results["fusion_train_layout"] = {
        f"{this_layout}_mfu_pct": results["fusion_train_tuned_mfu_pct"],
        f"{this_layout}_utt_per_s": results["fusion_train_tuned_utt_per_s"],
        f"{alt_layout}_mfu_pct": round(frac_a * 100, 1),
        f"{alt_layout}_utt_per_s": round(n_utt_tuned / min(times_a), 1),
        "spread_pct": round((max(times_a) - min(times_a)) / min(times_a) * 100, 2),
    }
    del state_a, solver_a, model_alt

    # --- train-side roofline (VERDICT r3 #3): separate optimizer HBM traffic
    # (the torch-Adam-L2 update is 7 f32 passes over params+moments per step:
    # read p,m,v,g; write p,m,v) and fwd/bwd param traffic (read p twice,
    # write g once) from GEMM time at bf16 peak — the train analog of
    # fusion_roofline, answering whether low train MFU is optimizer-bandwidth
    # or small-GEMM starvation.  Reference loop: src/train.py:217-231.
    HBM_GB_S = 819e9
    n_params = sum(int(np.size(x)) for x in jax.tree.leaves(state_t.params))
    wall32 = n_utt / results["fusion_train_utt_per_s"]
    epoch_flops32 = epoch_flops  # the b32 epoch's analytic matmul FLOPs (above)

    def _train_roofline(wall_s, flops, n_steps):
        opt_s = n_steps * n_params * 4 * 7 / HBM_GB_S
        grad_s = n_steps * n_params * 4 * 3 / HBM_GB_S
        gemm_s = flops / V5E_PEAK_BF16
        return {
            "epoch_wall_ms": round(wall_s * 1e3, 2),
            "gemm_ms_at_bf16_peak": round(gemm_s * 1e3, 2),
            "optimizer_hbm_ms": round(opt_s * 1e3, 2),
            "param_grad_hbm_ms": round(grad_s * 1e3, 2),
            "n_steps": n_steps,
            "optimizer_fraction": round(opt_s / wall_s, 3),
            "hbm_floor_fraction": round((opt_s + grad_s) / wall_s, 3),
            "optimizer_bound": (opt_s + grad_s) / wall_s > 0.5,
        }

    results["fusion_train_roofline"] = {
        "n_params": n_params,
        "b32": _train_roofline(wall32, epoch_flops32, len(dev_batcher)),
        "b256": _train_roofline(wall_tuned, epoch_flops_tuned, len(tuned_batcher)),
    }


def bench_fe_train_decomposition(results: dict) -> None:
    """Committed per-region decomposition of both FE fine-tune steps
    (VERDICT r4 #3: the backward+optimizer side was unprofiled). Runs
    scripts/profile_fe_regions.py in-process: RoBERTa b32x256 (fwd eval /
    fwd+dropout / fwd+bwd / AdamW / embedding gather+scatter / per-layer
    attention XLA-vs-pallas with and without prob dropout) and wav2vec2
    b16x10s (conv frontend, full step remat vs noremat). These rows are the
    evidence behind the attention-dropout kernel dispatch
    (ops/attention.py) and the noremat tuned default above."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "profile_fe_regions",
        os.path.join(REPO_ROOT, "scripts", "profile_fe_regions.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.profile_roberta()
    mod.profile_wav2vec2()
    results["fe_train_decomposition"] = {
        k: (round(v, 3) if isinstance(v, float) else v) for k, v in mod.r.items()
    }


def bench_fusion_train_decomposition(results: dict) -> None:
    """Committed per-ablation decomposition of the tuned fusion train step
    (VERDICT r4 #2 + ADVICE r4 #1: the rbg-vs-threefry numbers behind the
    tpu.dropout_prng default belong in a committed file). Runs the
    scripts/profile_fusion_train.py ablations at the tuned batch 256:
    fwd eval / fwd+dropout (threefry vs rbg) / Adam-only / grads-only /
    full step (nodrop, threefry, rbg). Device-chained timings."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "profile_fusion_train",
        os.path.join(REPO_ROOT, "scripts", "profile_fusion_train.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    results["fusion_train_decomposition_b256"] = mod.profile_batch(256)


def bench_fusion_latency(results: dict) -> None:
    """Serving latency (the throughput story's counterpart): one M2FNet
    forward at dialogue batch 1 and at the reference eval batch 32, bf16.
    ``*_compute_ms`` is device-chained scan timing (the chip's latency);
    ``*_dispatch_ms`` includes this host's per-call dispatch path (inflated
    by the dev tunnel; real TPU hosts dispatch in ~µs)."""
    import jax
    import jax.numpy as jnp

    from mer_tpu.models import M2FNet

    model = M2FNet(dtype=jnp.bfloat16, scan_layers=True)
    rng = np.random.default_rng(0)
    u = 8
    text = jnp.asarray(rng.normal(size=(32, u, 768)).astype(np.float32))
    audio = jnp.asarray(rng.normal(size=(32, u, 768)).astype(np.float32))
    mask = jnp.asarray(rng.random((32, u)) < 0.1)
    params = jax.device_put(
        jax.tree.map(lambda x: jnp.asarray(x, jnp.bfloat16),
                     model.init(jax.random.PRNGKey(0), text[:2], audio[:2], mask[:2])["params"])
    )

    # params travel as jit ARGUMENTS (closures bake them into the HLO as
    # literals -> remote-compile size rejection, CLAUDE.md gotcha 3)
    def fwd(t, a, m, p):
        return jnp.argmax(model.apply({"params": p}, t, a, m, deterministic=True), -1)

    jfwd = jax.jit(lambda p, t, a, m: jnp.argmax(
        model.apply({"params": p}, t, a, m, deterministic=True), -1))
    for b, label in [(1, "fusion_latency_b1"), (32, "fusion_latency_b32")]:
        t, a, m = text[:b], audio[:b], mask[:b]
        results[f"{label}_compute_ms"] = round(_device_timed(fwd, (t, a, m, params), 50), 3)
        out = jfwd(params, t, a, m)
        np.asarray(out)
        times = []
        for _ in range(30):
            t0 = time.perf_counter()
            np.asarray(jfwd(params, t, a, m))
            times.append(time.perf_counter() - t0)
        results[f"{label}_dispatch_ms"] = round(float(np.median(times)) * 1e3, 2)


def bench_fusion_int8(results: dict) -> None:
    """int8 serving engine at the same workload as the headline bench:
    per-channel int8 kernels (4x less weight HBM traffic than f32, 2x vs the
    bf16 serving path) + int8 MXU GEMMs."""
    import jax
    import jax.numpy as jnp

    from bench import _workload
    from mer_tpu.models import M2FNet
    from mer_tpu.serving import M2FNetInt8, quantize_m2fnet, quantized_bytes

    batcher, n_utt = _workload()
    model = M2FNet(scan_layers=True)
    host_batches = list(batcher)
    example = host_batches[0]
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.asarray(example["text"]), jnp.asarray(example["audio"]),
        jnp.asarray(example["padding_mask"]),
    )["params"]
    qparams = jax.device_put(quantize_m2fnet(params))
    results["fusion_int8_weight_mb"] = round(quantized_bytes(qparams) / 1e6, 1)
    server = M2FNetInt8(model)

    @jax.jit
    def predict(qp, text, audio, mask):
        return jnp.argmax(server.apply(qp, text, audio, mask), axis=-1)

    dev_batches = [jax.tree.map(jnp.asarray, b) for b in host_batches]
    last = None
    for b in dev_batches:
        last = predict(qparams, b["text"], b["audio"], b["padding_mask"])
    np.asarray(last)  # compile + sync (see bench.py protocol)
    inner = 10
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(inner):
            for b in dev_batches:
                last = predict(qparams, b["text"], b["audio"], b["padding_mask"])
        np.asarray(last)
        times.append((time.perf_counter() - t0) / inner)
    results["fusion_inference_int8_utt_per_s"] = round(n_utt / min(times), 1)
    # this row dispatches per batch (9 tiny programs/pass), so its value
    # tracks the tunnel's per-dispatch host overhead, which varies 2-3x
    # across process instances (measured 99k-267k utt/s same-day on an idle
    # chip). The scanned/bigbatch rows (ONE dispatch per shape group) are the
    # stable serving numbers; this row exists to show the per-batch path.
    results["fusion_inference_int8_note"] = (
        "per-batch-dispatch mode: value tracks tunnel dispatch overhead "
        "(2-3x swing across processes); see scanned/bigbatch rows for the "
        "dispatch-amortized serving numbers"
    )


def bench_online_serving(results: dict) -> None:
    """Online dynamic micro-batching (serving/online.py): sustained
    dialogues/s and request-latency percentiles when single-dialogue
    requests arrive concurrently — the production-serving counterpart of
    the offline scan rows (reference has only the offline loop,
    src/test.py:51-74)."""
    import jax
    import jax.numpy as jnp

    from mer_tpu.models import M2FNet
    from mer_tpu.serving import OnlineServer

    model = M2FNet(dtype=jnp.bfloat16, scan_layers=True)
    rng = np.random.default_rng(0)
    d = 768
    text0 = jnp.zeros((1, 16, d))
    params = model.init(jax.random.PRNGKey(0), text0, text0, jnp.zeros((1, 16), bool))["params"]
    params = jax.device_put(jax.tree.map(lambda x: x.astype(jnp.bfloat16), params))

    @jax.jit
    def predict(p, text, audio, mask):
        return jnp.argmax(model.apply({"params": p}, text, audio, mask, deterministic=True), -1)

    def predict_np(t, a, m):
        return np.asarray(predict(params, t, a, m))

    reqs = []
    for _ in range(512):
        u = int(rng.integers(3, 17))
        reqs.append((rng.normal(size=(u, d)).astype(np.float32),
                     rng.normal(size=(u, d)).astype(np.float32)))

    # warm EVERY (batch-bucket, length-bucket) program the engine can pick
    # before any timed window: arrival patterns decide which batch bucket a
    # micro-batch lands in, and a cold remote compile (~minutes on this
    # host) inside a timed sweep point turns the whole point into queue
    # drainage (measured exactly that before this pre-warm: achieved 68/s
    # at offered 125 with p50 2.2 s).
    from mer_tpu.data.fusion import DEFAULT_LENGTH_BUCKETS
    from mer_tpu.serving.online import DEFAULT_BATCH_BUCKETS

    max_u = max(t.shape[0] for t, _ in reqs)
    u_cover = min(u for u in DEFAULT_LENGTH_BUCKETS if u >= max_u)
    for bb in (b for b in DEFAULT_BATCH_BUCKETS if b <= 64):
        for ub in (u for u in DEFAULT_LENGTH_BUCKETS if u <= u_cover):
            predict_np(np.zeros((bb, ub, d), np.float32),
                       np.zeros((bb, ub, d), np.float32),
                       np.zeros((bb, ub), bool))

    server = OnlineServer(predict_np, max_batch=64, max_wait_ms=2.0)
    try:
        t0 = time.perf_counter()
        futures = [server.submit(t, a) for t, a in reqs]
        for f in futures:
            f.result(timeout=600)
        dt = time.perf_counter() - t0
        stats = server.stats.snapshot()
    finally:
        server.close()
    results["online_serving_dialogues_per_s"] = round(len(reqs) / dt, 1)
    results["online_serving_latency_ms_p50"] = round(stats["latency_ms_p50"], 2)
    results["online_serving_latency_ms_p99"] = round(stats["latency_ms_p99"], 2)
    results["online_serving_mean_batch"] = round(stats["mean_batch_size"], 1)
    results["online_serving_occupancy"] = round(stats["occupancy"], 3)

    # --- arrival-rate sweep (VERDICT r4 #6): the burst above is one load
    # point at saturation; operators need the saturation knee and the max
    # sustained rate within a latency budget. Poisson arrivals at each
    # target rate for ~2 s of traffic; per-rate p50/p99, achieved rate,
    # mean batch and padding efficiency (ServerStats.occupancy — fraction
    # of padded [b, u] compute doing real work).
    P99_BUDGET_MS = 200.0
    arrival_rng = np.random.default_rng(7)
    sweep = []
    for rate in (125, 250, 500, 750, 1000, 1500):
        n_req = min(int(rate * 2.0), 1200)
        picks = arrival_rng.integers(0, len(reqs), size=n_req)
        gaps = arrival_rng.exponential(1.0 / rate, size=n_req)
        sched = np.cumsum(gaps)
        server = OnlineServer(predict_np, max_batch=64, max_wait_ms=2.0)
        try:
            futures = []
            t0 = time.perf_counter()
            for k in range(n_req):
                delay = sched[k] - (time.perf_counter() - t0)
                if delay > 0:
                    time.sleep(delay)
                t, a = reqs[picks[k]]
                futures.append(server.submit(t, a))
            for f in futures:
                f.result(timeout=600)
            dt = time.perf_counter() - t0
            stats = server.stats.snapshot()
        finally:
            server.close()
        sweep.append({
            "offered_rate": rate,
            "achieved_rate": round(n_req / dt, 1),
            "p50_ms": round(stats["latency_ms_p50"], 2),
            "p99_ms": round(stats["latency_ms_p99"], 2),
            "mean_batch": round(stats["mean_batch_size"], 1),
            "occupancy": round(stats["occupancy"], 3),
        })
    results["online_serving_sweep"] = sweep
    results["online_serving_p99_budget_ms"] = P99_BUDGET_MS
    within = [s for s in sweep if s["p99_ms"] <= P99_BUDGET_MS
              and s["achieved_rate"] >= 0.9 * s["offered_rate"]]
    results["online_serving_max_rate_within_p99_budget"] = (
        max(s["achieved_rate"] for s in within) if within else None
    )


def bench_fe_export_int8(results: dict) -> None:
    """Stage-1 embedding export: bf16 Flax backbone vs the int8 serving
    engine (serving/encoders.py) on device-resident batches — RoBERTa-base
    [CLS] export and wav2vec2-base mean-pool export at working shapes
    (reference text/embeddings.py, audio_wav2vec2/embeddings.py)."""
    import jax
    import jax.numpy as jnp

    from mer_tpu.models.roberta import RobertaConfig, TextERC
    from mer_tpu.models.wav2vec2 import AudioERC, Wav2Vec2Config
    from mer_tpu.serving import (
        RobertaInt8, Wav2Vec2Int8, quantize_roberta, quantize_wav2vec2,
    )

    rng = np.random.default_rng(0)

    def timed_loop(fn, batches, n_items, label, flops=None, peak=None):
        last = None
        for b in batches:
            last = fn(*b)
        np.asarray(last)  # compile + sync
        inner = 4
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(inner):
                for b in batches:
                    last = fn(*b)
            np.asarray(last)
            times.append((time.perf_counter() - t0) / inner)
        results[label] = round(n_items / min(times), 1)
        if flops is not None:
            from mer_tpu.utils.profiling import V5E_PEAK_BF16, mfu

            tflops, frac = mfu(flops, min(times), peak or V5E_PEAK_BF16)
            results[label.replace("_utt_per_s", "_tflops")] = round(tflops, 1)
            results[label.replace("_utt_per_s", "_mfu_pct")] = round(frac * 100, 1)

    # --- RoBERTa-base, batch 32 x 128 tokens (typical context-window width)
    text_model = TextERC(RobertaConfig.base(), dtype=jnp.bfloat16, scan_layers=True)
    ids0 = jnp.asarray(rng.integers(2, 50000, size=(32, 128)).astype(np.int32))
    mask0 = jnp.ones((32, 128), jnp.int32)
    params = text_model.init(jax.random.PRNGKey(0), ids0, mask0)["params"]
    bf16_params = jax.device_put(jax.tree.map(lambda x: jnp.asarray(x, jnp.bfloat16), params))
    embed_bf16 = jax.jit(
        lambda p, ids, m: text_model.apply({"params": p}, ids, m, method=TextERC.embed)
    )
    qp_host = quantize_roberta(params)  # host tree: calibration observes eagerly on it
    qp = jax.device_put(qp_host)
    server = RobertaInt8(text_model)
    embed_int8 = jax.jit(server.embed)

    batches = [
        (jnp.asarray(rng.integers(2, 50000, size=(32, 128)).astype(np.int32)), mask0)
        for _ in range(8)
    ]
    n = 32 * len(batches)
    from mer_tpu.utils.profiling import (
        V5E_PEAK_INT8, roberta_forward_flops, wav2vec2_forward_flops,
    )

    r_flops = roberta_forward_flops(RobertaConfig.base(), 32, 128) * len(batches)
    timed_loop(lambda ids, m: embed_bf16(bf16_params, ids, m), batches, n,
               "roberta_export_bf16_utt_per_s", flops=r_flops)
    timed_loop(lambda ids, m: embed_int8(qp, ids, m), batches, n,
               "roberta_export_int8_utt_per_s", flops=r_flops, peak=V5E_PEAK_INT8)

    # static activation calibration: per-tensor scales from one batch replace
    # the per-row dynamic abs-max reductions at serving time (quant.py)
    from mer_tpu.serving import apply_calibration, calibration

    with calibration(qp_host) as sink:
        server.embed(qp_host, *batches[0])  # eager observer pass
    qp_static = jax.device_put(apply_calibration(qp_host, sink))
    timed_loop(lambda ids, m: embed_int8(qp_static, ids, m), batches, n,
               "roberta_export_int8_static_utt_per_s")

    # TPU-tuned export batch (the GPU-sized default starves the chip the
    # same way the serving batch did — see recollate_batches): 128x128 tokens
    tbatches = [
        (jnp.asarray(rng.integers(2, 50000, size=(128, 128)).astype(np.int32)),
         jnp.ones((128, 128), jnp.int32))
        for _ in range(2)
    ]
    r_flops_t = roberta_forward_flops(RobertaConfig.base(), 128, 128) * len(tbatches)
    timed_loop(lambda ids, m: embed_bf16(bf16_params, ids, m), tbatches, 128 * len(tbatches),
               "roberta_export_tuned_utt_per_s", flops=r_flops_t)

    # scan-amortized export: ONE dispatch embeds the whole stacked set.
    # The per-batch loops above are dispatch-bound on tunneled dev hosts
    # (each jit call blocks the host ~25-30 ms — fusion_latency_*_dispatch;
    # tuned wall 29 ms vs 23.9 ms device compute), so they understate the
    # chip. This row is the production shape on any host: it is exactly how
    # the e2e pipeline (embed_utterances_scanned) and the offline serving
    # engines batch their dispatches.
    def scanned_embed(embed_fn):
        def run(p, *stacked):
            def body(carry, args):
                return carry, embed_fn(p, *args)

            _, out = jax.lax.scan(body, None, stacked)
            return out

        return jax.jit(run)

    sbatches = tbatches * 4  # amortize over 8 dispatch-equivalents
    stacked_t = tuple(jnp.stack([b[i] for b in sbatches]) for i in range(2))
    embed_scan_t = scanned_embed(lambda p, ids, m: text_model.apply(
        {"params": p}, ids, m, method=TextERC.embed))
    timed_loop(lambda *s: embed_scan_t(bf16_params, *s), [stacked_t],
               128 * len(sbatches), "roberta_export_scanned_utt_per_s",
               flops=r_flops_t * 4)
    del params, bf16_params, qp, qp_host, qp_static

    # --- wav2vec2-base, batch 8 x 4 s (reference truncates at 10 s)
    audio_model = AudioERC(Wav2Vec2Config.base(), dtype=jnp.bfloat16, scan_layers=True)
    waves0 = jnp.asarray(rng.normal(size=(8, 64000)).astype(np.float32) * 0.1)
    lens0 = jnp.full((8,), 64000, jnp.int32)
    aparams = audio_model.init(jax.random.PRNGKey(1), waves0, lens0)["params"]
    abf16 = jax.device_put(jax.tree.map(lambda x: jnp.asarray(x, jnp.bfloat16), aparams))
    aembed_bf16 = jax.jit(
        lambda p, w, l: audio_model.apply({"params": p}, w, l, method=AudioERC.embed)
    )
    aqp_host = quantize_wav2vec2(aparams)  # host tree: calibration observes on it
    aqp = jax.device_put(aqp_host)
    aserver = Wav2Vec2Int8(audio_model)
    aembed_int8 = jax.jit(aserver.embed)

    abatches = [
        (jnp.asarray(rng.normal(size=(8, 64000)).astype(np.float32) * 0.1), lens0)
        for _ in range(4)
    ]
    an = 8 * len(abatches)
    w_flops = wav2vec2_forward_flops(Wav2Vec2Config.base(), 8, 64000) * len(abatches)
    timed_loop(lambda w, l: aembed_bf16(abf16, w, l), abatches, an,
               "wav2vec2_export_bf16_utt_per_s", flops=w_flops)
    timed_loop(lambda w, l: aembed_int8(aqp, w, l), abatches, an,
               "wav2vec2_export_int8_utt_per_s", flops=w_flops, peak=V5E_PEAK_INT8)

    # static activation calibration, wav2vec2 leg (VERDICT r3 #5: the int8
    # matrix benched {a8w8, w8, static} for RoBERTa only)
    with calibration(aqp_host) as sink:
        aserver.embed(aqp_host, *abatches[0])  # eager observer pass
    aqp_static = jax.device_put(apply_calibration(aqp_host, sink))
    timed_loop(lambda w, l: aembed_int8(aqp_static, w, l), abatches, an,
               "wav2vec2_export_int8_static_utt_per_s")

    # TPU-tuned wav2vec2 export batch: 32x4s
    wbatches = [
        (jnp.asarray(rng.normal(size=(32, 64000)).astype(np.float32) * 0.1),
         jnp.full((32,), 64000, jnp.int32))
        for _ in range(2)
    ]
    w_flops_t = wav2vec2_forward_flops(Wav2Vec2Config.base(), 32, 64000) * len(wbatches)
    timed_loop(lambda w, l: aembed_bf16(abf16, w, l), wbatches, 32 * len(wbatches),
               "wav2vec2_export_tuned_utt_per_s", flops=w_flops_t)

    # scan-amortized wav2vec2 export (see the RoBERTa scanned row above)
    swbatches = wbatches * 4
    stacked_w = tuple(jnp.stack([b[i] for b in swbatches]) for i in range(2))
    aembed_scan = jax.jit(lambda p, w, l: jax.lax.scan(
        lambda carry, args: (carry, audio_model.apply(
            {"params": p}, args[0], args[1], method=AudioERC.embed)),
        None, (w, l))[1])
    timed_loop(lambda *s: aembed_scan(abf16, *s), [stacked_w],
               32 * len(swbatches), "wav2vec2_export_scanned_utt_per_s",
               flops=w_flops_t * 4)


def bench_fe_train(results: dict) -> None:
    """Stage-1 fine-tune train-step throughput (fwd+bwd+AdamW).

    Rows per backbone:
      *_finetune_utt_per_s        — f32 at the reference's batch size
                                    (text/config.yaml batch 8;
                                    audio_wav2vec2/config.yaml:26 batch 2 —
                                    a GPU-memory artifact)
      *_finetune_bf16_utt_per_s   — bf16 compute / f32 params at the same
                                    batch (the shipped tpu.compute_dtype
                                    default)
      *_finetune_tuned_utt_per_s  — bf16 at the TPU-tuned batch
                                    (RoBERTa 32x256; wav2vec2 16x10s with
                                    per-layer remat)
    Device-chained timing via the step's loss output."""
    import jax
    import jax.numpy as jnp

    from mer_tpu.core import Config
    from mer_tpu.models.roberta import RobertaConfig, TextERC
    from mer_tpu.models.wav2vec2 import AudioERC, Wav2Vec2Config
    from mer_tpu.train import FESolver

    cfg = Config(
        {
            "checkpoint": {"save_checkpoint": False, "save_path": "/tmp/fe_bench.ckpt"},
            "solver": {
                "loss_fn": "CE", "balance_classes": False,
                "warmup_epochs": 0, "num_frozen_epochs": 0,
                "frozen_lr": 1e-4, "finetuning_lr": 2e-6, "weight_decay": 0.01,
                "epochs": 1,
                "early_stopping": {"enabled": False, "patience": 1, "restore_best_weights": False},
            },
            "wandb": {"enabled": False},
        }
    )
    rng = np.random.default_rng(0)

    def timed_steps(solver, batch, n_items, label, iters=20, flops_per_step=None):
        state = solver.init_state(batch, steps_per_epoch=iters)
        dev = jax.tree.map(jnp.asarray, batch)
        from mer_tpu.utils.rng import dropout_key

        # production stream: FESolver.fit uses dropout_key(tpu.seed + 1,
        # tpu.dropout_prng) from the pipeline config
        key = dropout_key(int(cfg.get_path("tpu.seed", 0)) + 1,
                          cfg.get_path("tpu.dropout_prng", None))
        state, loss = solver._step_finetune(state, dev, key)
        float(loss)  # compile + sync
        t0 = time.perf_counter()
        for _ in range(iters):
            state, loss = solver._step_finetune(state, dev, key)
        float(loss)  # chained: syncs the whole run
        dt = (time.perf_counter() - t0) / iters
        results[label] = round(n_items / dt, 1)
        if flops_per_step is not None:
            from mer_tpu.utils.profiling import mfu

            tflops, frac = mfu(flops_per_step, dt)
            results[label.replace("_utt_per_s", "_tflops")] = round(tflops, 1)
            results[label.replace("_utt_per_s", "_mfu_pct")] = round(frac * 100, 1)

    def text_batch(b):
        return {
            "text": rng.integers(2, 50000, size=(b, 256)).astype(np.int32),
            "attention_mask": np.ones((b, 256), np.int32),
            "emotion": rng.integers(0, 7, size=(b,)).astype(np.int32),
        }

    def w2v_batch(b):
        return {
            "audio": (rng.normal(size=(b, 160000)) * 0.1).astype(np.float32),
            "lengths": np.full((b,), 160000, np.int32),
            "emotion": rng.integers(0, 7, size=(b,)).astype(np.int32),
        }

    text_inputs = lambda b: (b["text"], b["attention_mask"])
    w2v_inputs = lambda b: (b["audio"], b["lengths"])

    from mer_tpu.utils.profiling import roberta_forward_flops, wav2vec2_forward_flops

    # tuned = unrolled layer stack (the fe_common resolve_scan_layers
    # training default): the scanned stack's backward pays a lax.scan
    # overhead — measured r5 b32x256 bf16, 40.7% vs 33.7% MFU. The
    # *_tuned_scan row keeps the committed A/B at the same shape.
    for label, dtype, batch, remat, scan in [
        ("roberta_finetune_utt_per_s", jnp.float32, 8, False, True),
        ("roberta_finetune_bf16_utt_per_s", jnp.bfloat16, 8, False, True),
        ("roberta_finetune_tuned_scan_utt_per_s", jnp.bfloat16, 32, False, True),
        ("roberta_finetune_tuned_utt_per_s", jnp.bfloat16, 32, False, False),
    ]:
        solver = FESolver(
            TextERC(RobertaConfig.base(), dtype=dtype, scan_layers=scan, remat=remat),
            cfg, backbone_key="roberta", batch_to_inputs=text_inputs,
        )
        timed_steps(solver, text_batch(batch), batch, label,
                    flops_per_step=3 * roberta_forward_flops(RobertaConfig.base(), batch, 256))

    for label, dtype, batch, remat, scan in [
        ("wav2vec2_finetune_utt_per_s", jnp.float32, 2, False, True),
        ("wav2vec2_finetune_bf16_utt_per_s", jnp.bfloat16, 2, False, True),
        # tuned: noremat — measured r5 (scripts/profile_fe_regions.py),
        # fwd+bwd 101.5 ms vs 109.5 remat at b16x10s; b16 activations fit
        # HBM, so recomputing the layer forwards only burns MXU time. MFU
        # numerator stays the honest 3x forward (remat's 4x counts
        # recompute FLOPs as useful work). And unrolled — the lax.scan
        # backward overhead again (r5 probe: 88.9 vs 103.4 ms/step);
        # *_tuned_scan is the committed same-shape A/B.
        ("wav2vec2_finetune_tuned_scan_utt_per_s", jnp.bfloat16, 16, False, True),
        ("wav2vec2_finetune_tuned_utt_per_s", jnp.bfloat16, 16, False, False),
    ]:
        solver = FESolver(
            AudioERC(Wav2Vec2Config.base(), dtype=dtype, scan_layers=scan, remat=remat),
            cfg, backbone_key="wav2vec2", batch_to_inputs=w2v_inputs,
        )
        # remat recomputes each layer's forward in the backward: ~4x fwd
        fwd = wav2vec2_forward_flops(Wav2Vec2Config.base(), batch, 160000)
        timed_steps(solver, w2v_batch(batch), batch, label, iters=10 if batch > 2 else 20,
                    flops_per_step=(4 if remat else 3) * fwd)


def _device_timed(fn, args, iters: int) -> float:
    """Device-chained timing: iters iterations inside one jitted scan with a
    data dependency (immune to per-dispatch tunnel latency)."""
    import jax
    import jax.numpy as jnp

    first, rest = args[0], args[1:]

    @jax.jit
    def many(first, *rest):
        def body(c, _):
            out = fn(first + c * 1e-30, *rest)
            leaf = out[0] if isinstance(out, tuple) else out
            return jnp.sum(leaf) * 1e-30, None

        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=iters)
        return c

    float(many(first, *rest))
    t0 = time.perf_counter()
    float(many(first, *rest))
    return (time.perf_counter() - t0) / iters * 1e3


def bench_kernels(results: dict) -> None:
    """Kernel-region timings, device-resident (no tunnel in the loop)."""
    import jax
    import jax.numpy as jnp

    from mer_tpu.ops.attention import _attention_reference
    from mer_tpu.ops.flash_attention import flash_attention
    from mer_tpu.ops.logmel import MelConfig
    from mer_tpu.ops.logmel_pallas import _operands, logmel_frames_pallas

    rng = np.random.default_rng(0)

    # log-mel kernel region: GEMM-NDFT + magnitude + mel + log on frames
    cfg = MelConfig()
    cos_p, sin_p, mel_t = _operands(cfg)
    cos_j, sin_j, mel_j = jnp.asarray(cos_p), jnp.asarray(sin_p), jnp.asarray(mel_t)

    def xla_unfused(frames):
        f = jnp.pad(frames, ((0, 0), (0, 0), (0, cos_p.shape[0] - frames.shape[-1])))
        re = jnp.einsum("bfn,nk->bfk", f, cos_j)
        im = jnp.einsum("bfn,nk->bfk", f, sin_j)
        mag = jnp.sqrt(re * re + im * im)
        mel = jnp.einsum("bfk,km->bfm", mag, mel_j)
        return jnp.log(mel + np.finfo(np.float64).eps)[..., : cfg.n_mels]

    frames = jnp.asarray(rng.normal(size=(32, 1001, cfg.n_fft)).astype(np.float32))
    xla_ms = _device_timed(xla_unfused, (frames,), 30)
    pal_ms = _device_timed(lambda f: logmel_frames_pallas(f, cfg), (frames,), 30)
    results["logmel_kernel_device_xla_ms"] = round(xla_ms, 3)
    results["logmel_kernel_device_pallas_ms"] = round(pal_ms, 3)
    results["logmel_kernel_device_speedup"] = round(xla_ms / pal_ms, 2)

    # attention kernel at a mid and a long shape (full table:
    # scripts/bench_attention.py)
    for name, b, h, s, dh, iters in [("s1024", 8, 12, 1024, 64, 16), ("s8192", 2, 12, 8192, 64, 4)]:
        q, k, v = (jnp.asarray(rng.normal(size=(b, h, s, dh)).astype(np.float32)) for _ in range(3))
        mask = jnp.asarray(rng.random((b, s)) < 0.1)

        def xla_train(q, k, v):
            return jax.grad(
                lambda q, k, v: jnp.sum(_attention_reference(
                    q, k, v, key_padding_mask=mask, dropout_rate=0.0,
                    dropout_rng=None, deterministic=True) ** 2),
                argnums=(0, 1, 2),
            )(q, k, v)

        def pal_train(q, k, v):
            return jax.grad(
                lambda q, k, v: jnp.sum(flash_attention(q, k, v, key_padding_mask=mask) ** 2),
                argnums=(0, 1, 2),
            )(q, k, v)

        results[f"attention_train_{name}_xla_ms"] = round(_device_timed(xla_train, (q, k, v), iters), 3)
        results[f"attention_train_{name}_pallas_ms"] = round(_device_timed(pal_train, (q, k, v), iters), 3)


def bench_logmel(results: dict) -> None:
    import jax
    import jax.numpy as jnp

    from mer_tpu.ops.logmel import MelConfig, log_mel_spectrogram, prepare_waveform_batch

    cfg = MelConfig()
    rng = np.random.default_rng(0)
    waves = [rng.normal(size=(160000,)).astype(np.float32) for _ in range(32)]
    batch, lengths = prepare_waveform_batch(waves, cfg)
    b, l = jnp.asarray(batch), jnp.asarray(lengths)
    for use_pallas, key in [(False, "logmel_xla_clips_per_s"), (True, "logmel_pallas_clips_per_s")]:
        out = log_mel_spectrogram(b, l, cfg, use_pallas=use_pallas)
        np.asarray(out[0, 0, 0, 0])  # real execution sync (see bench.py protocol)
        t0 = time.perf_counter()
        for _ in range(50):
            out = log_mel_spectrogram(b, l, cfg, use_pallas=use_pallas)
        np.asarray(out[0, 0, 0, 0])
        results[key] = round(32 * 50 / (time.perf_counter() - t0), 0)


def bench_mel_pipeline(results: dict, data_root: str) -> None:
    import jax

    from mer_tpu.core import Config
    from mer_tpu.data import MelFeatureDataset
    from mer_tpu.models.resnet import AudioMelFeatureExtractor
    from mer_tpu.train import MelSolver

    cfg = Config(
        {
            "DEBUG": {"enabled": False},
            "AUDIO": {"ffmpeg_sr": 16000, "wav2vec_sr": 16000, "max_duration": 10.0, "augmentation_factor": 1},
            "checkpoint": {"save_path": "/tmp/bench_mel/c.ckpt", "save_checkpoint": False, "load_checkpoint": False},
            "solver": {
                "len_triplet_picking": 100, "mining_type": "hard",
                "adaptive_triplet_margin_loss": True, "covariance_loss": True, "variance_loss": True,
                "lr": 1e-4, "weight_decay": 0.0, "epochs": 1,
                "scheduler": {"enabled": False}, "early_stopping": {"enabled": False},
            },
            "train": {"data_loader": {"shuffle": True, "batch_size": 32}},
            "val": {"data_loader": {"shuffle": False, "batch_size": 32}},
            "wandb": {"enabled": False},
        }
    )
    import jax.numpy as jnp

    train = MelFeatureDataset("train", cfg, data_root=data_root)
    val = MelFeatureDataset("val", cfg, data_root=data_root)
    n_steps = len(train) // 32
    for label, dtype in [
        ("mel_hard_mining_ms_per_step", jnp.float32),
        ("mel_hard_mining_bf16_ms_per_step", jnp.bfloat16),
    ]:
        solver = MelSolver(AudioMelFeatureExtractor(dtype=dtype), cfg, train, val)
        state = solver.init_state()
        from mer_tpu.utils.rng import dropout_key

        # production stream (Solver.fit convention: seed+1, config impl)
        rng = dropout_key(int(cfg.get_path("tpu.seed", 0)) + 1,
                          cfg.get_path("tpu.dropout_prng", None))
        state, _ = solver.train_epoch(state, 0, rng)
        t0 = time.perf_counter()
        state, _ = solver.train_epoch(state, 1, rng)
        dt = time.perf_counter() - t0
        results[label] = round(dt / max(n_steps, 1) * 1e3, 1)


def fusion_roofline(results: dict) -> None:
    """Settle the int8 thesis with numbers (round-2 VERDICT weak #3): is the
    fusion forward weight-bandwidth-bound at the reference batch?

    Computes, from the measured headline rows: per-split wall time, the
    analytic matmul time at bf16 peak, and the weight-read time per serving
    mode at the v5e HBM rate (819 GB/s). If weight-read time is a small
    fraction of the wall time, the forward is NOT weight-bandwidth-bound at
    this batch and int8's traffic cut cannot shift the headline — that is
    the honest explanation of the ~1% a8w8-vs-bf16 gap."""
    from bench import _workload
    from mer_tpu.models import M2FNet
    from mer_tpu.utils.profiling import V5E_PEAK_BF16, m2fnet_forward_flops

    HBM_GB_S = 819e9  # v5e HBM bandwidth (public spec)
    batcher, n_utt = _workload()
    batches = list(batcher)
    n_batches = len(batches)

    n_params = 86.3e6  # headline M2FNet (d=768, 6+6 enc, 5 FAM)
    model = M2FNet()
    split_flops = sum(
        m2fnet_forward_flops(model, b["text"].shape[0], b["text"].shape[1]) for b in batches
    )

    utt_s = results.get("fusion_inference_device_resident_utt_per_s")
    if not utt_s:
        return
    wall_ms = n_utt / utt_s * 1e3
    out = {
        "split_wall_ms": round(wall_ms, 2),
        "split_matmul_ms_at_bf16_peak": round(split_flops / V5E_PEAK_BF16 * 1e3, 2),
        # each of the n_batches forwards re-reads the full weight set
        "split_weight_read_ms_bf16": round(n_batches * n_params * 2 / HBM_GB_S * 1e3, 2),
        "split_weight_read_ms_int8": round(n_batches * n_params * 1 / HBM_GB_S * 1e3, 2),
        "n_batches": n_batches,
    }
    out["weight_read_fraction_bf16"] = round(out["split_weight_read_ms_bf16"] / wall_ms, 3)
    out["weight_bound"] = out["weight_read_fraction_bf16"] > 0.5
    results["fusion_roofline"] = out

    # the headline 512-batch mode: merging cuts the number of full weight
    # re-reads from n_batches to the merged count — state which resource the
    # forward is bound on there (weight HBM vs dispatch/latency floor)
    big = results.get("fusion_inference_bigbatch_bf16_utt_per_s")
    if big:
        from mer_tpu.serving import recollate_batches

        feed = [{k: b[k] for k in ("text", "audio", "padding_mask")} for b in batches]
        merged, _ = recollate_batches(feed, 512)
        wall_big_ms = n_utt / big * 1e3
        out_big = {
            "split_wall_ms": round(wall_big_ms, 2),
            "split_matmul_ms_at_bf16_peak": out["split_matmul_ms_at_bf16_peak"],
            "split_weight_read_ms_bf16": round(
                len(merged) * n_params * 2 / HBM_GB_S * 1e3, 2),
            "n_batches": len(merged),
        }
        out_big["weight_read_fraction_bf16"] = round(
            out_big["split_weight_read_ms_bf16"] / wall_big_ms, 3)
        out_big["weight_bound"] = out_big["weight_read_fraction_bf16"] > 0.5
        results["fusion_roofline_bigbatch"] = out_big


def bench_e2e(results: dict, data_root: str) -> None:
    """Streaming end-to-end throughput at MELD-test scale (280 dialogues /
    2608 usable utterances, realistic durations — scripts/make_synthetic_meld
    --meld-shape): wav2vec2 branch in bf16 and int8, and `--audio mel`
    (on-device log-mel -> ResNet18, the reference's embeddings-dir switch
    streamed). Reference scope: SURVEY §3.5 + BASELINE.json config 5."""
    import subprocess

    results["e2e_split"] = {"dialogues": 280, "utterances": 2608,
                            "shape": "MELD-test statistics (synthetic)"}
    for extra, key, stages_key in [
        ((), "e2e_streaming_utt_per_s", "e2e_stages"),
        (("--int8",), "e2e_streaming_int8_utt_per_s", "e2e_int8_stages"),
        (("--audio", "mel"), "e2e_streaming_mel_utt_per_s", "e2e_mel_stages"),
        # lossy uint8 wire (ops/mulaw.py): half the H2D waveform bytes —
        # the committed row that says whether the wire or the forward is
        # binding after length-sorted batching
        (("--wire", "mulaw"), "e2e_streaming_mulaw_utt_per_s", "e2e_mulaw_stages"),
    ]:
        try:
            proc = subprocess.run(
                [sys.executable, os.path.join(REPO_ROOT, "src", "e2e_stream.py"),
                 "--data-root", data_root, "--toy-tokenizer", *extra],
                capture_output=True, text=True, timeout=3600,
            )
        except subprocess.TimeoutExpired:
            # don't abort the whole evidence run (and lose every earlier
            # leg's numbers) on one stalled compile
            results[key] = None
            results[key + "_error"] = "timeout after 3600s"
            print(f"[bench_all] e2e leg {key} TIMED OUT", file=sys.stderr)
            continue
        results[key] = None
        for line in proc.stdout.splitlines():
            if "e2e streaming:" in line:
                # "...in Xs (Y utt/s) ..."
                results[key] = float(line.split("(")[1].split(" ")[0])
            elif "e2e stages:" in line:
                # per-stage wall-clock breakdown (tunnel vs compute bound)
                results[stages_key] = json.loads(line.split("e2e stages:", 1)[1])
        if results[key] is None:
            # never record a silent null: keep the evidence of WHY it failed
            # (a prior run wrote e2e_streaming_mel_utt_per_s: null with no trace)
            tail = "\n".join((proc.stderr or proc.stdout or "").splitlines()[-15:])
            results[key + "_error"] = f"rc={proc.returncode}: {tail}"
            print(f"[bench_all] e2e leg {key} FAILED rc={proc.returncode}\n{tail}",
                  file=sys.stderr)


def bench_h2d_link(results: dict) -> None:
    """Measured host->device link rate (this dev host tunnels; real TPU
    hosts ride PCIe). The e2e stage-1 wall is attributed against
    embed_h2d_bytes / this rate.

    Two rows: zeros (the tunnel compresses — an upper bound only synthetic
    silence hits) and random bytes (incompressible — what real PCM waveform
    payloads see; THIS is the rate stage-1 attribution must use)."""
    import jax

    rng = np.random.default_rng(0)
    for label, buf in [
        ("h2d_link_mb_s", np.zeros((32 * 1024 * 1024,), np.uint8)),  # 32 MB
        ("h2d_link_incompressible_mb_s",
         rng.integers(0, 256, size=(32 * 1024 * 1024,), dtype=np.uint8)),
    ]:
        jax.block_until_ready(jax.device_put(buf))  # warm the path
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(jax.device_put(buf))
            times.append(time.perf_counter() - t0)
        results[label] = round(buf.nbytes / 1e6 / min(times), 1)


def bench_h2d_dispatch(results: dict) -> None:
    """Attribute the e2e stage-1 upload wall: the same MELD-test-shaped
    waveform stacks (~356 MB int16 over 5 duration buckets) shipped three
    ways on this host. ``put_loop`` is the pre-round-5 per-stack pattern,
    ``put_single`` one device_put over the whole pytree, ``flat`` ONE
    contiguous buffer + a jitted dynamic-slice reshape per group (the
    pipelines/e2e.py ``coalesce_h2d`` default). The flat row's rate is what
    stage-1 attribution should use for coalesced runs; the loop row is the
    measured per-call overhead the coalesced path removes."""
    import jax

    rng = np.random.default_rng(0)
    buckets = [(38, 32, 32000), (20, 32, 64000), (12, 32, 96000),
               (7, 32, 128000), (5, 32, 160000)]
    stacks = [rng.integers(-2000, 2000, size=shape).astype(np.int16)
              for shape in buckets]
    total_mb = sum(s.nbytes for s in stacks) / 1e6
    jax.block_until_ready(jax.device_put(np.zeros((1 << 20,), np.int16)))  # warm

    def timed(fn):
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(fn())
            times.append(time.perf_counter() - t0)
        return min(times)

    results["e2e_dispatch_put_loop_mb_s"] = round(
        total_mb / timed(lambda: [jax.device_put(s) for s in stacks]), 1)
    results["e2e_dispatch_put_single_mb_s"] = round(
        total_mb / timed(lambda: jax.device_put(stacks)), 1)

    flat = np.empty((sum(s.size for s in stacks),), np.int16)
    offs, o = [], 0
    for s in stacks:
        flat[o:o + s.size] = s.ravel()
        offs.append(o)
        o += s.size

    def _reslice_all(buf):
        out, = [tuple(
            jax.lax.dynamic_slice_in_dim(buf, off, int(np.prod(shape))).reshape(shape)
            for off, shape in zip(offs, buckets))]
        return out

    reslicer = jax.jit(_reslice_all)

    def flat_path():
        return reslicer(jax.device_put(flat))

    jax.block_until_ready(flat_path())  # compile the reslice program
    results["e2e_dispatch_flat_mb_s"] = round(total_mb / timed(flat_path), 1)
    results["e2e_dispatch_stacks"] = len(stacks)
    results["e2e_dispatch_total_mb"] = round(total_mb, 1)


def bench_e2e_baseline(results: dict, data_root: str) -> None:
    """Measured torch-CPU denominator for the e2e config (VERDICT r4 #5):
    a CPU restatement of the reference's sequential chain — the text export
    loop (text/embeddings.py:69-93), the wav2vec2 export loop
    (audio_wav2vec2/embeddings.py:68-94) and the fusion eval loop
    (src/test.py:51-74) — at random-init on the SAME synthetic split the
    streaming legs run. Per-stage rates are measured on a subset (the loops
    are linear in N; full-split torch-CPU would take ~an hour) and composed
    sequentially, exactly how the reference pipeline runs. Cached in
    .bench_baseline.json (one slow measurement per machine)."""
    import json as _json

    from bench import BASELINE_CACHE

    CACHE_KEY = "e2e_torch_cpu_meldshape_v1"
    cache = {}
    if os.path.exists(BASELINE_CACHE):
        try:
            with open(BASELINE_CACHE) as f:
                cache = _json.load(f)
        except (OSError, _json.JSONDecodeError):
            cache = {}
    if CACHE_KEY in cache:
        results["e2e_baseline_torch_cpu"] = cache[CACHE_KEY]["utt_per_s"]
        results["e2e_baseline_torch_cpu_stages"] = cache[CACHE_KEY]["stages"]
        return

    import torch

    from mer_tpu.data import TextFeatureDataset, ToyWhitespaceTokenizer, Wav2Vec2FeatureDataset
    from mer_tpu.data.text_fe import pad_tokens_to

    torch.manual_seed(0)
    text_ds = TextFeatureDataset("test", ToyWhitespaceTokenizer(), data_root=data_root)
    w2v_ds = Wav2Vec2FeatureDataset("test", data_root=data_root)
    n_total = len(text_ds)
    n_sub = min(128, n_total)

    stages = {}
    with torch.inference_mode():
        # --- text export loop (reference text/embeddings.py:69-93: forward
        # -> [CLS] row -> scatter into the [N, 768] table), batch 32
        from transformers import RobertaConfig as HFRobertaConfig
        from transformers import RobertaModel

        tmodel = RobertaModel(HFRobertaConfig(vocab_size=50265)).eval()
        ids_batches = []
        for i in range(0, n_sub, 32):
            texts = [text_ds.texts[j] for j in range(i, min(i + 32, n_sub))]
            ids, mask = text_ds.tokenizer(texts)
            ids, mask = pad_tokens_to(ids, mask, 128, text_ds.tokenizer.pad_id)
            ids_batches.append((torch.tensor(np.asarray(ids)), torch.tensor(np.asarray(mask))))
        tmodel(*ids_batches[0])  # warmup
        t0 = time.perf_counter()
        for ids, mask in ids_batches:
            _ = tmodel(ids, attention_mask=mask).last_hidden_state[:, 0, :]
        stages["text_utt_per_s"] = round(n_sub / (time.perf_counter() - t0), 2)

        # --- wav2vec2 export loop (audio_wav2vec2/embeddings.py:68-94:
        # forward -> masked mean pool), batch 8, real split durations
        from transformers import Wav2Vec2Config as HFW2VConfig
        from transformers import Wav2Vec2Model

        wmodel = Wav2Vec2Model(HFW2VConfig()).eval()
        n_wav = min(32, n_total)
        waves = [w2v_ds.waveform(j) for j in range(n_wav)]
        wav_batches = []
        for i in range(0, n_wav, 8):
            chunk = waves[i : i + 8]
            width = max(len(w) for w in chunk)
            buf = np.zeros((len(chunk), width), np.float32)
            for k, w in enumerate(chunk):
                buf[k, : len(w)] = w
            wav_batches.append(torch.tensor(buf))
        wmodel(wav_batches[0])  # warmup
        t0 = time.perf_counter()
        for wb in wav_batches:
            _ = wmodel(wb).last_hidden_state.mean(dim=1)
        stages["wav2vec2_utt_per_s"] = round(n_wav / (time.perf_counter() - t0), 2)

    # --- fusion eval loop: the measured headline denominator already covers
    # it (bench.py bench_torch_cpu over the full MELD-test-shaped workload)
    from bench import BASELINE_KEY

    fusion_rate = cache.get(BASELINE_KEY)
    if fusion_rate is None:
        from bench import _workload, bench_torch_cpu

        batcher, n_utt = _workload()
        fusion_rate = bench_torch_cpu(batcher, n_utt)
    stages["fusion_utt_per_s"] = round(float(fusion_rate), 2)

    # sequential composition (the reference runs export, export, then eval)
    per_utt = sum(1.0 / stages[k] for k in
                  ("text_utt_per_s", "wav2vec2_utt_per_s", "fusion_utt_per_s"))
    value = round(1.0 / per_utt, 2)
    results["e2e_baseline_torch_cpu"] = value
    results["e2e_baseline_torch_cpu_stages"] = stages
    cache[CACHE_KEY] = {"utt_per_s": value, "stages": stages}
    try:
        with open(BASELINE_CACHE, "w") as f:
            _json.dump(cache, f)
    except OSError:
        pass


def main():
    # optional single-leg re-runs: `bench_all.py [data_root] --legs a,b`
    # loads the committed BENCH_LOCAL.json and re-measures ONLY the named
    # legs in place (e.g. after fixing one leg's harness, without paying
    # the full multi-hour sweep again)
    argv = sys.argv[1:]
    only_legs = None
    if "--legs" in argv:
        i = argv.index("--legs")
        only_legs = set(argv[i + 1].split(","))
        argv = argv[:i] + argv[i + 2:]
    data_root = argv[0] if argv else "/tmp/meldbig"
    if not os.path.isdir(os.path.join(data_root, "MELD.Raw")):
        import subprocess

        subprocess.run(
            [sys.executable, os.path.join(REPO_ROOT, "scripts", "make_synthetic_meld.py"),
             data_root, "--dialogues", "120"],
            check=True,
        )
    # MELD-test-shaped split for the e2e legs (280 dialogues / 2608 usable
    # utterances, realistic durations)
    e2e_root = data_root.rstrip("/") + "_meldshape"
    if not os.path.isdir(os.path.join(e2e_root, "MELD.Raw")):
        import subprocess

        subprocess.run(
            [sys.executable, os.path.join(REPO_ROOT, "scripts", "make_synthetic_meld.py"),
             e2e_root, "--meld-shape"],
            check=True,
        )

    results: dict = {}
    out_path = os.path.join(REPO_ROOT, "BENCH_LOCAL.json")
    if only_legs is not None and os.path.exists(out_path):
        with open(out_path) as f:
            results = json.load(f)

    def run_leg(fn, *args):
        """Fault isolation per leg + incremental flush: a crashed leg (TPU
        outage, OOM, compiler 500) records an error row instead of losing
        the hours of sweep behind it, and BENCH_LOCAL.json always holds
        every completed leg."""
        if only_legs is not None and fn.__name__ not in only_legs:
            return
        results.pop(f"{fn.__name__}_error", None)
        t0 = time.perf_counter()
        try:
            fn(results, *args)
        except Exception as e:  # noqa: BLE001 — the whole point
            results[f"{fn.__name__}_error"] = str(e)[:300]
            print(f"LEG FAILED {fn.__name__}: {e}", file=sys.stderr)
        results.setdefault("_leg_seconds", {})[fn.__name__] = round(
            time.perf_counter() - t0, 1)
        with open(out_path, "w") as f:
            json.dump(results, f, indent=2)

    run_leg(bench_h2d_link)
    run_leg(bench_h2d_dispatch)
    run_leg(bench_kernels)
    run_leg(bench_logmel)
    run_leg(bench_fusion)
    run_leg(fusion_roofline)
    run_leg(bench_fusion_train_decomposition)
    run_leg(bench_fusion_latency)
    run_leg(bench_fusion_int8)
    run_leg(bench_online_serving)
    run_leg(bench_fe_export_int8)
    run_leg(bench_fe_train)
    run_leg(bench_fe_train_decomposition)
    run_leg(bench_mel_pipeline, data_root)
    run_leg(bench_e2e_baseline, e2e_root)
    run_leg(bench_e2e, e2e_root)
    # vs-baseline multiples for the e2e legs (north-star config 5)
    base = results.get("e2e_baseline_torch_cpu")
    if base:
        for key in ("e2e_streaming_utt_per_s", "e2e_streaming_int8_utt_per_s",
                    "e2e_streaming_mel_utt_per_s", "e2e_streaming_mulaw_utt_per_s"):
            if results.get(key):
                results[key + "_vs_baseline"] = round(results[key] / base, 1)

    with open(out_path, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
