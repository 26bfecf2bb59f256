"""Benchmark: M2FNet fusion inference throughput (the reference's benchmark
path, src/test.py) on a MELD-test-shaped workload.

Workload (SURVEY.md §6): 280 dialogues / ~2608 utterances, batches of 32
dialogues, d=768 embeddings, 6-layer modality encoders, 5 FAM layers.
MELD itself cannot ship here, so dialogue structure is synthesized with the
corpus statistics; throughput depends only on shapes.

Prints ONE JSON line:
  {"metric": ..., "value": utterances/sec on TPU, "unit": ...,
   "vs_baseline": speedup vs the torch-CPU reference implementation}

The baseline is the same architecture built from torch built-ins
(nn.TransformerEncoder / nn.MultiheadAttention) run on CPU — i.e. what the
reference implementation does on this machine.  The torch number is cached
in .bench_baseline.json (keyed by workload/version) because it is slow.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

import numpy as np

N_DIALOGUES = 280
MEAN_LEN = 9.3
MAX_LEN = 33
BATCH = 32
D = 768
SEED = 1234
BASELINE_CACHE = os.path.join(REPO_ROOT, ".bench_baseline.json")
# v2: baseline measured over the FULL test workload (v1 extrapolated from
# 3 batches — fine directionally, fragile as a headline denominator)
BASELINE_KEY = f"m2fnet-test-v2-{N_DIALOGUES}x{D}-b{BATCH}"


def _workload():
    from mer_tpu.data import FusionBatcher
    from mer_tpu.data.synthetic import SyntheticFusionDataset

    ds = SyntheticFusionDataset(
        n_dialogues=N_DIALOGUES, d_text=D, d_audio=D, mean_len=MEAN_LEN,
        max_len=MAX_LEN, seed=SEED, learnable=False,
    )
    batcher = FusionBatcher(ds, batch_size=BATCH, shuffle=False, sort_by_length=True)
    n_utterances = int(sum(d["emotion"].shape[0] for d in ds._dialogues))
    return batcher, n_utterances


def bench_int8(batcher, n_utterances: int, repeats: int = 3) -> float:
    """int8 serving engine (mer_tpu/serving) at the same workload:
    per-channel int8 kernels + int8 MXU GEMMs — the production serving path
    (measured ~1.25x the bf16 Flax forward; weight HBM traffic 87 MB vs 173)."""
    import jax
    import jax.numpy as jnp

    from mer_tpu.models import M2FNet
    from mer_tpu.serving import M2FNetInt8, quantize_m2fnet

    model = M2FNet(scan_layers=True)
    host_batches = list(batcher)
    example = host_batches[0]
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.asarray(example["text"]), jnp.asarray(example["audio"]),
        jnp.asarray(example["padding_mask"]),
    )["params"]
    qparams = jax.device_put(quantize_m2fnet(params))
    server = M2FNetInt8(model)

    @jax.jit
    def predict(qp, text, audio, mask):
        return jnp.argmax(server.apply(qp, text, audio, mask), axis=-1)

    dev_batches = [jax.tree.map(jnp.asarray, b) for b in host_batches]
    last = None
    for b in dev_batches:
        last = predict(qparams, b["text"], b["audio"], b["padding_mask"])
    np.asarray(last)  # compile + sync (see bench_tpu protocol)
    inner = 10
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(inner):
            for b in dev_batches:
                last = predict(qparams, b["text"], b["audio"], b["padding_mask"])
        np.asarray(last)
        times.append((time.perf_counter() - t0) / inner)
    return n_utterances / min(times)


def bench_scanned(batcher, n_utterances: int, repeats: int = 3,
                  serving_batch: int | None = None) -> tuple[float, float, float]:
    """Offline whole-split inference as scanned XLA programs
    (mer_tpu/serving/offline.py): batches grouped by bucket shape, each
    group ONE lax.scan dispatch over HBM-stacked arrays — the TPU-native
    form of the reference's per-batch DataLoader eval loop (src/test.py:51).
    Returns (bf16, int8, w8) scanned utt/s — w8 = int8 weights in HBM
    dequantized into bf16 GEMMs (no activation-quant math); same
    execution-verified sync protocol as bench_tpu.

    ``serving_batch``: re-collate the split's batches into serving batches
    of up to this many dialogues first (recollate_batches — identity
    re-batching; the reference's batch 32 leaves the MXU starved, see
    scripts/profile_fusion_serving_batch.py: 108k -> 565k utt/s per-batch
    forward going 32 -> 512)."""
    import jax
    import jax.numpy as jnp

    from mer_tpu.models import M2FNet
    from mer_tpu.serving import (
        M2FNetInt8, ScanPredictor, quantize_m2fnet, recollate_batches,
    )

    model = M2FNet(dtype=jnp.bfloat16, scan_layers=True)
    host_batches = [
        {k: b[k] for k in ("text", "audio", "padding_mask")} for b in batcher
    ]
    if serving_batch is not None:
        host_batches, _ = recollate_batches(host_batches, serving_batch)
    example = host_batches[0]
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.asarray(example["text"]), jnp.asarray(example["audio"]),
        jnp.asarray(example["padding_mask"]),
    )["params"]
    bf16_params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
    qparams = jax.device_put(quantize_m2fnet(params))
    wparams = jax.device_put(quantize_m2fnet(params, weight_only=True))
    server = M2FNetInt8(model)

    def predict_bf16(p, b):
        return jnp.argmax(
            model.apply({"params": p}, b["text"], b["audio"], b["padding_mask"],
                        deterministic=True), -1)

    def predict_int8(p, b):
        return jnp.argmax(server.apply(p, b["text"], b["audio"], b["padding_mask"]), -1)

    results, spreads = [], []
    for predict, p in [(predict_bf16, bf16_params), (predict_int8, qparams),
                       (predict_int8, wparams)]:
        sp = ScanPredictor(predict)
        staged = [stacked for _, _, stacked in sp.stage(host_batches)]
        last = None
        for stacked in staged:
            last = sp._run(p, stacked)
        np.asarray(last)  # compile + sync
        inner = 10
        times = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            for _ in range(inner):
                for stacked in staged:
                    last = sp._run(p, stacked)
            np.asarray(last)  # in-order execution: syncs everything above
            times.append((time.perf_counter() - t0) / inner)
        results.append(n_utterances / min(times))
        # run-to-run spread of the SAME measurement (max/min of the repeats,
        # as a % of the best) — any "winner" whose margin over the runner-up
        # sits inside the combined spread is a tie, not a ranking
        spreads.append((max(times) - min(times)) / min(times) * 100.0)
    return tuple(results), tuple(spreads)


def bench_tpu(batcher, n_utterances: int, repeats: int = 3) -> tuple[float, float]:
    """Returns (device_resident_utt_per_s, streaming_utt_per_s).

    Measurement protocol: execution is synced by fetching a value derived
    from the final output — on this TPU stack ``block_until_ready`` can
    return before queued work executes (dispatch-rate inflation), so every
    timing ends in a real D2H fetch.  Single-device execution is in-order,
    so one tiny fetch of the last prediction proves the whole run executed.

    - device-resident: inputs pre-staged in HBM; measures model compute
      (what a serving deployment with on-host data sees).
    - streaming: inputs transferred host->device inside the timed region
      via the double-buffered prefetcher, every prediction fetched back
      (bounded by host link bandwidth; on this dev machine that link is a
      ~100 MB/s tunnel, on real TPU hosts it is PCIe).
    """
    import numpy as np

    import jax
    import jax.numpy as jnp

    from mer_tpu.data import prefetch
    from mer_tpu.models import M2FNet

    model = M2FNet(dtype=jnp.bfloat16, scan_layers=True)
    host_batches = list(batcher)
    example = host_batches[0]
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.asarray(example["text"]), jnp.asarray(example["audio"]),
        jnp.asarray(example["padding_mask"]),
    )["params"]
    # inference-only: bf16 param storage halves weight HBM reads
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)

    @jax.jit
    def predict(params, text, audio, mask):
        logits = model.apply({"params": params}, text, audio, mask, deterministic=True)
        return jnp.argmax(logits, axis=-1)

    # --- device-resident ---
    dev_batches = [jax.tree.map(jnp.asarray, b) for b in host_batches]
    last = None
    for b in dev_batches:
        last = predict(params, b["text"], b["audio"], b["padding_mask"])
    np.asarray(last)  # compile + sync
    inner = 10
    dr_times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(inner):
            for b in dev_batches:
                last = predict(params, b["text"], b["audio"], b["padding_mask"])
        np.asarray(last)  # in-order execution: syncs everything above
        dr_times.append((time.perf_counter() - t0) / inner)
    device_resident = n_utterances / min(dr_times)

    # --- streaming (H2D transfers + full prediction fetch inside the clock) ---
    st_times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        preds = [
            predict(params, b["text"], b["audio"], b["padding_mask"])
            for b in prefetch(host_batches, buffer_size=4)
        ]
        _ = [np.asarray(p) for p in preds]
        st_times.append(time.perf_counter() - t0)
    streaming = n_utterances / min(st_times)

    return device_resident, streaming


def _torch_m2fnet_baseline():
    """The reference architecture from torch built-ins (CPU baseline)."""
    import torch
    import torch.nn as tnn

    class TorchFAM(tnn.Module):
        def __init__(self, d, h):
            super().__init__()
            self.mha = tnn.MultiheadAttention(d, h, batch_first=True, dropout=0.4)
            self.lin = tnn.Linear(2 * d, d)

        def forward(self, text, audio, mask):
            x, _ = self.mha(text, audio, text, key_padding_mask=mask)
            x = torch.relu(torch.cat([x, text], dim=2))
            return torch.relu(self.lin(x))

    class TorchM2FNet(tnn.Module):
        def __init__(self, d=D, h=8, n_enc=6, n_fam=5, hidden=768, classes=7):
            super().__init__()
            mk_enc = lambda: tnn.TransformerEncoder(
                tnn.TransformerEncoderLayer(d_model=d, nhead=h, dropout=0.4, batch_first=True),
                num_layers=n_enc, norm=tnn.LayerNorm(d),
            )
            self.audio_enc, self.text_enc = mk_enc(), mk_enc()
            self.audio_proj, self.text_proj = tnn.Linear(d, d), tnn.Linear(d, d)
            self.fams = tnn.ModuleList(TorchFAM(d, h) for _ in range(n_fam))
            self.head = tnn.Sequential(
                tnn.Linear(2 * d, hidden), tnn.ReLU(), tnn.Dropout(0.4), tnn.Linear(hidden, classes)
            )

        def forward(self, text, audio, mask):
            audio = audio + self.audio_enc(audio, src_key_padding_mask=mask)
            audio = self.audio_proj(audio)
            text = text + self.text_enc(text, src_key_padding_mask=mask)
            text = self.text_proj(text)
            for fam in self.fams:
                text = fam(text, audio, mask)
            return self.head(torch.cat([audio, text], dim=2))

    return TorchM2FNet().eval()


def bench_torch_cpu(batcher, n_utterances: int, max_batches: int | None = None) -> float:
    """Reference-equivalent CPU throughput over the FULL test workload
    (cached in .bench_baseline.json — one slow measurement per machine)."""
    import torch

    model = _torch_m2fnet_baseline()
    batches = list(batcher)
    if max_batches is not None:
        batches = batches[:max_batches]
    utt = sum(int((b["emotion"] != -1).sum()) for b in batches)
    with torch.inference_mode():
        tb = [
            (torch.tensor(b["text"]), torch.tensor(b["audio"]), torch.tensor(b["padding_mask"]))
            for b in batches
        ]
        model(*tb[0])  # warmup
        t0 = time.perf_counter()
        for text, audio, mask in tb:
            model(text, audio, mask).argmax(dim=2)
        dt = time.perf_counter() - t0
    return utt / dt


def get_baseline(batcher, n_utterances: int) -> float:
    if os.path.exists(BASELINE_CACHE):
        try:
            with open(BASELINE_CACHE) as f:
                cache = json.load(f)
            if BASELINE_KEY in cache:
                return float(cache[BASELINE_KEY])
        except (json.JSONDecodeError, OSError):
            pass
    value = bench_torch_cpu(batcher, n_utterances)
    try:
        with open(BASELINE_CACHE, "w") as f:
            json.dump({BASELINE_KEY: value}, f)
    except OSError:
        pass
    return value


def probe_backend(attempts: int = 2, timeout_s: float = 180.0) -> str | None:
    """Check the jax backend is alive BEFORE building any jax workload.

    The compile service here is remote (HTTP tunnel) and has gone down
    mid-round before — when it does, even ``jax.devices()`` hangs, so the
    probe must run in a subprocess under a hard timeout.  Bounded retries
    with backoff ride out transient restarts.  Returns None when healthy,
    else a one-line reason string (bench must still print ONE JSON line).
    """
    import subprocess

    code = (
        "import jax, jax.numpy as jnp;"
        "x = jnp.ones((64, 64));"
        "(x @ x).block_until_ready();"
        "print('OK', jax.default_backend())"
    )
    reason = "unknown"
    for i in range(attempts):
        try:
            r = subprocess.run(
                [sys.executable, "-c", code], capture_output=True, text=True,
                timeout=timeout_s, cwd=REPO_ROOT,
            )
            if r.returncode == 0 and "OK" in r.stdout:
                return None
            reason = (r.stderr.strip().splitlines() or ["probe failed"])[-1][:300]
        except subprocess.TimeoutExpired:
            reason = f"backend probe timed out after {timeout_s:.0f}s"
        except OSError as e:
            reason = f"probe spawn failed: {e}"
        if i < attempts - 1:
            time.sleep(20.0 * (i + 1))
    return reason


def main():
    # Workload + torch-CPU baseline first: neither needs a live jax backend
    # (resolve_process falls back to (0, 1) when the runtime is unreachable),
    # so a TPU outage cannot cost us the baseline leg.
    batcher, n_utterances = _workload()
    baseline = get_baseline(batcher, n_utterances)
    err = probe_backend()
    if err is not None:
        print(json.dumps({
            "metric": "MELD-test-shaped M2FNet fusion inference throughput (utterances/sec/chip)",
            "value": None,
            "unit": "utterances/sec",
            "vs_baseline": None,
            "baseline_torch_cpu": round(baseline, 1),
            "error": f"jax backend unavailable: {err}",
        }))
        return
    device_resident, streaming = bench_tpu(batcher, n_utterances)
    int8 = bench_int8(batcher, n_utterances)
    (scanned_bf16, scanned_int8, scanned_w8), scanned_spread = bench_scanned(batcher, n_utterances)
    # TPU-tuned serving batch: same split, same per-dialogue predictions,
    # bigger GEMMs (recollate_batches — the reference's batch 32 is a GPU
    # artifact that starves the MXU)
    (big_bf16, big_int8, big_w8), big_spread = bench_scanned(batcher, n_utterances, serving_batch=512)
    modes = {
        "bf16": device_resident,
        "int8": int8,
        "scanned_bf16": scanned_bf16,
        "scanned_int8": scanned_int8,
        "scanned_w8": scanned_w8,
        "bigbatch_bf16": big_bf16,
        "bigbatch_int8": big_int8,
        "bigbatch_w8": big_w8,
    }
    ranked = sorted(modes, key=modes.get, reverse=True)
    best_mode, runner_up = ranked[0], ranked[1]
    best = modes[best_mode]
    # a "winner" whose margin over the runner-up is inside the measured
    # run-to-run spread is a TIE (VERDICT r4: the bf16-vs-int8 bigbatch
    # ordering flips between same-day runs at 1-4% margins)
    spread_by_mode = dict(zip(
        ("scanned_bf16", "scanned_int8", "scanned_w8"), scanned_spread))
    spread_by_mode.update(zip(
        ("bigbatch_bf16", "bigbatch_int8", "bigbatch_w8"), big_spread))
    margin_pct = (best - modes[runner_up]) / modes[runner_up] * 100.0
    pair_spread = max(spread_by_mode.get(best_mode, 5.0),
                      spread_by_mode.get(runner_up, 5.0))
    print(
        json.dumps(
            {
                "metric": "MELD-test-shaped M2FNet fusion inference throughput (utterances/sec/chip, device-resident inputs, best of 8 serving modes)",
                "value": round(best, 1),
                "best_mode": best_mode,
                "best_mode_is_tie": bool(margin_pct <= pair_spread),
                "runner_up_mode": runner_up,
                "winner_margin_pct": round(margin_pct, 2),
                "winner_spread_pct": round(pair_spread, 2),
                "unit": "utterances/sec",
                "vs_baseline": round(best / baseline, 2),
                "bf16_value": round(device_resident, 1),
                "int8_value": round(int8, 1),
                "scanned_bf16_value": round(scanned_bf16, 1),
                "scanned_int8_value": round(scanned_int8, 1),
                "scanned_w8_value": round(scanned_w8, 1),
                "bigbatch_bf16_value": round(big_bf16, 1),
                "bigbatch_int8_value": round(big_int8, 1),
                "bigbatch_w8_value": round(big_w8, 1),
                "scanned_spread_pct": [round(s, 2) for s in scanned_spread],
                "bigbatch_spread_pct": [round(s, 2) for s in big_spread],
                "streaming_value": round(streaming, 1),
                "baseline_torch_cpu": round(baseline, 1),
            }
        )
    )


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # contract: ALWAYS exactly one JSON line on stdout
        print(json.dumps({
            "metric": "MELD-test-shaped M2FNet fusion inference throughput (utterances/sec/chip)",
            "value": None,
            "unit": "utterances/sec",
            "vs_baseline": None,
            "error": f"{type(e).__name__}: {e}"[:500],
        }))
        sys.exit(1)
