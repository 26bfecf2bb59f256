"""End-to-end streaming inference: raw utterances -> emotion predictions.

BASELINE.json config 5: "mp4->wav->mel on-device + both encoders + M2FNet
inference on full MELD test".  The reference has no such path — it requires
three separate export runs writing pickles to disk between stages
(SURVEY.md §3.5).  Here the whole thing is one pipelined program:

  host:   wav decode (data/audio_io) + tokenization        } prefetch thread
  device: audio utterance embeddings (jit, bucketed) — either wav2vec2
          (768-d) or log-mel -> ResNet18 (300-d; the reference switches
          between them via the embeddings dir, src/config.yaml:6-8)
  device: RoBERTa [CLS] utterance embeddings (jit, bucketed)
  device: dialogue grouping -> M2FNet fusion logits (jit, bucketed)

No intermediate artifacts touch disk; utterance embeddings stream straight
into dialogue batches.  Throughput metric: utterances/sec end-to-end.
"""

from __future__ import annotations

import time
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from mer_tpu.data.fusion import DEFAULT_LENGTH_BUCKETS, collate_dialogues, pick_bucket
from mer_tpu.data.text_fe import pad_tokens_to
from mer_tpu.models.m2fnet import M2FNet
from mer_tpu.models.roberta import TextERC
from mer_tpu.models.wav2vec2 import AudioERC
from mer_tpu.objectives.metrics import BatchAveragedMetrics


def _bucket_len(n: int) -> int:
    """Round a flat-buffer length up to a coarse bucket (multiples of 4M
    elements above 4M, powers of two below) so the coalesced-upload reslice
    programs keep stable input shapes — and compile-cache keys — across
    datasets of similar scale."""
    if n >= (1 << 22):
        q = 1 << 22
        return (n + q - 1) // q * q
    m = 1024
    while m < n:
        m <<= 1
    return m


@dataclass
class E2EModels:
    """The audio branch accepts either embedder the reference can feed fusion
    with (src/config.yaml:6-8 switches the embeddings dir): an ``AudioERC``
    (wav2vec2, 768-d) or an ``AudioMelFeatureExtractor`` (on-device log-mel
    -> ResNet18 -> 300-d, reference audio_mel/embeddings.py:61-80) — the
    latter needs its BatchNorm ``batch_stats`` tree too."""

    text_model: TextERC
    text_params: dict
    audio_model: object  # AudioERC | AudioMelFeatureExtractor
    audio_params: dict
    fusion_model: M2FNet
    fusion_params: dict
    audio_batch_stats: dict | None = None


class StreamingPipeline:
    """Chains the three models with device-resident intermediates.

    ``engine="bf16"`` (default) runs the Flax forwards in each model's
    dtype; ``engine="int8"`` swaps all three models for the int8 serving
    engines (mer_tpu/serving — per-channel int8 kernels, int8 MXU GEMMs,
    ~4x less weight HBM). Measured on the dev chip the int8 mode is
    metric-faithful but slower end-to-end at this workload's small batch
    counts (542 vs 746 utt/s) — the dynamic quant elementwise work doesn't
    amortize; it exists for memory-constrained serving and parity with the
    offline int8 paths (bench.py shows where int8 wins: the device-resident
    fusion split at full batch counts).
    """

    def __init__(self, models: E2EModels, utterance_batch: int = 32, dialogue_batch: int = 32,
                 buckets=DEFAULT_LENGTH_BUCKETS, engine: str = "bf16", mel_cfg=None,
                 wire: str = "int16", coalesce_h2d: bool = True):
        if engine not in ("bf16", "int8"):
            raise ValueError(f"engine must be 'bf16' or 'int8', got {engine!r}")
        if wire not in ("int16", "mulaw"):
            raise ValueError(f"wire must be 'int16' or 'mulaw', got {wire!r}")
        self.engine = engine
        self.wire = wire

        # waveform wire decode: int16 PCM is exact (the default); 8-bit
        # μ-law halves the H2D bytes again at ~35-38 dB quantization SNR
        # (ops/mulaw.py — envelope vs the exact path pinned in
        # tests/test_mulaw.py). Both are pure elementwise and fuse into the
        # first conv/frame op on device.
        if wire == "mulaw":
            from mer_tpu.ops.mulaw import mulaw_decode as _wire_decode
        else:
            def _wire_decode(a):
                return a.astype(jnp.float32) / 32768.0
        self._wire_decode = _wire_decode

        from mer_tpu.models.resnet import AudioMelFeatureExtractor

        self.audio_kind = (
            "mel" if isinstance(models.audio_model, AudioMelFeatureExtractor) else "wav2vec2"
        )
        if self.audio_kind == "mel":
            if engine == "int8":
                # the int8 engines cover the transformer backbones (weight-
                # bandwidth-bound GEMMs); the mel branch is conv-dominated
                # and has no int8 conv path
                raise ValueError("engine='int8' supports the wav2vec2 audio branch only")
            if models.audio_batch_stats is None:
                raise ValueError(
                    "the mel audio branch needs audio_batch_stats (BatchNorm "
                    "running statistics — model.init(...)['batch_stats'] or a "
                    "restored checkpoint's stats)"
                )
            from mer_tpu.ops.logmel import MelConfig

            self.mel_cfg = mel_cfg if mel_cfg is not None else MelConfig()

        # commit params to device once — checkpoint-restored trees arrive as
        # host numpy, and numpy jit arguments re-transfer on EVERY call
        # (~2 GB/batch for the full model set on this workload). Inference-only
        # pipeline: store bf16 when the model computes in bf16 (halves weight
        # HBM reads, measured +35% on the fusion forward).
        def _commit(model, params):
            if getattr(model, "dtype", None) == jnp.bfloat16:
                params = jax.tree.map(lambda x: jnp.asarray(x).astype(jnp.bfloat16), params)
            return jax.device_put(params)

        if engine == "int8":
            from mer_tpu.serving import (
                quantize_m2fnet, quantize_roberta, quantize_wav2vec2,
            )

            self.m = E2EModels(
                models.text_model, jax.device_put(quantize_roberta(models.text_params)),
                models.audio_model, jax.device_put(quantize_wav2vec2(models.audio_params)),
                models.fusion_model, jax.device_put(quantize_m2fnet(models.fusion_params)),
            )
        else:
            # the mel embedder's "params" jit argument is the full variables
            # dict (params + f32 BatchNorm batch_stats)
            audio_vars = (
                {
                    "params": _commit(models.audio_model, models.audio_params),
                    "batch_stats": jax.device_put(models.audio_batch_stats),
                }
                if self.audio_kind == "mel"
                else _commit(models.audio_model, models.audio_params)
            )
            self.m = E2EModels(
                models.text_model, _commit(models.text_model, models.text_params),
                models.audio_model, audio_vars,
                models.fusion_model, _commit(models.fusion_model, models.fusion_params),
            )
        self.utterance_batch = utterance_batch
        self.dialogue_batch = dialogue_batch
        self.buckets = buckets
        self.coalesce_h2d = coalesce_h2d
        self._reslicer_cache: dict = {}

        # params must be jit *arguments*, not closure constants — closed-over
        # arrays are baked into the HLO as literals, which blows program-size
        # limits on remote-compile setups (125M-param RoBERTa -> HTTP 413).
        if engine == "int8":
            from mer_tpu.serving import M2FNetInt8, RobertaInt8, Wav2Vec2Int8

            text_server = RobertaInt8(models.text_model)
            audio_server = Wav2Vec2Int8(models.audio_model)
            fusion_server = M2FNetInt8(models.fusion_model)
            text_embed = text_server.embed

            def audio_embed(params, audio_wire, lengths):
                audio = _wire_decode(audio_wire)
                return audio_server.embed(params, audio, lengths)

            def fusion_logits(params, text, audio, mask):
                return fusion_server.apply(params, text, audio, mask)
        else:
            def text_embed(params, ids, mask):
                return self.m.text_model.apply({"params": params}, ids, mask, method=TextERC.embed)

            if self.audio_kind == "mel":
                from mer_tpu.ops.logmel import log_mel_spectrogram

                mcfg = self.mel_cfg

                # wav -> log-mel -> ResNet18+projector, entirely on device:
                # the streaming analog of the reference's offline
                # embeddings/audio_mel chain (audio_mel/dataset.py:93-180 +
                # embeddings.py:61-80). int16 wire format is exact here too —
                # the mel frontend peak-normalizes per clip (dataset.py:94),
                # cancelling the 1/32768 scale. (μ-law is NOT exact here:
                # companding error survives peak normalization.)
                def audio_embed(variables, audio_wire, lengths):
                    audio = _wire_decode(audio_wire)
                    pad = mcfg.max_samples - audio.shape[1]
                    if pad > 0:
                        audio = jnp.pad(audio, ((0, 0), (0, pad)))
                    spec = log_mel_spectrogram(
                        audio[:, : mcfg.max_samples],
                        jnp.minimum(lengths, mcfg.max_samples),
                        mcfg, channels_first=False,
                    )
                    return self.m.audio_model.apply(variables, spec)
            else:
                # audio travels host->device as int16 (PCM's native width,
                # half the transfer bytes) or uint8 μ-law (quarter);
                # decode/normalization happens on device.
                def audio_embed(params, audio_wire, lengths):
                    audio = _wire_decode(audio_wire)
                    return self.m.audio_model.apply({"params": params}, audio, lengths, method=AudioERC.embed)

            def fusion_logits(params, text, audio, mask):
                return self.m.fusion_model.apply({"params": params}, text, audio, mask)

        self._text_embed_fn = jax.jit(text_embed)
        self._audio_embed_fn = jax.jit(audio_embed)

        # scan-grouped stage 1 (offline path): all same-shape utterance
        # batches stacked to [G, B, ...] and embedded by ONE lax.scan
        # dispatch per (modality, shape) group. On tunneled hosts each jit
        # dispatch blocks the host ~25-30 ms (BENCH fusion_latency_*_dispatch
        # rows); the per-batch loop paid that 2x per batch and was the
        # whole e2e bottleneck (host batch production profiles at 18 ms
        # for the full split — see embed_utterances_scanned).
        def _scanned(fn):
            def run_scan(params, *stacked):
                def body(carry, args):
                    return carry, fn(params, *args)

                _, out = jax.lax.scan(body, None, stacked)
                return out

            return jax.jit(run_scan)

        self._text_embed_scan_fn = _scanned(text_embed)
        self._audio_embed_scan_fn = _scanned(audio_embed)
        self._fusion_fn = jax.jit(
            lambda params, text, audio, mask: jnp.argmax(fusion_logits(params, text, audio, mask), axis=-1)
        )

        # device-resident stage1->stage2 handoff: the utterance embedding
        # tables never leave HBM; dialogue grouping is this jitted gather from
        # the flat [N, D] tables (idxm rows of -1 = padding), so the only D2H
        # traffic of the whole pipeline is the tiny [B, U] prediction arrays.
        # (The host-table path fetched [N, 768] x2 over the host link — ~87%
        # of stage-1 wall clock on tunneled hosts, BENCH_LOCAL e2e_stages.)
        def _fusion_from_tables(params, table_t, table_a, idxm_t, idxm_a, mask):
            # separate index matrices per modality: the scan-grouped stage 1
            # orders each table by its own shape groups, so a dataset row can
            # sit at different positions in the text and audio tables
            text = jnp.where((idxm_t >= 0)[..., None], table_t[jnp.maximum(idxm_t, 0)], 0)
            audio = jnp.where((idxm_a >= 0)[..., None], table_a[jnp.maximum(idxm_a, 0)], 0)
            return jnp.argmax(fusion_logits(params, text, audio, mask), axis=-1)

        self._fusion_tables_fn = jax.jit(_fusion_from_tables)
        self._text_embed = lambda ids, mask: self._text_embed_fn(self.m.text_params, ids, mask)
        self._audio_embed = lambda audio, lengths: self._audio_embed_fn(self.m.audio_params, audio, lengths)
        self._fusion = lambda text, audio, mask: self._fusion_fn(self.m.fusion_params, text, audio, mask)
        self._fusion_tables = lambda tt, ta, idxm_t, idxm_a, mask: self._fusion_tables_fn(
            self.m.fusion_params, tt, ta, idxm_t, idxm_a, mask
        )

    # -- stage 1: utterance embeddings ---------------------------------------

    def _check_wire(self, audio) -> None:
        """Fail loudly on a generator/pipeline wire-format mismatch — μ-law
        decode of int16 PCM (or vice versa) would be silent garbage."""
        expect = np.uint8 if self.wire == "mulaw" else np.int16
        if np.asarray(audio).dtype != expect:
            raise ValueError(
                f"wire={self.wire!r} expects {np.dtype(expect).name} audio "
                f"batches, got {np.asarray(audio).dtype.name} — pass "
                f"wire={self.wire!r} to mixed_utterance_batches too"
            )

    def embed_utterances(self, batches, stage_times: dict | None = None, fetch: bool = True):
        """Consume mixed host batches with both modalities:
        {"text", "attention_mask", "audio", "lengths", "idx", "emotion"}.

        ``fetch=True`` returns host ([N, Dt], [N, Da]) embedding tables in
        dataset-row order.  ``fetch=False`` keeps the tables in HBM and
        returns ``(table_t, table_a, pos)`` where the tables are flat
        device arrays in dispatch order and ``pos[row] -> table position``
        maps dataset rows into them (for the device-resident gather handoff;
        nothing bigger than the per-batch dispatch queue touches the host).

        Transfers are double-buffered (DevicePrefetcher) and results are
        fetched only after every batch is dispatched, so host->device copies
        overlap device compute.  With ``stage_times`` supplied, records a
        wall-clock breakdown: ``embed_host_prep_s`` (host batch production —
        wav decode + tokenize — accumulated inside the prefetch thread),
        ``embed_dispatch_s`` (the dispatch loop, incl. H2D stalls) and
        ``embed_fetch_s`` (D2H).  NOTE host_prep runs concurrently with
        dispatch over the same wall-clock interval — it measures *overlap*
        hidden behind the dispatch leg, not an additive phase; summing it
        with dispatch can exceed ``stage1_embed_s``."""
        from mer_tpu.data.prefetch import prefetch

        device_keys = ("text", "attention_mask", "audio", "lengths")
        checked_wire = [False]
        host = []
        host_prep = [0.0]

        def _device_batches():
            it = iter(batches)
            while True:
                t0 = time.perf_counter()
                b = next(it, None)
                host_prep[0] += time.perf_counter() - t0
                if b is None:
                    return
                if not checked_wire[0]:
                    self._check_wire(b["audio"])
                    checked_wire[0] = True
                host.append((b["idx"], b["emotion"]))
                yield {k: b[k] for k in device_keys}

        text_rows, audio_rows, idx_rows = [], [], []
        pending = []
        t_dispatch = time.perf_counter()
        for i, b in enumerate(prefetch(_device_batches(), buffer_size=4)):
            te = self._text_embed(b["text"], b["attention_mask"])
            ae = self._audio_embed(b["audio"], b["lengths"])
            pending.append((i, te, ae))
        t_fetch = time.perf_counter()
        if stage_times is not None:
            stage_times["embed_host_prep_s"] = round(host_prep[0], 3)
            stage_times["embed_dispatch_s"] = round(t_fetch - t_dispatch, 3)
        if not fetch:
            # flat HBM tables in dispatch order (one concatenate dispatch);
            # pos maps dataset rows -> table positions (first occurrence wins,
            # duplicate rows are batch padding with emotion == -1). Offsets
            # come from a running sum, so ragged batch sizes are handled.
            table_t = jnp.concatenate([te for _, te, _ in pending], axis=0)
            table_a = jnp.concatenate([ae for _, _, ae in pending], axis=0)
            n_rows = 1 + max(int(np.max(idx)) for idx, _ in host)
            pos = np.full((n_rows,), -1, np.int64)
            offset = 0
            for i, (idx, emotion) in enumerate(host):
                valid = emotion != -1
                pos[idx[valid]] = offset + np.nonzero(valid)[0]
                offset += pending[i][1].shape[0]
            if not (pos >= 0).all():
                missing = int((pos < 0).sum())
                raise ValueError(
                    f"{missing} dataset rows never appeared in the utterance stream "
                    "(or arrived only as emotion==-1 padding) — the device-resident "
                    "handoff would silently misclassify them as padding"
                )
            if stage_times is not None:
                stage_times["embed_fetch_s"] = 0.0  # tables stay in HBM
            return table_t, table_a, pos
        # fetch after all dispatches (keeps the device queue full)
        for i, te, ae in pending:
            idx, emotion = host[i]
            valid = emotion != -1
            text_rows.append(np.asarray(te)[valid])
            audio_rows.append(np.asarray(ae)[valid])
            idx_rows.append(idx[valid])
        if stage_times is not None:
            stage_times["embed_fetch_s"] = round(time.perf_counter() - t_fetch, 3)
        idx = np.concatenate(idx_rows)
        order = np.argsort(idx)
        return (
            np.concatenate(text_rows)[order],
            np.concatenate(audio_rows)[order],
        )

    def _upload_coalesced(self, host, modalities):
        """Ship stage 1's H2D traffic as ONE transfer per dtype.

        Every (modality, shape-group) stack is raveled into a flat per-dtype
        host buffer — ``np.stack(..., out=flat_view)`` writes each stack
        straight into its slot, so host memcpy cost matches the per-stack
        path — then a single ``jax.device_put`` per dtype moves the whole
        set, and one jitted program per modality recovers the [G, B, ...]
        stacks with static slices (HBM-to-HBM copies, off the host link).

        Why: on tunneled hosts ``device_put`` pays a large per-call cost —
        the MELD-test waveform set (356 MB over ~10 per-group calls) moved
        at ~85 MB/s while one flat buffer moves at ~1.3 GB/s
        (BENCH_LOCAL ``h2d_link_incompressible_mb_s``, ``e2e_dispatch_*``;
        scripts/profile_e2e_dispatch.py). On PCIe hosts the coalesced path
        is at worst neutral: same bytes, fewer DMA submissions.

        Buffers are padded to 4M-element buckets so the reslice programs'
        input shapes (and compile-cache keys) stay stable across datasets
        of similar scale. Returns ``(plans, h2d_bytes)`` shaped exactly
        like the per-stack path's.
        """
        specs = []   # per modality: (scan_fn, params, [(idxs, [(dtype, off, size, shape)])])
        totals: dict[str, int] = {}
        for _, keys, scan_fn, params in modalities:
            groups: dict[tuple, list[int]] = {}
            for i, b in enumerate(host):
                sig = tuple(np.shape(b[k]) for k in keys)
                groups.setdefault(sig, []).append(i)
            mod = []
            for idxs in groups.values():
                entries = []
                for k in keys:
                    first = np.asarray(host[idxs[0]][k])
                    shape = (len(idxs),) + first.shape
                    size = int(np.prod(shape))
                    off = totals.get(first.dtype.name, 0)
                    totals[first.dtype.name] = off + size
                    entries.append((k, first.dtype, off, size, shape))
                mod.append((idxs, entries))
            specs.append((scan_fn, params, mod))

        # allocate at the bucketed length up front (no second copy to pad)
        bufs = {name: np.empty((_bucket_len(n),), np.dtype(name))
                for name, n in totals.items()}
        for name, n in totals.items():
            bufs[name][n:] = 0
        for _, _, mod in specs:
            for idxs, entries in mod:
                for k, dt, off, size, shape in entries:
                    np.stack([np.asarray(host[i][k]) for i in idxs],
                             out=bufs[dt.name][off:off + size].reshape(shape))

        names = sorted(bufs)
        dbufs = [jax.device_put(bufs[name]) for name in names]
        h2d_bytes = sum(b.nbytes for b in bufs.values())

        plans = []
        for scan_fn, params, mod in specs:
            # one reslice program per modality: all of its stacks come back
            # from a single dispatch (static offsets/shapes; cached on the
            # layout signature so repeat calls over the same split reuse it)
            layout = tuple(
                tuple((names.index(dt.name), off, size, shape)
                      for _, dt, off, size, shape in entries)
                for _, entries in mod)
            key = (layout, tuple((names[i], int(d.size)) for i, d in enumerate(dbufs)))
            reslicer = self._reslicer_cache.get(key)
            if reslicer is None:
                def _reslice_all(bs, layout=layout):
                    return tuple(
                        tuple(jax.lax.dynamic_slice_in_dim(bs[bi], off, size).reshape(shape)
                              for bi, off, size, shape in entries)
                        for entries in layout)
                reslicer = self._reslicer_cache[key] = jax.jit(_reslice_all)
            stacked_groups = reslicer(dbufs)
            uploaded = [(idxs, stacked)
                        for (idxs, _), stacked in zip(mod, stacked_groups)]
            plans.append((scan_fn, params, uploaded))
        return plans, h2d_bytes

    def embed_utterances_scanned(self, batches, stage_times: dict | None = None):
        """Offline stage 1: consume ALL host batches up front, group them by
        device shape per modality, and embed each group with ONE lax.scan
        dispatch over the [G, B, ...] stack (one H2D transfer per group).

        Rationale (measured, v5e behind an HTTP tunnel): producing every host
        batch for a 300-utterance split costs 18 ms warm / 76 ms cold, while
        EACH jit dispatch blocks the host ~25-30 ms on the tunnel — the
        per-batch loop in ``embed_utterances`` paid that twice per batch
        (2 modalities x ~10 batches ~= 0.6 s of pure dispatch latency).
        Grouping collapses that to one dispatch per (modality, shape) group,
        the TPU-native shape of the reference's export loops
        (text/embeddings.py:69-93, audio_wav2vec2/embeddings.py:68-94).

        Returns ``(table_t, table_a, pos_t, pos_a)``: flat HBM embedding
        tables (group-major order, which differs per modality) and per-row
        position maps into each.
        """
        t_host = time.perf_counter()
        host = list(batches)
        if not host:
            raise ValueError("no utterance batches")
        self._check_wire(host[0]["audio"])
        n_rows = 1 + max(int(np.max(b["idx"])) for b in host)
        if stage_times is not None:
            stage_times["embed_host_prep_s"] = round(time.perf_counter() - t_host, 3)

        t_dispatch = time.perf_counter()

        # Phase 1 — group by device shape and issue EVERY H2D upload up
        # front (jax.device_put is async): the waveform stacks are the bulk
        # of the pipeline's H2D bytes (reported as embed_h2d_bytes so the
        # stage-1 wall can be attributed against the measured link rate),
        # and uploading them all before any scan dispatch lets later groups'
        # transfers ride under earlier groups' compute wherever the runtime
        # can overlap DMA with execution.
        modalities = [
            ("t", ("text", "attention_mask"), self._text_embed_scan_fn, self.m.text_params),
            ("a", ("audio", "lengths"), self._audio_embed_scan_fn, self.m.audio_params),
        ]
        h2d_bytes = 0
        plans = []  # (scan_fn, params, [(batch idxs, stacked device arrays)])
        if self.coalesce_h2d:
            plans, h2d_bytes = self._upload_coalesced(host, modalities)
        else:
            for _, keys, scan_fn, params in modalities:
                groups: dict[tuple, list[int]] = {}
                for i, b in enumerate(host):
                    sig = tuple(np.shape(b[k]) for k in keys)
                    groups.setdefault(sig, []).append(i)
                uploaded = []
                for idxs in groups.values():
                    stacks = tuple(np.stack([host[i][k] for i in idxs]) for k in keys)
                    h2d_bytes += sum(s.nbytes for s in stacks)
                    uploaded.append((idxs, tuple(jax.device_put(s) for s in stacks)))
                plans.append((scan_fn, params, uploaded))

        # Phase 2 — dispatch one scan per (modality, shape) group
        def _embed_tables(scan_fn, params, uploaded):
            pos = np.full((n_rows,), -1, np.int64)
            tables, offset = [], 0
            for idxs, stacked in uploaded:
                out = scan_fn(params, *stacked)  # [G, B, D]
                g, bsz, d = out.shape
                tables.append(out.reshape(g * bsz, d))
                for j, i in enumerate(idxs):
                    b = host[i]
                    valid = b["emotion"] != -1
                    pos[np.asarray(b["idx"])[valid]] = offset + j * bsz + np.nonzero(valid)[0]
                offset += g * bsz
            table = jnp.concatenate(tables, axis=0) if len(tables) > 1 else tables[0]
            if not (pos >= 0).all():
                missing = int((pos < 0).sum())
                raise ValueError(
                    f"{missing} dataset rows never appeared in the utterance stream "
                    "(or arrived only as emotion==-1 padding) — the device-resident "
                    "handoff would silently misclassify them as padding"
                )
            return table, pos

        table_t, pos_t = _embed_tables(*plans[0])
        table_a, pos_a = _embed_tables(*plans[1])
        if stage_times is not None:
            stage_times["embed_dispatch_s"] = round(time.perf_counter() - t_dispatch, 3)
            stage_times["embed_h2d_bytes"] = int(h2d_bytes)
            stage_times["embed_fetch_s"] = 0.0  # tables stay in HBM
        return table_t, table_a, pos_t, pos_a

    # -- stage 2: fusion over dialogues ---------------------------------------

    def predict_dialogues(self, dialogues: list[dict]) -> tuple[np.ndarray, np.ndarray]:
        """dialogues: [{"text": [U, Dt], "audio": [U, Da], "emotion": [U]}].
        Returns flat (y_true, y_pred) over utterances."""
        y_true, y_pred = [], []
        for i in range(0, len(dialogues), self.dialogue_batch):
            chunk = dialogues[i : i + self.dialogue_batch]
            batch = collate_dialogues(chunk, self.dialogue_batch, self.buckets)
            preds = np.asarray(
                self._fusion(
                    jnp.asarray(batch["text"]), jnp.asarray(batch["audio"]),
                    jnp.asarray(batch["padding_mask"]),
                )
            )
            mask = batch["emotion"] != -1
            y_true.append(batch["emotion"][mask])
            y_pred.append(preds[mask])
        return np.concatenate(y_true), np.concatenate(y_pred)

    def predict_dialogues_from_tables(self, table_t, table_a, dialogues: list[dict]) -> tuple[np.ndarray, np.ndarray]:
        """Device-resident stage 2: gather dialogue batches straight from the
        HBM embedding tables and fetch only the [B, U] predictions.
        dialogues: [{"rows": [U] table positions, "emotion": [U]}] — or, when
        stage 1 ran scan-grouped (per-modality table orders), "rows_t" and
        "rows_a" instead of "rows"."""
        pending = []
        for i in range(0, len(dialogues), self.dialogue_batch):
            chunk = dialogues[i : i + self.dialogue_batch]
            u = pick_bucket(max(len(d.get("rows", d.get("rows_t")))
                                for d in chunk), self.buckets)
            idxm_t = np.full((self.dialogue_batch, u), -1, np.int32)
            idxm_a = np.full((self.dialogue_batch, u), -1, np.int32)
            emotion = np.full((self.dialogue_batch, u), -1, np.int64)
            for k, d in enumerate(chunk):
                rows_t = d.get("rows_t", d.get("rows"))
                rows_a = d.get("rows_a", d.get("rows"))
                n = len(rows_t)
                idxm_t[k, :n] = rows_t
                idxm_a[k, :n] = rows_a
                emotion[k, :n] = d["emotion"]
            padding_mask = emotion == -1
            # collate_dialogues parity: all-pad rows keep one attendable key
            empty_rows = padding_mask.all(axis=1)
            padding_mask[empty_rows, 0] = False
            preds = self._fusion_tables(
                table_t, table_a, jnp.asarray(idxm_t), jnp.asarray(idxm_a),
                jnp.asarray(padding_mask)
            )
            pending.append((emotion, preds))
        # ONE fused D2H transfer for all batches (each np.asarray pays a full
        # host-link round trip; on tunneled hosts that latency dominated)
        flat = np.asarray(jnp.concatenate([p.reshape(-1) for _, p in pending]))
        y_true, y_pred, off = [], [], 0
        for emotion, p in pending:
            preds = flat[off : off + p.size].reshape(p.shape)
            off += p.size
            mask = emotion != -1
            y_true.append(emotion[mask])
            y_pred.append(preds[mask])
        return np.concatenate(y_true), np.concatenate(y_pred)

    # -- full run -------------------------------------------------------------

    def run(self, utterance_batches, df, timed: bool = True, device_resident: bool = True,
            scan_stage1: bool = True) -> dict:
        """utterance_batches: host iterator of mixed-modality batches;
        df: the get_text dataframe (dialogue structure + labels).

        ``device_resident=True`` (default) hands stage-1 embeddings to the
        fusion stage as HBM-resident tables + a jitted gather; only the tiny
        prediction arrays cross back to the host.  ``False`` restores the
        host-table path (fetch [N, D] tables, group on host, re-upload) —
        useful when the embedding tables themselves are the product.

        ``scan_stage1=True`` (default, device-resident only) runs stage 1
        scan-grouped (embed_utterances_scanned): one dispatch per (modality,
        shape) group instead of two per batch — 2.8x end-to-end on tunneled
        hosts.  ``False`` keeps the per-batch streaming loop (the shape a
        true online source requires)."""
        from mer_tpu.core import dialogue_index

        stages: dict = {}
        labels = df["Emotion"].to_numpy()
        t0 = time.perf_counter()
        if device_resident:
            if scan_stage1:
                table_t, table_a, pos_t, pos_a = self.embed_utterances_scanned(
                    utterance_batches, stage_times=stages
                )
            else:
                table_t, table_a, pos = self.embed_utterances(
                    utterance_batches, stage_times=stages, fetch=False
                )
                pos_t = pos_a = pos
            t1 = time.perf_counter()
            stages["stage1_embed_s"] = round(t1 - t0, 3)
            dialogues = [
                {"rows_t": pos_t[np.asarray(rows)], "rows_a": pos_a[np.asarray(rows)],
                 "emotion": labels[np.asarray(rows)].astype(np.int64)}
                for rows in dialogue_index(df).values()
            ]
            t2 = time.perf_counter()
            # the host grouping above overlapped the queued embed compute;
            # now sync so that compute lands in its own named leg instead of
            # being charged to the first stage-2 fetch (dispatch-side timing
            # made the mel branch's stage2_fusion_s read 7x its true cost).
            # Costs one host-link round trip; no device overlap is lost —
            # stage-2's table gather depends on the complete tables anyway.
            jax.block_until_ready((table_t, table_a))
            t_wait = time.perf_counter()
            stages["stage1_device_wait_s"] = round(t_wait - t2, 3)
            y_true, y_pred = self.predict_dialogues_from_tables(table_t, table_a, dialogues)
        else:
            text_emb, audio_emb = self.embed_utterances(utterance_batches, stage_times=stages)
            t1 = time.perf_counter()
            stages["stage1_embed_s"] = round(t1 - t0, 3)
            dialogues = []
            for dia, rows in dialogue_index(df).items():
                rows = np.asarray(rows)
                dialogues.append(
                    {"dialogue_id": dia, "text": text_emb[rows], "audio": audio_emb[rows],
                     "emotion": labels[rows].astype(np.int64)}
                )
            t2 = time.perf_counter()
            t_wait = t2  # fetch=True already synced inside embed_utterances
            y_true, y_pred = self.predict_dialogues(dialogues)
        dt = time.perf_counter() - t0
        stages["group_s"] = round(t2 - t1, 3)
        stages["stage2_fusion_s"] = round(dt - (t_wait - t0), 3)

        metrics = BatchAveragedMetrics()
        metrics.update(y_true, y_pred, mask=np.ones_like(y_true, bool))
        out = {
            "n_utterances": int(len(y_true)),
            "seconds": dt,
            "utterances_per_sec": len(y_true) / dt if timed else None,
            "accuracy": metrics.pooled_accuracy,
            "weighted_f1": metrics.pooled_weighted_f1,
            "stages": stages,
        }
        return out


def mixed_utterance_batches(text_ds, w2v_ds, batch_size: int = 16,
                            seconds_buckets=(2.0, 4.0, 6.0, 8.0, 10.0), token_buckets=(64, 128, 256, 512),
                            sort_by_length: bool = True, wire: str = "int16"):
    """Host generator yielding batches carrying BOTH modalities for the same
    utterance rows (text_ds: TextFeatureDataset, w2v_ds: Wav2Vec2FeatureDataset).

    ``sort_by_length`` (default) orders utterances by waveform length (WAV
    headers only — no decode) before batching, so each batch pads to a bucket
    near its members' true lengths instead of its longest straggler's. On the
    MELD-test-shaped split (2608 utts, mean 3.2 s, p90 5.8 s) corpus-order
    batches average 0.34 pad efficiency vs 0.75 sorted — 2.2x less audio
    compute AND 2.2x fewer H2D wire bytes, which is most of the e2e wall on
    tunneled hosts. Downstream order is immaterial: every batch carries its
    dataset rows in ``idx`` and stage 2 regroups via position tables
    (embed_utterances_scanned). The reference's offline analog sidesteps the
    issue by writing per-utterance pickles one at a time
    (audio_wav2vec2/embeddings.py:68-94); an order-preserving stream exists
    behind ``sort_by_length=False``.

    ``wire`` selects the waveform wire format: "int16" (exact PCM, default)
    or "mulaw" (uint8 companding — half the bytes, lossy; ops/mulaw.py).
    Must match the consuming StreamingPipeline's ``wire``."""
    if wire not in ("int16", "mulaw"):
        raise ValueError(f"wire must be 'int16' or 'mulaw', got {wire!r}")
    if wire == "mulaw":
        from mer_tpu.ops.mulaw import mulaw_encode_np
    n = len(text_ds)
    assert len(w2v_ds) == n
    sample_buckets = tuple(int(s * w2v_ds.sample_rate) for s in seconds_buckets)
    header_lengths = w2v_ds.waveform_lengths()  # cached; WAV headers only
    order = np.arange(n)
    if sort_by_length:
        order = order[np.argsort(header_lengths, kind="stable")]

    def bucket(x, ladder):
        for b in ladder:
            if x <= b:
                return b
        return ladder[-1]

    for i in range(0, n, batch_size):
        idx = order[i : i + batch_size]
        pad = batch_size - len(idx)
        full = np.concatenate([idx, idx[-1:].repeat(pad)]) if pad else idx

        texts = [text_ds.texts[j] for j in full]
        ids, mask = text_ds.tokenizer(texts)
        width = bucket(ids.shape[1], token_buckets)
        if ids.shape[1] <= width:
            ids, mask = pad_tokens_to(ids, mask, width, text_ds.tokenizer.pad_id)
        else:  # longest > largest bucket: let the tokenizer truncate
            ids, mask = text_ds.tokenizer(texts, pad_to=width)

        # bucket width from the cached header lengths (no decode), then ONE
        # native thread-pooled batch decode (native/wavio.cc) straight into
        # the [B, wwidth] buffer — the per-file stdlib loop here was most of
        # stage-1 host prep at MELD-test scale
        wwidth = bucket(int(header_lengths[full].max()), sample_buckets)
        wav_f32, lengths = w2v_ds.waveform_batch(full, wwidth)
        # int16 on the wire (see StreamingPipeline): half the H2D bytes;
        # uint8 μ-law (wire="mulaw"): a quarter (ops/mulaw.py). Pad regions
        # are zeros, which both encoders map to their exact-zero code.
        if wire == "mulaw":
            audio = mulaw_encode_np(wav_f32)
        else:
            audio = np.clip(wav_f32 * 32768.0, -32768, 32767).astype(np.int16)

        emotion = text_ds.labels[full].astype(np.int32).copy()
        if pad:
            emotion[len(idx):] = -1
        yield {
            "idx": full, "text": ids, "attention_mask": mask,
            "audio": audio, "lengths": lengths, "emotion": emotion,
        }
