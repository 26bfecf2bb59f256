"""Text feature-extractor data pipeline (stage 1a).

Reference behavior (text/dataset.py): items are ``prev </s> current </s>
next`` context strings (built via get_utterance_with_context), tokenized in
the collate with padding='longest', truncation at 512.  Two deliberate
changes (documented quirk fixes, SURVEY.md §7.4):

- the reference re-instantiates RobertaTokenizer **per batch**
  (text/dataset.py:42) — a pure perf bug; here the tokenizer is built once
- 'longest' padding produces a new XLA shape per batch; here token lengths
  pad to a fixed bucket ladder so compiled executables are reused
"""

from __future__ import annotations

import numpy as np

from mer_tpu.core import get_text, get_utterance_with_context, map_emotions

TOKEN_BUCKETS = (64, 128, 256, 512)


def load_roberta_tokenizer(name: str = "roberta-base"):
    """HF tokenizer, built once (fixes the reference's per-batch rebuild).
    Requires the tokenizer files locally (HF cache) — MELD text work needs
    the real RoBERTa vocab."""
    try:
        from transformers import RobertaTokenizerFast

        return HFTokenizerAdapter(RobertaTokenizerFast.from_pretrained(name))
    except Exception as e:  # offline without cache
        raise RuntimeError(
            f"RoBERTa tokenizer '{name}' unavailable (offline without HF cache?): {e}"
        ) from e


def pad_tokens_to(ids: np.ndarray, mask: np.ndarray, width: int, pad_id: int):
    """Widen tokenized [B, T] ids/mask to exactly ``width`` columns — the
    result of re-tokenizing with pad_to=width, without re-running the
    tokenizer (this host is 1 core; tokenization ran twice per batch before).
    Callers must only use this when T <= width (padding, never truncation —
    truncation semantics belong to the tokenizer)."""
    t = ids.shape[1]
    if t == width:
        return ids, mask
    assert t < width, "pad_tokens_to only pads; re-tokenize to truncate"
    return (
        np.pad(ids, ((0, 0), (0, width - t)), constant_values=pad_id),
        np.pad(mask, ((0, 0), (0, width - t))),
    )


class HFTokenizerAdapter:
    def __init__(self, tokenizer, max_length: int = 512):
        self.tokenizer = tokenizer
        self.max_length = max_length
        self.sep_token = tokenizer.sep_token
        self.pad_id = int(tokenizer.pad_token_id)

    def __call__(self, texts: list[str], pad_to: int | None = None):
        enc = self.tokenizer(
            texts, padding="max_length" if pad_to else "longest",
            max_length=pad_to or self.max_length, truncation=True, return_tensors="np",
        )
        return enc["input_ids"].astype(np.int32), enc["attention_mask"].astype(np.int32)


class ToyWhitespaceTokenizer:
    """Hash-vocabulary tokenizer for tests / synthetic runs (no HF files)."""

    def __init__(self, vocab_size: int = 1000, max_length: int = 512):
        self.vocab_size = vocab_size
        self.max_length = max_length
        self.sep_token = "</s>"
        self.pad_id, self.bos_id, self.eos_id = 1, 0, 2

    def __call__(self, texts: list[str], pad_to: int | None = None):
        rows = []
        for t in texts:
            ids = [self.bos_id] + [3 + (hash(w) % (self.vocab_size - 3)) for w in t.split()] + [self.eos_id]
            rows.append(ids[: self.max_length])
        width = pad_to or max(len(r) for r in rows)
        ids = np.full((len(rows), width), self.pad_id, dtype=np.int32)
        mask = np.zeros((len(rows), width), dtype=np.int32)
        for i, r in enumerate(rows):
            r = r[:width]
            ids[i, : len(r)] = r
            mask[i, : len(r)] = 1
        return ids, mask


class TextFeatureDataset:
    """Context-window utterance dataset."""

    def __init__(self, mode: str, tokenizer, data_root: str | None = None):
        self.mode = mode
        self.tokenizer = tokenizer
        df = map_emotions(get_text(mode, data_root=data_root))
        self.df = df
        self.labels = df["Emotion"].to_numpy(dtype=np.int64)
        sep = tokenizer.sep_token
        # precompute all context strings once (the reference rebuilds the
        # dialogue scan per item)
        self.texts = [get_utterance_with_context(df, i, sep) for i in range(len(df))]

    def __len__(self) -> int:
        return len(self.df)

    def get_labels(self) -> np.ndarray:
        return self.labels


class TextBatcher:
    """Fixed-shape token batches over a TextFeatureDataset."""

    def __init__(self, dataset: TextFeatureDataset, batch_size: int, shuffle: bool = False,
                 seed: int = 0, buckets: tuple[int, ...] = TOKEN_BUCKETS,
                 process_index: int | None = None, process_count: int | None = None):
        from mer_tpu.data.process_sharding import resolve_process

        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.buckets = buckets
        self.process_index, self.process_count = resolve_process(process_index, process_count)
        self._rng = np.random.default_rng(seed)

    def __len__(self) -> int:
        from mer_tpu.data.process_sharding import local_num_batches

        n_global = (len(self.dataset) + self.batch_size - 1) // self.batch_size
        return local_num_batches(n_global, self.process_index, self.process_count)

    def _bucket(self, longest: int) -> int:
        for b in self.buckets:
            if longest <= b:
                return b
        return self.buckets[-1]

    def __iter__(self):
        from mer_tpu.data.process_sharding import shard_batches

        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            self._rng.shuffle(order)
        starts = shard_batches(range(0, n, self.batch_size), self.process_index, self.process_count)
        for i in starts:
            idx = order[i : i + self.batch_size]
            # pad the trailing partial batch with repeats labeled -1
            pad = self.batch_size - len(idx)
            full_idx = np.concatenate([idx, idx[-1:].repeat(pad)]) if pad else idx
            texts = [self.dataset.texts[j] for j in full_idx]
            ids, mask = self.dataset.tokenizer(texts)
            width = self._bucket(ids.shape[1])
            if ids.shape[1] <= width:
                ids2, mask2 = pad_tokens_to(ids, mask, width, self.dataset.tokenizer.pad_id)
            else:  # longest > largest bucket: let the tokenizer truncate
                ids2, mask2 = self.dataset.tokenizer(texts, pad_to=width)
            emotion = self.dataset.labels[full_idx].astype(np.int32).copy()
            if pad:
                emotion[len(idx):] = -1
            yield {"idx": full_idx, "text": ids2, "attention_mask": mask2, "emotion": emotion}
