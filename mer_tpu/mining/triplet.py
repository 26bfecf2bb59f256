"""Online triplet mining, TPU-native.

The reference mines triplets with pandas ``.sample()`` rejection loops and
per-sample model calls inside the training step (audio_mel/dataset.py:182-413)
— the most TPU-hostile loop in the codebase (SURVEY.md §3.4).  Reformulation:

- **index sampling** is host-side numpy (class-uniform choice over a
  precomputed per-class index table — the same distribution as the
  reference's ``random.choice(emotions)`` + ``df.sample()``);
- **model-dependent selection** (semi-hard filtering, hard mining over a
  candidate pool) is one jitted device program over a batched embedding pool:
  cdist + masks + argmax/argmin + top-k, mirroring the tensor math the
  reference already does at audio_mel/dataset.py:330-358 but without the
  per-sample host loop.

Mining returns *row indices* into the dataset; the data pipeline fetches the
corresponding spectrograms and the train step computes gradients through
3 forward passes (anchor/positive/negative), exactly like the reference.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def cdist(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Pairwise Euclidean distances [N, M] (torch.cdist p=2 parity).

    Exact difference-based form: mining pools are small (len_triplet_picking
    ~100), and the GEMM expansion x^2+y^2-2xy loses ~1e-3 absolute precision
    near zero, enough to flip argmin/argmax on near-ties."""
    diff = x[:, None, :] - y[None, :, :]
    return jnp.sqrt(jnp.sum(diff * diff, axis=-1))


@partial(jax.jit, static_argnames=("batch_size",))
def hard_triplets_from_pool(
    embeddings: jnp.ndarray, labels: jnp.ndarray, batch_size: int
) -> jnp.ndarray:
    """Hard mining over an embedded candidate pool.

    Parity with reference mine_hard_triplets (audio_mel/dataset.py:298-391):
      positive[i] = argmax_j d(i, j) among same-class j != i   (farthest positive)
      negative[i] = argmin_j d(i, j) among diff-class j        (closest negative)
      keep the top-``batch_size`` anchors by violation d(i,p) - d(i,n)

    Returns one [3, batch_size] int32 array of (anchor, positive, negative)
    pool-index rows — stacked so callers fetch ONE device array (three
    separate fetches cost three full host-link round trips; on tunneled
    hosts that latency dominated the whole mining step).
    """
    d = cdist(embeddings, embeddings)
    same = labels[:, None] == labels[None, :]
    eye = jnp.eye(labels.shape[0], dtype=bool)

    # positive: zero out invalid entries, argmax (reference :336-342)
    positive_mask = jnp.where(same & ~eye, 1.0, 0.0)
    positive_idx = jnp.argmax(d * positive_mask, axis=1)

    # negative: +inf on invalid entries, argmin (reference :344-352)
    negative_bias = jnp.where(same | eye, jnp.inf, 0.0)
    negative_idx = jnp.argmin(d + negative_bias, axis=1)

    n = labels.shape[0]
    rows = jnp.arange(n)
    losses = d[rows, positive_idx] - d[rows, negative_idx]
    _, anchor_idx = jax.lax.top_k(losses, batch_size)

    return jnp.stack(
        [anchor_idx, positive_idx[anchor_idx], negative_idx[anchor_idx]]
    ).astype(jnp.int32)


@jax.jit
def semihard_mask(
    anchor_emb: jnp.ndarray, positive_emb: jnp.ndarray, negative_emb: jnp.ndarray, margin: float
) -> jnp.ndarray:
    """True where a candidate triplet is semi-hard:
    d(a,p) < d(a,n) < d(a,p) + margin (reference audio_mel/dataset.py:283)."""
    d_ap = jnp.linalg.norm(anchor_emb - positive_emb, axis=-1)
    d_an = jnp.linalg.norm(anchor_emb - negative_emb, axis=-1)
    return (d_ap < d_an) & (d_an < d_ap + margin)


class TripletIndexSampler:
    """Class-uniform host-side index sampling (the reference's
    ``random.choice(list(emotion_labels.values()))`` + ``df.sample()``)."""

    def __init__(self, labels: np.ndarray, num_classes: int = 7, seed: int = 0):
        self.labels = np.asarray(labels)
        self.num_classes = num_classes
        self._rng = np.random.default_rng(seed)
        self._by_class = [np.flatnonzero(self.labels == c) for c in range(num_classes)]
        self._nonempty = [c for c in range(num_classes) if len(self._by_class[c]) > 0]
        if not self._nonempty:
            raise ValueError("no labeled samples to mine from")

    def sample_class_uniform(self, n: int) -> np.ndarray:
        """n indices, class chosen uniformly first (imbalance-correcting,
        reference :309-310)."""
        classes = self._rng.choice(self._nonempty, size=n)
        return np.array([self._rng.choice(self._by_class[c]) for c in classes], dtype=np.int64)

    def sample_random_triplets(self, batch_size: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Random mining (reference :201-239): anchor class-uniform, positive
        same class != anchor, negative any other class."""
        anchors = np.empty(batch_size, np.int64)
        positives = np.empty(batch_size, np.int64)
        negatives = np.empty(batch_size, np.int64)
        for i in range(batch_size):
            c = self._rng.choice(self._nonempty)
            pool = self._by_class[c]
            anchors[i] = self._rng.choice(pool)
            if len(pool) > 1:
                while True:
                    p = self._rng.choice(pool)
                    if p != anchors[i]:
                        break
            else:
                p = anchors[i]
            positives[i] = p
            other = [oc for oc in self._nonempty if oc != c]
            negatives[i] = self._rng.choice(self._by_class[self._rng.choice(other)]) if other else anchors[i]
        return anchors, positives, negatives


class TripletMiner:
    """Full mining engine bound to a dataset + embedding function.

    Args:
        labels: [N] class labels for the dataset rows.
        embed_fn: (row_indices ndarray) -> [n, D] jnp embeddings — typically
            a jitted model forward over a spectrogram fetch; kept abstract so
            mining is testable without the audio pipeline.
        len_triplet_picking: hard-mining pool size (config
            solver.len_triplet_picking, reference default 100).
    """

    def __init__(self, labels: np.ndarray, embed_fn, *, len_triplet_picking: int = 100,
                 num_classes: int = 7, seed: int = 0):
        self.sampler = TripletIndexSampler(labels, num_classes=num_classes, seed=seed)
        self.embed_fn = embed_fn
        self.labels = np.asarray(labels)
        self.len_triplet_picking = len_triplet_picking
        # Semi-hard rejection telemetry: the batched sampler deviates from the
        # reference's spin-forever loop (audio_mel/dataset.py:242-296) only in
        # its bounded-rounds random fallback; these counters quantify how
        # often that fallback actually fires (tests/test_mining.py asserts it
        # is rare under realistic acceptance rates).
        self.stats = {"semihard_accepted": 0, "semihard_fallback": 0, "semihard_rounds": 0}

    def mine(self, batch_size: int, mining_type: str = "hard", margin: float = 1.0):
        if mining_type == "random":
            return self.sampler.sample_random_triplets(batch_size)
        if mining_type == "semi-hard":
            return self._mine_semihard(batch_size, margin)
        if mining_type == "hard":
            return self._mine_hard(batch_size)
        raise ValueError("mining_type must be 'hard', 'semi-hard' or 'random'")

    def _hard_pool_apn(self, batch_size: int):
        """Shared core of both hard-mining paths: sample the class-uniform
        pool (reference rounds it down to a multiple of batch_size, :305),
        embed it, select — returns (host pool rows, [3, B] device apn)."""
        pool_size = max((self.len_triplet_picking // batch_size) * batch_size, batch_size)
        pool = self.sampler.sample_class_uniform(pool_size)
        emb = self.embed_fn(pool)
        return pool, hard_triplets_from_pool(emb, jnp.asarray(self.labels[pool]), batch_size)

    def _mine_hard(self, batch_size: int):
        pool, apn = self._hard_pool_apn(batch_size)
        apn = np.asarray(apn)  # ONE D2H fetch for all three index rows
        return pool[apn[0]], pool[apn[1]], pool[apn[2]]

    def mine_hard_rows_device(self, batch_size: int) -> "jnp.ndarray":
        """Hard mining with the selected dataset rows left ON DEVICE: returns
        a flat [3*batch_size] int32 device array of (anchors ++ positives ++
        negatives) rows. With an HBM spectrogram cache downstream, a whole
        hard-mining train step then runs with zero host<->device syncs —
        pool sampling is host RNG, everything after is device dataflow."""
        pool, apn = self._hard_pool_apn(batch_size)
        return jnp.asarray(pool.astype(np.int32))[apn.reshape(-1)]

    def _mine_semihard(self, batch_size: int, margin: float, max_rounds: int = 50, oversample: int = 4):
        """Batched rejection sampling: propose oversample*batch candidate
        triplets per round, keep the semi-hard ones (same acceptance rule as
        the reference's per-sample loop at :242-296)."""
        kept_a, kept_p, kept_n = [], [], []
        need = batch_size
        for _ in range(max_rounds):
            a, p, n = self.sampler.sample_random_triplets(need * oversample)
            uniq = np.unique(np.concatenate([a, p, n]))
            emb = np.asarray(self.embed_fn(uniq))
            lookup = {int(r): i for i, r in enumerate(uniq)}
            ea = emb[[lookup[int(i)] for i in a]]
            ep = emb[[lookup[int(i)] for i in p]]
            en = emb[[lookup[int(i)] for i in n]]
            ok = np.asarray(semihard_mask(jnp.asarray(ea), jnp.asarray(ep), jnp.asarray(en), margin))
            take = min(int(ok.sum()), need)
            sel = np.flatnonzero(ok)[:take]
            kept_a.append(a[sel]); kept_p.append(p[sel]); kept_n.append(n[sel])
            need -= take
            self.stats["semihard_rounds"] += 1
            self.stats["semihard_accepted"] += take
            if need == 0:
                break
        else:
            # fall back to random for any remainder (the reference would spin
            # forever; we degrade gracefully and count it — stats quantify
            # how often this deviation actually bites)
            a, p, n = self.sampler.sample_random_triplets(need)
            kept_a.append(a); kept_p.append(p); kept_n.append(n)
            self.stats["semihard_fallback"] += need
        return np.concatenate(kept_a), np.concatenate(kept_p), np.concatenate(kept_n)
