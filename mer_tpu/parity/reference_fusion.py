"""Head-to-head parity harness against the LIVE torch reference.

The reference implementation is mounted read-only at ``/root/reference``
(override with ``MER_REFERENCE_ROOT``) and torch + transformers are
installed, so the reference fusion stage (src/model.py, the train loop of
src/train.py:217-231 and the metric semantics of src/test.py:51-74) can be
*executed* on CPU and compared head-to-head with mer_tpu on identical data —
converting "architecturally identical" into "numerically proven".

Data: the reference ships real val-split embedding artifacts
(``embeddings/{text_base,audio_wav2vec2}/val.pkl``, [1108, 768] each —
reference src/dataset.py:14-17). The MELD CSVs are NOT mounted, so the true
dialogue grouping and emotion labels are unavailable; the harness therefore

- partitions the 1108 rows into **pseudo-dialogues** with a seeded RNG
  (both frameworks receive the exact same partition), and
- derives **learnable labels** from a fixed random projection of the text
  embeddings (``argmax(E @ W)``), so training genuinely converges and the
  two frameworks' optimization trajectories can be compared on real data.

Everything here is host-side glue: torch runs on CPU, mer_tpu runs on
whatever jax backend is active. Only ``model.py`` is imported from the
reference tree (it depends on torch alone — src/model.py:1-2); the
reference's munch/wandb-dependent scripts are reproduced by construction
(same loss, optimizer, batching), since those packages are not installed.
"""

from __future__ import annotations

import importlib.util
import os
from typing import Iterable

import numpy as np

REFERENCE_ROOT = os.environ.get("MER_REFERENCE_ROOT", "/root/reference")


def reference_available() -> bool:
    return os.path.exists(os.path.join(REFERENCE_ROOT, "src", "model.py"))


def shipped_val_artifacts_available() -> bool:
    return all(
        os.path.exists(os.path.join(REFERENCE_ROOT, "embeddings", name, "val.pkl"))
        for name in ("text_base", "audio_wav2vec2")
    )


def load_reference_model_module():
    """Import the reference's src/model.py (torch-only deps) under a private
    module name, without polluting sys.path."""
    path = os.path.join(REFERENCE_ROOT, "src", "model.py")
    spec = importlib.util.spec_from_file_location("_mer_reference_fusion_model", path)
    module = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(module)
    return module


def reference_model_config(
    d: int = 768,
    n_head: int = 8,
    n_encoder_layers: int = 6,
    n_fam_layers: int = 5,
    n_transformers: int = 1,
    hidden_size: int = 768,
    n_classifier_layers: int = 2,
    dropout: float = 0.4,
    output_size: int = 7,
):
    """The reference ``model:`` YAML block (src/config.yaml:31-54) as an
    attribute-style config usable by BOTH the torch reference M2FNet and
    ``mer_tpu.models.M2FNet.from_config``."""
    from mer_tpu.core import Config

    return Config(
        {
            "dropout": dropout,
            "AUDIO": {
                "enabled": True, "embedding_size": d, "n_head": n_head,
                "n_transformers": n_transformers, "n_encoder_layers": n_encoder_layers,
            },
            "TEXT": {
                "enabled": True, "embedding_size": d, "n_head": n_head,
                "n_transformers": n_transformers, "n_encoder_layers": n_encoder_layers,
            },
            "FAM": {"enabled": True, "embedding_size": d, "n_head": n_head, "n_layers": n_fam_layers},
            "CLASSIFIER": {
                "hidden_size": hidden_size, "output_size": output_size,
                "n_layers": n_classifier_layers,
            },
        }
    )


# ---------------------------------------------------------------------------
# Data: shipped val.pkl artifacts -> identical pseudo-dialogue batches
# ---------------------------------------------------------------------------

def load_val_tables() -> tuple[np.ndarray, np.ndarray]:
    """The reference's real val-split embedding tables ([1108, 768] each,
    src/dataset.py:14-17)."""
    from mer_tpu.core import load_embeddings

    text = load_embeddings(os.path.join(REFERENCE_ROOT, "embeddings", "text_base", "val.pkl"))
    audio = load_embeddings(os.path.join(REFERENCE_ROOT, "embeddings", "audio_wav2vec2", "val.pkl"))
    return np.asarray(text, np.float32), np.asarray(audio, np.float32)


def projection_labels(features: np.ndarray, num_classes: int = 7, seed: int = 0) -> np.ndarray:
    """Deterministic learnable labels: argmax of a fixed random projection.
    (The MELD CSVs with true emotion labels are not mounted; see module doc.)"""
    rng = np.random.default_rng(seed)
    w = rng.normal(size=(features.shape[1], num_classes))
    return np.argmax(features.astype(np.float64) @ w, axis=1).astype(np.int64)


def mlp_labels(features: np.ndarray, num_classes: int = 7, seed: int = 0,
               hidden: int = 64, noise_frac: float = 0.15) -> np.ndarray:
    """Harder deterministic labels for convergence comparisons: argmax of a
    fixed random 2-layer tanh MLP of the features, with a seeded fraction of
    labels flipped uniformly. Learnable but not saturated after one epoch, so
    per-epoch metric trajectories actually move."""
    rng = np.random.default_rng(seed)
    w1 = rng.normal(size=(features.shape[1], hidden)) / np.sqrt(features.shape[1])
    w2 = rng.normal(size=(hidden, num_classes)) / np.sqrt(hidden)
    logits = np.tanh(features.astype(np.float64) @ w1 * 4.0) @ w2
    labels = np.argmax(logits, axis=1).astype(np.int64)
    flip = rng.random(len(labels)) < noise_frac
    labels[flip] = rng.integers(0, num_classes, size=int(flip.sum()))
    return labels


def make_pseudo_dialogues(n_rows: int, seed: int = 0, min_len: int = 3, max_len: int = 15) -> list[np.ndarray]:
    """Seeded contiguous partition of rows into variable-length dialogues —
    the batching shape of the fusion stage (src/dataset.py:26-65)."""
    rng = np.random.default_rng(seed)
    groups: list[np.ndarray] = []
    i = 0
    while i < n_rows:
        length = int(rng.integers(min_len, max_len + 1))
        groups.append(np.arange(i, min(i + length, n_rows)))
        i += length
    return groups


def build_batches(
    text: np.ndarray,
    audio: np.ndarray,
    labels: np.ndarray,
    groups: Iterable[np.ndarray],
    batch_size: int,
    shuffle_seed: int | None = None,
    pad_to: int | None = None,
) -> list[dict[str, np.ndarray]]:
    """Reference collate semantics (src/dataset.py:71-89): 0-pad features to
    the batch max dialogue length, -1-pad labels, boolean padding_mask
    True=pad. Returns plain numpy batches consumable by torch and jax alike.
    Like torch DataLoader(drop_last=False), the ragged tail batch is kept.

    ``pad_to`` pads every batch to one fixed dialogue length — one compiled
    XLA shape instead of one per distinct batch max (masking makes the
    numerics identical; tested by test_layers padding invariance)."""
    groups = list(groups)
    order = np.arange(len(groups))
    if shuffle_seed is not None:
        np.random.default_rng(shuffle_seed).shuffle(order)

    batches = []
    for start in range(0, len(order), batch_size):
        sel = [groups[j] for j in order[start : start + batch_size]]
        max_len = pad_to if pad_to is not None else max(len(g) for g in sel)
        b = len(sel)
        bt = np.zeros((b, max_len, text.shape[1]), np.float32)
        ba = np.zeros((b, max_len, audio.shape[1]), np.float32)
        be = np.full((b, max_len), -1, np.int64)
        for k, g in enumerate(sel):
            bt[k, : len(g)] = text[g]
            ba[k, : len(g)] = audio[g]
            be[k, : len(g)] = labels[g]
        batches.append(
            {"text": bt, "audio": ba, "emotion": be, "padding_mask": be == -1}
        )
    return batches


# ---------------------------------------------------------------------------
# Torch-side runner (the reference, executed)
# ---------------------------------------------------------------------------

class TorchReferenceFusion:
    """The reference M2FNet + its exact training/eval semantics:

    - loss: CE(ignore_index=-1, label_smoothing=0.1) applied to
      ``outputs.permute(0, 2, 1)`` (src/train.py:48-50, 229)
    - optimizer: torch.optim.Adam(lr, weight_decay) — L2, not AdamW
      (src/train.py:56)
    - eval: model.eval(), argmax dim 2, mask -1, sklearn accuracy/weighted-F1
      averaged per batch (src/test.py:51-74)
    """

    def __init__(self, model_cfg, seed: int = 0):
        import torch

        self.torch = torch
        torch.manual_seed(seed)
        self.module = load_reference_model_module()
        self.model = self.module.M2FNet(model_cfg)

    def state_dict(self):
        return self.model.state_dict()

    def _to_torch(self, batch):
        t = self.torch
        return (
            t.from_numpy(batch["text"]),
            t.from_numpy(batch["audio"]),
            t.from_numpy(batch["padding_mask"]),
            t.from_numpy(batch["emotion"]),
        )

    def logits(self, batch) -> np.ndarray:
        self.model.eval()
        with self.torch.no_grad():
            text, audio, mask, _ = self._to_torch(batch)
            return self.model(text, audio, mask).numpy()

    def loss(self, batch) -> float:
        t = self.torch
        criterion = t.nn.CrossEntropyLoss(ignore_index=-1, label_smoothing=0.1)
        self.model.eval()
        with t.no_grad():
            text, audio, mask, emotion = self._to_torch(batch)
            out = self.model(text, audio, mask)
            return float(criterion(out.permute(0, 2, 1), emotion))

    def train_steps(self, batches, lr: float = 5e-5, weight_decay: float = 0.01,
                    train_mode: bool = True) -> list[float]:
        """Run the reference inner loop (src/train.py:217-231) over the given
        batches; returns per-step losses. The Adam optimizer persists across
        calls (one optimizer per run, src/train.py:56), so calling this once
        per epoch reproduces multi-epoch training. ``train_mode=False`` keeps
        dropout off for deterministic trajectory comparison."""
        t = self.torch
        criterion = t.nn.CrossEntropyLoss(ignore_index=-1, label_smoothing=0.1)
        if getattr(self, "_optimizer", None) is None:
            self._optimizer = t.optim.Adam(self.model.parameters(), lr=lr, weight_decay=weight_decay)
        optimizer = self._optimizer
        self.model.train(train_mode)
        losses = []
        for batch in batches:
            text, audio, mask, emotion = self._to_torch(batch)
            out = self.model(text, audio, mask)
            loss = criterion(out.permute(0, 2, 1), emotion)
            optimizer.zero_grad()
            loss.backward()
            optimizer.step()
            losses.append(float(loss))
        return losses

    def evaluate(self, batches) -> dict[str, float]:
        """src/test.py:51-74 verbatim semantics (sklearn, batch-averaged)."""
        from sklearn.metrics import accuracy_score, f1_score

        t = self.torch
        self.model.eval()
        accs, f1s = [], []
        with t.no_grad():
            for batch in batches:
                text, audio, mask, emotion = self._to_torch(batch)
                out = self.model(text, audio, mask)
                preds = t.argmax(out, dim=2)
                keep = emotion != -1
                y_true = emotion[keep].numpy()
                y_pred = preds[keep].numpy()
                accs.append(accuracy_score(y_true, y_pred))
                f1s.append(f1_score(y_true, y_pred, average="weighted", zero_division=0))
        return {"accuracy": float(np.mean(accs)), "weighted_f1": float(np.mean(f1s))}


# ---------------------------------------------------------------------------
# mer_tpu-side runner on the SAME batches, seeded from the SAME weights
# ---------------------------------------------------------------------------

class MerTpuFusion:
    """mer_tpu M2FNet initialized from a converted reference state_dict, with
    the framework's own train/eval steps (train/solver.py)."""

    def __init__(self, model_cfg, torch_state_dict, scan_layers: bool = True):
        import jax
        import jax.numpy as jnp

        from mer_tpu.models import M2FNet
        from mer_tpu.models.torch_import import convert_m2fnet_state_dict

        self.jax, self.jnp = jax, jnp
        self.model = M2FNet.from_config(model_cfg, scan_layers=scan_layers)
        self.params = jax.device_put(
            jax.tree.map(jnp.asarray, convert_m2fnet_state_dict(torch_state_dict, self.model))
        )
        self._fwd = jax.jit(
            lambda p, text, audio, mask: self.model.apply(
                {"params": p}, text, audio, mask, deterministic=True
            )
        )

    def logits(self, batch) -> np.ndarray:
        jnp = self.jnp
        return np.asarray(
            self._fwd(
                self.params,
                jnp.asarray(batch["text"]),
                jnp.asarray(batch["audio"]),
                jnp.asarray(batch["padding_mask"]),
            )
        )

    def train_steps(self, batches, lr: float = 5e-5, weight_decay: float = 0.01,
                    train_mode: bool = True) -> list[float]:
        """The framework's fused train step (forward+backward+torch-Adam-L2
        update in one jitted program) over the same batches. The optimizer,
        its state, and the compiled step persist across calls — calling once
        per epoch reproduces multi-epoch training. ``train_mode=False`` turns
        dropout off (mirrors TorchReferenceFusion.train_steps) so the two
        frameworks' trajectories are deterministic and directly comparable
        (the dropout RNGs are the one thing that cannot be pinned across
        torch and jax)."""
        import optax

        from mer_tpu.objectives.classification import cross_entropy
        from mer_tpu.train.solver import torch_adam

        jax, jnp = self.jax, self.jnp
        if getattr(self, "_optimizer", None) is None:
            optimizer = torch_adam(lr, weight_decay=weight_decay)

            def step(params, opt_state, text, audio, mask, emotion, rng):
                def compute_loss(p):
                    logits = self.model.apply(
                        {"params": p}, text, audio, mask,
                        deterministic=not train_mode, rngs={"dropout": rng},
                    )
                    return cross_entropy(logits, emotion, label_smoothing=0.1, ignore_index=-1)

                loss, grads = jax.value_and_grad(compute_loss)(params)
                updates, new_opt = optimizer.update(grads, opt_state, params)
                return optax.apply_updates(params, updates), new_opt, loss

            self._optimizer = optimizer
            self._opt_state = optimizer.init(self.params)
            self._step = jax.jit(step)
            self._steps_done = 0
            self._train_mode = train_mode
        elif self._train_mode != train_mode:
            raise ValueError("train_mode is baked into the compiled step at the first call")

        rng = jax.random.PRNGKey(0)
        losses = []
        for batch in batches:
            self.params, self._opt_state, loss = self._step(
                self.params, self._opt_state,
                jnp.asarray(batch["text"]), jnp.asarray(batch["audio"]),
                jnp.asarray(batch["padding_mask"]), jnp.asarray(batch["emotion"]),
                jax.random.fold_in(rng, self._steps_done),
            )
            self._steps_done += 1
            losses.append(float(loss))
        return losses

    def evaluate(self, batches) -> dict[str, float]:
        """The framework's metric path (objectives/metrics.py, batch-averaged
        reference semantics)."""
        from mer_tpu.objectives.metrics import BatchAveragedMetrics

        metrics = BatchAveragedMetrics()
        for batch in batches:
            preds = np.argmax(self.logits(batch), axis=-1)
            metrics.update(batch["emotion"], preds, mask=batch["emotion"] != -1)
        return {
            "accuracy": metrics.batch_averaged_accuracy,
            "weighted_f1": metrics.batch_averaged_weighted_f1,
        }
