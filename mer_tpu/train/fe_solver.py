"""Freeze/fine-tune solver for the text and wav2vec2 feature extractors.

Reference scheme (text/train.py:55-63,84,137-144,211-227; wav2vec2 is the
same skeleton with per-phase weight decay):

- two AdamW optimizers created up front: head-only (frozen phase) and
  all-params (fine-tune phase)
- epochs < num_frozen_epochs: backbone frozen, head optimizer
- afterwards: all-params optimizer with a constant-with-warmup schedule over
  warmup_epochs * steps_per_epoch steps, stepped **per batch, only during
  unfrozen epochs** (the reference quirk — the warmup clock starts at
  unfreeze)
- CE loss without label smoothing, optional balanced class weights
- early stopping on val loss with best-weights restore; FE checkpoints store
  model params only (text/train.py:165-169)

JAX realization: the frozen phase is optax.multi_transform with
``set_to_zero`` on the backbone subtree; both optimizer states exist from the
start (their moments begin at zero exactly like torch's lazily-initialized
state).  Each phase has its own jitted train step.
"""

from __future__ import annotations

import os
import time
from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax

from mer_tpu.data.prefetch import prefetch
from mer_tpu.objectives.classification import cross_entropy
from mer_tpu.objectives.metrics import BatchAveragedMetrics
from mer_tpu.parallel.mesh import batch_sharding, replicated
from mer_tpu.train.checkpoint import (
    load_checkpoint_auto, remove_checkpoint, restore_into, save_checkpoint_auto,
)
from mer_tpu.train.solver import constant_with_warmup, torch_adamw
from mer_tpu.utils.logging import RunLogger
from mer_tpu.utils.rng import dropout_key


class FESolver:
    """Two-phase fine-tuning engine.

    Args:
        model: Flax module (TextERC / AudioERC).
        config: pipeline config (reference YAML schema).
        backbone_key: top-level param subtree that freezes ("roberta" /
            "wav2vec2").
        batch_to_inputs: batch dict -> model args.
    """

    def __init__(
        self,
        model,
        config,
        *,
        backbone_key: str,
        batch_to_inputs: Callable[[dict], tuple],
        class_weights: np.ndarray | None = None,
        seed: int = 0,
        mesh=None,
        pp_logits_fn: Callable | None = None,
    ):
        self.model = model
        self.config = config
        self.backbone_key = backbone_key
        self.batch_to_inputs = batch_to_inputs
        self.seed = seed
        self.mesh = mesh
        # pipeline parallelism: a split forward (parallel/pp_forward.py) with
        # signature (params, *inputs, deterministic=..., rng=...) -> logits
        # that routes the scanned encoder stack through scanned_layer_pipeline
        # over the mesh's pp axis.  Entry points build it for --pp N.
        self.pp_logits_fn = pp_logits_fn
        if pp_logits_fn is not None:
            if mesh is None or "pp" not in mesh.axis_names:
                raise ValueError("pp_logits_fn requires a mesh with a 'pp' axis")
        self.logger = RunLogger(config)

        cw = None if class_weights is None else jnp.asarray(class_weights)
        self.loss_fn = partial(cross_entropy, label_smoothing=0.0, class_weights=cw, ignore_index=-1)

        s = config.solver
        # text schema: solver.{frozen_lr,finetuning_lr,weight_decay,warmup_epochs}
        # wav2vec2 schema: solver.{frozen:{lr,weight_decay},finetuning:{lr,weight_decay,warmup_epochs}}
        if "frozen" in s:
            self.frozen_lr = float(s.frozen.lr)
            self.frozen_wd = float(s.frozen.weight_decay)
            self.finetune_lr = float(s.finetuning.lr)
            self.finetune_wd = float(s.finetuning.weight_decay)
            self.warmup_epochs = int(s.finetuning.warmup_epochs)
        else:
            self.frozen_lr = float(s.frozen_lr)
            self.frozen_wd = float(s.weight_decay)
            self.finetune_lr = float(s.finetuning_lr)
            self.finetune_wd = float(s.weight_decay)
            self.warmup_epochs = int(s.warmup_epochs)
        self.num_frozen_epochs = int(s.num_frozen_epochs)
        # grad_accum_steps > 1: optax.MultiSteps averages k micro-batch
        # gradients before each optimizer update — effective batch k*B at
        # batch-B memory (the reference caps wav2vec2 at batch 2 purely for
        # GPU memory, audio_wav2vec2/config.yaml:26). Warmup is counted in
        # optimizer UPDATES, not micro-steps.
        self.grad_accum = int(config.get_path("solver.grad_accum_steps", 1))
        # ZeRO-1 (tpu.zero1): Adam moments sharded over dp — see
        # train/solver.py and parallel/mesh.py zero1_*. Matters most here:
        # the FE backbones are where optimizer state is big (≈1 GB f32
        # moments for RoBERTa-base + head)
        self.zero1 = (
            bool(config.get_path("tpu.zero1", False))
            and mesh is not None
            and mesh.shape.get("dp", 1) > 1
            # under --pp the stacked [L, ...] backbone params are pp-sharded
            # on the layer axis; the moments must mirror THAT placement, not
            # take a dp shard on the same axis — zero1 composes with dp/tp
            # only (documented in src/config.yaml)
            and pp_logits_fn is None
        )

        self._built = False

    # -- setup -----------------------------------------------------------------

    def _labels_tree(self, params):
        return {k: ("backbone" if k == self.backbone_key else "head") for k in params.keys()}

    @property
    def data_sharding(self):
        """Batch-axis DP sharding when a mesh is supplied (the expensive FE
        fine-tunes — 12-layer RoBERTa at 512 tokens, wav2vec2 waveforms — are
        exactly where data parallelism pays; reference is single-device,
        SURVEY.md §2.2)."""
        return batch_sharding(self.mesh) if self.mesh is not None else None

    def init_state(self, example_batch: dict, steps_per_epoch: int):
        rng = jax.random.PRNGKey(self.seed)
        inputs = self.batch_to_inputs(jax.tree.map(jnp.asarray, example_batch))
        params = self.model.init({"params": rng}, *inputs)["params"]
        if self.mesh is not None:
            if self.pp_logits_fn is not None and self.mesh.shape.get("pp", 1) > 1:
                # stage-local layer placement: [L, ...] stacked encoder params
                # sharded over pp on the layer axis (each stage's HBM holds
                # only its own layers); everything else replicated
                from jax.sharding import NamedSharding, PartitionSpec

                stack_shard = NamedSharding(self.mesh, PartitionSpec("pp"))
                repl = replicated(self.mesh)
                backbone = self.backbone_key

                def place(path, leaf):
                    names = [getattr(p, "key", None) for p in path]
                    if names[:1] == [backbone] and "layers_scan" in names:
                        return jax.device_put(leaf, stack_shard)
                    return jax.device_put(leaf, repl)

                params = jax.tree_util.tree_map_with_path(place, params)
            elif "tp" in self.mesh.axis_names and self.mesh.shape["tp"] > 1:
                # Megatron-style TP over the encoder stack (the rules are
                # name-generic, parallel/mesh.py) + dp grad all-reduce;
                # optimizer moments inherit the kernel shardings
                from mer_tpu.parallel.mesh import shard_params

                params = shard_params(params, self.mesh)
            else:
                # params replicated over the mesh; GSPMD all-reduces grads over dp
                params = jax.device_put(params, replicated(self.mesh))

        labels = self._labels_tree(params)

        def accum(opt):
            return optax.MultiSteps(opt, every_k_schedule=self.grad_accum) if self.grad_accum > 1 else opt

        self.opt_frozen = accum(
            optax.multi_transform(
                {
                    "backbone": optax.set_to_zero(),
                    "head": torch_adamw(self.frozen_lr, weight_decay=self.frozen_wd),
                },
                labels,
            )
        )
        updates_per_epoch = max(steps_per_epoch // self.grad_accum, 1)
        self.finetune_schedule = constant_with_warmup(self.finetune_lr, self.warmup_epochs * updates_per_epoch)
        self.opt_finetune = accum(torch_adamw(self.finetune_schedule, weight_decay=self.finetune_wd))

        frozen_state = self.opt_frozen.init(params)
        finetune_state = self.opt_finetune.init(params)
        if self.zero1:
            from mer_tpu.parallel.mesh import shard_opt_state_zero1

            frozen_state = shard_opt_state_zero1(frozen_state, params, self.mesh)
            finetune_state = shard_opt_state_zero1(finetune_state, params, self.mesh)
        self._build_steps()
        # two parallel opt states; step counts the *unfrozen* batches
        return {
            "params": params,
            "frozen_opt": frozen_state,
            "finetune_opt": finetune_state,
            "step": jnp.zeros((), jnp.int32),
        }

    def _build_steps(self):
        model, loss_fn, batch_to_inputs = self.model, self.loss_fn, self.batch_to_inputs
        pp_fn = self.pp_logits_fn

        def train_logits(params, batch, step_rng):
            if pp_fn is not None:
                return pp_fn(params, *batch_to_inputs(batch), deterministic=False, rng=step_rng)
            return model.apply(
                {"params": params}, *batch_to_inputs(batch),
                deterministic=False, rngs={"dropout": step_rng},
            )

        def make_step(optimizer, opt_key, advance_step, watched=False):
            def step_fn(state, batch, rng):
                step_rng = jax.random.fold_in(rng, state["step"])

                def compute_loss(params):
                    logits = train_logits(params, batch, step_rng)
                    return loss_fn(logits, batch["emotion"])

                loss, grads = jax.value_and_grad(compute_loss)(state["params"])
                updates, new_opt = optimizer.update(grads, state[opt_key], state["params"])
                new_params = optax.apply_updates(state["params"], updates)
                if self.zero1:
                    # pin the moments' dp sharding across steps (ZeRO-1)
                    from mer_tpu.parallel.mesh import constrain_opt_state_zero1

                    new_opt = constrain_opt_state_zero1(new_opt, new_params, self.mesh)
                new_state = dict(state)
                new_state["params"] = new_params
                new_state[opt_key] = new_opt
                if advance_step:
                    new_state["step"] = state["step"] + 1
                if watched:
                    # wandb.watch analog (reference text/train.py:124-130)
                    from mer_tpu.utils.logging import watch_norms

                    return new_state, loss, watch_norms(grads, new_params, self.logger.watch_log)
                return new_state, loss

            return step_fn

        raw_frozen = make_step(self.opt_frozen, "frozen_opt", advance_step=False)
        raw_finetune = make_step(self.opt_finetune, "finetune_opt", advance_step=True)
        self._step_frozen = jax.jit(raw_frozen, donate_argnums=(0,))
        self._step_finetune = jax.jit(raw_finetune, donate_argnums=(0,))

        def make_scan(raw_step):
            """k same-shape train steps as ONE XLA program (lax.scan over a
            [k, B, ...] batch stack). Per-step jit dispatch blocks the host
            ~25-30 ms on tunneled dev hosts (BENCH fusion_latency_*_dispatch
            + the r5 fusion-train decomposition: the per-group dispatch was
            ~40% of the tuned epoch wall) — chunking pays it once per k
            steps. Numerically identical to the stepwise loop: the same
            step_fn body, state carried through the scan."""

            def scan_fn(state, stacked, rng):
                def body(carry, batch):
                    return raw_step(carry, batch, rng)

                state, losses = jax.lax.scan(body, state, stacked)
                return state, jnp.sum(losses)

            return jax.jit(scan_fn, donate_argnums=(0,))

        self._scan_frozen = make_scan(raw_frozen)
        self._scan_finetune = make_scan(raw_finetune)
        if self.logger.wants_watch_logs:
            self._step_frozen_watched = jax.jit(
                make_step(self.opt_frozen, "frozen_opt", advance_step=False, watched=True),
                donate_argnums=(0,))
            self._step_finetune_watched = jax.jit(
                make_step(self.opt_finetune, "finetune_opt", advance_step=True, watched=True),
                donate_argnums=(0,))

        def eval_step(params, batch):
            if pp_fn is not None:
                logits = pp_fn(params, *batch_to_inputs(batch), deterministic=True, rng=None)
            else:
                logits = model.apply({"params": params}, *batch_to_inputs(batch), deterministic=True)
            return loss_fn(logits, batch["emotion"]), jnp.argmax(logits, axis=-1)

        self._eval_step = jax.jit(eval_step)
        self._built = True

    # -- loops -------------------------------------------------------------------

    def train_epoch(self, state, batcher, epoch: int, rng) -> tuple[dict, float]:
        is_frozen = epoch < self.num_frozen_epochs
        step_fn = self._step_frozen if is_frozen else self._step_finetune
        sync_every_step = self.logger.wants_step_logs
        watch_every = self.logger.watch_freq if self.logger.wants_watch_logs else 0
        # chunked-scan fast path: k same-shape steps per dispatch (see
        # make_scan). Single-device, no per-step logging/watching, no pp —
        # the conditions under which the stepwise loop's only difference is
        # its per-step host dispatch cost.
        chunk = int(self.config.get_path("tpu.train_scan_chunk", 8) or 0)
        if (chunk > 1 and self.mesh is None and not sync_every_step
                and not watch_every and self.pp_logits_fn is None):
            scan_fn = self._scan_frozen if is_frozen else self._scan_finetune
            return self._train_epoch_chunked(state, batcher, scan_fn, step_fn, rng, chunk)
        watched_fn = (
            (self._step_frozen_watched if is_frozen else self._step_finetune_watched)
            if watch_every else None
        )
        losses = []
        total, batches = 0.0, 0
        for batch in prefetch(batcher, sharding=self.data_sharding):
            if watch_every and batches % watch_every == 0:
                state, loss, norms = watched_fn(state, batch, rng)
                self.logger.log_watch(norms)
            else:
                state, loss = step_fn(state, batch, rng)
            batches += 1
            if sync_every_step:
                total += float(loss)
                self.logger.log_step(total / batches)
            else:
                losses.append(loss)
        if not sync_every_step:
            total = float(jnp.sum(jnp.stack(losses))) if losses else 0.0
        return state, total / max(batches, 1)

    def _train_epoch_chunked(self, state, batcher, scan_fn, step_fn, rng, chunk: int):
        """Group same-shape host batches into [chunk, B, ...] stacks and run
        each stack as one scanned program; leftovers (fewer than ``chunk``
        same-shape batches) run through the stepwise jit. Steps execute in a
        shape-grouped order rather than arrival order — the same reordering
        the fusion batcher's sort_by_length already applies; per-step rng
        still folds on the carried optimizer step counter."""
        pending: dict[tuple, list] = {}
        losses, batches = [], 0

        def flush(group):
            nonlocal state
            stacked = {
                k: jnp.asarray(np.stack([b[k] for b in group])) for k in group[0]
            }
            state_, loss_sum = scan_fn(state, stacked, rng)
            state = state_
            losses.append(loss_sum)

        for batch in batcher:
            # shape signature without touching device values (np.asarray on a
            # device array would be a tunnel round trip per key)
            sig = tuple(sorted((k, tuple(np.shape(v)), str(getattr(v, "dtype", type(v))))
                               for k, v in batch.items()))
            group = pending.setdefault(sig, [])
            group.append(batch)
            batches += 1
            if len(group) == chunk:
                flush(group)
                pending[sig] = []
        for group in pending.values():  # leftovers: stepwise
            for batch in group:
                state, loss = step_fn(state, jax.tree.map(jnp.asarray, batch), rng)
                losses.append(loss)
        total = float(jnp.sum(jnp.stack(losses))) if losses else 0.0
        return state, total / max(batches, 1)

    def evaluate(self, params, batcher) -> tuple[float, BatchAveragedMetrics]:
        # avoid per-call transfer of numpy trees — but never re-place leaves
        # already on device (a bare device_put would collapse pp/tp shardings
        # to the default device)
        params = jax.tree.map(
            lambda x: jax.device_put(x) if isinstance(x, np.ndarray) else x, params
        )
        metrics = BatchAveragedMetrics()
        total, batches = 0.0, 0
        for batch in prefetch(batcher, sharding=self.data_sharding):
            loss, preds = self._eval_step(params, batch)
            emotion = np.asarray(batch["emotion"])
            metrics.update(emotion, np.asarray(preds), mask=emotion != -1)
            total += float(loss)
            batches += 1
        return total / max(batches, 1), metrics

    def fit(self, train_batcher, val_batcher, state: dict | None = None):
        cfg = self.config
        epochs = int(cfg.solver.epochs)
        early = bool(cfg.solver.early_stopping.enabled)
        patience = int(cfg.solver.early_stopping.patience)
        restore_best = bool(cfg.solver.early_stopping.restore_best_weights)
        save_path = os.path.abspath(str(cfg.checkpoint.save_path))
        sharded = bool(cfg.checkpoint.get("sharded", False))  # per-process shard dirs
        best_path = os.path.join(os.path.dirname(save_path),
                                 "best_weights.sharded" if sharded else "best_weights.ckpt")
        save_ckpt = bool(cfg.checkpoint.get("save_checkpoint", True))

        if state is None:
            example = next(iter(train_batcher))
            state = self.init_state(example, steps_per_epoch=len(train_batcher))

        rng = dropout_key(self.seed + 1, cfg.get_path("tpu.dropout_prng", None))
        min_loss_val = float("inf")
        patience_counter = 0
        history = {"loss_values": [], "val_loss_values": []}

        for epoch in range(epochs):
            t0 = time.perf_counter()
            state, loss_train = self.train_epoch(state, train_batcher, epoch, rng)
            loss_val, metrics = self.evaluate(state["params"], val_batcher)
            dt = time.perf_counter() - t0
            history["loss_values"].append(loss_train)
            history["val_loss_values"].append(loss_val)

            if save_ckpt:
                # FE checkpoints store model params only (text/train.py:165-169)
                save_checkpoint_auto(save_path, sharded=sharded, epoch=epoch, params=state["params"])

            is_frozen = epoch < self.num_frozen_epochs
            # the schedule horizon is denominated in optimizer UPDATES; with
            # grad accumulation the state counts micro-steps, so divide
            n_updates = (state["step"] - 1) // self.grad_accum
            lr = self.frozen_lr if is_frozen else float(self.finetune_schedule(n_updates))
            self.logger.log_epoch(
                epoch, lr=lr, loss_train=loss_train, loss_val=loss_val,
                accuracy=metrics.batch_averaged_accuracy,
                weighted_f1=metrics.batch_averaged_weighted_f1,
                epoch_seconds=dt,
            )

            if early:
                if loss_val < min_loss_val:
                    min_loss_val = loss_val
                    patience_counter = 0
                    if restore_best:
                        save_checkpoint_auto(best_path, sharded=sharded, epoch=epoch, params=state["params"])
                else:
                    patience_counter += 1
                    if patience_counter >= patience:
                        self.logger.print(f"Early stopping: patience {patience} reached")
                        if restore_best and os.path.exists(best_path):
                            best = load_checkpoint_auto(best_path)
                            state["params"] = restore_into(state["params"], best["params"])
                            if save_ckpt:
                                save_checkpoint_auto(save_path, sharded=sharded, epoch=best["epoch"], params=state["params"])
                            remove_checkpoint(best_path)
                            self.logger.print(f"Best model at epoch {best['epoch']} restored")
                        break

        self.logger.finish()
        return state, history

    def test(self, batcher, params) -> dict:
        if not self._built:
            self._build_steps()
        loss, metrics = self.evaluate(params, batcher)
        result = {"loss": loss, **metrics.summary()}
        self.logger.print(
            f"Accuracy=[{metrics.batch_averaged_accuracy * 100:.3f}%] "
            f"Weighted_F1=[{metrics.batch_averaged_weighted_f1 * 100:.3f}%]"
        )
        return result
