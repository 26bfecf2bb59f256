"""The shared solver engine.

The reference copy-pastes its epoch loop four times (fusion src/train.py,
text/train.py, audio_wav2vec2/train.py, audio_mel/train.py — SURVEY.md §1).
Here it is one engine:

- one jitted ``train_step`` / ``eval_step`` per model (single XLA program:
  forward + backward + optimizer update, donated state)
- torch-semantics optimizers built from the same YAML solver blocks:
  Adam with L2 weight decay (torch.optim.Adam) and AdamW, per-epoch
  ExponentialLR, constant-with-warmup
- per-epoch validation with the reference's batch-averaged accuracy /
  weighted-F1 (src/train.py:245-272)
- checkpoint save per epoch incl. optimizer state + resume
  (src/train.py:86-93, 163-168)
- early stopping with best-weights shadow copy and restore-and-promote
  (src/train.py:186-210), early-stop state resumable (audio_mel/train.py:143-154)
- DP/TP sharding over a jax mesh when one is supplied; batches land
  pre-sharded via the DevicePrefetcher
"""

from __future__ import annotations

import os
import time
from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from mer_tpu.data.prefetch import prefetch
from mer_tpu.objectives.classification import cross_entropy
from mer_tpu.objectives.metrics import BatchAveragedMetrics
from mer_tpu.parallel.mesh import batch_sharding, shard_params
from mer_tpu.utils.rng import dropout_key
from mer_tpu.train.checkpoint import (
    AsyncCheckpointer, load_checkpoint_auto, remove_checkpoint, restore_into,
    save_checkpoint_auto,
)
from mer_tpu.utils.logging import RunLogger


class TrainState(struct.PyTreeNode):
    params: Any
    opt_state: Any
    step: jnp.ndarray


# ---------------------------------------------------------------------------
# Optimizers (torch semantics)
# ---------------------------------------------------------------------------

def torch_adam(learning_rate, weight_decay: float = 0.0, b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8) -> optax.GradientTransformation:
    """torch.optim.Adam parity: L2 decay added to the gradient *before* the
    moment updates (unlike AdamW's decoupled decay)."""
    parts = []
    if weight_decay:
        parts.append(optax.add_decayed_weights(weight_decay))
    parts.append(optax.scale_by_adam(b1=b1, b2=b2, eps=eps))
    parts.append(optax.scale_by_learning_rate(learning_rate))
    return optax.chain(*parts)


def torch_adamw(learning_rate, weight_decay: float = 0.0, b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8) -> optax.GradientTransformation:
    return optax.adamw(learning_rate, b1=b1, b2=b2, eps=eps, weight_decay=weight_decay)


def exponential_lr(base_lr: float, gamma: float, steps_per_epoch: int) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """torch ExponentialLR stepped once per epoch (src/train.py:171-172)."""

    def schedule(step):
        epoch = step // max(steps_per_epoch, 1)
        return base_lr * (gamma ** epoch)

    return schedule


def constant_with_warmup(base_lr: float, warmup_steps: int) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """HF get_constant_schedule_with_warmup parity (text/train.py:84):
    lr factor is step/warmup — the FIRST optimizer step runs at lr=0."""

    def schedule(step):
        frac = jnp.minimum(step / jnp.maximum(warmup_steps, 1), 1.0)
        return base_lr * frac

    return schedule


def optimizer_from_config(solver_cfg, steps_per_epoch: int) -> tuple[optax.GradientTransformation, Callable]:
    """Build the fusion-style optimizer from a reference solver YAML block.

    ``solver.grad_accum_steps > 1`` wraps the optimizer in optax.MultiSteps
    (k micro-gradients average into one update); the schedule's horizon and
    the inner optimizer's step count are then denominated in UPDATES, so
    callers logging LR must divide the micro-step counter by k."""
    base_lr = float(solver_cfg.lr)
    wd = float(solver_cfg.get("weight_decay", 0.0))
    accum = int(solver_cfg.get("grad_accum_steps", 1) or 1)
    sched_cfg = solver_cfg.get("scheduler", None)
    if sched_cfg and sched_cfg.get("enabled", False):
        if sched_cfg.get("scheduler_fn") != "ExponentialLR":
            raise ValueError("Scheduler not supported")
        updates_per_epoch = max(steps_per_epoch // accum, 1)
        schedule = exponential_lr(base_lr, float(sched_cfg.gamma), updates_per_epoch)
    else:
        schedule = lambda step: jnp.asarray(base_lr)
    opt = torch_adam(schedule, weight_decay=wd)
    if accum > 1:
        opt = optax.MultiSteps(opt, every_k_schedule=accum)
    return opt, schedule


# ---------------------------------------------------------------------------
# Solver
# ---------------------------------------------------------------------------

class Solver:
    """Shared classification solver (fusion pipeline; FE pipelines build on it).

    Args:
        model: a Flax module whose __call__ returns logits.
        config: full pipeline config (reference YAML schema).
        loss_fn: (logits, labels) -> scalar; defaults to the reference CE
            (ignore_index=-1, label_smoothing=0.1, optional class weights).
        batch_to_inputs: batch dict -> model args tuple.
        mesh: optional jax Mesh for DP/TP sharding.
    """

    def __init__(
        self,
        model,
        config,
        *,
        class_weights: np.ndarray | None = None,
        loss_fn: Callable | None = None,
        batch_to_inputs: Callable[[dict], tuple] | None = None,
        mesh=None,
        seed: int | None = None,
    ):
        self.model = model
        self.config = config
        self.mesh = mesh
        self.logger = RunLogger(config)
        self.seed = int(config.get_path("tpu.seed", 0) if seed is None else seed)
        # ZeRO-1: shard the Adam moments over dp (tpu.zero1) — params stay
        # dp-replicated; GSPMD turns the update into shard-local math plus
        # one update all-gather per step (parallel/mesh.py zero1_* helpers)
        self.zero1 = (
            bool(config.get_path("tpu.zero1", False))
            and mesh is not None
            and mesh.shape.get("dp", 1) > 1
        )

        if loss_fn is None:
            cw = None if class_weights is None else jnp.asarray(class_weights)
            loss_fn = partial(cross_entropy, label_smoothing=0.1, class_weights=cw, ignore_index=-1)
        self.loss_fn = loss_fn

        if batch_to_inputs is None:
            batch_to_inputs = lambda b: (b["text"], b["audio"], b["padding_mask"])
        self.batch_to_inputs = batch_to_inputs

        self._train_step = None
        self._eval_step = None
        self._optimizer = None
        self._schedule = None

    # -- setup ---------------------------------------------------------------

    def init_state(self, example_batch: dict, steps_per_epoch: int) -> TrainState:
        rng = jax.random.PRNGKey(self.seed)
        inputs = self.batch_to_inputs(jax.tree.map(jnp.asarray, example_batch))
        params = self.model.init({"params": rng}, *inputs)["params"]
        self._optimizer, self._schedule = optimizer_from_config(self.config.solver, steps_per_epoch)
        opt_state = self._optimizer.init(params)
        state = TrainState(params=params, opt_state=opt_state, step=jnp.zeros((), jnp.int32))
        if self.mesh is not None:
            state = state.replace(params=shard_params(state.params, self.mesh))
            if self.zero1:
                from mer_tpu.parallel.mesh import shard_opt_state_zero1

                state = state.replace(
                    opt_state=shard_opt_state_zero1(state.opt_state, state.params, self.mesh)
                )
        return state

    def _build_steps(self) -> None:
        model, loss_fn, optimizer = self.model, self.loss_fn, self._optimizer
        batch_to_inputs = self.batch_to_inputs

        def _step_core(state: TrainState, batch: dict, rng):
            step_rng = jax.random.fold_in(rng, state.step)

            def compute_loss(params):
                logits = model.apply(
                    {"params": params}, *batch_to_inputs(batch),
                    deterministic=False, rngs={"dropout": step_rng},
                )
                return loss_fn(logits, batch["emotion"])

            loss, grads = jax.value_and_grad(compute_loss)(state.params)
            updates, new_opt_state = optimizer.update(grads, state.opt_state, state.params)
            new_params = optax.apply_updates(state.params, updates)
            if self.zero1:
                # keep the moments dp-sharded across steps (ZeRO-1): without
                # the constraint GSPMD may re-replicate them to match the
                # replicated grads
                from mer_tpu.parallel.mesh import constrain_opt_state_zero1

                new_opt_state = constrain_opt_state_zero1(new_opt_state, new_params, self.mesh)
            new_state = state.replace(params=new_params, opt_state=new_opt_state, step=state.step + 1)
            return new_state, loss, grads

        def train_step(state: TrainState, batch: dict, rng) -> tuple[TrainState, jnp.ndarray]:
            new_state, loss, _ = _step_core(state, batch, rng)  # grads DCE'd by XLA
            return new_state, loss

        def train_step_watched(state: TrainState, batch: dict, rng):
            """wandb.watch analog (reference src/train.py:132-138): the same
            step, plus per-parameter gradient/parameter L2 norms computed on
            device. Compiled separately; invoked every watch_freq steps."""
            from mer_tpu.utils.logging import watch_norms

            new_state, loss, grads = _step_core(state, batch, rng)
            return new_state, loss, watch_norms(grads, new_state.params, self.logger.watch_log)

        def eval_step(params, batch: dict) -> tuple[jnp.ndarray, jnp.ndarray]:
            logits = model.apply({"params": params}, *batch_to_inputs(batch), deterministic=True)
            loss = loss_fn(logits, batch["emotion"])
            preds = jnp.argmax(logits, axis=-1)
            return loss, preds

        def scan_train(state: TrainState, idx_all, text_all, audio_all, emotion_all, rng, bucket: int):
            """A whole bucket-group of train steps as ONE XLA program: scan
            over [n_steps, B] index rows, gathering each batch from the
            HBM-resident tables. Removes per-step dispatch latency (the
            round-1 train/inference gap was dispatch-bound, not compute-
            bound — see ROADMAP §train-gap)."""
            from mer_tpu.data.fusion import gather_fusion_batch

            def body(carry, idx_row):
                batch = gather_fusion_batch(text_all, audio_all, emotion_all, idx_row, bucket)
                new_state, loss = train_step(carry, batch, rng)
                return new_state, loss

            state, losses = jax.lax.scan(body, state, idx_all)
            return state, jnp.sum(losses)

        def scan_train_epoch(state: TrainState, idx_groups, text_all, audio_all, emotion_all, rng,
                             buckets: tuple):
            """The WHOLE epoch as one XLA program: every bucket group's scan
            chained inside a single jit. The per-bucket path pays one host
            dispatch block (~25-30 ms on tunneled dev hosts,
            fusion_latency_*_dispatch_ms) per group — measured r5, that was
            ~40% of the tuned epoch wall (sum-of-regions 8.9 ms fwd+bwd +
            2.8 Adam + 1.0 gather per u=8 step vs 41.8 ms/step observed;
            scripts/profile_fusion_regions.py). One program -> one block.
            ``idx_groups`` is a tuple of [n_steps_g, B] arrays, one per
            static bucket width in ``buckets``."""
            from mer_tpu.data.fusion import gather_fusion_batch

            total = jnp.float32(0)
            for idx_all, bucket in zip(idx_groups, buckets):
                def body(carry, idx_row, _b=bucket):
                    batch = gather_fusion_batch(text_all, audio_all, emotion_all, idx_row, _b)
                    new_state, loss = train_step(carry, batch, rng)
                    return new_state, loss

                state, losses = jax.lax.scan(body, state, idx_all)
                total = total + jnp.sum(losses)
            return state, total

        donate = bool(self.config.get_path("tpu.donate_state", True))
        self._train_step = jax.jit(train_step, donate_argnums=(0,) if donate else ())
        self._train_step_watched = jax.jit(train_step_watched, donate_argnums=(0,) if donate else ())
        self._scan_train = jax.jit(
            scan_train, static_argnames=("bucket",), donate_argnums=(0,) if donate else ()
        )
        self._scan_train_epoch = jax.jit(
            scan_train_epoch, static_argnames=("buckets",),
            donate_argnums=(0,) if donate else (),
        )
        self._eval_step = jax.jit(eval_step)

    @property
    def data_sharding(self):
        return batch_sharding(self.mesh) if self.mesh is not None else None

    # -- epochs ---------------------------------------------------------------

    def train_epoch(self, state: TrainState, batcher, rng) -> tuple[TrainState, float]:
        if self._train_step is None:
            self._build_steps()
        # Scanned-epoch fast path: HBM-resident dataset + no per-step logging
        # + single device -> run each bucket group as one XLA scan program.
        if (
            self.mesh is None
            and not self.logger.wants_step_logs
            and hasattr(batcher, "epoch_index_plan")
        ):
            return self._train_epoch_scanned(state, batcher, rng)
        # Losses stay on device during the epoch — a per-step float() would
        # stall the dispatch pipeline. Per-step running-loss logging (the
        # reference's wandb semantics) only happens when a logger wants it.
        sync_every_step = self.logger.wants_step_logs
        watch_every = self.logger.watch_freq if self.logger.wants_watch_logs else 0
        losses = []
        total, batches = 0.0, 0
        for batch in prefetch(batcher, sharding=self.data_sharding):
            if watch_every and batches % watch_every == 0:
                state, loss, norms = self._train_step_watched(state, batch, rng)
                self.logger.log_watch(norms)
            else:
                state, loss = self._train_step(state, batch, rng)
            batches += 1
            if sync_every_step:
                total += float(loss)
                self.logger.log_step(total / batches)
            else:
                losses.append(loss)
        if not sync_every_step:
            total = float(jnp.sum(jnp.stack(losses))) if losses else 0.0
        return state, total / max(batches, 1)

    def _train_epoch_scanned(self, state: TrainState, batcher, rng) -> tuple[TrainState, float]:
        text_all, audio_all, emotion_all = batcher.arrays
        plan = list(batcher.epoch_index_plan())
        if not plan:
            return state, 0.0
        steps = sum(int(idx.shape[0]) for _, idx in plan)
        # the whole epoch is ONE dispatch (scan_train_epoch): bucket widths
        # are static jit args, [n_steps_g, B] index shapes are stable across
        # epochs (the batcher's bucket composition is shuffle-invariant), so
        # this compiles once and every epoch pays a single host dispatch
        # block instead of one per bucket group
        buckets = tuple(bucket for bucket, _ in plan)
        idx_groups = tuple(idx for _, idx in plan)
        state, loss_sum = self._scan_train_epoch(
            state, idx_groups, text_all, audio_all, emotion_all, rng, buckets
        )
        return state, float(loss_sum) / max(steps, 1)

    def evaluate(self, params, batcher) -> tuple[float, BatchAveragedMetrics]:
        if self._eval_step is None:
            self._build_steps()
        # commit once: numpy param trees (checkpoint restores) would otherwise
        # re-transfer host->device on every jitted call
        params = jax.device_put(params)
        metrics = BatchAveragedMetrics()
        total, batches = 0.0, 0
        for batch in prefetch(batcher, sharding=self.data_sharding):
            loss, preds = self._eval_step(params, batch)
            emotion = np.asarray(batch["emotion"])
            metrics.update(emotion, np.asarray(preds), mask=emotion != -1)
            total += float(loss)
            batches += 1
        return total / max(batches, 1), metrics

    # -- full training loop ----------------------------------------------------

    def fit(self, train_batcher, val_batcher, state: TrainState | None = None) -> tuple[TrainState, dict]:
        cfg = self.config
        solver_cfg = cfg.solver
        epochs = int(solver_cfg.epochs)
        early_stopping = bool(solver_cfg.get_path("early_stopping.enabled", False))
        patience = int(solver_cfg.get_path("early_stopping.patience", 0) or 0)
        restore_best = bool(solver_cfg.get_path("early_stopping.restore_best_weights", False))

        ckpt_cfg = cfg.checkpoint
        save_ckpt = bool(ckpt_cfg.get("save_checkpoint", False))
        # checkpoint.sharded: per-process shard files under a DIRECTORY at
        # save_path (multi-host — no host gather); async writes are bypassed
        # there (every process writes only its own small addressable slice)
        sharded = bool(ckpt_cfg.get("sharded", False))
        save_path = os.path.abspath(str(ckpt_cfg.get("save_path", "checkpoints/model.ckpt")))
        best_path = os.path.join(os.path.dirname(save_path),
                                 "best_weights.sharded" if sharded else "best_weights.ckpt")

        example = next(iter(train_batcher))
        if state is None:
            state = self.init_state(example, steps_per_epoch=len(train_batcher))
        elif self._optimizer is None:
            self._optimizer, self._schedule = optimizer_from_config(solver_cfg, len(train_batcher))

        start_epoch = 0
        min_loss_val = float("inf")
        patience_counter = 0

        # resume (reference src/train.py:86-93)
        load_path = os.path.abspath(str(ckpt_cfg.get("load_path", save_path)))
        if bool(ckpt_cfg.get("load_checkpoint", False)) and os.path.exists(load_path):
            restored = load_checkpoint_auto(load_path)
            state = state.replace(
                params=restore_into(state.params, restored["params"]),
                opt_state=restore_into(state.opt_state, restored["opt_state"]),
                step=jnp.asarray(restored["extra"].get("step", 0), jnp.int32),
            )
            start_epoch = restored["epoch"] + 1
            min_loss_val = float(restored["extra"].get("min_loss_val", float("inf")))
            patience_counter = int(restored["extra"].get("patience_counter", 0))
            self.logger.print(f"Resumed from {load_path} at epoch {start_epoch}")

        rng = dropout_key(self.seed + 1, cfg.get_path("tpu.dropout_prng", None))
        history: dict[str, list] = {"loss_values": [], "val_loss_values": []}
        # background checkpoint writes (multi-GB at full size) never stall epochs
        ckpt_writer = (
            AsyncCheckpointer()
            if bool(cfg.get_path("tpu.async_checkpoint", True)) and not sharded
            else None
        )

        def _save(path, **kw):
            if ckpt_writer is not None:
                ckpt_writer.save(path, **kw)
            else:
                save_checkpoint_auto(path, sharded=sharded, **kw)

        for epoch in range(start_epoch, epochs):
            t0 = time.perf_counter()
            state, loss_train = self.train_epoch(state, train_batcher, rng)
            loss_val, metrics = self.evaluate(state.params, val_batcher)
            dt = time.perf_counter() - t0
            history["loss_values"].append(loss_train)
            history["val_loss_values"].append(loss_val)

            def _extra():
                return {
                    "step": int(state.step),
                    "min_loss_val": min_loss_val,
                    "patience_counter": patience_counter,
                }

            if save_ckpt:
                _save(save_path, epoch=epoch, params=state.params, opt_state=state.opt_state, extra=_extra())

            # schedule counts optimizer updates; state.step counts micro-steps
            accum = int(self.config.get_path("solver.grad_accum_steps", 1) or 1)
            lr = float(self._schedule((state.step - 1) // accum)) if self._schedule else float(solver_cfg.lr)
            self.logger.log_epoch(
                epoch, lr=lr, loss_train=loss_train, loss_val=loss_val,
                accuracy=metrics.batch_averaged_accuracy,
                weighted_f1=metrics.batch_averaged_weighted_f1,
                epoch_seconds=dt,
            )

            if early_stopping:
                if loss_val < min_loss_val:
                    min_loss_val = loss_val
                    patience_counter = 0
                    if restore_best:
                        _save(best_path, epoch=epoch, params=state.params, opt_state=state.opt_state, extra=_extra())
                else:
                    patience_counter += 1
                    if patience_counter >= patience:
                        self.logger.print(f"Early stopping: patience {patience} reached")
                        if ckpt_writer is not None:
                            ckpt_writer.wait()  # best_path must be fully on disk
                        if restore_best and os.path.exists(best_path):
                            best = load_checkpoint_auto(best_path)
                            state = state.replace(params=restore_into(state.params, best["params"]))
                            if save_ckpt:
                                save_checkpoint_auto(
                                    save_path, sharded=sharded, epoch=best["epoch"],
                                    params=state.params,
                                    opt_state=state.opt_state, extra=_extra(),
                                )
                            remove_checkpoint(best_path)
                            self.logger.print(f"Best model at epoch {best['epoch']} restored")
                        break

        if ckpt_writer is not None:
            ckpt_writer.wait()
        self.logger.finish()
        return state, history

    # -- evaluation entry (reference src/test.py) ------------------------------

    def test(self, test_batcher, params) -> dict:
        loss, metrics = self.evaluate(params, test_batcher)
        result = {"loss": loss, **metrics.summary()}
        self.logger.print(
            f"Accuracy=[{metrics.batch_averaged_accuracy * 100:.3f}%] "
            f"Weighted_F1=[{metrics.batch_averaged_weighted_f1 * 100:.3f}%]"
        )
        return result
