"""Metric-learning solver for the mel feature extractor (stage 1c).

Reference loop (audio_mel/train.py:117-280): per step, hard-mine a triplet
batch with the current model (inference mode), then 3 forward passes +
composite loss (20*triplet + 5*cov + 1*var) + Adam step; per-epoch hard-mined
validation loss drives early stopping (patience 10) with min_loss_val /
patience_counter resume — the only reference pipeline that resumes
early-stop state.

TPU redesign:
- mining pool embedding and selection are one jitted device program
  (mer_tpu.mining); the host only fetches waveforms
- anchor/positive/negative go through ONE forward of [3B, ...] (identical
  numerics to 3 separate passes: BatchNorm runs in eval stats, the
  reference's own quirk — audio_mel/train.py:231, see models/resnet.py)
- the log-mel frontend runs on device right before the encoder, so a "step"
  is wav bytes -> spectrogram -> embeddings -> loss -> update with no host
  featurization
"""

from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from mer_tpu.mining import TripletMiner
from mer_tpu.objectives.embedding import make_embedding_loss
from mer_tpu.train.checkpoint import load_checkpoint, restore_into, save_checkpoint
from mer_tpu.train.solver import TrainState, optimizer_from_config
from mer_tpu.utils.logging import RunLogger
from mer_tpu.utils.rng import dropout_key


class MelSolver:
    def __init__(self, model, config, data_train, data_val, seed: int = 0, mesh=None):
        self.model = model
        self.config = config
        self.data_train = data_train
        self.data_val = data_val
        self.seed = seed
        self.mesh = mesh
        self.logger = RunLogger(config)
        self.loss_fn = make_embedding_loss(config)
        # ZeRO-1 (tpu.zero1): dp-sharded Adam moments — small absolute win
        # here (ResNet18+projector), but keeps the knob uniform across all
        # three solvers (see train/solver.py, parallel/mesh.py zero1_*)
        self.zero1 = (
            bool(config.get_path("tpu.zero1", False))
            and mesh is not None
            and mesh.shape.get("dp", 1) > 1
        )
        self.mining_type = str(config.get_path("solver.mining_type", "hard"))
        # async_mining=True mines batch k+1 (with the params from *before*
        # step k's update — one step staler than the reference's semantics)
        # in a worker thread while step k's gradient computes. Documented
        # semantic deviation, off by default.
        self.async_mining = bool(config.get_path("solver.async_mining", False))
        # device_mining=True (default) keeps hard-mined row indices on device
        # (zero per-step host syncs); False forces the host-index path
        self.device_mining = bool(config.get_path("solver.device_mining", True))
        self.batch_size = int(config.train.data_loader.batch_size)
        self.val_batch_size = int(config.val.data_loader.batch_size)

        # BatchNorm runs in eval stats (the reference quirk, see
        # models/resnet.py); stats are captured at init and stay constant.
        self._batch_stats: dict = {}
        # persistent miners (one per dataset) — the sampler RNG must advance
        # across steps, never reset (see _miner)
        self._miners: dict = {}
        self._mining_params = None

        def _apply(params, x):
            return self.model.apply({"params": params, "batch_stats": self._batch_stats}, x)

        self._apply = _apply
        self._embed = jax.jit(_apply)

        def _step_core(state: TrainState, spectrograms: jnp.ndarray):
            def compute_loss(params):
                emb = _apply(params, spectrograms)  # [3B, D]
                a, p, n = jnp.split(emb, 3, axis=0)
                return self.loss_fn(a, p, n)

            loss, grads = jax.value_and_grad(compute_loss)(state.params)
            updates, new_opt = self._optimizer.update(grads, state.opt_state, state.params)
            import optax

            new_params = optax.apply_updates(state.params, updates)
            if self.zero1:
                # pin the moments' dp sharding across steps (ZeRO-1)
                from mer_tpu.parallel.mesh import constrain_opt_state_zero1

                new_opt = constrain_opt_state_zero1(new_opt, new_params, self.mesh)
            return state.replace(params=new_params, opt_state=new_opt, step=state.step + 1), loss, grads

        def triplet_step(state: TrainState, spectrograms: jnp.ndarray):
            new_state, loss, _ = _step_core(state, spectrograms)  # grads DCE'd
            return new_state, loss

        def triplet_step_watched(state: TrainState, spectrograms: jnp.ndarray):
            """wandb.watch analog (reference audio_mel/train.py:135-141)."""
            from mer_tpu.utils.logging import watch_norms

            new_state, loss, grads = _step_core(state, spectrograms)
            return new_state, loss, watch_norms(grads, new_state.params, self.logger.watch_log)

        def eval_loss(params, spectrograms: jnp.ndarray):
            emb = _apply(params, spectrograms)
            a, p, n = jnp.split(emb, 3, axis=0)
            return self.loss_fn(a, p, n)

        self._triplet_step_fn = triplet_step
        self._triplet_step_watched_fn = triplet_step_watched
        self._eval_loss = jax.jit(eval_loss)
        self._train_step = None
        self._train_step_watched = None
        self._optimizer = None
        self._schedule = None

    # -- setup -----------------------------------------------------------------

    def set_batch_stats(self, stats: dict) -> None:
        """Replace the (eval-mode, constant) BatchNorm statistics.

        The jitted programs bake ``self._batch_stats`` in as closure
        constants at first trace, so assigning the attribute directly after
        any embed/step has run would be silently ignored by the cached
        traces — this re-creates the embed jit (training steps are rebuilt
        by init_state). Use before exporting from imported checkpoints."""
        self._batch_stats = stats
        self._embed = jax.jit(self._apply)

    def init_state(self) -> TrainState:
        # one-time HBM spectrogram caches: every subsequent mining pool /
        # triplet batch is a device gather instead of a host wav transfer
        for ds in (self.data_train, self.data_val):
            if getattr(ds, "build_device_cache", None) and ds._device_cache is None:
                ds.build_device_cache()
        spec = self.data_train.spectrogram_batch(np.arange(min(2, len(self.data_train))))
        variables = self.model.init(jax.random.PRNGKey(self.seed), spec)
        params = variables["params"]
        self._batch_stats = variables.get("batch_stats", {})
        if self.mesh is not None:
            # replicate params/stats; the [3B] triplet batch shards over dp
            from mer_tpu.parallel.mesh import replicated

            params = jax.device_put(params, replicated(self.mesh))
            self._batch_stats = jax.device_put(self._batch_stats, replicated(self.mesh))
        steps_per_epoch = len(self.data_train) // self.batch_size
        self._optimizer, self._schedule = optimizer_from_config(self.config.solver, steps_per_epoch)
        opt_state = self._optimizer.init(params)
        if self.zero1:
            from mer_tpu.parallel.mesh import shard_opt_state_zero1

            opt_state = shard_opt_state_zero1(opt_state, params, self.mesh)
        # async mining reads the pre-update params concurrently with the
        # step — donation would invalidate those buffers mid-use
        donate = () if self.async_mining else (0,)
        self._train_step = jax.jit(self._triplet_step_fn, donate_argnums=donate)
        if self.logger.wants_watch_logs:
            self._train_step_watched = jax.jit(self._triplet_step_watched_fn, donate_argnums=donate)
        return TrainState(params=params, opt_state=opt_state, step=jnp.zeros((), jnp.int32))

    def _miner(self, dataset, params) -> TripletMiner:
        """Persistent per-dataset miner whose sampler RNG advances across
        steps/epochs (reference parity: global torch/np random state advances
        every `df.sample()`, audio_mel/dataset.py:202-358). The embed_fn reads
        ``self._mining_params`` so one miner serves every step's params."""
        self._mining_params = params
        key = id(dataset)
        miner = self._miners.get(key)
        if miner is None:
            def embed_fn(indices):
                spec = dataset.spectrogram_batch(np.asarray(indices))
                return self._embed(self._mining_params, spec)

            miner = TripletMiner(
                dataset.get_labels(), embed_fn,
                len_triplet_picking=int(self.config.solver.len_triplet_picking),
                seed=self.seed + len(self._miners),
            )
            self._miners[key] = miner
        return miner

    def _fetch_triplet_batch(self, dataset, a, p, n, key=None) -> jnp.ndarray:
        idx = np.concatenate([a, p, n])
        spec = dataset.spectrogram_batch(idx, key=key)
        if self.mesh is not None:
            # shard the [3B, T, M, C] triplet batch over dp; params are
            # replicated so GSPMD all-reduces the grads across the mesh
            from mer_tpu.parallel.mesh import batch_sharding

            spec = jax.device_put(spec, batch_sharding(self.mesh))
        return spec

    # -- epochs ------------------------------------------------------------------

    def train_epoch(self, state: TrainState, epoch: int, rng) -> tuple[TrainState, float]:
        n_steps = len(self.data_train) // self.batch_size
        if self.async_mining:
            return self._train_epoch_async(state, epoch, rng, n_steps)
        watch_every = self.logger.watch_freq if self.logger.wants_watch_logs else 0
        # per-step float(loss) forces a full host-link round trip per step
        # (~30 ms on tunneled hosts) — defer to one epoch-end fetch unless
        # wandb is actually recording the running loss (FESolver pattern)
        sync_every_step = self.logger.wants_step_logs
        # hard mining against an HBM cache (and no augmentation) can keep the
        # mined rows on device: the whole epoch is then pure device dataflow
        # with ZERO per-step host syncs (mine_hard_rows_device)
        device_rows = (
            self.device_mining
            and self.mining_type == "hard"
            and getattr(self.data_train, "_device_cache", None) is not None
            and int(getattr(self.data_train, "augmentation_factor", 1)) <= 1
        )
        losses = []
        total = 0.0
        for step in range(n_steps):
            miner = self._miner(self.data_train, state.params)
            if device_rows:
                rows = miner.mine_hard_rows_device(self.batch_size)
                spec = self.data_train.spectrogram_batch(rows)
                if self.mesh is not None:
                    from mer_tpu.parallel.mesh import batch_sharding

                    spec = jax.device_put(spec, batch_sharding(self.mesh))
            else:
                a, p, n = miner.mine(self.batch_size, self.mining_type)
                key = jax.random.fold_in(rng, epoch * n_steps + step)
                spec = self._fetch_triplet_batch(self.data_train, a, p, n, key=key)
            if watch_every and step % watch_every == 0:
                state, loss, norms = self._train_step_watched(state, spec)
                self.logger.log_watch(norms)
            else:
                state, loss = self._train_step(state, spec)
            if sync_every_step:
                total += float(loss)
                self.logger.log_step(total / (step + 1))
            else:
                losses.append(loss)
        if not sync_every_step:
            total = float(jnp.sum(jnp.stack(losses))) if losses else 0.0
        return state, total / max(n_steps, 1)

    def _train_epoch_async(self, state: TrainState, epoch: int, rng, n_steps: int) -> tuple[TrainState, float]:
        from concurrent.futures import ThreadPoolExecutor

        def produce(params, step):
            miner = self._miner(self.data_train, params)
            a, p, n = miner.mine(self.batch_size, self.mining_type)
            key = jax.random.fold_in(rng, epoch * n_steps + step)
            return self._fetch_triplet_batch(self.data_train, a, p, n, key=key)

        total = 0.0
        losses = []
        with ThreadPoolExecutor(max_workers=1) as pool:
            fut = pool.submit(produce, state.params, 0)
            for step in range(n_steps):
                spec = fut.result()
                if step + 1 < n_steps:
                    # mine the next batch with the CURRENT (pre-update) params
                    fut = pool.submit(produce, state.params, step + 1)
                state, loss = self._train_step(state, spec)
                losses.append(loss)
        total = float(jnp.sum(jnp.stack(losses))) if losses else 0.0
        return state, total / max(n_steps, 1)

    def validate(self, params) -> float:
        params = jax.device_put(params)  # avoid per-call transfer of numpy trees
        n_steps = max(len(self.data_val) // self.val_batch_size, 1)
        miner = self._miner(self.data_val, params)
        total = 0.0
        for _ in range(n_steps):
            a, p, n = miner.mine(self.val_batch_size, self.mining_type)
            spec = self._fetch_triplet_batch(self.data_val, a, p, n)
            total += float(self._eval_loss(params, spec))
        return total / n_steps

    # -- full loop -----------------------------------------------------------------

    def fit(self, state: TrainState | None = None) -> tuple[TrainState, dict]:
        cfg = self.config
        epochs = int(cfg.solver.epochs)
        early = bool(cfg.solver.early_stopping.enabled)
        patience = int(cfg.solver.early_stopping.patience)
        restore_best = bool(cfg.solver.early_stopping.restore_best_weights)
        save_path = os.path.abspath(str(cfg.checkpoint.save_path))
        best_path = os.path.join(os.path.dirname(save_path), "best_weights.ckpt")
        save_ckpt = bool(cfg.checkpoint.save_checkpoint)

        if state is None:
            state = self.init_state()

        start_epoch = 0
        min_loss_val = float("inf")
        patience_counter = 0
        load_path = os.path.abspath(str(cfg.checkpoint.get("load_path", save_path)))
        if bool(cfg.checkpoint.get("load_checkpoint", False)) and os.path.exists(load_path):
            restored = load_checkpoint(load_path)
            state = state.replace(
                params=restore_into(state.params, restored["params"]),
                opt_state=restore_into(state.opt_state, restored["opt_state"]),
            )
            start_epoch = restored["epoch"] + 1
            # early-stop state resume (audio_mel/train.py:143-154)
            min_loss_val = float(restored["extra"].get("min_loss_val", float("inf")))
            patience_counter = int(restored["extra"].get("patience_counter", 0))
            if restored["extra"].get("batch_stats"):
                self._batch_stats = restore_into(self._batch_stats, restored["extra"]["batch_stats"])

        rng = dropout_key(self.seed + 1, cfg.get_path("tpu.dropout_prng", None))
        history = {"loss_values": [], "val_loss_values": []}
        viz_each_epoch = bool(cfg.get_path("DEBUG.visualize_during_training", False))

        for epoch in range(start_epoch, epochs):
            t0 = time.perf_counter()
            state, loss_train = self.train_epoch(state, epoch, rng)
            loss_val = self.validate(state.params)
            if viz_each_epoch:
                # reference audio_mel/train.py:182 (shipped commented out there)
                self.visualize(state.params, self.data_val, epoch=epoch)
            dt = time.perf_counter() - t0
            history["loss_values"].append(loss_train)
            history["val_loss_values"].append(loss_val)

            extra = {
                "min_loss_val": min_loss_val,
                "patience_counter": patience_counter,
                # constant under the eval-BN quirk, but saved for bn_mode="train" runs
                "batch_stats": jax.tree.map(lambda x: np.asarray(jax.device_get(x)), self._batch_stats),
            }
            if save_ckpt:
                save_checkpoint(save_path, epoch=epoch, params=state.params, opt_state=state.opt_state, extra=extra)

            # schedule counts optimizer updates; state.step counts micro-steps
            accum = int(cfg.get_path("solver.grad_accum_steps", 1) or 1)
            lr = float(self._schedule((state.step - 1) // accum)) if self._schedule else float(cfg.solver.lr)
            self.logger.print(
                f"Epoch: {epoch}  Lr: {lr:.8f}  Loss: Train = [{loss_train:.3E}] - Val = [{loss_val:.3E}] ({dt:.1f}s)"
            )

            if early:
                if loss_val < min_loss_val:
                    min_loss_val = loss_val
                    patience_counter = 0
                    if restore_best:
                        save_checkpoint(
                            best_path, epoch=epoch, params=state.params, opt_state=state.opt_state,
                            extra={"min_loss_val": min_loss_val, "patience_counter": patience_counter},
                        )
                else:
                    patience_counter += 1
                    if patience_counter >= patience:
                        self.logger.print(f"Early stopping: patience {patience} reached")
                        if restore_best and os.path.exists(best_path):
                            best = load_checkpoint(best_path)
                            state = state.replace(params=restore_into(state.params, best["params"]))
                            if save_ckpt:
                                save_checkpoint(
                                    save_path, epoch=best["epoch"], params=state.params,
                                    opt_state=state.opt_state, extra=extra,
                                )
                            self.logger.print(f"Best model at epoch {best['epoch']} restored")
                        break

        self.logger.finish()
        return state, history

    # -- diagnostics ----------------------------------------------------------------

    def visualize(self, params, dataset, *, epoch: int = 0, out_dir: str = "visualization",
                  kind: str | None = None, batch_size: int = 32) -> dict:
        """The reference's ``visualize_model`` (audio_mel/train.py:282-342):
        embed the dataset, silhouette + PCA->t-SNE scatter written as
        visualization/{png,html}/visualization_{epoch}.{png,html}, uploaded
        to wandb as Image/Html when recording (train.py:333-339).  In the
        reference the per-epoch call is shipped commented out
        (train.py:182); here it is live behind DEBUG.visualize_during_training."""
        from mer_tpu.core.config import EMOTION_LABELS
        from mer_tpu.utils.viz import visualize_embeddings

        kind = kind or str(self.config.get_path("DEBUG.visualization_type", "2D"))
        emb = self.export_embeddings(dataset, params, batch_size=batch_size)
        out = visualize_embeddings(
            emb, dataset.get_labels(), out_dir, epoch=epoch, kind=kind,
            logger=self.logger, label_names=EMOTION_LABELS,
        )
        self.logger.print(f"Silhouette score: {out['silhouette']:.6f}")
        return out

    # -- export -------------------------------------------------------------------

    def export_embeddings(self, dataset, params, batch_size: int = 32) -> np.ndarray:
        """[N, 300] embeddings row-indexed by dataframe order
        (reference audio_mel/embeddings.py:61-80)."""
        params = jax.device_put(params)  # avoid per-call transfer of numpy trees
        n = len(dataset)
        out = np.zeros((n, self.model.embedding_size), dtype=np.float32)
        for i in range(0, n, batch_size):
            idx = np.arange(i, min(i + batch_size, n))
            pad = batch_size - len(idx)
            spec = dataset.spectrogram_batch(np.concatenate([idx, idx[-1:].repeat(pad)]) if pad else idx)
            emb = np.asarray(self._embed(params, spec))
            out[idx] = emb[: len(idx)]
        return out
