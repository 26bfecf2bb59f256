"""Run logging: console + optional wandb.

Mirrors the reference's observability surface (SURVEY.md C31): per-batch
running loss, per-epoch lr/losses/accuracy/weighted-F1, wandb init/resume by
run id (src/train.py:59-72,176-184,235-240), model watching
(``wandb.watch(model, log="all", log_freq=100)``, src/train.py:132-138 and
the same block in every FE trainer), and image/HTML artifact uploads
(audio_mel/train.py:335-339).  wandb is an optional dependency — when absent
or disabled everything degrades to console prints / no-ops.
Also logs step time / throughput, which the reference lacks.

Watching, the TPU way: torch's ``wandb.watch`` installs backward hooks that
stream full gradient/parameter histograms off the graph.  Under jit there are
no hooks — instead the solvers compile a *watched* train-step variant that
additionally returns per-parameter L2 norms (computed on device, a few
hundred scalars), invoked only every ``log_freq``-th step so the steady-state
step stays donation-friendly and transfer-free.
"""

from __future__ import annotations

from datetime import datetime
from typing import Any


def tree_norms(tree, prefix: str) -> dict:
    """Per-leaf L2 norms of a pytree, keyed ``{prefix}/{path}`` — the jit-side
    analog of wandb.watch's per-parameter histograms (norms summarize the
    distribution at ~1e-3 of the transfer cost). Traceable: call inside jit."""
    import jax
    import jax.numpy as jnp

    out = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        name = "/".join(
            str(getattr(k, "key", getattr(k, "idx", k))) for k in path
        )
        out[f"{prefix}/{name}"] = jnp.sqrt(jnp.sum(jnp.square(leaf.astype(jnp.float32))))
    return out


def watch_norms(grads, params, watch_log: str) -> dict:
    """Norm dict for a train step, honoring the reference's ``log=`` modes
    ("gradients" | "parameters" | "all", src/train.py:136)."""
    norms = {}
    if watch_log in ("gradients", "all"):
        norms.update(tree_norms(grads, "gradients"))
    if watch_log in ("parameters", "all"):
        norms.update(tree_norms(params, "parameters"))
    return norms


class RunLogger:
    def __init__(self, config=None):
        self._wandb = None
        self._global_step = 0
        self._epoch_steps = 0
        self._watch_model = False
        self.watch_log = "all"
        self.watch_freq = 100
        wandb_cfg = config.get("wandb") if config is not None else None
        if wandb_cfg:
            # wandb.watch parity knobs (reference src/train.py:132-138:
            # log="all", log_freq=100; every trainer config ships watch_model)
            self._watch_model = bool(wandb_cfg.get("watch_model", False))
            self.watch_log = str(wandb_cfg.get("watch_log", "all"))
            self.watch_freq = int(wandb_cfg.get("watch_log_freq", 100))
        if wandb_cfg and wandb_cfg.get("enabled", False):
            try:
                import wandb

                resume_run = bool(wandb_cfg.get("resume_run", False))
                wandb.init(
                    project=wandb_cfg.get("project_name", "mer-tpu"),
                    name=datetime.now().isoformat().split(".")[0],
                    config=config.to_dict() if hasattr(config, "to_dict") else dict(config or {}),
                    entity=wandb_cfg.get("entity") or None,
                    resume="must" if resume_run else False,
                    id=wandb_cfg.get("resume_run_id") or None,
                )
                self._wandb = wandb
            except ImportError:
                print("wandb enabled in config but not installed; falling back to console logging")

    @property
    def wants_step_logs(self) -> bool:
        """Per-step running-loss logging forces a device sync per batch; only
        worth paying when wandb is actually recording it."""
        return self._wandb is not None

    @property
    def wants_watch_logs(self) -> bool:
        """True when the solvers should compile + periodically invoke the
        watched train-step variant (wandb.watch analog)."""
        return self._wandb is not None and self._watch_model

    def log_watch(self, norms: dict) -> None:
        """Log a dict of on-device norm scalars from a watched train step."""
        if self._wandb is not None:
            self._wandb.log({k: float(v) for k, v in norms.items()})

    def log_image(self, key: str, path: str) -> None:
        """wandb.Image upload (reference audio_mel/train.py:337)."""
        if self._wandb is not None:
            self._wandb.log({key: [self._wandb.Image(path)]})

    def log_html(self, key: str, path: str) -> None:
        """wandb.Html upload (reference audio_mel/train.py:339)."""
        if self._wandb is not None:
            self._wandb.log({key: [self._wandb.Html(path)]})

    def print(self, msg: str) -> None:
        print(msg)

    def log_step(self, running_loss: float) -> None:
        self._global_step += 1
        if self._wandb is not None:
            self._wandb.log({"Train/Running_loss": running_loss, "Params/Global_step": self._global_step})

    def log_epoch(self, epoch: int, *, lr: float, loss_train: float, loss_val: float,
                  accuracy: float, weighted_f1: float, epoch_seconds: float | None = None,
                  extra: dict[str, Any] | None = None) -> None:
        line = (
            f"Epoch: {epoch} lr: {lr:.3E} Train=[{loss_train:.3E}] Val=[{loss_val:.3E}] "
            f"Accuracy=[{accuracy * 100:.3f}%] Weighted_F1=[{weighted_f1 * 100:.3f}%]"
        )
        if epoch_seconds is not None:
            line += f" ({epoch_seconds:.1f}s)"
        print(line)
        if self._wandb is not None:
            payload = {
                "Params/Epoch": epoch,
                "Params/Learning_Rate": lr,
                "Train/Loss": loss_train,
                "Validation/Loss": loss_val,
                "Validation/Accuracy": accuracy,
                "Validation/Weighted_F1": weighted_f1,
            }
            if epoch_seconds is not None:
                payload["Perf/Epoch_seconds"] = epoch_seconds
            if extra:
                payload.update(extra)
            self._wandb.log(payload)

    def finish(self) -> None:
        if self._wandb is not None:
            self._wandb.finish()
