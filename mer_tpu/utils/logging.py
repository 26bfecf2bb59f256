"""Run logging: console + optional wandb.

Mirrors the reference's observability surface (SURVEY.md C31): per-batch
running loss, per-epoch lr/losses/accuracy/weighted-F1, wandb init/resume by
run id (src/train.py:59-72,176-184,235-240).  wandb is an optional
dependency — when absent or disabled everything degrades to console prints.
Also logs step time / throughput, which the reference lacks.
"""

from __future__ import annotations

from datetime import datetime
from typing import Any


class RunLogger:
    def __init__(self, config=None):
        self._wandb = None
        self._global_step = 0
        self._epoch_steps = 0
        wandb_cfg = config.get("wandb") if config is not None else None
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
