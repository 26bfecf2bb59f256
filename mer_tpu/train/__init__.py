from mer_tpu.train.checkpoint import (
    AsyncCheckpointer, load_checkpoint, load_checkpoint_auto,
    load_checkpoint_sharded, remove_checkpoint, restore_into,
    save_checkpoint, save_checkpoint_auto, save_checkpoint_sharded,
)
from mer_tpu.train.fe_solver import FESolver
from mer_tpu.train.mel_solver import MelSolver
from mer_tpu.train.solver import (
    Solver,
    TrainState,
    constant_with_warmup,
    exponential_lr,
    optimizer_from_config,
    torch_adam,
    torch_adamw,
)

__all__ = [
    "Solver",
    "FESolver",
    "MelSolver",
    "TrainState",
    "torch_adam",
    "torch_adamw",
    "exponential_lr",
    "constant_with_warmup",
    "optimizer_from_config",
    "save_checkpoint",
    "save_checkpoint_sharded",
    "load_checkpoint_sharded",
    "load_checkpoint_auto",
    "save_checkpoint_auto",
    "remove_checkpoint",
    "AsyncCheckpointer",
    "load_checkpoint",
    "restore_into",
]
