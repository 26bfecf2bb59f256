"""Break the mel metric-learning step (bench_all: mel_hard_mining_ms_per_step)
into its legs on the real chip: hard-mining (pool embed + selection),
triplet-batch gather, and the [3B] fwd+bwd+Adam train step.
"""

import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

import numpy as np

import jax

from mer_tpu.core import Config
from mer_tpu.data import MelFeatureDataset
from mer_tpu.models.resnet import AudioMelFeatureExtractor
from mer_tpu.train import MelSolver


def main():
    data_root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/meldbig"
    cfg = Config(
        {
            "DEBUG": {"enabled": False},
            "AUDIO": {"ffmpeg_sr": 16000, "wav2vec_sr": 16000, "max_duration": 10.0, "augmentation_factor": 1},
            "checkpoint": {"save_path": "/tmp/bench_mel/c.ckpt", "save_checkpoint": False, "load_checkpoint": False},
            "solver": {
                "len_triplet_picking": 100, "mining_type": "hard",
                "adaptive_triplet_margin_loss": True, "covariance_loss": True, "variance_loss": True,
                "lr": 1e-4, "weight_decay": 0.0, "epochs": 1,
                "scheduler": {"enabled": False}, "early_stopping": {"enabled": False},
            },
            "train": {"data_loader": {"shuffle": True, "batch_size": 32}},
            "val": {"data_loader": {"shuffle": False, "batch_size": 32}},
            "wandb": {"enabled": False},
        }
    )
    train = MelFeatureDataset("train", cfg, data_root=data_root)
    val = MelFeatureDataset("val", cfg, data_root=data_root)
    solver = MelSolver(AudioMelFeatureExtractor(), cfg, train, val)
    state = solver.init_state()

    # warmup every program (note: _miner must be re-bound to the live params
    # every step — _train_step donates the previous params buffers)
    miner = solver._miner(train, state.params)
    a, p, n = miner.mine(32, "hard")
    spec = solver._fetch_triplet_batch(train, a, p, n)
    state, loss = solver._train_step(state, spec)
    np.asarray(loss)

    iters = 20
    t_mine = t_fetch = t_step = 0.0
    for i in range(iters):
        t0 = time.perf_counter()
        miner = solver._miner(train, state.params)
        a, p, n = miner.mine(32, "hard")  # includes pool embed + host fetch of indices
        t1 = time.perf_counter()
        spec = solver._fetch_triplet_batch(train, a, p, n)
        jax.block_until_ready(spec)
        t2 = time.perf_counter()
        state, loss = solver._train_step(state, spec)
        lv = float(loss)  # execution-verified
        t3 = time.perf_counter()
        t_mine += t1 - t0
        t_fetch += t2 - t1
        t_step += t3 - t2
    print(f"mine:  {t_mine / iters * 1e3:7.1f} ms")
    print(f"fetch: {t_fetch / iters * 1e3:7.1f} ms")
    print(f"step:  {t_step / iters * 1e3:7.1f} ms")
    print(f"total: {(t_mine + t_fetch + t_step) / iters * 1e3:7.1f} ms  (loss={lv:.3e})")


if __name__ == "__main__":
    main()
