"""Test configuration: run everything on a virtual 8-device CPU backend.

This is the standard JAX fake-backend trick for exercising DP/TP sharding
without TPU hardware (SURVEY.md §4d). Must run before the first jax import.
"""

import os

# Force-override: the machine environment pre-sets JAX_PLATFORMS to the TPU
# plugin; tests must run on the virtual CPU mesh regardless.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

import jax

# The axon TPU plugin ignores the env var in some paths; force via config too.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pandas as pd
import pytest


@pytest.fixture(scope="session")
def meld_like_root(tmp_path_factory):
    """A tiny synthetic MELD.Raw directory with the reference CSV schema,
    including the corrupted rows that get_text must drop and cp1252 bytes
    that it must fix."""
    root = tmp_path_factory.mktemp("data")
    raw = root / "MELD.Raw"
    raw.mkdir()

    rng = np.random.default_rng(0)
    emotions = ["neutral", "joy", "sadness", "anger", "surprise", "fear", "disgust"]

    def make_split(n_dialogues, corrupted, fname):
        rows = []
        for dia in range(n_dialogues):
            n_utt = int(rng.integers(1, 6))
            for utt in range(n_utt):
                rows.append(
                    {
                        "Sr No.": len(rows) + 1,
                        "Utterance": f"utt \x92{dia}\x92 number {utt}",
                        "Speaker": "A",
                        "Emotion": emotions[int(rng.integers(0, 7))],
                        "Sentiment": "neutral",
                        "Dialogue_ID": dia,
                        "Utterance_ID": utt,
                        "Season": 1,
                        "Episode": 1,
                        "StartTime": "0",
                        "EndTime": "1",
                    }
                )
        # ensure the corrupted rows exist so the filter has something to drop
        for dia, utt in corrupted:
            rows.append(
                {
                    "Sr No.": len(rows) + 1,
                    "Utterance": "corrupted",
                    "Speaker": "A",
                    "Emotion": "neutral",
                    "Sentiment": "neutral",
                    "Dialogue_ID": dia,
                    "Utterance_ID": utt,
                    "Season": 1,
                    "Episode": 1,
                    "StartTime": "0",
                    "EndTime": "1",
                }
            )
        pd.DataFrame(rows).to_csv(raw / fname, index=False)
        return len(rows) - len(corrupted)

    sizes = {
        "train": make_split(12, [(125, 3)], "train_sent_emo.csv"),
        "val": make_split(6, [(110, 7)], "dev_sent_emo.csv"),
        "test": make_split(8, [(38, 4), (220, 0)], "test_sent_emo.csv"),
    }
    return str(root), sizes


@pytest.fixture(scope="session")
def meld_like_root_with_wavs(meld_like_root):
    """Extends the synthetic MELD root with tiny 16 kHz wav clips for every
    utterance row in every split (reference wav layout,
    audio_mel/dataset.py:36-46)."""
    root, sizes = meld_like_root
    import pandas as pd

    from mer_tpu.data.audio_io import save_wav

    wav_dirs = {
        "train_sent_emo.csv": "MELD.Raw/train_splits/wav",
        "dev_sent_emo.csv": "MELD.Raw/dev_splits_complete/wav",
        "test_sent_emo.csv": "MELD.Raw/output_repeated_splits_test/wav",
    }
    rng = np.random.default_rng(42)
    for csv_name, wav_dir in wav_dirs.items():
        df = pd.read_csv(os.path.join(root, "MELD.Raw", csv_name))
        out_dir = os.path.join(root, wav_dir)
        os.makedirs(out_dir, exist_ok=True)
        for _, row in df.iterrows():
            n = int(rng.integers(4000, 12000))  # 0.25-0.75 s
            wave = (0.3 * np.sin(2 * np.pi * 440 * np.arange(n) / 16000)
                    + 0.05 * rng.normal(size=n)).astype(np.float32)
            save_wav(os.path.join(out_dir, f"dia{row.Dialogue_ID}_utt{row.Utterance_ID}.wav"), wave, 16000)
    return root, sizes
