"""Generate a synthetic MELD-shaped data root (CSVs + tiny wavs) for smoke
runs without the real corpus: same schema, same wav layout, same corrupted
rows that get_text must filter.

Usage: python scripts/make_synthetic_meld.py [out_dir] [--dialogues N]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from mer_tpu.data.audio_io import save_wav

EMOTIONS = ["neutral", "joy", "sadness", "anger", "surprise", "fear", "disgust"]
SPLITS = {
    "train_sent_emo.csv": ("MELD.Raw/train_splits/wav", [(125, 3)]),
    "dev_sent_emo.csv": ("MELD.Raw/dev_splits_complete/wav", [(110, 7)]),
    "test_sent_emo.csv": ("MELD.Raw/output_repeated_splits_test/wav", [(38, 4), (220, 0)]),
}


def make_split(root: str, csv_name: str, wav_dir: str, corrupted, n_dialogues: int, rng) -> int:
    rows = []
    for dia in range(n_dialogues):
        for utt in range(int(rng.integers(1, 8))):
            rows.append(
                {
                    "Sr No.": len(rows) + 1,
                    "Utterance": f"synthetic utterance {dia}-{utt}",
                    "Speaker": "Synth",
                    "Emotion": EMOTIONS[int(rng.integers(0, 7))],
                    "Sentiment": "neutral",
                    "Dialogue_ID": dia,
                    "Utterance_ID": utt,
                    "Season": 1, "Episode": 1, "StartTime": "0", "EndTime": "1",
                }
            )
    for dia, utt in corrupted:
        rows.append({**rows[-1], "Dialogue_ID": dia, "Utterance_ID": utt, "Utterance": "corrupted"})

    df = pd.DataFrame(rows)
    os.makedirs(os.path.join(root, "MELD.Raw"), exist_ok=True)
    df.to_csv(os.path.join(root, "MELD.Raw", csv_name), index=False)

    out_dir = os.path.join(root, wav_dir)
    os.makedirs(out_dir, exist_ok=True)
    for _, row in df.iterrows():
        n = int(rng.integers(8000, 32000))
        f = float(rng.uniform(150, 800))
        wave = (0.4 * np.sin(2 * np.pi * f * np.arange(n) / 16000)
                + 0.05 * rng.normal(size=n)).astype(np.float32)
        save_wav(os.path.join(out_dir, f"dia{row.Dialogue_ID}_utt{row.Utterance_ID}.wav"), wave, 16000)
    return len(rows) - len(corrupted)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("out_dir", nargs="?", default="data_synth")
    p.add_argument("--dialogues", type=int, default=20)
    args = p.parse_args()

    rng = np.random.default_rng(0)
    for csv_name, (wav_dir, corrupted) in SPLITS.items():
        scale = {"train_sent_emo.csv": 1.0, "dev_sent_emo.csv": 0.4, "test_sent_emo.csv": 0.6}[csv_name]
        n = make_split(args.out_dir, csv_name, wav_dir, corrupted, max(int(args.dialogues * scale), 2), rng)
        print(f"{csv_name}: {n} utterances")
    print(f"Synthetic MELD root at {os.path.abspath(args.out_dir)}")


if __name__ == "__main__":
    main()
