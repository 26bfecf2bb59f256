"""Generate a synthetic MELD-shaped data root (CSVs + tiny wavs) for smoke
runs without the real corpus: same schema, same wav layout, same corrupted
rows that get_text must filter.

Usage: python scripts/make_synthetic_meld.py [out_dir] [--dialogues N]
       python scripts/make_synthetic_meld.py [out_dir] --meld-shape

``--meld-shape`` generates a TEST split with the real MELD test statistics
(280 dialogues / exactly 2608 usable utterances after the corrupted-clip
filter, reference src/utils.py:53-59; durations lognormal, mean ~3.2 s,
clipped to the 10 s training truncation) — the production-shaped split the
e2e benchmark legs run on (train/dev stay tiny; only test is benched).
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


def make_meld_shaped_test(root: str, rng) -> int:
    """The real MELD test shape: 280 dialogues, 2610 raw rows of which the
    two corrupted clips (dia38_utt4, dia220_utt0 — reference
    src/utils.py:57-59) are filtered, leaving exactly 2608 usable
    utterances. Durations ~lognormal(mean 3.2 s) clipped to [0.5, 10] s."""
    wav_dir, _ = SPLITS["test_sent_emo.csv"]
    n_dialogues, target_rows = 280, 2610

    counts = rng.integers(1, 18, size=n_dialogues)
    counts[38] = max(counts[38], 5)    # dia38 must contain utt 4
    while counts.sum() != target_rows:  # nudge to the exact row count
        i = int(rng.integers(0, n_dialogues))
        step = 1 if counts.sum() < target_rows else -1
        if 1 <= counts[i] + step <= 33 and not (i == 38 and counts[i] + step < 5):
            counts[i] += step

    rows = []
    for dia in range(n_dialogues):
        for utt in range(int(counts[dia])):
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
    df = pd.DataFrame(rows)
    os.makedirs(os.path.join(root, "MELD.Raw"), exist_ok=True)
    df.to_csv(os.path.join(root, "MELD.Raw", "test_sent_emo.csv"), index=False)

    out_dir = os.path.join(root, wav_dir)
    os.makedirs(out_dir, exist_ok=True)
    corrupted = {(38, 4), (220, 0)}
    for _, row in df.iterrows():
        if (row.Dialogue_ID, row.Utterance_ID) in corrupted:
            continue  # filtered before load; no wav needed
        dur = float(np.clip(rng.lognormal(1.0, 0.6), 0.5, 10.0))
        n = int(dur * 16000)
        f = float(rng.uniform(150, 800))
        wave = (0.4 * np.sin(2 * np.pi * f * np.arange(n) / 16000)
                + 0.05 * rng.normal(size=n)).astype(np.float32)
        save_wav(os.path.join(out_dir, f"dia{row.Dialogue_ID}_utt{row.Utterance_ID}.wav"), wave, 16000)
    return len(rows) - len(corrupted)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("out_dir", nargs="?", default="data_synth")
    p.add_argument("--dialogues", type=int, default=20)
    p.add_argument("--meld-shape", action="store_true",
                   help="MELD-test-statistics test split (280 dialogues / 2608 "
                        "usable utterances, realistic durations); train/dev tiny")
    args = p.parse_args()

    rng = np.random.default_rng(0)
    for csv_name, (wav_dir, corrupted) in SPLITS.items():
        if args.meld_shape and csv_name == "test_sent_emo.csv":
            n = make_meld_shaped_test(args.out_dir, rng)
        else:
            scale = {"train_sent_emo.csv": 1.0, "dev_sent_emo.csv": 0.4, "test_sent_emo.csv": 0.6}[csv_name]
            n_dia = 2 if args.meld_shape else max(int(args.dialogues * scale), 2)
            n = make_split(args.out_dir, csv_name, wav_dir, corrupted, n_dia, rng)
        print(f"{csv_name}: {n} utterances")
    print(f"Synthetic MELD root at {os.path.abspath(args.out_dir)}")


if __name__ == "__main__":
    main()
