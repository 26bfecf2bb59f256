"""MELD raw-table loading and text cleaning.

Behavior-parity port of the reference's ``get_text`` (src/utils.py:33-76,
duplicated verbatim in the three feature-extractor utils) and
``get_utterance_with_context`` (src/feature_extractors/text/utils.py:61-92):

- reads {train,dev,test}_sent_emo.csv with columns
  Utterance / Emotion / Dialogue_ID / Utterance_ID
- drops the 4 corrupted clips (train dia125_utt3, val dia110_utt7,
  test dia38_utt4 and dia220_utt0)
- fixes cp1252 mojibake characters to proper UTF-8
- resulting sizes: train 9988, val 1108, test 2608 utterances

Context building for the text feature extractor produces
``prev <sep> current <sep> next`` strings with boundary handling identical to
the reference (leading/trailing separator when there is no neighbor).
"""

from __future__ import annotations

import os

import pandas as pd

from mer_tpu.core.config import EMOTION_LABELS

_SPLIT_CSV = {
    "train": "train_sent_emo.csv",
    "val": "dev_sent_emo.csv",
    "test": "test_sent_emo.csv",
}

# Corrupted multimedia clips removed per split (reference src/utils.py:53-59).
_CORRUPTED = {
    "train": [(125, 3)],
    "val": [(110, 7)],
    "test": [(38, 4), (220, 0)],
}

# cp1252 -> utf-8 character fixes (reference src/utils.py:63-74).
_CP1252_TO_UTF8 = {
    "\x85": "…",  # HORIZONTAL ELLIPSIS
    "\x91": "‘",  # LEFT SINGLE QUOTATION MARK
    "\x92": "’",  # RIGHT SINGLE QUOTATION MARK
    "\x93": "“",  # LEFT DOUBLE QUOTATION MARK
    "\x94": "”",  # RIGHT DOUBLE QUOTATION MARK
    "\x96": "–",  # EN DASH
    "\x97": "—",  # EM DASH
    "\xa0": " ",       # NO-BREAK SPACE
}


def get_text(mode: str = "train", data_root: str | None = None) -> pd.DataFrame:
    """Load the canonical utterance table for a split.

    Args:
        mode: "train" | "val" | "test".
        data_root: directory containing MELD.Raw (defaults to ./data).
    """
    if mode not in _SPLIT_CSV:
        raise ValueError(f"Invalid mode {mode}")

    root = os.path.join(os.path.abspath(data_root or "data"), "MELD.Raw")
    data_path = os.path.join(root, _SPLIT_CSV[mode])
    if not os.path.exists(data_path):
        raise FileNotFoundError(f"Dataset not found at {data_path}")

    df = pd.read_csv(data_path, usecols=["Utterance", "Emotion", "Dialogue_ID", "Utterance_ID"])

    for dia, utt in _CORRUPTED[mode]:
        df = df[(df["Dialogue_ID"] != dia) | (df["Utterance_ID"] != utt)]
    df = df.reset_index(drop=True)

    def _fix(s: str) -> str:
        for bad, good in _CP1252_TO_UTF8.items():
            s = s.replace(bad, good)
        return s

    df["Utterance"] = df["Utterance"].map(_fix)
    return df


def map_emotions(df: pd.DataFrame) -> pd.DataFrame:
    """Map emotion strings to class indices in place (reference src/dataset.py:22-23)."""
    df = df.copy()
    df["Emotion"] = df["Emotion"].map(EMOTION_LABELS)
    return df


def get_utterance_with_context(df: pd.DataFrame, idx: int, separator: str) -> str:
    """Build ``prev <sep> current <sep> next`` within the same dialogue.

    Parity with reference text/utils.py:61-92: neighbors are resolved by
    sorted Utterance_ID order inside the dialogue; a missing neighbor leaves
    a bare separator on that side.
    """
    main_row = df.iloc[idx]
    dialogue_id = int(main_row["Dialogue_ID"])
    main_utt_id = int(main_row["Utterance_ID"])

    dialogue = df[df["Dialogue_ID"] == dialogue_id]
    dia_utt_ids = sorted(dialogue["Utterance_ID"].to_list())
    pos = dia_utt_ids.index(main_utt_id)
    prev_id = dia_utt_ids[pos - 1] if pos > 0 else None
    next_id = dia_utt_ids[pos + 1] if pos < len(dia_utt_ids) - 1 else None

    text = str(main_row["Utterance"])
    if prev_id is not None:
        prev_text = dialogue[dialogue["Utterance_ID"] == prev_id].iloc[0]["Utterance"]
        text = f"{prev_text} {separator} {text}"
    else:
        text = f"{separator} {text}"

    if next_id is not None:
        next_text = dialogue[dialogue["Utterance_ID"] == next_id].iloc[0]["Utterance"]
        text = f"{text} {separator} {next_text}"
    else:
        text = f"{text} {separator}"

    return text


def dialogue_index(df: pd.DataFrame) -> dict[int, list[int]]:
    """Map Dialogue_ID -> list of df row indices sorted by Utterance_ID.

    This replaces the reference's per-item pandas scans
    (src/dataset.py:32-59) with a one-shot index so dataset construction is
    O(N) instead of O(N^2).
    """
    out: dict[int, list[int]] = {}
    order = df.sort_values(["Dialogue_ID", "Utterance_ID"])
    for row_idx, dia in zip(order.index.to_list(), order["Dialogue_ID"].to_list()):
        out.setdefault(int(dia), []).append(int(row_idx))
    return out
