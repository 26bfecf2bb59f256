"""Embedding artifact store.

The reference's stage-1 -> stage-2 contract is a pickled ``torch.FloatTensor``
of shape [N, D] at ``embeddings/<name>/{train,val,test}.pkl``, row-indexed by
the ``get_text`` dataframe order (reference: text/embeddings.py:69-93,
audio_wav2vec2/embeddings.py:68-94, audio_mel/embeddings.py:61-80; consumed at
src/dataset.py:14-17).

This module keeps layout parity while making the artifacts readable without
torch: we can read both torch-pickles (when torch is importable) and plain
numpy pickles, and we write torch-compatible pickles when torch is available
(so the reference's own src/dataset.py can consume our artifacts) with a
numpy fallback otherwise.
"""

from __future__ import annotations

import os
import pickle
from typing import Any

import numpy as np


def _to_numpy(obj: Any) -> np.ndarray:
    """Convert an unpickled embedding table (torch tensor or ndarray) to float32 numpy."""
    if isinstance(obj, np.ndarray):
        return np.asarray(obj, dtype=np.float32)
    # torch.Tensor without importing torch at module scope
    if type(obj).__module__.startswith("torch"):
        return obj.detach().cpu().numpy().astype(np.float32)
    raise TypeError(f"Unsupported embedding artifact type: {type(obj)!r}")


def load_embeddings(path: str | os.PathLike) -> np.ndarray:
    """Load an [N, D] embedding table from a reference-layout pickle."""
    with open(path, "rb") as f:
        obj = pickle.load(f)
    arr = _to_numpy(obj)
    if arr.ndim != 2:
        raise ValueError(f"Expected [N, D] embeddings at {path}, got shape {arr.shape}")
    return arr


def save_embeddings(path: str | os.PathLike, embeddings: np.ndarray, torch_compatible: bool = True) -> None:
    """Save an [N, D] float32 table in the reference pickle layout.

    When ``torch_compatible`` and torch is importable, writes a pickled
    ``torch.FloatTensor`` exactly like the reference exporters do
    (text/embeddings.py:86-90); otherwise writes a numpy array pickle.
    """
    arr = np.ascontiguousarray(np.asarray(embeddings, dtype=np.float32))
    payload: Any = arr
    if torch_compatible:
        try:
            import torch  # local import: torch is host-side only in this framework

            payload = torch.from_numpy(arr.copy())
        except ImportError:
            pass
    os.makedirs(os.path.dirname(os.path.abspath(os.fspath(path))), exist_ok=True)
    with open(path, "wb") as f:
        pickle.dump(payload, f)


def embeddings_path(base_dir: str | os.PathLike, mode: str) -> str:
    """``embeddings/<name>`` + mode -> ``embeddings/<name>/<mode>.pkl``."""
    return os.path.join(os.path.abspath(os.fspath(base_dir)), f"{mode}.pkl")
