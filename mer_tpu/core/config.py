"""Config system.

The reference uses per-pipeline YAML files parsed into ``Munch`` attribute
objects via a process-wide singleton (reference: src/utils.py:8-13 and the
three copies under src/feature_extractors/*/utils.py).  We keep the exact
same YAML schema (BASELINE.json requires "same config.yaml schema") but parse
into a small, dependency-free attribute-dict with:

- recursive attribute access (``config.solver.lr``)
- ``.get(key, default)`` so new TPU-only knobs (mesh shape, dtype, bucketing)
  can be added to YAML without breaking reference-schema files
- no global singleton requirement (but ``get_config(path)`` memoizes per-path
  to mirror the reference behavior of "load once")
"""

from __future__ import annotations

import copy
import os
from typing import Any, Iterator, Mapping

import yaml


class Config(dict):
    """A dict with attribute access, recursively applied. Minimal Munch."""

    def __init__(self, data: Mapping[str, Any] | None = None, **kwargs: Any):
        super().__init__()
        merged: dict[str, Any] = dict(data or {})
        merged.update(kwargs)
        for key, value in merged.items():
            self[key] = _wrap(value)

    # -- attribute protocol -------------------------------------------------
    def __getattr__(self, name: str) -> Any:
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setattr__(self, name: str, value: Any) -> None:
        self[name] = _wrap(value)

    def __delattr__(self, name: str) -> None:
        try:
            del self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    # -- helpers -------------------------------------------------------------
    def get_path(self, dotted: str, default: Any = None) -> Any:
        """``config.get_path("solver.scheduler.gamma", 0.98)``."""
        node: Any = self
        for part in dotted.split("."):
            if isinstance(node, Mapping) and part in node:
                node = node[part]
            else:
                return default
        return node

    def to_dict(self) -> dict[str, Any]:
        return {k: (v.to_dict() if isinstance(v, Config) else copy.deepcopy(v)) for k, v in self.items()}

    def __deepcopy__(self, memo: dict) -> "Config":
        return Config(self.to_dict())

    def override(self, **kwargs: Any) -> "Config":
        """Return a copy with dotted-key overrides applied."""
        out = Config(self.to_dict())
        for dotted, value in kwargs.items():
            parts = dotted.split("__")
            node: Any = out
            for part in parts[:-1]:
                if part not in node:
                    node[part] = Config()
                node = node[part]
            node[parts[-1]] = _wrap(value)
        return out


def _wrap(value: Any) -> Any:
    if isinstance(value, Config):
        return value
    if isinstance(value, Mapping):
        return Config(value)
    if isinstance(value, (list, tuple)):
        return type(value)(_wrap(v) for v in value)
    return value


_CONFIG_CACHE: dict[str, Config] = {}


def load_config(path: str | os.PathLike) -> Config:
    """Parse a YAML file into a Config (no caching)."""
    with open(path, "rt", encoding="utf-8") as f:
        raw = yaml.safe_load(f.read())
    return Config(raw or {})


def get_config(path: str | os.PathLike) -> Config:
    """Memoized YAML load, mirroring the reference's singleton get_config()
    (src/utils.py:8-13) but keyed by path so the four pipelines coexist."""
    key = os.path.abspath(os.fspath(path))
    if key not in _CONFIG_CACHE:
        _CONFIG_CACHE[key] = load_config(key)
    return _CONFIG_CACHE[key]


def clear_config_cache() -> None:
    _CONFIG_CACHE.clear()


# Emotion label vocabulary shared by every pipeline
# (reference: src/dataset.py:22, feature_extractors/*/dataset.py).
EMOTION_LABELS: dict[str, int] = {
    "neutral": 0,
    "joy": 1,
    "sadness": 2,
    "anger": 3,
    "surprise": 4,
    "fear": 5,
    "disgust": 6,
}
NUM_EMOTIONS = len(EMOTION_LABELS)
