"""Process-indexed data sharding for multi-host training.

The reference is single-process (SURVEY.md §2.2 — no torch.distributed
anywhere); on a TPU pod every host runs the same program and must feed its
own addressable devices a DISJOINT slice of the data.  Every batcher accepts
``process_index`` / ``process_count`` (defaulting to the live
``jax.process_index()`` / ``jax.process_count()``) and applies the same rule:

- all processes build the IDENTICAL global batch list (same seed, same
  shuffle — the per-instance RNGs are seeded, never drawn from global state),
- each process then takes the round-robin slice ``batches[index::count]``.

Disjointness and exhaustiveness are structural (a partition of the list) and
unit-tested in tests/test_data.py::TestProcessSharding.
"""

from __future__ import annotations

from typing import Sequence, TypeVar

T = TypeVar("T")


def resolve_process(process_index: int | None, process_count: int | None) -> tuple[int, int]:
    """Fill in defaults from the live jax runtime; validate.

    ``jax.process_count()`` initializes the backend; if the backend is
    unreachable (remote TPU service down) a data-layout question must not
    crash host-side code, so fall back to the single-process layout (0, 1)
    — correct for every non-pod run and the only safe answer when the
    runtime cannot be asked.
    """
    if process_count is None or process_index is None:
        try:
            import jax

            if process_count is None:
                process_count = jax.process_count()
            if process_index is None:
                process_index = jax.process_index()
        except Exception as e:
            # never degrade silently: on a real pod a transient backend error
            # resolving to (0, 1) would make every host iterate the FULL
            # global batch list (duplicated data, changed epoch semantics)
            import sys

            print(
                f"[mer_tpu] WARNING: jax process query failed ({type(e).__name__}: {e}); "
                "assuming single-process data layout (0, 1). Pass process_index/"
                "process_count explicitly on multi-host runs.",
                file=sys.stderr,
            )
            process_count = 1 if process_count is None else process_count
            process_index = 0 if process_index is None else process_index
    process_index = int(process_index)
    process_count = int(process_count)
    if process_count < 1:
        raise ValueError(f"process_count must be >= 1, got {process_count}")
    if not 0 <= process_index < process_count:
        raise ValueError(f"process_index {process_index} out of range for {process_count} processes")
    return process_index, process_count


def shard_batches(batches: Sequence[T], process_index: int, process_count: int) -> list[T]:
    """This process's round-robin slice of the global batch list."""
    return list(batches[process_index::process_count])


def local_num_batches(global_batches: int, process_index: int, process_count: int) -> int:
    """len(shard_batches(range(global_batches), ...)) without materializing."""
    return (global_batches - process_index + process_count - 1) // process_count
