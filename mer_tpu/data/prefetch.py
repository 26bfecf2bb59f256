"""Double-buffered host -> device input pipeline.

Replaces the reference's ``DataLoader(num_workers=2, pin_memory=True)``
(src/config.yaml:56-75).  A background thread runs the (numpy) batcher and
eagerly transfers batches to device memory — optionally with a
``jax.sharding.Sharding`` so each batch lands pre-sharded across the mesh —
while the previous step computes.  ``buffer_size=2`` gives classic double
buffering; transfers overlap compute because ``jax.device_put`` is async.
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Iterable, Iterator

import jax


class DevicePrefetcher:
    """Wrap a host batch iterable; yield device-resident batches."""

    def __init__(self, batches: Iterable[Any], sharding=None, buffer_size: int = 2):
        self._batches = batches
        self._sharding = sharding
        self._buffer_size = max(1, buffer_size)

    def _put(self, batch: Any) -> Any:
        if self._sharding is not None:
            return jax.tree.map(lambda x: jax.device_put(x, self._sharding), batch)
        return jax.tree.map(jax.device_put, batch)

    def __iter__(self) -> Iterator[Any]:
        q: queue.Queue = queue.Queue(maxsize=self._buffer_size)
        sentinel = object()
        error: list[BaseException] = []

        def producer() -> None:
            try:
                for batch in self._batches:
                    q.put(self._put(batch))
            except BaseException as e:  # propagate into the consumer
                error.append(e)
            finally:
                q.put(sentinel)

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()

        while True:
            item = q.get()
            if item is sentinel:
                break
            yield item
        thread.join()
        if error:
            raise error[0]


def prefetch(batches: Iterable[Any], sharding=None, buffer_size: int = 2) -> Iterator[Any]:
    return iter(DevicePrefetcher(batches, sharding=sharding, buffer_size=buffer_size))
