"""Host-side tile prefetching.

The reference overlaps I/O with compute by returning TensorStore read
futures (`qi2labDataStore._load_from_zarr_array:2239-2269`) and running
one OS process per GPU. Here a small thread pool keeps the next tiles'
zarr reads (C++ TensorStore, GIL-releasing) in flight while the TPU
processes the current tile — the host/device double-buffering half of the
pipeline (SURVEY.md §2.9 "Pipeline parallelism" row).
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Iterator, Sequence, TypeVar

T = TypeVar("T")


class TilePrefetcher:
    """Iterate ``(index, load_fn(index))`` with ``depth`` loads in flight."""

    def __init__(
        self,
        load_fn: Callable[[int], T],
        indices: Sequence[int],
        depth: int = 2,
        max_workers: int = 4,
    ):
        self._load_fn = load_fn
        self._indices = list(indices)
        self._depth = max(1, depth)
        self._pool = ThreadPoolExecutor(max_workers=max_workers)

    def __iter__(self) -> Iterator[tuple[int, T]]:
        futures = {}
        try:
            for i in self._indices[: self._depth]:
                futures[i] = self._pool.submit(self._load_fn, i)
            for pos, i in enumerate(self._indices):
                nxt = pos + self._depth
                if nxt < len(self._indices):
                    j = self._indices[nxt]
                    futures[j] = self._pool.submit(self._load_fn, j)
                yield i, futures.pop(i).result()
        finally:
            for f in futures.values():
                f.cancel()
            self._pool.shutdown(wait=False)
