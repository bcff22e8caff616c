"""Small loader-backed LRU cache shared by the streaming fusion pass and
the interactive viewer (bounded host RAM for repeated volume loads)."""

from __future__ import annotations

from collections import OrderedDict
from typing import Callable, Generic, Hashable, Optional, TypeVar

T = TypeVar("T")


class LoaderCache(Generic[T]):
    """LRU of ``capacity`` loader results keyed by an arbitrary hashable.

    ``get(key)`` uses the constructor's loader; ``get(key, loader)``
    overrides per call. ``None`` results are cached too (a missing volume
    stays missing — don't re-read zarr metadata for it every chunk).
    """

    def __init__(
        self,
        loader: Optional[Callable[..., Optional[T]]] = None,
        capacity: int = 4,
    ):
        self._loader = loader
        self._capacity = max(1, int(capacity))
        self._cache: OrderedDict[Hashable, Optional[T]] = OrderedDict()

    def get(
        self, key: Hashable, loader: Optional[Callable[[], Optional[T]]] = None
    ) -> Optional[T]:
        if key in self._cache:
            self._cache.move_to_end(key)
            return self._cache[key]
        if loader is not None:
            value = loader()
        elif self._loader is not None:
            value = self._loader(key)
        else:
            raise ValueError("no loader provided")
        self._cache[key] = value
        while len(self._cache) > self._capacity:
            self._cache.popitem(last=False)
        return value
