"""Broadcast small side data (dimension tables, query matrices, vocab
maps) to every task/actor: `ray.put` ONCE on the driver, `ray.get`
inside the stage (zero-copy from the local plasma store) — never ship
the object per batch (ray_guide 'Joins and lookups')."""

from __future__ import annotations

from typing import Any


class Broadcast:
    """Wrapper so stages can take a broadcast handle in fn_kwargs without
    caring whether they run in the driver process (tests) or a worker.

    >>> bc = Broadcast.put(big_lookup_dict)
    >>> ds.map_batches(fn, fn_kwargs={"lookup": bc})
    ...     # inside fn: lookup.value
    """

    def __init__(self, ref):
        self._ref = ref
        self._cache: Any = None
        self._has = False

    @classmethod
    def put(cls, obj: Any) -> "Broadcast":
        import ray

        if ray.is_initialized():
            return cls(ray.put(obj))
        b = cls(None)
        b._cache, b._has = obj, True
        return b

    @property
    def value(self) -> Any:
        if not self._has:
            import ray

            self._cache = ray.get(self._ref)
            self._has = True
        return self._cache
