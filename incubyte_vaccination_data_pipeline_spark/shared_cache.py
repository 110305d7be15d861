"""Bounded keyed cache for per-(app, sf_dir) shared query state.

Several catalog queries share expensive intermediates — the MinHash
candidate-pair frame (dedup_minhash_lsh / dedup_clusters), the exact
ANN top-k twin (ann_bruteforce_topk / both recall certificates), the
IVF coarse quantizer. Keys include the corpus directory, so a
long-lived session that touches many corpora (the portability-fuzz
suite runs the dedup family over per-seed temp dirs; a notebook user
may loop over datasets) would otherwise accumulate persisted frames
without bound. LRU-bounded; evicted DataFrames are unpersisted.
"""

from __future__ import annotations

from collections import OrderedDict
from collections.abc import Callable
from typing import Any


#: every BoundedCache and registered dict cache, for the cross-corpus
#: release sweep (bench between scale factors, notebook dataset loops)
_ALL_CACHES: list[Any] = []


def register_dict_cache(d: dict) -> dict:
    """Track a plain-dict frame cache so :func:`release_shared_state`
    can sweep it alongside the BoundedCaches."""
    _ALL_CACHES.append(d)
    return d


def _unpersist(value: Any) -> None:
    if isinstance(value, (tuple, list)):
        # composite cache entries (frame, metadata) — release each part
        for v in value:
            _unpersist(v)
        return
    if hasattr(value, "unpersist"):
        try:
            value.unpersist()
        except Exception:
            pass  # session already stopped; nothing to release


def _key_matches(key: Any, sf_dir: str) -> bool:
    # exact element equality: every cache keys the corpus dir as a
    # standalone tuple element, and substring matching would sweep a
    # sibling corpus whose path merely contains sf_dir (e.g. a
    # "<sf_dir>_10x" stress scratch)
    parts = key if isinstance(key, tuple) else (key,)
    return any(p == sf_dir for p in parts)


def release_shared_state(sf_dir: str | None = None) -> int:
    """Unpersist and drop every cached shared frame — all of them, or
    only entries keyed to ``sf_dir``. The explicit sweep between bench
    scale factors / dataset switches: BoundedCache bounds entry COUNT,
    but persisted RDDs pin executor storage memory until eviction;
    a corpus the session is done with should release immediately.
    Returns the number of entries dropped."""
    n = 0
    for cache in _ALL_CACHES:
        entries = cache._entries if isinstance(cache, BoundedCache) else cache
        for key in list(entries):
            if sf_dir is None or _key_matches(key, sf_dir):
                _unpersist(entries.pop(key))
                n += 1
    return n


class BoundedCache:
    def __init__(self, max_entries: int = 8):
        self._entries: OrderedDict[Any, Any] = OrderedDict()
        self._max = max_entries
        _ALL_CACHES.append(self)

    def get_or_build(self, key: Any, build: Callable[[], Any]) -> Any:
        if key in self._entries:
            self._entries.move_to_end(key)
            return self._entries[key]
        value = build()
        self._entries[key] = value
        while len(self._entries) > self._max:
            _, evicted = self._entries.popitem(last=False)
            _unpersist(evicted)
        return value

    def __len__(self) -> int:
        return len(self._entries)
