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


class BoundedCache:
    def __init__(self, max_entries: int = 8):
        self._entries: OrderedDict[Any, Any] = OrderedDict()
        self._max = max_entries

    def get_or_build(self, key: Any, build: Callable[[], Any]) -> Any:
        if key in self._entries:
            self._entries.move_to_end(key)
            return self._entries[key]
        value = build()
        self._entries[key] = value
        while len(self._entries) > self._max:
            _, evicted = self._entries.popitem(last=False)
            if hasattr(evicted, "unpersist"):
                try:
                    evicted.unpersist()
                except Exception:
                    pass  # session already stopped; nothing to release
        return value

    def __len__(self) -> int:
        return len(self._entries)
