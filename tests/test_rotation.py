"""The least-recently-verified registration rotation (catalog/verify_rotation).

The external driver only value-checks the first 50 registered queries
per round; these tests pin the invariants the rotation promises:
never-verified queries lead, staleness ordering is ascending, the sort
is stable, and the repo's committed state file agrees with the driver's
CORRECTNESS history.
"""

from __future__ import annotations

import json

from incubyte_vaccination_data_pipeline_spark import catalog
from incubyte_vaccination_data_pipeline_spark.catalog import verify_rotation as vr


def test_rotation_order_never_verified_first():
    rounds = {"a": 2, "b": 1, "d": 1}
    assert vr.rotation_order(["a", "b", "c", "d"], rounds) == ["c", "b", "d", "a"]


def test_rotation_order_stable_within_round():
    rounds = {"x": 1, "y": 1, "z": 1}
    assert vr.rotation_order(["z", "x", "y"], rounds) == ["z", "x", "y"]


def test_state_file_matches_driver_history():
    committed = vr.load_state()
    rebuilt = vr.rebuild_verified_rounds()
    assert committed == rebuilt, (
        "verified_rounds.json is stale — run "
        "python -m incubyte_vaccination_data_pipeline_spark.catalog.verify_rotation"
    )


def test_catalog_registration_is_lrv_sorted():
    rounds = vr.rebuild_verified_rounds()  # the ordering source at import
    staleness = [rounds.get(n, 0) for n in catalog.QUERIES]
    assert staleness == sorted(staleness)
    # oracle dict ordering mirrors the query dict
    oracle_names = list(catalog.ORACLES)
    assert oracle_names == [n for n in catalog.QUERIES if n in catalog.ORACLES]


def test_window_covers_least_recently_verified():
    """Every query whose last driver row is oldest sits inside the
    50-slot window — i.e. no query is more than ceil(N/50) rounds from
    re-verification."""
    rounds = vr.rebuild_verified_rounds()
    names = list(catalog.QUERIES)
    window = set(names[:50])
    max_in_window = max(rounds.get(n, 0) for n in names[:50])
    for n in names[50:]:
        assert rounds.get(n, 0) >= max_in_window or n in window


def test_every_query_has_an_oracle():
    """Round-3 invariant: zero rows-only queries. Every registered
    query carries a DuckDB oracle — approximate/stateful/decoder
    operators do it via in-query boolean certificates the oracle
    states as literal TRUE. A new query without an oracle is a
    regression, not a style choice."""
    assert set(catalog.QUERIES) == set(catalog.ORACLES)


def test_bench_compact_line_fits_driver_tail():
    """The driver records only the last 2000 chars of bench stdout;
    the final line bench prints must parse from within that window,
    even with every real catalog query name in the timing map."""
    import json as _json

    import bench

    timings = {name: 123.4567 for name in catalog.QUERIES}
    payload = {
        "metric": "total_headline_query_sec",
        "value": 12345.6789,
        "unit": "sec",
        "queries": timings,
        "sf": 0.1,
    }
    line = _json.dumps(bench.compact_payload(payload, timings))
    assert len(line) < bench.DRIVER_TAIL_CHARS - 100, (
        f"compact bench line too long for the driver tail: {len(line)}"
    )
    assert _json.loads(line)["n_queries"] == len(catalog.QUERIES)


def test_bounded_cache_evicts_and_unpersists():
    from incubyte_vaccination_data_pipeline_spark.catalog.shared_cache import BoundedCache

    class Frame:
        def __init__(self):
            self.released = False

        def unpersist(self):
            self.released = True

    cache = BoundedCache(max_entries=2)
    frames = [Frame() for _ in range(3)]
    for i, f in enumerate(frames):
        assert cache.get_or_build(i, lambda f=f: f) is f
    # LRU: key 0 evicted and unpersisted; 1 and 2 retained
    assert frames[0].released and not frames[1].released and not frames[2].released
    assert len(cache) == 2
    # hit moves to end and builds nothing new
    assert cache.get_or_build(1, lambda: Frame()) is frames[1]


def test_load_state_tolerates_missing_file(tmp_path):
    assert vr.load_state(tmp_path / "nope.json") == {}
    bad = tmp_path / "bad.json"
    bad.write_text("[1,2,3]")
    assert vr.load_state(bad) == {}


def test_rebuild_counts_any_row_kind(tmp_path):
    (tmp_path / "CORRECTNESS_r01.json").write_text(
        json.dumps({"q_green": {"hash_match": True}, "q_weak": {"err": "no_oracle"}})
    )
    (tmp_path / "CORRECTNESS_r02.json").write_text(
        json.dumps({"q_green": {"hash_match": True}})
    )
    rounds = vr.rebuild_verified_rounds(tmp_path)
    assert rounds == {"q_green": 2, "q_weak": 1}
