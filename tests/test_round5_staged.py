"""Driver-style DuckDB side-by-side for the round-5 STAGED queries
(`catalog/round5_ext.py` — implemented now, registered next round so
they don't push the round-4 certificate queries out of the
verification window; same staging pattern as round 3's training_ext).
"""

from __future__ import annotations

import pandas as pd
import pytest

from incubyte_vaccination_data_pipeline_spark.catalog import round5_ext
from tests.test_oracle import _normalize, _values_equal


@pytest.fixture(scope="module")
def duck(sf_dir):
    import duckdb

    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    ]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


@pytest.mark.parametrize("name", sorted(round5_ext.STAGED))
def test_staged_query_matches_oracle(spark, sf_dir, duck, name):
    fn, oracle = round5_ext.STAGED[name]
    spark_df = _normalize(fn(spark, sf_dir).toPandas())
    duck_df = _normalize(duck.execute(oracle).df())
    assert len(spark_df) == len(duck_df), f"{name}: row counts differ"
    assert list(spark_df.columns) == list(duck_df.columns), f"{name}: columns"
    assert len(spark_df) > 0, f"{name}: vacuous (0 rows)"
    mism = [
        (c, i, a, b)
        for c in spark_df.columns
        for i, (a, b) in enumerate(zip(spark_df[c], duck_df[c]))
        if not _values_equal(a, b)
    ][:5]
    assert not mism, f"{name}: value mismatches {mism}"


def test_staged_registration_split():
    """Round-5 contract: the FULL staged family is live, and every
    staged query the driver has never recorded a row for sits inside
    the 50-slot window (the rotation sorts never-verified first).
    Derived from the live driver history — landing a newer
    CORRECTNESS file rotates queries out *after* they're verified, so
    this can never redden at a round boundary."""
    from incubyte_vaccination_data_pipeline_spark.catalog import QUERIES
    from incubyte_vaccination_data_pipeline_spark.catalog import (
        verify_rotation as vr,
    )

    assert set(round5_ext.STAGED) <= set(QUERIES), "staged queries not all live"
    hist = vr.rebuild_history()
    order = list(QUERIES)
    for n in round5_ext.STAGED:
        if n not in hist:  # no driver row ever -> must be in the window
            assert order.index(n) < vr.WINDOW, f"{n} outside the driver window"


def test_cms_bound_and_psi_semantics(spark, sf_dir):
    """CM estimates must dominate true counts on every reported row;
    PSI must be positive for the drifted status column (the mutation
    moves ~1% of statuses to 'X') and ~0 for the untouched price."""
    cms = round5_ext.agg_heavy_hitters_cms(spark, sf_dir).collect()
    assert len(cms) > 0 and all(r["bound_holds"] for r in cms)
    assert all(r["cm_estimate"] >= r["true_n"] for r in cms)

    psi = {r["col"]: r for r in
           round5_ext.quality_psi_drift_orders(spark, sf_dir).collect()}
    assert psi["o_orderstatus"]["psi"] > 0.0005, "status drift must register"
    # price distribution is untouched by the mutation (only keys drop /
    # duplicate) — PSI stays near zero
    assert abs(psi["o_totalprice"]["psi"]) < 0.01


def test_containment_finds_true_sources(spark, sf_dir):
    """Every derived snippet is a prefix of its source, so its best
    match must be the source doc with containment exactly 1.0."""
    rows = round5_ext.text_containment_dedup(spark, sf_dir).collect()
    assert len(rows) > 0
    for r in rows:
        assert r["matched_doc"] == r["sid"] - round5_ext._SNIP_OFFSET or (
            r["containment"] == 1.0
        ), r  # a different doc may win only by also containing it fully
    # and the overwhelming majority resolve to their own source
    own = sum(r["matched_doc"] == r["sid"] - round5_ext._SNIP_OFFSET for r in rows)
    assert own / len(rows) > 0.9


def test_dau_mau_hand_computed(spark, monkeypatch, tmp_path):
    """Two users: u1 active day 1, u2 active days 1 and 20. Day-1
    DAU=2 MAU=2; day-20 DAU=1, MAU=2 (u1's day-1 activity still
    inside the trailing 30-day window)."""
    import datetime as dt

    import incubyte_vaccination_data_pipeline_spark.sources.parquet_io as pio

    rows = [
        (1, dt.datetime(2024, 1, 1, 8), 1, "view", 0.0, "{}"),
        (2, dt.datetime(2024, 1, 1, 9), 2, "view", 0.0, "{}"),
        (3, dt.datetime(2024, 1, 20, 9), 2, "view", 0.0, "{}"),
    ]
    events = spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint,"
        " event_type string, value double, props string",
    )
    monkeypatch.setitem(
        pio._READ_CACHE,
        (spark.sparkContext.applicationId, str(tmp_path), "events"),
        events,
    )
    fn, _ = round5_ext.STAGED["events_dau_mau"]
    out = {r["day"]: r for r in fn(spark, str(tmp_path)).collect()}
    d = dt.date
    assert (out[d(2024, 1, 1)]["dau"], out[d(2024, 1, 1)]["mau"]) == (2, 2)
    assert (out[d(2024, 1, 20)]["dau"], out[d(2024, 1, 20)]["mau"]) == (1, 2)
    assert out[d(2024, 1, 20)]["stickiness"] == 0.5
    assert len(out) == 2  # only ACTIVE days appear, no dense spine


def test_asof_tolerance_hand_computed(spark, monkeypatch, tmp_path):
    """A purchase 5 min after a click attributes; one 20 min after
    nulls out (tolerance 600 s) but keeps within_tolerance=False."""
    import datetime as dt

    import incubyte_vaccination_data_pipeline_spark.sources.parquet_io as pio

    t = lambda m: dt.datetime(2024, 1, 1, 0, m)  # noqa: E731
    rows = [
        (1, t(0), 1, "click", 0.0, "{}"),
        (2, t(5), 1, "purchase", 0.0, "{}"),   # 300 s -> attributed
        (3, t(25), 1, "purchase", 0.0, "{}"),  # 1500 s -> nulled
    ]
    events = spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint,"
        " event_type string, value double, props string",
    )
    monkeypatch.setitem(
        pio._READ_CACHE,
        (spark.sparkContext.applicationId, str(tmp_path), "events"),
        events,
    )
    fn, _ = round5_ext.STAGED["events_asof_tolerance"]
    out = {r["purchase_id"]: r for r in fn(spark, str(tmp_path)).collect()}
    assert out[2]["click_id"] == 1 and out[2]["gap_seconds"] == 300
    assert out[2]["within_tolerance"]
    assert out[3]["click_id"] is None and out[3]["gap_seconds"] is None
    assert not out[3]["within_tolerance"]


def test_rfm_quartiles_sum_and_champions(spark, sf_dir):
    """NTILE(4) buckets are balanced (sizes differ by <=1) and the
    champion rule matches a recomputation from the output scores."""
    fn, _ = round5_ext.STAGED["orders_rfm_segmentation"]
    rows = fn(spark, sf_dir).collect()
    from collections import Counter

    for col in ("r_score", "f_score", "m_score"):
        sizes = Counter(r[col] for r in rows)
        assert set(sizes) == {1, 2, 3, 4}
        assert max(sizes.values()) - min(sizes.values()) <= 1
    for r in rows:
        want = (
            "champion" if r["r_score"] == 4 and r["f_score"] == 4
            else "recent" if r["r_score"] == 4
            else "loyal" if r["f_score"] == 4
            else "lost" if r["r_score"] == 1 and r["f_score"] == 1
            else "regular"
        )
        assert r["segment"] == want


def test_cohort_ltv_hand_computed(spark, monkeypatch, tmp_path):
    """Two customers: one acquired in Q1 with two orders, one in Q3
    with one order — cohort totals and per-customer LTV by hand."""
    import datetime as dt

    import incubyte_vaccination_data_pipeline_spark.sources.parquet_io as pio

    rows = [
        (1, 10, dt.date(2020, 2, 1), 100.0),
        (2, 10, dt.date(2020, 8, 1), 50.0),   # later order, same Q1 cohort
        (3, 20, dt.date(2020, 2, 2), 30.0),   # second Q1 customer
        (4, 30, dt.date(2020, 7, 1), 40.0),   # Q3 cohort
    ]
    orders = spark.createDataFrame(
        rows, "o_orderkey bigint, o_custkey bigint, o_orderdate date,"
        " o_totalprice double",
    )
    monkeypatch.setitem(
        pio._READ_CACHE,
        (spark.sparkContext.applicationId, str(tmp_path), "orders"),
        orders,
    )
    fn, _ = round5_ext.STAGED["orders_cohort_ltv"]
    out = {r["cohort_q"]: r for r in fn(spark, str(tmp_path)).collect()}
    q1, q3 = dt.date(2020, 1, 1), dt.date(2020, 7, 1)
    assert out[q1]["n_customers"] == 2 and out[q1]["n_orders"] == 3
    assert out[q1]["total_value"] == 180.0  # 100 + 50 + 30
    assert out[q1]["ltv_per_customer"] == 90.0
    assert out[q3]["n_customers"] == 1 and out[q3]["total_value"] == 40.0
