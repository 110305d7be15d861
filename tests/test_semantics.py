"""Hand-computed ground truth for the round-4 composite operators.

Oracle parity proves Spark and DuckDB agree; these tests pin the
SEMANTICS against values computed by hand (or by an independent
pure-Python reference) on tiny inputs, so a bug shared by both
engine-side derivations cannot hide (the same layering the ANN
operators use: recall certificates in the catalog, exact-set parity
vs a numpy reference here).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F


def test_pagerank_hand_computed_star_graph(spark):
    """Star graph c1-s1, c2-s1, c3-s1 (symmetrized). Degrees:
    c*=1 each, s1=3. All start at 1_000_000.

    it1: each c contributes 1_000_000 to s1 -> s1 recv 3_000_000;
    s1 contributes 333_333 to each c (1_000_000 div 3).
    scores: s1 = 150000 + 85*3_000_000 div 100 = 2_700_000
            c* = 150000 + 85*333_333 div 100 = 433_333
    it2: c* contribute 433_333 each -> s1 = 150000 +
         (85 * 1_299_999) div 100 = 1_254_999;
         s1 contributes 2_700_000 div 3 = 900_000 to each c ->
         c* = 150000 + 765000 = 915_000
    it3: s1 = 150000 + (85 * 3 * 915_000) div 100 = 2_483_250
         c* = 150000 + (85 * (1_254_999 div 3)) div 100
            = 150000 + (85 * 418_333) div 100 = 505_583
    """
    from incubyte_vaccination_data_pipeline_spark.catalog.graph import (
        PR_SCALE,
        _TELEPORT,
    )

    assert PR_SCALE == 1_000_000 and _TELEPORT == 150_000
    # run the same integer iteration the catalog query uses, on an
    # in-memory edge list (the catalog query derives edges from
    # lineitem; the arithmetic under test is identical)
    base = spark.createDataFrame(
        [("c1", "s1"), ("c2", "s1"), ("c3", "s1")], "src string, dst string"
    )
    edges = base.unionByName(
        base.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    deg = edges.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("out_deg")
    )
    score = deg.select("node", F.lit(PR_SCALE).cast("bigint").alias("score"))
    for _ in range(3):
        contrib = score.join(deg, "node").select(
            "node", F.expr("score div out_deg").alias("contrib")
        )
        recv = (
            edges.join(contrib, edges.src == contrib.node)
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("contrib").alias("recv"))
        )
        score = deg.select("node").join(recv, "node", "left").select(
            "node",
            (
                F.lit(_TELEPORT) + F.expr("(85 * coalesce(recv, 0)) div 100")
            ).cast("bigint").alias("score"),
        )
    got = {r["node"]: r["score"] for r in score.collect()}
    assert got == {
        "s1": 2_483_250,
        "c1": 505_583,
        "c2": 505_583,
        "c3": 505_583,
    }, got


def test_scd2_hand_computed_versions(spark, sf_dir, monkeypatch, tmp_path):
    """A four-order change log with a run, a flip, and a flip-back
    must collapse to exactly three versions with tiling intervals."""
    import incubyte_vaccination_data_pipeline_spark.sources.parquet_io as pio
    from incubyte_vaccination_data_pipeline_spark.catalog.relational_ext import (
        scd2_priority_history,
    )

    rows = [
        (1, dt.date(2020, 1, 1), 10, "LOW"),
        (1, dt.date(2020, 2, 1), 11, "LOW"),   # same run
        (1, dt.date(2020, 3, 1), 12, "HIGH"),  # flip
        (1, dt.date(2020, 4, 1), 13, "LOW"),   # flip back = NEW version
        (2, dt.date(2020, 5, 1), 14, "MED"),   # second customer
    ]
    orders = spark.createDataFrame(
        rows,
        "o_custkey bigint, o_orderdate date, o_orderkey bigint,"
        " o_orderpriority string",
    )
    monkeypatch.setitem(
        pio._READ_CACHE,
        (spark.sparkContext.applicationId, str(tmp_path), "orders"),
        orders,
    )
    out = {
        (r["cust_i"], r["version"]): r
        for r in scd2_priority_history(spark, str(tmp_path)).collect()
    }
    assert set(out) == {(1, 1), (1, 2), (1, 3), (2, 1)}
    v1, v2, v3 = out[(1, 1)], out[(1, 2)], out[(1, 3)]
    assert (v1["priority"], v1["n_orders"]) == ("LOW", 2)
    assert (v2["priority"], v2["n_orders"]) == ("HIGH", 1)
    assert (v3["priority"], v3["n_orders"]) == ("LOW", 1)
    # intervals tile: [1/1, 3/1) [3/1, 4/1) [4/1, inf)
    assert v1["effective_from"] == dt.date(2020, 1, 1)
    assert v1["effective_to"] == dt.date(2020, 3, 1)
    assert v2["effective_to"] == dt.date(2020, 4, 1)
    assert v3["effective_to"] is None and v3["is_current"]
    assert out[(2, 1)]["is_current"]


def test_snapshot_diff_hand_computed(spark, sf_dir, monkeypatch, tmp_path):
    """Keys chosen to hit every branch: 97*101*? -- use the real
    moduli: 0 is change+delete+add (delete wins on the kept side),
    97 changes, 101 deletes, 103 adds at +3_000_000, 1 unchanged."""
    import incubyte_vaccination_data_pipeline_spark.sources.parquet_io as pio
    from incubyte_vaccination_data_pipeline_spark.catalog.quality import (
        snapshot_diff_orders,
    )

    rows = [(k, "O", 100.0) for k in (1, 97, 101, 103)]
    orders = spark.createDataFrame(
        rows, "o_orderkey bigint, o_orderstatus string, o_totalprice double"
    )
    monkeypatch.setitem(
        pio._READ_CACHE,
        (spark.sparkContext.applicationId, str(tmp_path), "orders"),
        orders,
    )
    out = {
        (r["o_orderkey"], r["change_kind"]): r
        for r in snapshot_diff_orders(spark, str(tmp_path)).collect()
    }
    # 1: unchanged -> absent. 97: status flips to X. 101: deleted.
    # 103: survives unchanged AND spawns 3_000_103 as added.
    assert set(out) == {
        (97, "changed"),
        (101, "removed"),
        (3_000_103, "added"),
    }, out
    assert out[(97, "changed")]["old_status"] == "O"
    assert out[(97, "changed")]["new_status"] == "X"
    assert out[(101, "removed")]["new_status"] is None
    assert out[(3_000_103, "added")]["old_status"] is None
