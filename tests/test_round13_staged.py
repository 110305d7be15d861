"""Round-12-staged queries (registered in round 13 via register_r13):
registration pin plus the semantic pins the oracle alone cannot
express. Their DuckDB side-by-sides live in tests/test_oracle.py now
that they're registered."""

from __future__ import annotations

import hashlib

from incubyte_vaccination_data_pipeline_spark import catalog
from incubyte_vaccination_data_pipeline_spark.catalog import round13_staged as r13


def test_staged_r13_registered_round13():
    """Round 13: register_r13() landed the staged trio in the live
    registry (catalog/__init__.py), so the 3 queries now take driver
    CORRECTNESS rows and their DuckDB side-by-sides run in the live
    oracle sweep (tests/test_oracle.py) instead of a staged copy
    here."""
    assert set(r13.STAGED) <= set(catalog.QUERIES)
    assert set(r13.STAGED) <= set(catalog.ORACLES)


def test_ivf_oracle_occupancy_param_byte_identity():
    """The staging protocol's generator rule: _ivf_oracle gained the
    occupancy_coverage param — every pre-existing rendering must stay
    byte-identical (three registered queries depend on it)."""
    from incubyte_vaccination_data_pipeline_spark.catalog.similarity import (
        _ivf_oracle,
    )

    want = {
        "default": "e7e9a66fc9d6c69d4e2e9d7fbb33493a83e1c3d6e88b825e"
                   "8ef1e55cfbbfe534",
        "pair": "30d3c18a9601f6b66c5d79c30bf08418f9c96cf7b073b06e"
                "b6321bf32abb665b",
        "radius": "591f95416eb5d16cea034326285af13af170ad41b2d82337"
                  "be7d575d8e6c15fe",
    }
    got = {
        "default": _ivf_oracle(),
        "pair": _ivf_oracle(pair_threshold=0.8, assign_m=2),
        "radius": _ivf_oracle(radius=0.25),
    }
    for key, text in got.items():
        assert hashlib.sha256(text.encode()).hexdigest() == want[key], key


def test_occupancy_differs_from_fixed_probe_where_cells_skew(spark, sf_dir):
    """The occupancy query is not a re-labelled ann_ivf_topk: on a
    skewed inverted file the per-query probe COUNTS must vary (some
    query probes != IVF_N_PROBE cells), while every returned pair is
    still exact (subset-of-bruteforce law with equal cosines)."""
    from pyspark.sql import functions as F

    from incubyte_vaccination_data_pipeline_spark.catalog.similarity import (
        N_QUERY_VECTORS,
        _ivf_assigned_index,
        _ivf_index,
    )
    from incubyte_vaccination_data_pipeline_spark.operators.similarity import (
        occupancy_probes_expr,
        topk_bruteforce,
    )
    from incubyte_vaccination_data_pipeline_spark.sources.parquet_io import (
        read_table,
    )

    emb = read_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERY_VECTORS)
    cents = _ivf_index(spark, sf_dir)
    counts = {
        r["cid"]: r["count"]
        for r in _ivf_assigned_index(spark, sf_dir).groupBy("cid").count().collect()
    }
    cell_counts = [counts.get(i, 0) for i in range(len(cents))]
    lens = [
        len(r["p"])
        for r in queries.select(
            occupancy_probes_expr(
                "embedding", cents, cell_counts, coverage=r13.OCC_COVERAGE
            ).alias("p")
        ).collect()
    ]
    assert min(lens) >= 1 and max(lens) <= len(cents)
    assert len(set(lens)) > 1, "all queries probed the same cell count"

    brute = {
        (r["query_id"], r["neighbor_id"]): r["cosine"]
        for r in topk_bruteforce(emb, queries, k=emb.count()).collect()
    }
    for r in r13.ann_ivf_occupancy_topk_q(spark, sf_dir).collect():
        assert brute[(r["query_id"], r["neighbor_id"])] == r["cosine"]


def test_occupancy_plan_shape(spark, sf_dir):
    """The occupancy cut is a per-row expression: the executed plan
    must stay the family shape — probe explode + broadcast candidate
    equi-join + one rank window; no cartesian, no extra shuffle from
    the cell-count attachment (counts are literals inside the
    expression, collected once at build)."""
    df = r13.ann_ivf_occupancy_topk_q(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # operator lines render as "Window [..."; bare "Window" also
    # matches windowspecdefinition mentions inside expressions
    assert plan.count("Window [") == 1


def test_kcore_planted_graph_and_fixpoint_subset(spark, sf_dir):
    """Planted: K4 plus a tail 4-5-6 hanging off node 4. The 3-core
    is exactly K4 (each node degree 3); the tail peels in two rounds
    (6 first, then 5... actually 5 and 6 both drop round 1 — degrees
    1 and 2 < 3 — and 4's degree falls to 3, staying). Fixed-round
    peel must SUPERSET the fixpoint core on the shared co-purchase
    graph (the upper-approximation law), and reversed/duplicate/loop
    edges canonicalize like triangle_counts."""
    from incubyte_vaccination_data_pipeline_spark.catalog.graph import (
        _copurchase_pairs,
    )
    from incubyte_vaccination_data_pipeline_spark.operators.graph_metrics import (
        kcore,
    )
    from pyspark.sql import functions as F

    k4 = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    edges = spark.createDataFrame(
        k4 + [(5, 4), (5, 6), (2, 1), (3, 3)],  # reversed dup + loop
        "lo int, hi int",
    )
    got = {r["node"]: r["degree"] for r in kcore(edges, 3).collect()}
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}
    # fixed-round approximation supersets the fixpoint on real data
    real = _copurchase_pairs(spark, sf_dir).select(
        F.col("pa").alias("lo"), F.col("pb").alias("hi")
    )
    fixed = {r["node"] for r in kcore(real, r13.KCORE_K,
                                      max_rounds=r13.KCORE_ROUNDS).collect()}
    fix = {r["node"] for r in kcore(real, r13.KCORE_K).collect()}
    assert fix <= fixed
    assert fix, "fixpoint core empty at test SF"


def test_stratified_exact_budgets(spark, sf_dir):
    """Per-stratum counts are EXACTLY ceil(frac x stratum size) —
    computed independently from the raw table — and the sample is
    deterministic across runs (content-hash order)."""
    import math

    from incubyte_vaccination_data_pipeline_spark.sources.parquet_io import (
        read_table,
    )

    sizes = {
        r["lang"]: r["count"]
        for r in read_table(spark, sf_dir, "documents")
        .groupBy("lang").count().collect()
    }
    rows = r13.sample_stratified_exact_q(spark, sf_dir).collect()
    got = {}
    for r in rows:
        got[r["lang"]] = got.get(r["lang"], 0) + 1
        assert 1 <= r["rn"] <= math.ceil(r13.STRAT_FRAC * sizes[r["lang"]])
    assert got == {
        lang: math.ceil(r13.STRAT_FRAC * n) for lang, n in sizes.items()
    }
    again = {(r["doc_id"], r["rn"]) for r in
             r13.sample_stratified_exact_q(spark, sf_dir).collect()}
    assert again == {(r["doc_id"], r["rn"]) for r in rows}
