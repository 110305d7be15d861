"""Round-11-staged queries (registered in round 12 via register_r12):
registration pin plus the semantic pins the oracle alone cannot
express. Their DuckDB side-by-sides live in tests/test_oracle.py now
that they're registered."""

from __future__ import annotations

from incubyte_vaccination_data_pipeline_spark import catalog
from incubyte_vaccination_data_pipeline_spark.catalog import round12_staged as r12


def test_staged_r12_registered_round12():
    """Round 12: register_r12() landed the staged trio in the live
    registry (catalog/__init__.py), so the 3 queries now take driver
    CORRECTNESS rows and their DuckDB side-by-sides run in the live
    oracle sweep (tests/test_oracle.py) instead of a staged copy
    here."""
    assert set(r12.STAGED) <= set(catalog.QUERIES)
    assert set(r12.STAGED) <= set(catalog.ORACLES)


def test_hier_scored_ctes_shared_with_registered_rank_oracle():
    """The radius oracle reuses the registered hier-search oracle's
    probe chain verbatim: the rank oracle must be exactly that chain
    plus its rank tail (byte-level prefix check), so the two tails
    cannot diverge from the probe machinery."""
    from incubyte_vaccination_data_pipeline_spark.catalog import round11_staged as r11

    chain = r11._hier_scored_ctes()
    assert catalog.ORACLES["ann_ivf_hier_topk"].startswith(chain)
    assert r12.STAGED["ann_radius_ivf_hier"][1].startswith(chain)


def test_radius_hier_subset_of_bruteforce_with_equal_scores(spark, sf_dir):
    """The hierarchical radius search only PRUNES: every returned pair
    appears in the brute-force range result with the identical rounded
    cosine, and the result is non-empty (the probe budget keeps the
    planted structure)."""
    from incubyte_vaccination_data_pipeline_spark.catalog.similarity import (
        N_QUERY_VECTORS,
        RANGE_THRESHOLD,
    )
    from incubyte_vaccination_data_pipeline_spark.operators.similarity import (
        range_search,
    )
    from incubyte_vaccination_data_pipeline_spark.sources.parquet_io import (
        read_table,
    )
    from pyspark.sql import functions as F

    emb = read_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERY_VECTORS)
    brute = {
        (r["query_id"], r["neighbor_id"]): r["cosine"]
        for r in range_search(emb, queries, RANGE_THRESHOLD).collect()
    }
    rows = r12.ann_radius_ivf_hier_q(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert brute[(r["query_id"], r["neighbor_id"])] == r["cosine"]


def test_funnel_laws_and_contamination_nonvacuous(spark, sf_dir):
    """Funnel arithmetic over the planted augmented corpus: the exact
    stage must collapse every planted verbatim copy
    (n_docs - n_exact_unique == |doc_id % 10 == 0|), the stages must
    be monotone, and the raw-eval screen must actually catch leaked
    copies (non-vacuous: > 0 contaminated train docs)."""
    import duckdb as _dd

    row = r12.corpus_curation_funnel_q(spark, sf_dir).collect()[0]
    n_docs_base = _dd.sql(
        f"SELECT COUNT(*), SUM(CASE WHEN doc_id % 10 = 0 THEN 1 ELSE 0 END) "
        f"FROM '{sf_dir}/documents.parquet'"
    ).fetchone()
    n_base, n_copies = int(n_docs_base[0]), int(n_docs_base[1])
    assert row["n_docs"] - row["n_exact_unique"] == n_copies
    assert row["n_cleaned"] <= row["n_exact_unique"]
    assert row["n_final"] <= row["n_cleaned"]
    assert row["n_contaminated_train"] > 0, "raw-eval screen vacuous"
    assert row["n_packed_seqs"] > 0
    # packed sequences can't exceed one per doc plus the token total
    assert row["n_packed_seqs"] <= row["n_final"] * 64


def test_funnel_plan_no_cartesian_blowup(spark, sf_dir):
    """The five scalar aggregates attach as broadcast one-row joins —
    no CartesianProduct in the executed plan."""
    df = r12.corpus_curation_funnel_q(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan


def test_radius_hier_plan_drops_the_rank_window(spark, sf_dir):
    """The advertised property: the threshold tail replaces the
    per-query CANDIDATE rank window (the index machinery's own
    row_number windows — seeds, assignment, probe selection — are
    shared with the rank twin): the radius plan must carry exactly
    one fewer Window than ann_ivf_hier_topk, and no cartesian
    fallback."""
    import re

    from incubyte_vaccination_data_pipeline_spark.catalog import (
        round11_staged as r11,
    )

    def windows(df):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        return len(re.findall(r"\bWindow\b", plan))

    n_radius = windows(r12.ann_radius_ivf_hier_q(spark, sf_dir))
    n_topk = windows(r11.ann_ivf_hier_topk_q(spark, sf_dir))
    assert n_radius == n_topk - 1


def test_triangle_counts_planted_graph(spark):
    """Planted structure: K4 on {1,2,3,4} (four triangles — each node
    in exactly 3), one pendant edge (5 in no triangle, absent from the
    result), and a disjoint K3 {6,7,8} (each node in exactly 1). Also
    pins the global law sum(n_triangles) == 3 x #triangles."""
    from incubyte_vaccination_data_pipeline_spark.operators.graph_metrics import (
        triangle_counts,
    )

    k4 = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    edges = spark.createDataFrame(
        k4 + [(4, 5), (6, 7), (6, 8), (7, 8)], "lo int, hi int"
    )
    got = {r["node"]: r["n_triangles"] for r in triangle_counts(edges).collect()}
    assert got == {1: 3, 2: 3, 3: 3, 4: 3, 6: 1, 7: 1, 8: 1}
    assert sum(got.values()) == 3 * 5  # 4 triangles in K4 + 1 in K3


def test_triangle_counts_duplicate_edges_ignored(spark):
    """The edge set is distinct-ed: multi-edges (a part pair sharing
    several orders) must not inflate counts."""
    from incubyte_vaccination_data_pipeline_spark.operators.graph_metrics import (
        triangle_counts,
    )

    edges = spark.createDataFrame(
        [(1, 2), (1, 2), (2, 3), (1, 3), (1, 3)], "lo int, hi int"
    )
    got = {r["node"]: r["n_triangles"] for r in triangle_counts(edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1}


def test_triangle_counts_canonicalizes_reversed_edges(spark):
    """Defensive canonicalization (least/greatest before distinct): a
    reversed row, a bidirectional pair, and a self-loop must collapse
    to the same K3 as the canonical edge list — not double degrees,
    break wedge closure, or close a 'triangle' through a loop."""
    from incubyte_vaccination_data_pipeline_spark.operators.graph_metrics import (
        triangle_counts,
    )

    edges = spark.createDataFrame(
        # K3 with (2,1) reversed, (1,3)+(3,1) bidirectional, (2,2) loop
        [(2, 1), (2, 3), (1, 3), (3, 1), (2, 2)],
        "lo int, hi int",
    )
    got = {r["node"]: r["n_triangles"] for r in triangle_counts(edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1}


def test_triangle_plan_equi_joins_only(spark, sf_dir):
    """Wedge generation and closure are equi-joins on src / (lo, hi)
    — no cartesian or broadcast-NLJ fallback at any scale."""
    df = r12.graph_triangle_per_node_q(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_per_node_triangles_sum_to_three_times_global(spark, sf_dir):
    """The cross-query law binding the staged per-node decomposition
    to the registered global count over the SAME shared edge frame:
    every triangle has exactly three corners."""
    per_node = r12.graph_triangle_per_node_q(spark, sf_dir)
    total = sum(r["n_triangles"] for r in per_node.collect())
    global_row = catalog.QUERIES["graph_triangle_count"](
        spark, sf_dir
    ).collect()[0]
    assert total == 3 * global_row["n_triangles"]
