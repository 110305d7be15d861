"""Round-13 staged queries: driver-style DuckDB side-by-sides BEFORE
registration (window protection keeps them staged this round — see
catalog/round13_staged.py) plus the semantic pins the oracle alone
cannot express."""

from __future__ import annotations

import duckdb
import hashlib
import pytest

from incubyte_vaccination_data_pipeline_spark import catalog
from incubyte_vaccination_data_pipeline_spark.catalog import round13_staged as r13
from incubyte_vaccination_data_pipeline_spark.sources.parquet_io import TESTDATA_TABLES
from tests.test_oracle import _normalize, _values_equal


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    yield con
    con.close()


def test_staged_r13_not_yet_registered():
    """Registering mid-round would re-sort the driver window under the
    slots round 12 promised; register_r13() lands these at the
    round-13 kickoff."""
    assert not (set(r13.STAGED) & set(catalog.QUERIES))
    assert not (set(r13.STAGED) & set(catalog.ORACLES))


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


@pytest.mark.parametrize("name", sorted(r13.STAGED))
def test_staged_r13_query_matches_oracle(spark, sf_dir, duck, name):
    fn, oracle = r13.STAGED[name]
    spark_df = fn(spark, sf_dir).toPandas()
    duck_df = duck.execute(oracle).df()
    assert len(spark_df) == len(duck_df)
    spark_df.columns = [c.lower() for c in spark_df.columns]
    duck_df.columns = [c.lower() for c in duck_df.columns]
    s, d = _normalize(spark_df), _normalize(duck_df)
    assert sorted(s.columns) == sorted(d.columns)
    for col in s.columns:
        for av, bv in zip(s[col], d[col]):
            if av is None and bv is None:
                continue
            assert _values_equal(av, bv), (name, col, av, bv)


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
    assert plan.count("Window") == 1
