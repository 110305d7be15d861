"""Round-10 staged-for-round-11 queries: driver-style DuckDB
side-by-side for the wide-SimHash pairs path BEFORE it joins the live
registry (window protection kept it staged this round — see
catalog/round10_ext.py), plus semantic pins that the wide path does
what the 30x stress showed it does."""

from __future__ import annotations

import duckdb
import pytest

from incubyte_vaccination_data_pipeline_spark import catalog
from incubyte_vaccination_data_pipeline_spark.catalog import round10_ext
from incubyte_vaccination_data_pipeline_spark.sources.parquet_io import TESTDATA_TABLES
from tests.test_oracle import _normalize, _values_equal


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    yield con
    con.close()


def test_staged_r11_not_yet_registered():
    """Round 10: the wide-simhash query is deliberately NOT in the
    live registry (registering a 202nd query would re-sort the window
    under the four round-8 queries' promised driver slots); the live
    round-10 registration is only dedup_ngram_jaccard_prefix."""
    assert set(round10_ext.STAGED) <= set(catalog.QUERIES)
    assert not (set(round10_ext.STAGED_R11) & set(catalog.QUERIES))
    assert not (set(round10_ext.STAGED_R11) & set(catalog.ORACLES))


@pytest.mark.parametrize("name", sorted(round10_ext.STAGED_R11))
def test_staged_r11_query_matches_oracle(spark, sf_dir, duck, name):
    fn, oracle = round10_ext.STAGED_R11[name]
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


def test_radius_ivf_subset_of_bruteforce_with_equal_scores(spark, sf_dir):
    """IVF radius search only PRUNES candidates: every returned pair
    must appear in the brute-force range result with the identical
    rounded cosine, and the planted high-similarity structure must
    survive the probe pruning (non-empty result)."""
    brute = {
        (r["query_id"], r["neighbor_id"]): r["cosine"]
        for r in catalog.QUERIES["ann_cosine_range"](spark, sf_dir).collect()
    }
    ivf = {
        (r["query_id"], r["neighbor_id"]): r["cosine"]
        for r in round10_ext.ann_radius_ivf_q(spark, sf_dir).collect()
    }
    assert ivf, "radius-IVF returned nothing — probe pruning too aggressive"
    assert set(ivf) <= set(brute)
    for pair, cos in ivf.items():
        assert cos == brute[pair], (pair, cos, brute[pair])


def test_wide_simhash_finds_exact_planted_pairs(spark, sf_dir):
    """Exact copies collide at any width: every planted exact-dup pair
    (d, d+1000000) must appear with hamming 0; and the 48-bit band
    space must not spray junk — pair count bounded well under the
    32-bit query's candidate volume at the same corpus."""
    from pyspark.sql import functions as F

    from incubyte_vaccination_data_pipeline_spark.catalog.dedup import (
        augmented_documents,
    )

    rows = round10_ext.dedup_simhash_hamming_wide_q(spark, sf_dir).collect()
    # the junk bound the wide path exists for: the 48-bit band space
    # must not spray candidates — the 32-bit catalog query at the same
    # corpus and threshold is the saturation baseline, and the wide
    # result must not exceed it (at 10x/30x the measured gap is
    # 2.65M/24M vs 134k-274k pairs; at test SF both are small but the
    # ordering must already hold)
    n32 = catalog.QUERIES["dedup_simhash_hamming"](spark, sf_dir).count()
    assert len(rows) <= n32, (len(rows), n32)
    found = {(r["doc_a"], r["doc_b"]): r["hamming"] for r in rows}
    planted = [
        (r["doc_id"] - 1000000, r["doc_id"])
        for r in augmented_documents(spark, sf_dir)
        .filter((F.col("doc_id") >= 1000000) & (F.col("doc_id") < 2000000))
        .collect()
    ]
    assert planted
    for p in planted:
        assert found.get(p) == 0, f"planted exact pair {p} missing or nonzero"
