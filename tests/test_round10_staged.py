"""Round-10-staged queries (registered in round 11 via register_r11):
registration pin plus semantic pins that the wide-SimHash and IVF-radius
paths do what the 30x stress showed they do. Their DuckDB side-by-sides
live in tests/test_oracle.py now that they're registered."""

from __future__ import annotations

from incubyte_vaccination_data_pipeline_spark import catalog
from incubyte_vaccination_data_pipeline_spark.catalog import round10_ext


def test_staged_r11_registered_round11():
    """Round 11: register_r11() landed the full staged batch in the
    live registry (catalog/__init__.py), so the 11 queries now take
    driver CORRECTNESS rows and their DuckDB side-by-sides run in the
    live oracle sweep (tests/test_oracle.py) instead of a staged copy
    here."""
    assert set(round10_ext.STAGED) <= set(catalog.QUERIES)
    assert set(round10_ext.STAGED_R11) <= set(catalog.QUERIES)
    assert set(round10_ext.STAGED_R11) <= set(catalog.ORACLES)


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
