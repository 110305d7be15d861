"""Round-10: corpus-derived operator defaults for SimHash width and
IVF cell count (VERDICT r9 item 3).

The catalog keeps its pinned small-SF values as explicit,
oracle-portable overrides; the OPERATOR defaults now derive from
corpus size — these tests pin the derivation laws (sqrt(N) tracking
for IVF cells, ~constant band-bucket population for SimHash width)
and that the default paths produce valid, working configurations."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from incubyte_vaccination_data_pipeline_spark.operators.dedup import (
    derived_simhash_bits,
    simhash_fingerprints,
)
from incubyte_vaccination_data_pipeline_spark.operators.similarity import (
    derived_ivf_cells,
    ivf_centroids,
)


def test_ivf_cells_track_sqrt_n():
    # in the unclamped region the derived cell count is sqrt(N): a 10x
    # corpus (the stress harness's scratch factor) gets ~sqrt(10) =
    # 3.16x the cells, so per-cell population ALSO grows only sqrt(10)x
    for n in (2_560, 60_000, 1_000_000, 50_000_000):
        r = derived_ivf_cells(10 * n) / derived_ivf_cells(n)
        assert 3.0 <= r <= 3.4, f"n={n}: 10x ratio {r} not ~sqrt(10)"
        assert derived_ivf_cells(n) == round(math.sqrt(n))


def test_ivf_cells_clamps():
    assert derived_ivf_cells(0) == 16
    assert derived_ivf_cells(100) == 16  # sqrt(100)=10 < min
    assert derived_ivf_cells(10**14) == 1 << 20  # capped
    assert derived_ivf_cells(400, min_cells=4) == 20


def test_simhash_bits_hold_bucket_population():
    # bucket space per band (2^(bits/bands)) must reach
    # n / target_bucket_docs in the unclamped region -> expected
    # within-bucket population stays <= target as the corpus grows
    for n in (10_000, 60_000, 600_000):
        bits = derived_simhash_bits(n)
        if bits < 60:  # unclamped
            assert 2 ** (bits // 4) >= n / 16
            # and not gratuitously wide: one band-step narrower would
            # NOT hold the population bound
            assert 2 ** (bits // 4 - 1) < n / 16
        assert bits % 4 == 0 and 16 <= bits <= 60


def test_simhash_bits_clamps_and_granularity():
    assert derived_simhash_bits(1) == 16  # floor
    assert derived_simhash_bits(10**12) == 60  # hex-decode ceiling
    # non-default band count: result divisible by bands AND by 4
    b = derived_simhash_bits(1_000_000, bands=6)
    assert b % 6 == 0 and b % 4 == 0 and b <= 60
    # monotone in n
    prev = 0
    for n in (10, 1_000, 100_000, 10_000_000):
        cur = derived_simhash_bits(n)
        assert cur >= prev
        prev = cur


def test_derivation_laws_fuzz():
    """Property fuzz over the derivation laws: granularity, clamps,
    monotonicity, and the population/sqrt bounds hold on arbitrary
    corpus sizes and band counts — not just the hand-picked cases."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from incubyte_vaccination_data_pipeline_spark.operators.similarity import (
        derived_ivf_probes,
    )

    @settings(max_examples=100, deadline=None)
    @given(
        n=st.integers(min_value=0, max_value=10**15),
        bands=st.integers(min_value=16, max_value=64),
    )
    def check_simhash_impossible_bands(n, bands):
        # widths must be multiples of lcm(4, bands) <= 60; when none
        # exists the function must RAISE, never return a 0-bit width
        # whose empty band mask degenerates the join to all-pairs
        step = 4 * bands // math.gcd(4, bands)
        if step > 60:
            with pytest.raises(ValueError):
                derived_simhash_bits(n, bands=bands)
        else:
            assert derived_simhash_bits(n, bands=bands) % bands == 0

    check_simhash_impossible_bands()

    @settings(max_examples=300, deadline=None)
    @given(
        n=st.integers(min_value=0, max_value=10**15),
        bands=st.integers(min_value=1, max_value=10),
    )
    def check_simhash(n, bands):
        b = derived_simhash_bits(n, bands=bands)
        assert b % 4 == 0 and b % bands == 0 and 4 <= b <= 60
        # monotone in n at fixed bands
        assert derived_simhash_bits(n + max(1, n // 7), bands=bands) >= b
        # population bound holds whenever the width is below the
        # band-specific ceiling (the largest multiple of lcm(4, bands)
        # that the 60-bit hex decode allows — e.g. 36 for bands=9);
        # AT the ceiling the bound is physically out of reach and the
        # docstring's "move to 64-bit fingerprints" note applies
        step = 4 * bands // math.gcd(4, bands)
        ceiling = 60 - (60 % step)
        per_band = b // bands
        if b < ceiling and b > 16 and n > 16:
            assert 2**per_band >= n / 16

    @settings(max_examples=300, deadline=None)
    @given(n=st.integers(min_value=0, max_value=10**15))
    def check_ivf(n):
        c = derived_ivf_cells(n)
        assert 16 <= c <= 1 << 20
        if 16**2 <= n <= (1 << 20) ** 2:
            assert abs(c - math.sqrt(n)) <= 0.5 + 1e-9
        p = derived_ivf_probes(c)
        assert 4 <= p <= c  # never probes more cells than exist

    @settings(max_examples=200, deadline=None)
    @given(cells=st.integers(min_value=1, max_value=10**6))
    def check_probes_capped(cells):
        # the cell cap must win over min_probe: a 2-cell quantizer
        # probes at most 2 cells (round-10 review finding)
        p = derived_ivf_probes(cells)
        assert 1 <= p <= cells

    check_probes_capped()

    check_simhash()
    check_ivf()


def test_simhash_default_width_derives_and_works(spark):
    rows = [(i, f"document body number {i} with words {i * 7}") for i in range(40)]
    rows.append((1000, rows[0][1]))  # exact copy of doc 0
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r["simhash"] for r in simhash_fingerprints(df).collect()}
    bits = derived_simhash_bits(len(rows))
    assert bits == 16  # tiny corpus -> floor
    assert out[1000] == out[0]
    assert all(0 <= v < 2**bits for v in out.values())


def test_ivf_default_cells_derive_from_corpus(spark, sf_dir):
    from incubyte_vaccination_data_pipeline_spark.sources.parquet_io import read_table

    emb = read_table(spark, sf_dir, "embeddings")
    n = emb.count()
    cents = ivf_centroids(emb)  # default: derived
    assert len(cents) == min(derived_ivf_cells(n), n)
    # each centroid is unit-norm (search math relies on it)
    for c in cents[:3]:
        assert abs(sum(x * x for x in c) - 1.0) < 1e-9


def test_occupancy_probes_laws(spark):
    """occupancy_probes_expr cuts the distance-ranked cell list at the
    shortest prefix reaching the coverage target: uniform occupancy
    degenerates to the constant-fraction default; concentrated
    occupancy probes fewer cells when the dense cell ranks first and
    more when the query sits in the sparse region; coverage=1.0
    probes everything; min_probe floors."""
    from incubyte_vaccination_data_pipeline_spark.operators.similarity import (
        occupancy_probes_expr,
    )

    # 4 unit centroids along distinct axes; queries ON the axes make
    # the ranked order deterministic (dot = 1 for own cell, 0 others
    # except the tie-broken tail — use distinct-dot queries instead)
    cents = [
        [1.0, 0.0, 0.0, 0.0],
        [0.0, 1.0, 0.0, 0.0],
        [0.0, 0.0, 1.0, 0.0],
        [0.0, 0.0, 0.0, 1.0],
    ]
    # query leaning c0 > c1 > c2 > c3 strictly
    df = spark.createDataFrame([([0.8, 0.5, 0.3, 0.1],)], ["v"])

    def probes(counts, coverage, min_probe=1):
        col = occupancy_probes_expr(
            "v", cents, counts, coverage=coverage, min_probe=min_probe
        )
        return df.select(col.alias("p")).collect()[0]["p"]

    # uniform: coverage 0.25 -> exactly 1 of 4 cells, 0.5 -> 2, 1.0 -> 4
    assert probes([10, 10, 10, 10], 0.25) == [0]
    assert probes([10, 10, 10, 10], 0.50) == [0, 1]
    assert probes([10, 10, 10, 10], 1.00) == [0, 1, 2, 3]
    # dense first-ranked cell: one probe already covers 70%
    assert probes([70, 10, 10, 10], 0.5) == [0]
    # sparse first-ranked cells: must escalate to reach half the corpus
    assert probes([5, 5, 5, 85], 0.5) == [0, 1, 2, 3]
    # min_probe floors even when one cell suffices
    assert probes([100, 1, 1, 1], 0.1, min_probe=2) == [0, 1]
    # exact-boundary: cum reaching target stops growth (>= before add)
    assert probes([25, 25, 25, 25], 0.5) == [0, 1]

    # corpus_n keeps coverage's fraction-of-corpus meaning under
    # multi-assigned counts (r12 advice): m=2 counts sum to 2x the
    # corpus, silently doubling the implicit target — an explicit
    # corpus_n pins the denominator
    from incubyte_vaccination_data_pipeline_spark.operators.similarity import (
        occupancy_probes_expr as ope,
    )

    m2_counts = [50, 50, 50, 50]  # 100-vector corpus, assign_m=2
    implicit = df.select(
        ope("v", cents, m2_counts, coverage=0.5).alias("p")
    ).collect()[0]["p"]
    pinned = df.select(
        ope("v", cents, m2_counts, coverage=0.5, corpus_n=100).alias("p")
    ).collect()[0]["p"]
    assert implicit == [0, 1]  # target ceil(0.5*200)=100 -> 2 cells
    assert pinned == [0]  # target ceil(0.5*100)=50 -> 1 cell


def test_topk_ivf_coverage_option(spark, sf_dir):
    """The coverage opt-in returns the same schema, every returned
    pair carries its exact cosine (subset-of-bruteforce law), and the
    routed two-level default refuses the flat-only option loudly."""
    import pytest as _pytest

    from incubyte_vaccination_data_pipeline_spark.operators.similarity import (
        TWO_LEVEL_CELL_THRESHOLD,
        topk_bruteforce,
        topk_ivf,
    )
    from incubyte_vaccination_data_pipeline_spark.sources.parquet_io import read_table

    emb = read_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 3)
    cents = ivf_centroids(emb, n_centroids=8)
    got = topk_ivf(emb, queries, k=5, centroids=cents, coverage=0.5).collect()
    assert got
    brute = {
        (r["query_id"], r["neighbor_id"]): r["cosine"]
        for r in topk_bruteforce(emb, queries, k=emb.count()).collect()
    }
    for r in got:
        assert brute[(r["query_id"], r["neighbor_id"])] == r["cosine"]

    class _FakeCount:
        def count(self):
            return (TWO_LEVEL_CELL_THRESHOLD + 1) ** 2

    with _pytest.raises(ValueError, match="coverage"):
        topk_ivf(_FakeCount(), queries, coverage=0.5)


def test_radius_ivf_coverage_option(spark, sf_dir):
    """radius_search_ivf's occupancy opt-in (the fixed/occupancy x
    topk/radius matrix completion): subset-of-bruteforce with equal
    cosines, cell_counts amortization path used, routed default
    refuses the flat-only option."""
    import pytest as _pytest

    from incubyte_vaccination_data_pipeline_spark.operators.similarity import (
        TWO_LEVEL_CELL_THRESHOLD,
        ivf_assigned,
        radius_search_ivf,
        range_search,
    )
    from incubyte_vaccination_data_pipeline_spark.sources.parquet_io import read_table

    emb = read_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 3)
    cents = ivf_centroids(emb, n_centroids=8)
    assigned = ivf_assigned(emb, cents)
    counts = [0] * len(cents)
    for r in assigned.groupBy("cid").count().collect():
        counts[r["cid"]] = int(r["count"])
    got = radius_search_ivf(
        emb, queries, threshold=0.2, centroids=cents,
        assigned_corpus=assigned, coverage=0.5, cell_counts=counts,
    ).collect()
    assert got
    brute = {
        (r["query_id"], r["neighbor_id"]): r["cosine"]
        for r in range_search(emb, queries, 0.2).collect()
    }
    for r in got:
        assert brute[(r["query_id"], r["neighbor_id"])] == r["cosine"]

    class _FakeCount:
        def count(self):
            return (TWO_LEVEL_CELL_THRESHOLD + 1) ** 2

    with _pytest.raises(ValueError, match="coverage"):
        radius_search_ivf(_FakeCount(), queries, 0.2, coverage=0.5)
