"""Automatic two-level routing (round-11, VERDICT r10 item 4).

``derived_ivf_cells`` can return cell counts past the literal-codegen /
O(n x cells) assignment boundary; the default-build operators must
route to the two-level quantizer there WITHOUT the caller opting in.
The semantic law: with the probe budget forced to 100%, BOTH the flat
and the routed two-level path degenerate to exact search — so the
routed operator must reproduce brute force bit-for-bit on the small
corpus, proving the switch changes the execution shape, never the
contract.
"""

from __future__ import annotations

import pytest

from incubyte_vaccination_data_pipeline_spark.operators import similarity as sim
from incubyte_vaccination_data_pipeline_spark.sources.parquet_io import read_table


def test_two_level_split_laws():
    """coarse ~ sqrt(cells), coarse * fine covers every requested cell,
    and both levels stay O(sqrt(cells))."""
    for n in (10, 100, 783, 4096, 65536):
        coarse, fine = sim.two_level_split(n)
        assert coarse * fine >= n
        assert coarse <= 2 * int(n**0.5) + 2
        assert fine <= 2 * int(n**0.5) + 2
    assert sim.two_level_split(256)[0] == 16


def test_threshold_is_inside_derived_range():
    """The boundary must be reachable by the derived default (else the
    router is dead code) and above every measured flat regime."""
    assert sim.derived_ivf_cells(17_000_000) > sim.TWO_LEVEL_CELL_THRESHOLD
    # the 100x stress corpus (50k vectors -> 224 cells) stays flat
    assert sim.derived_ivf_cells(50_000) < sim.TWO_LEVEL_CELL_THRESHOLD


@pytest.fixture()
def routed(monkeypatch):
    """Force the router on for the 500-vector test corpus (derived
    cells ~ 22 > patched threshold 8) with a 100%-probe budget, and
    record that the two-level build actually ran."""
    calls = []
    orig = sim.build_two_level_index

    def spy(*a, **kw):
        calls.append(True)
        return orig(*a, **kw)

    monkeypatch.setattr(sim, "TWO_LEVEL_CELL_THRESHOLD", 8)
    monkeypatch.setattr(sim, "build_two_level_index", spy)
    monkeypatch.setattr(sim, "derived_ivf_probes", lambda n, **kw: n)
    return calls


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_topk_ivf_routes_and_full_probe_matches_bruteforce(
    spark, sf_dir, routed
):
    emb = read_table(spark, sf_dir, "embeddings")
    queries = emb.limit(5)
    got = sim.topk_ivf(emb, queries, k=5)
    assert routed, "derived cell count above threshold must route two-level"
    want = sim.topk_bruteforce(emb, queries, k=5)
    cols = ["query_id", "neighbor_id", "cosine", "rank"]
    assert _rows(got, cols) == _rows(want, cols)


def test_radius_ivf_routes_and_full_probe_matches_range_search(
    spark, sf_dir, routed
):
    emb = read_table(spark, sf_dir, "embeddings")
    queries = emb.limit(5)
    got = sim.radius_search_ivf(emb, queries, threshold=0.25)
    assert routed
    want = sim.range_search(emb, queries, threshold=0.25)
    cols = ["query_id", "neighbor_id", "cosine"]
    rows = _rows(got, cols)
    assert rows and rows == _rows(want, cols)


def test_near_dup_auto_builds_flat_below_threshold(spark, sf_dir, monkeypatch):
    """With neither centroids nor cells, the operator derives its own
    index; below the threshold that is the flat quantizer, and results
    must be a subset of brute-force all-pairs with identical cosines."""
    calls = []
    orig = sim.build_two_level_index
    monkeypatch.setattr(
        sim, "build_two_level_index", lambda *a, **kw: calls.append(True) or orig(*a, **kw)
    )
    emb = read_table(spark, sf_dir, "embeddings")
    got = sim.cosine_near_dup_pairs_ivf(emb, threshold=0.3)
    assert not calls, "500 vectors derive ~22 cells — must stay flat"
    brute = {
        (r["vec_a"], r["vec_b"]): r["cosine"]
        for r in sim.cosine_near_dup_pairs(emb, threshold=0.3, block_col=None).collect()
    }
    rows = got.collect()
    assert rows
    for r in rows:
        assert brute[(r["vec_a"], r["vec_b"])] == r["cosine"]


def test_near_dup_auto_routes_two_level_above_threshold(
    spark, sf_dir, routed
):
    emb = read_table(spark, sf_dir, "embeddings")
    got = sim.cosine_near_dup_pairs_ivf(emb, threshold=0.3)
    assert routed
    brute = {
        (r["vec_a"], r["vec_b"]): r["cosine"]
        for r in sim.cosine_near_dup_pairs(emb, threshold=0.3, block_col=None).collect()
    }
    rows = got.collect()
    assert rows
    for r in rows:
        assert brute[(r["vec_a"], r["vec_b"])] == r["cosine"]


def test_probe_budget_honors_explicit_full_probe():
    """An explicit n_probe must be reachable: the coarse budget
    expands to ceil(n_probe / fine) so n_probe == grid degenerates to
    exact search (the flat-path law); the default stays the derived
    fraction of the actual grid."""
    # full-grid request: every coarse cell must be probed
    npc, npf = sim._two_level_probe_budget(20, 25, 20 * 25)
    assert (npc, npf) == (20, 500)
    # small explicit request keeps the derived coarse floor
    npc, npf = sim._two_level_probe_budget(20, 25, 4)
    assert npc == sim.derived_ivf_probes(20) and npf == 4
    # default: derived fraction of the actual grid, capped reachable
    npc, npf = sim._two_level_probe_budget(20, 25, None)
    assert npf == min(sim.derived_ivf_probes(500), npc * 25)


def test_probe_budget_scales_to_actual_grid():
    """two_level_split's grid (coarse * ceil(cells / coarse)) can
    exceed the REQUESTED cell count; an explicit n_probe expressed
    against the request must rescale to the grid, or n_probe ==
    requested_cells (the flat path's exact-search degenerate) leaves
    the grid's excess cells unprobed and silently loses exactness."""
    # 4999 requested -> 71 x 71 = 5041 grid: full-probe request must
    # cover the WHOLE grid, not just 4999 of its cells
    coarse, fine = sim.two_level_split(4999)
    assert coarse * fine > 4999  # the advisory's premise
    npc, npf = sim._two_level_probe_budget(
        coarse, fine, 4999, requested_cells=4999
    )
    assert (npc, npf) == (coarse, coarse * fine)
    # over-asking (n_probe > requested) also degenerates to full grid
    npc, npf = sim._two_level_probe_budget(
        coarse, fine, 10_000, requested_cells=4999
    )
    assert (npc, npf) == (coarse, coarse * fine)
    # partial budgets keep (at least) the requested probed fraction
    npc, npf = sim._two_level_probe_budget(
        coarse, fine, 100, requested_cells=4999
    )
    assert npf / (coarse * fine) >= 100 / 4999
    assert npf == __import__("math").ceil(100 * coarse * fine / 4999)


def test_cross_coarse_multi_assignment_spans_boundaries(spark, sf_dir):
    """coarse_m=1 confines a vector's assign_m cells to ONE coarse
    cell; coarse_m=assign_m ranks globally across the m nearest
    coarse cells — some vector's two cells must span two coarse ids
    (the boundary-mitigation contract of the routed dedup path), and
    every within-path law still holds (exactly m cells per vector)."""
    from pyspark.sql import functions as F

    emb = read_table(spark, sf_dir, "embeddings")
    coarse = sim.ivf_centroids(emb, n_centroids=4)
    fine = sim.ivf_two_level_centroids(emb, coarse, 3, refine_fine=1)
    within = sim.ivf_two_level_assign(
        emb, coarse, 3, assign_m=2, fine_centroids=fine
    )
    across = sim.ivf_two_level_assign(
        emb, coarse, 3, assign_m=2, fine_centroids=fine, coarse_m=2
    )
    per_vec = lambda df: (
        df.groupBy("vec_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct(F.expr("cell div 3")).alias("n_coarse"),
        )
    )
    w = per_vec(within).agg(
        F.max("n").alias("mx"), F.max("n_coarse").alias("mc")
    ).collect()[0]
    assert w["mx"] == 2 and w["mc"] == 1  # confined to one coarse cell
    a = per_vec(across).agg(
        F.max("n").alias("mx"), F.max("n_coarse").alias("mc")
    ).collect()[0]
    assert a["mx"] == 2 and a["mc"] == 2  # some vector spans coarse cells
