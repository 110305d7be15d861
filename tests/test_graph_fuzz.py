"""Randomized brute-force cross-checks for the graph operators added
in rounds 11-12 (triangle_counts, kcore): seeded random graphs, a
pure-Python reference implementation computed independently of any
Spark code path, exact equality required. The planted-structure unit
tests pin known shapes; this pins the operators on ADVERSARIALLY
shapeless inputs (dense pockets, isolated nodes, chains, reversed and
duplicated edges)."""

from __future__ import annotations

import itertools
import random

import pytest


def _random_graph(seed: int, n_nodes: int, p: float):
    """Deterministic Erdos-Renyi-ish edge list WITH dirt: each chosen
    edge may appear reversed or duplicated (the defensive
    canonicalization contract)."""
    rng = random.Random(seed)
    edges = []
    adj = set()
    for a, b in itertools.combinations(range(n_nodes), 2):
        if rng.random() < p:
            adj.add((a, b))
            style = rng.random()
            if style < 0.2:
                edges.append((b, a))  # reversed
            elif style < 0.3:
                edges.append((a, b))
                edges.append((b, a))  # bidirectional dup
            else:
                edges.append((a, b))
    if rng.random() < 0.5 and n_nodes:
        edges.append((0, 0))  # self-loop, must be ignored
    return edges, adj


def _ref_triangles(adj: set[tuple[int, int]]) -> dict[int, int]:
    nodes = sorted({x for e in adj for x in e})
    out: dict[int, int] = {}
    for a, b, c in itertools.combinations(nodes, 3):
        if (a, b) in adj and (b, c) in adj and (a, c) in adj:
            for x in (a, b, c):
                out[x] = out.get(x, 0) + 1
    return out


def _ref_kcore(adj: set[tuple[int, int]], k: int) -> dict[int, int]:
    cur = set(adj)
    while True:
        deg: dict[int, int] = {}
        for a, b in cur:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        drop = {n for n, d in deg.items() if d < k}
        if not drop:
            return deg
        cur = {e for e in cur if e[0] not in drop and e[1] not in drop}


@pytest.mark.parametrize("seed", range(6))
def test_triangle_counts_random_graphs(spark, seed):
    from incubyte_vaccination_data_pipeline_spark.operators.graph_metrics import (
        triangle_counts,
    )

    n, p = 14 + seed, 0.25 + 0.05 * (seed % 3)
    edges, adj = _random_graph(seed, n, p)
    df = spark.createDataFrame(edges or [(0, 1)], "lo int, hi int")
    got = {r["node"]: r["n_triangles"] for r in triangle_counts(df).collect()}
    want = _ref_triangles(adj if edges else {(0, 1)})
    assert got == want, (seed, got, want)


@pytest.mark.parametrize("seed,k", [(0, 2), (1, 2), (2, 3), (3, 3), (4, 4)])
def test_kcore_fixpoint_random_graphs(spark, seed, k):
    from incubyte_vaccination_data_pipeline_spark.operators.graph_metrics import (
        kcore,
    )

    edges, adj = _random_graph(100 + seed, 16, 0.3)
    df = spark.createDataFrame(edges or [(0, 1)], "lo int, hi int")
    got = {r["node"]: r["degree"] for r in kcore(df, k).collect()}
    want = _ref_kcore(adj if edges else {(0, 1)}, k)
    assert got == want, (seed, k, got, want)
    # fixed-round upper approximation: every fixpoint survivor is in
    # any m-round peel's survivor set
    for m in (1, 2):
        fixed = {r["node"] for r in kcore(df, k, max_rounds=m).collect()}
        assert set(want) <= fixed


@pytest.mark.parametrize("seed", range(4))
def test_occupancy_probes_random_inputs(spark, seed):
    """occupancy_probes_expr vs an independent Python reference:
    random centroids / counts / coverage, in-order dot-product fold,
    exclusive-prefix cut with the >=-before-add law and the min_probe
    floor. Continuous random scores make ties measure-zero."""
    from incubyte_vaccination_data_pipeline_spark.operators.similarity import (
        occupancy_probes_expr,
    )
    import math

    rng = random.Random(1000 + seed)
    dims, n_cells = 6, 5 + seed
    cents = [[rng.uniform(-1, 1) for _ in range(dims)] for _ in range(n_cells)]
    counts = [rng.randint(0, 40) for _ in range(n_cells)]
    coverage = rng.choice([0.1, 0.25, 0.5, 0.9])
    min_probe = rng.choice([1, 2])
    queries = [[rng.uniform(-1, 1) for _ in range(dims)] for _ in range(5)]

    def ref(q):
        scores = []
        for i, c in enumerate(cents):
            s = 0.0
            for a, b in zip(q, c):  # in-order fold, like _dot_lit
                s += a * b
            scores.append((-s, i))
        ranked = [cid for _, cid in sorted(scores)]
        target = math.ceil(coverage * max(1, sum(counts)))
        cum, kept = 0, 0
        for cid in ranked:
            if cum >= target:
                break
            cum += counts[cid]
            kept += 1
        return ranked[: max(min_probe, kept)]

    df = spark.createDataFrame([(q,) for q in queries], "v array<double>")
    col = occupancy_probes_expr(
        "v", cents, counts, coverage=coverage, min_probe=min_probe
    )
    got = [r["p"] for r in df.select(col.alias("p")).collect()]
    assert got == [ref(q) for q in queries], (seed, coverage, counts)
