"""Round-13 staging registry (window protection: registering mid-round
would re-sort the driver window under the slots round 12 promised —
``register_r13()`` lands these at the round-13 kickoff, exactly like
``round12_staged.register_r12()`` did).

- ``ann_ivf_occupancy_topk`` — approximate cosine top-10 through the
  shared flat IVF index with OCCUPANCY-AWARE probing
  (``operators/similarity.occupancy_probes_expr`` via
  ``topk_ivf(coverage=...)``, new in round 12): each query probes its
  distance-ranked cells until their cumulative inverted-file
  occupancy reaches 25% of the corpus, instead of a fixed 4-of-16
  cells. On a skewed quantizer this GUARANTEES per-query candidate
  work == coverage x N where fixed-count probing only averages it
  (SCALE.md: +0.8pp recall at matched budget on the Zipf-clustered
  corpus; the real use is fixed-grid / stale quantizers). The oracle
  replays the whole quantizer plus the occupancy cut (ranked cells
  LEFT JOIN cell counts, exclusive running sum vs ceil(coverage x N),
  min-probe floor) in SQL — ``_ivf_oracle(occupancy_coverage=...)``,
  parameterized with the sha256 byte-identity check the staging
  protocol requires.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from incubyte_vaccination_data_pipeline_spark.sources.parquet_io import read_table

STAGED: dict = {}

#: the probed occupancy fraction — matches the family's 25% probed
#: fraction contract (4-of-16 cells on the small-SF pin), expressed
#: against corpus OCCUPANCY instead of cell count
OCC_COVERAGE = 0.25

_CELL_COUNTS_CACHE: dict = {}


def _ivf_cell_counts(spark: SparkSession, sf_dir: str) -> list[int]:
    """Per-(app, corpus) inverted-file cell sizes (C ints) — amortized
    alongside the shared quantizer/inverted file, so the occupancy
    query does NOT re-collect them on every materialization (it would
    otherwise pay an eager groupBy+collect per bench run). Plain dict
    (not a registered frame cache): the value is a Python list, no
    persisted RDD to sweep."""
    from incubyte_vaccination_data_pipeline_spark.catalog.similarity import (
        _ivf_assigned_index,
        _ivf_index,
    )

    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _CELL_COUNTS_CACHE:
        n = len(_ivf_index(spark, sf_dir))
        counts = [0] * n
        for r in (
            _ivf_assigned_index(spark, sf_dir).groupBy("cid").count().collect()
        ):
            counts[r["cid"]] = int(r["count"])
        _CELL_COUNTS_CACHE[key] = counts
    return _CELL_COUNTS_CACHE[key]


def ann_ivf_occupancy_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cosine top-10 through the shared flat IVF index with the
    occupancy cut: probes per query are VARIABLE — the shortest
    distance-ranked cell prefix whose cumulative occupancy reaches
    25% of the corpus (``occupancy_probes_expr``'s single-fold
    expression; no shuffle, no UDF). Shares ``_ivf_index`` /
    ``_ivf_assigned_index`` with the fixed-probe search family —
    build once, probe many. Differs from ``ann_ivf_topk`` exactly
    where cell populations skew: dense-cell queries stop early,
    sparse-cell queries escalate, per-query candidate work is pinned
    at coverage x N by construction."""
    from incubyte_vaccination_data_pipeline_spark.catalog.similarity import (
        N_QUERY_VECTORS,
        TOP_K,
        _ivf_assigned_index,
        _ivf_index,
    )
    from incubyte_vaccination_data_pipeline_spark.operators.similarity import (
        topk_ivf,
    )

    emb = read_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERY_VECTORS)
    return topk_ivf(
        emb,
        queries,
        k=TOP_K,
        centroids=_ivf_index(spark, sf_dir),
        assigned_corpus=_ivf_assigned_index(spark, sf_dir),
        coverage=OCC_COVERAGE,
        cell_counts=_ivf_cell_counts(spark, sf_dir),
    )


def _occupancy_oracle() -> str:
    from incubyte_vaccination_data_pipeline_spark.catalog.similarity import (
        _ivf_oracle,
    )

    return _ivf_oracle(occupancy_coverage=OCC_COVERAGE)


STAGED["ann_ivf_occupancy_topk"] = (
    ann_ivf_occupancy_topk_q,
    _occupancy_oracle(),
)


#: k-core pins: small fixed peel count so the oracle is a fixed CTE
#: pipeline (the LPA_ROUNDS precedent); the operator's fixpoint path
#: (max_rounds=None, durable_checkpoint per round) is the deployment
#: shape and is pinned against this query in tests (fixpoint core is
#: a SUBSET of any fixed-round peel).
KCORE_K = 2
KCORE_ROUNDS = 2


def graph_kcore_peel_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-round k=2 core peel over the shared support-2 co-purchase
    graph (``operators/graph_metrics.kcore`` with ``max_rounds``
    pinned — each round drops nodes of degree < 2 and the edges they
    carry): the density decomposition between connected components
    (k=1) and cliques, the sixth member of the graph family. Returns
    (part, degree) over the surviving subgraph, degree AFTER the
    final peel. The fixed-round form is an upper approximation of the
    true core (supersets it — and vividly so where the support
    threshold leaves long chains: 160 vs 18 nodes at sf0.1, chains
    peel one link per round); the operator's fixpoint path is the
    run-to-convergence deployment shape, checkpointed per round.
    k=2 keeps the query non-vacuous across the whole SF ladder (the
    sf0.1 signal graph has NO 3-core)."""
    from incubyte_vaccination_data_pipeline_spark.catalog.graph import (
        _copurchase_pairs,
    )
    from incubyte_vaccination_data_pipeline_spark.operators.graph_metrics import (
        kcore,
    )

    edges = _copurchase_pairs(spark, sf_dir).select(
        F.col("pa").alias("lo"), F.col("pb").alias("hi")
    )
    return kcore(edges, KCORE_K, max_rounds=KCORE_ROUNDS).select(
        F.col("node").alias("part"), "degree"
    )


def _kcore_oracle() -> str:
    # the CTE chain hand-writes exactly TWO peel rounds (d0/keep0/e1,
    # d1/keep1/e2); bumping KCORE_ROUNDS without rewriting it would
    # silently desynchronize query and oracle — a real exception, not
    # assert, so `python -O` cannot strip the guard
    if KCORE_ROUNDS != 2:
        raise RuntimeError(
            "_kcore_oracle hardcodes two peel rounds; rewrite the CTE "
            f"chain before setting KCORE_ROUNDS={KCORE_ROUNDS}"
        )
    from incubyte_vaccination_data_pipeline_spark.catalog.graph import (
        PAIRS_LOHI_CTE,
    )

    k = KCORE_K
    return f"""
    WITH {PAIRS_LOHI_CTE},
    d0 AS (
        SELECT node, COUNT(*) AS degree FROM (
            SELECT lo AS node FROM pairs UNION ALL SELECT hi FROM pairs)
        GROUP BY node
    ),
    keep0 AS (SELECT node FROM d0 WHERE degree >= {k}),
    e1 AS (
        SELECT p.lo, p.hi FROM pairs p
        WHERE p.lo IN (SELECT node FROM keep0)
          AND p.hi IN (SELECT node FROM keep0)
    ),
    d1 AS (
        SELECT node, COUNT(*) AS degree FROM (
            SELECT lo AS node FROM e1 UNION ALL SELECT hi FROM e1)
        GROUP BY node
    ),
    keep1 AS (SELECT node FROM d1 WHERE degree >= {k}),
    e2 AS (
        SELECT p.lo, p.hi FROM e1 p
        WHERE p.lo IN (SELECT node FROM keep1)
          AND p.hi IN (SELECT node FROM keep1)
    )
    SELECT node AS part, CAST(COUNT(*) AS BIGINT) AS degree FROM (
        SELECT lo AS node FROM e2 UNION ALL SELECT hi FROM e2)
    GROUP BY node
"""


STAGED["graph_kcore_peel"] = (graph_kcore_peel_q, _kcore_oracle())


#: exact-size stratified sampling: per-stratum budget = ceil(frac x
#: stratum size) — experiment design needs exact counts per stratum,
#: which the registered rate-based samplers (hash-threshold
#: predicates) only deliver in expectation.
STRAT_FRAC = 0.1


def sample_stratified_exact_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT-size stratified sample of ``documents`` by language:
    every stratum contributes exactly ceil(0.1 x its size) documents,
    chosen by content-hash order (md5(doc_id), doc_id — deterministic
    on every engine and run, no TABLESAMPLE nondeterminism). The
    counted-budget complement to ``sample_stratified_orders``'s
    rate-based hash predicate: a scan-side filter samples at a RATE
    (exact only in expectation); an eval-set builder or per-language
    training quota needs the exact count. One keyed shuffle (the
    per-stratum window); no driver-side work. Returns
    (doc_id, lang, rn) — rank within stratum kept so downstream can
    tighten the budget without resampling."""
    from pyspark.sql import Window

    docs = read_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    wn = Window.partitionBy("lang")
    return (
        docs.select(
            "doc_id",
            "lang",
            F.row_number().over(w).alias("rn"),
            F.count(F.lit(1)).over(wn).alias("__n"),
        )
        .filter(
            F.col("rn")
            <= F.ceil(F.lit(STRAT_FRAC) * F.col("__n")).cast("long")
        )
        .select("doc_id", "lang", "rn")
    )


_STRAT_ORACLE = f"""
    SELECT doc_id, lang, rn FROM (
        SELECT doc_id, lang,
               ROW_NUMBER() OVER (
                   PARTITION BY lang
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn,
               COUNT(*) OVER (PARTITION BY lang) AS n
        FROM documents)
    WHERE rn <= CAST(ceil({STRAT_FRAC} * n) AS BIGINT)
"""


STAGED["sample_stratified_exact"] = (sample_stratified_exact_q, _STRAT_ORACLE)


def register_r13(names: list[str] | None = None) -> None:
    """Land the round-13 staged queries in the live registry — call
    from ``catalog/__init__.py`` at the round-13 kickoff, AFTER the
    existing registrations (so this round's promised window slots
    keep their order)."""
    from incubyte_vaccination_data_pipeline_spark.catalog.registry import (
        ORACLES,
        QUERIES,
    )

    for name in (names if names is not None else list(STAGED)):
        fn, oracle = STAGED[name]
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
