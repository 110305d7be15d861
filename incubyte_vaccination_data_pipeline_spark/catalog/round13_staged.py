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
