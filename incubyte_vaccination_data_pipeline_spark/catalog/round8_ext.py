"""Round-8 additions: four queries — the two scale-path primitives
the LLM-data families still lacked, plus a diversity-sampling
primitive and a temporal-overlap primitive.

- ``ann_knn_join`` — k-NN JOIN (a data-scale query SET against the
  corpus through the shared IVF index, shuffle equi-join on cell id) —
  dataset-to-dataset retrieval: link two embedded corpora, build a kNN
  graph, score an eval set. ``topk_ivf`` broadcasts its handful of
  query rows; a 5%-of-corpus query set must not be broadcast.
- ``dedup_incremental_batch`` — the daily-ingest dedup shape: a new
  batch (planted exact copies, near copies, and novel docs) matched
  against the EXISTING corpus only — batch->corpus band join, never
  batch x batch or corpus x corpus — with an exact-hash fast path and
  an exact/near/novel verdict per arriving doc.

- ``sample_kcenter_coreset`` — greedy farthest-first k-center coreset
  (distributed TakeOrdered argmax per round; only the k chosen
  centers reach the driver).
- ``join_interval_overlap`` — per-supplier overlapping transit-pair
  COUNT via a distributed sweep line (one scan + one keyed window,
  no join).

All four carry full DuckDB value-check oracles (the IVF oracle is the
parameterized ``_ivf_oracle``; the incremental oracle reuses the
minhash CTE arithmetic constants; the coreset and sweep-line oracles
are unrolled-CTE restatements). Registered from
``catalog/__init__.py``; the growth simulation at 200 queries keeps
the re-verification gap at ceil(200/50) = 4
(tests/test_rotation.py::test_simulated_growth_keeps_gap_bounded).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from incubyte_vaccination_data_pipeline_spark.catalog.dedup import (
    NEAR_DUP_TAIL,
    _D1,
    _D2,
    _SIG_LIST,
    _SIG_MINS,
)
from incubyte_vaccination_data_pipeline_spark.catalog.registry import ORACLES, QUERIES
from incubyte_vaccination_data_pipeline_spark.catalog.similarity import (
    IVF_N_PROBE,
    _ivf_index,
    _ivf_assigned_index,
    _ivf_oracle,
)
from incubyte_vaccination_data_pipeline_spark.operators.dedup import (
    incremental_minhash_matches,
    minhash_signatures,
)
from incubyte_vaccination_data_pipeline_spark.shared_cache import BoundedCache
from incubyte_vaccination_data_pipeline_spark.operators.similarity import knn_join_ivf
from incubyte_vaccination_data_pipeline_spark.sources.parquet_io import read_table

#: every 20th vector is a query — a query SET (5% of the corpus), not
#: the few-probe N_QUERY_VECTORS handful the topk queries use
KNN_JOIN_QUERY_PRED = "vec_id % 20 = 0"
KNN_JOIN_K = 5


def ann_knn_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-NN JOIN through the shared IVF index: every 20th corpus vector
    (a 5% query SET) gets its top-5 neighbors — the dataset-to-dataset
    retrieval primitive (kNN-graph build, eval-set scoring, corpus
    linking). Unlike ``ann_ivf_topk``'s broadcast of a handful of
    query rows, BOTH sides here are data-scale: the candidate join is
    a plain shuffle equi-join on the cell id (each side exchanges
    once; candidates form only within probed cells), and the per-query
    top-k window repartitions by query id. Reuses the cached quantizer
    + inverted file, so the warm join pays probe + join + window only.
    Fully deterministic (content-addressed seeds, quantized-integer
    Lloyd mean, explicit tie-breaks), so the oracle replays the whole
    index build and the joined probe in SQL."""
    emb = read_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.expr(KNN_JOIN_QUERY_PRED))
    return knn_join_ivf(
        _ivf_assigned_index(spark, sf_dir),
        _ivf_index(spark, sf_dir),
        queries,
        k=KNN_JOIN_K,
        n_probe=IVF_N_PROBE,
    )


_ANN_KNN_JOIN_ORACLE = _ivf_oracle(query_pred=KNN_JOIN_QUERY_PRED, k=KNN_JOIN_K)


#: the arriving batch: exact copies of every 10th doc, near copies
#: (5-token tail) of every 7th, and genuinely novel docs (reversed
#: text -> disjoint shingles) from every 13th-plus-1 — id offsets keep
#: the three slices and the corpus disjoint
_BATCH_EXACT_OFF = 1_000_000
_BATCH_NEAR_OFF = 2_000_000
_BATCH_NOVEL_OFF = 3_000_000
INCREMENTAL_MIN_EST = 0.5

#: the persisted corpus signature index per (app, corpus) — the thing
#: a production ingest pipeline writes ONCE and probes with every
#: day's batch; warm calls pay only the batch-side pipeline + probe
_SHARED_CORPUS_SIGS = BoundedCache()


def _corpus_sig_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    def build() -> DataFrame:
        docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
        return minhash_signatures(docs).persist()

    return _SHARED_CORPUS_SIGS.get_or_build(
        (spark.sparkContext.applicationId, sf_dir), build
    )


def dedup_incremental_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental ingest dedup: match a NEW document batch against the
    EXISTING corpus and emit one verdict row per arriving doc —
    (batch_doc, match_type exact|near|novel, matched_doc_id,
    est_jaccard). The production shape this encodes: the corpus
    signature/band table is built once (persisted at warehouse scale)
    and each day's batch only hashes itself and probes — batch->corpus
    band equi-join ONLY, never batch x batch or corpus x corpus, so
    per-ingest cost is O(|batch| + collisions) regardless of corpus
    size. Exact matches short-circuit via a content-hash equi-join
    (md5 keyed shuffle, map-side combinable min); near matches come
    from ``incremental_minhash_matches`` with the best match chosen by
    (est_jaccard DESC, corpus_doc ASC); everything else is novel.
    Deterministic end to end — the oracle replays the batch
    construction, both match paths, and the precedence rule."""
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    batch = (
        docs.filter(F.col("doc_id") % 10 == 0)
        .select((F.col("doc_id") + _BATCH_EXACT_OFF).alias("doc_id"), "text")
        .unionByName(
            docs.filter(F.col("doc_id") % 7 == 0).select(
                (F.col("doc_id") + _BATCH_NEAR_OFF).alias("doc_id"),
                F.concat(F.col("text"), F.lit(NEAR_DUP_TAIL)).alias("text"),
            )
        )
        .unionByName(
            docs.filter(F.col("doc_id") % 13 == 1).select(
                (F.col("doc_id") + _BATCH_NOVEL_OFF).alias("doc_id"),
                F.reverse(F.col("text")).alias("text"),
            )
        )
    )
    exact = (
        batch.select(F.col("doc_id").alias("batch_doc"), F.md5("text").alias("h"))
        .join(docs.select(F.md5("text").alias("h"), "doc_id"), "h")
        .groupBy("batch_doc")
        .agg(F.min("doc_id").alias("exact_doc"))
    )
    near_all = incremental_minhash_matches(
        docs,
        batch,
        min_est_jaccard=INCREMENTAL_MIN_EST,
        corpus_sigs=_corpus_sig_index(spark, sf_dir),
    )
    w = Window.partitionBy("batch_doc").orderBy(
        F.col("est_jaccard").desc(), F.col("corpus_doc")
    )
    near = (
        near_all.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "batch_doc",
            F.col("corpus_doc").alias("near_doc"),
            F.col("est_jaccard").alias("near_est"),
        )
    )
    return (
        batch.select(F.col("doc_id").alias("batch_doc"))
        .join(exact, "batch_doc", "left")
        .join(near, "batch_doc", "left")
        .select(
            "batch_doc",
            F.when(F.col("exact_doc").isNotNull(), F.lit("exact"))
            .when(F.col("near_doc").isNotNull(), F.lit("near"))
            .otherwise(F.lit("novel"))
            .alias("match_type"),
            F.coalesce("exact_doc", "near_doc").alias("matched_doc_id"),
            F.when(F.col("exact_doc").isNotNull(), F.lit(1.0))
            .otherwise(F.col("near_est"))
            .alias("est_jaccard"),
        )
    )


_DEDUP_INCREMENTAL_ORACLE = f"""
    WITH batch AS (
        SELECT doc_id + {_BATCH_EXACT_OFF} AS doc_id, text
        FROM documents WHERE doc_id % 10 = 0
        UNION ALL
        SELECT doc_id + {_BATCH_NEAR_OFF}, text || '{NEAR_DUP_TAIL}'
        FROM documents WHERE doc_id % 7 = 0
        UNION ALL
        SELECT doc_id + {_BATCH_NOVEL_OFF}, reverse(text)
        FROM documents WHERE doc_id % 13 = 1
    ),
    exact AS (
        SELECT b.doc_id AS batch_doc, MIN(c.doc_id) AS exact_doc
        FROM batch b JOIN documents c ON md5(b.text) = md5(c.text)
        GROUP BY b.doc_id
    ),
    alldocs AS (
        SELECT doc_id AS doc, text FROM documents
        UNION ALL
        SELECT doc_id AS doc, text FROM batch
    ),
    tok AS (
        SELECT doc, string_split(lower(text), ' ') AS words FROM alldocs
    ),
    sh AS (
        SELECT doc,
               list_transform(range(1, greatest(len(words) - 2, 0) + 1),
                              i -> array_to_string(words[i:i+2], ' ')) AS shingles
        FROM tok
    ),
    shex AS (
        SELECT doc, unnest(shingles) AS s FROM sh WHERE len(shingles) > 0
    ),
    hm AS (
        SELECT doc, md5(s) AS m FROM shex
    ),
    hv AS (
        SELECT doc, {_D1} AS v1, {_D2} AS v2 FROM hm
    ),
    sigagg AS (
        SELECT doc, {_SIG_MINS}
        FROM hv GROUP BY doc
    ),
    sig AS (
        SELECT doc, {_SIG_LIST} AS sig FROM sigagg
    ),
    banded AS (
        SELECT doc, sig,
               unnest(list_transform(range(0, 4),
                   b -> CAST(b AS VARCHAR) || '|'
                        || array_to_string(list_transform(sig[b*3+1:b*3+3],
                                          x -> CAST(x AS VARCHAR)), '|'))) AS band
        FROM sig
    ),
    cpairs AS (
        SELECT DISTINCT bb.doc AS batch_doc, cb.doc AS corpus_doc
        FROM banded bb JOIN banded cb ON bb.band = cb.band
        WHERE bb.doc >= {_BATCH_EXACT_OFF} AND cb.doc < {_BATCH_EXACT_OFF}
    ),
    nest AS (
        SELECT p.batch_doc, p.corpus_doc,
               round(CAST(len(list_filter(range(1, 13),
                                          i -> sa.sig[i] = sb.sig[i])) AS DOUBLE)
                     / 12, 6) AS est_jaccard
        FROM cpairs p
        JOIN sig sa ON sa.doc = p.batch_doc
        JOIN sig sb ON sb.doc = p.corpus_doc
    ),
    near AS (
        SELECT batch_doc, corpus_doc AS near_doc, est_jaccard AS near_est FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY batch_doc
                ORDER BY est_jaccard DESC, corpus_doc) AS rn
            FROM nest WHERE est_jaccard >= {INCREMENTAL_MIN_EST})
        WHERE rn = 1
    )
    SELECT b.doc_id AS batch_doc,
           CASE WHEN e.exact_doc IS NOT NULL THEN 'exact'
                WHEN n.near_doc IS NOT NULL THEN 'near'
                ELSE 'novel' END AS match_type,
           COALESCE(e.exact_doc, n.near_doc) AS matched_doc_id,
           CASE WHEN e.exact_doc IS NOT NULL THEN 1.0
                ELSE n.near_est END AS est_jaccard
    FROM batch b
    LEFT JOIN exact e ON b.doc_id = e.batch_doc
    LEFT JOIN near n ON b.doc_id = n.batch_doc
    """


KCENTER_K = 8


def _d2_cols_sql(a: str, b: str) -> str:
    """In-order squared-L2 between two DuckDB list columns — the same
    left fold (index order, identical double op sequence) as the Spark
    side's ``_dist2_lit`` zip_with aggregate."""
    diff = f"(CAST({a}[i] AS DOUBLE) - CAST({b}[i] AS DOUBLE))"
    return (
        f"list_reduce(list_prepend(CAST(0 AS DOUBLE),"
        f" list_transform(range(1, len({a}) + 1),"
        f" i -> {diff} * {diff})),"
        f" (x, y) -> x + y)"
    )


def sample_kcenter_coreset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy k-center coreset over the embedding corpus
    (farthest-first traversal, k=8): the diversity-sampling primitive
    of training-data selection — coreset construction, active-learning
    seeding, prototype picking. Each round's argmax-of-min-distance is
    a DISTRIBUTED TakeOrdered; only the k chosen centers are collected
    (the iterative-driver-program pattern of the IVF quantizer). Fully
    deterministic (min-id seed, index-order distance folds against
    literal centers, exact min, lowest-id tie-break), so the oracle
    unrolls all k selection rounds in SQL — the PageRank recipe.
    Emits (center_rank, vec_id, min_dist2): the coverage radius at
    selection, i.e. the k-center objective's trajectory."""
    from incubyte_vaccination_data_pipeline_spark.operators.similarity import (
        kcenter_coreset,
    )

    emb = read_table(spark, sf_dir, "embeddings")
    centers = kcenter_coreset(emb, k=KCENTER_K)
    out = spark.createDataFrame(
        centers, "center_rank int, vec_id bigint, min_dist2 double"
    )
    return out.select(
        "center_rank", "vec_id", F.round("min_dist2", 6).alias("min_dist2")
    )


def _kcenter_oracle(k: int = KCENTER_K) -> str:
    d2 = _d2_cols_sql
    ctes = [
        """c0 AS (
        SELECT vec_id, embedding FROM embeddings
        WHERE vec_id = (SELECT MIN(vec_id) FROM embeddings)
    )"""
    ]
    for r in range(1, k):
        prev = [f"c{j}" for j in range(r)]
        dists = [d2("e.embedding", f"{p}.embedding") for p in prev]
        mind = f"LEAST({', '.join(dists)})" if len(dists) > 1 else dists[0]
        not_chosen = " AND ".join(f"e.vec_id <> {p}.vec_id" for p in prev)
        ctes.append(
            f"""c{r} AS (
        SELECT e.vec_id, e.embedding, {mind} AS d
        FROM embeddings e, {', '.join(prev)}
        WHERE {not_chosen}
        ORDER BY d DESC, e.vec_id LIMIT 1
    )"""
        )
    selects = ["SELECT CAST(0 AS INT) AS center_rank, vec_id, CAST(0.0 AS DOUBLE) AS min_dist2 FROM c0"]
    selects += [
        f"SELECT CAST({r} AS INT), vec_id, ROUND(d, 6) FROM c{r}" for r in range(1, k)
    ]
    return "WITH " + ",\n    ".join(ctes) + "\n    " + "\n    UNION ALL ".join(selects)


_SAMPLE_KCENTER_ORACLE = _kcenter_oracle()


#: deterministic synthesized transit duration in days (the testdata
#: has no receipt date): 3..16 days from the quantity. floor() before
#: the int cast makes the derivation engine-portable by construction:
#: Spark truncates double->int while DuckDB rounds half-away, so a
#: bare CAST agrees only while quantities happen to be integral
#: (ADVICE r8).
_TRANSIT_DAYS_SQL = "(CAST(floor(l_quantity) AS INT) % 14) + 3"


def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap pair COUNT via a distributed sweep line — the
    temporal/range primitive Spark lacks natively (concurrent
    sessions, co-active shipments, genomics-style range overlap): per
    supplier, how many unordered pairs of lineitems have overlapping
    transit intervals [shipdate, shipdate + 3..16 d].

    The scale insight: COUNTING overlaps needs no pair enumeration.
    With intervals sorted by start, a pair overlaps iff the
    later-starting interval begins before the earlier one ends, so
    per supplier ``pairs = C(n,2) - sum over starts of (#ends
    strictly before that start)`` — one union of (start, end) events,
    ONE keyed window (ends order after starts at equal time, which is
    exactly the inclusive-overlap boundary), one aggregate. O(n log n)
    per key where any enumeration path is output-bound (1.4M pairs at
    sf0.1): measured 0.6s vs 2.9s for the month-bin-blocked candidate
    join (which remains the right shape when the pairs themselves are
    needed — see the plan guard test). All arithmetic is exact
    integers; the oracle counts the same unordered row pairs by the
    INDEPENDENT algorithm (the O(n^2) keyed join), making this a
    cross-algorithm value check like the components oracle. Dates are
    compared as DATE in both engines (midnight timestamps in the
    testdata); suppliers with zero overlapping pairs are omitted
    (matching the oracle's inner-join shape)."""
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_suppkey",
        F.to_date("l_shipdate").alias("s"),
        F.expr(f"date_add(to_date(l_shipdate), {_TRANSIT_DAYS_SQL})").alias("r"),
    )
    return _sweep_overlap_counts(li, key_col="l_suppkey")


def _sweep_overlap_counts(intervals: DataFrame, key_col: str) -> DataFrame:
    """The sweep core over an (key, s, r) interval frame: one in-row
    event explode (ONE scan — a union of two selects would duplicate
    the subtree into two), one keyed window, one aggregate. Ends order
    AFTER starts at equal time, which is exactly the inclusive-overlap
    boundary (an interval ending the day another starts overlaps it).
    Emits (suppkey, n_overlapping_pairs) for keys with >= 1 pair."""
    events = intervals.select(
        F.col(key_col).alias("__k"),
        F.explode(
            F.expr(
                "array(struct(s as t, 0 as is_end), struct(r as t, 1 as is_end))"
            )
        ).alias("e"),
    ).select("__k", F.col("e.t").alias("t"), F.col("e.is_end").alias("is_end"))
    w = (
        Window.partitionBy("__k")
        .orderBy("t", "is_end")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    swept = events.withColumn("ends_before", F.sum("is_end").over(w))
    agg = swept.groupBy("__k").agg(
        F.sum(F.when(F.col("is_end") == 0, F.col("ends_before"))).alias(
            "sum_ends_before"
        ),
        F.sum(F.when(F.col("is_end") == 0, 1).otherwise(0)).alias("n"),
    )
    return (
        agg.select(
            F.col("__k").alias("suppkey"),
            (F.col("n") * (F.col("n") - 1) / 2 - F.col("sum_ends_before"))
            .cast("bigint")
            .alias("n_overlapping_pairs"),
        )
        .filter(F.col("n_overlapping_pairs") > 0)
    )


#: the oracle counts unordered overlapping ROW pairs by the independent
#: O(n^2) keyed join; ROW_NUMBER assigns an arbitrary row identity but
#: the COUNT of unordered pairs is invariant to the assignment (and the
#: testdata violates the (orderkey, linenumber) PK, so ids cannot serve
#: as pair identity)
_JOIN_INTERVAL_OVERLAP_ORACLE = f"""
    WITH iv AS (
        SELECT l_suppkey AS sk,
               ROW_NUMBER() OVER () AS rid,
               CAST(l_shipdate AS DATE) AS s,
               CAST(l_shipdate AS DATE) + to_days({_TRANSIT_DAYS_SQL}) AS r
        FROM lineitem
    )
    SELECT a.sk AS suppkey, COUNT(*) AS n_overlapping_pairs
    FROM iv a JOIN iv b ON a.sk = b.sk
     AND a.rid < b.rid AND a.s <= b.r AND b.s <= a.r
    GROUP BY a.sk
    """


STAGED = {
    "ann_knn_join": (ann_knn_join, _ANN_KNN_JOIN_ORACLE),
    "dedup_incremental_batch": (dedup_incremental_batch, _DEDUP_INCREMENTAL_ORACLE),
    "sample_kcenter_coreset": (sample_kcenter_coreset, _SAMPLE_KCENTER_ORACLE),
    "join_interval_overlap": (join_interval_overlap, _JOIN_INTERVAL_OVERLAP_ORACLE),
}


def register(names: list[str] | None = None) -> None:
    """Move the round-8 queries into the live registry (called from
    catalog/__init__.py)."""
    for name in (names if names is not None else list(STAGED)):
        fn, oracle = STAGED[name]
        QUERIES[name] = fn
        ORACLES[name] = oracle
