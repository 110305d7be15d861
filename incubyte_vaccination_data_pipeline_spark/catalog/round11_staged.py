"""Second round-11 staging batch (registration deferred — window
protection, same rationale as ``round10_ext.STAGED_R11``): nine
operators the catalog lacked.

- ``text_substring_dedup`` — per-document duplicated-substring
  statistics: the exact cross-document word-8-gram duplication signal
  behind "strip verbatim-repeated passages before training" (the
  position-level complement of the doc-level dedup family: MinHash
  finds near-duplicate DOCUMENTS; this finds duplicated PASSAGES
  inside otherwise-unique documents). Exact integer arithmetic plus
  one int/int division, so the DuckDB oracle value-checks every row.
- ``text_bm25_topk`` — BM25 (k1=1.2, b=0.75) relevance ranking of the
  corpus for a CORPUS-DERIVED query (the 5 highest-document-frequency
  tokens of length >= 4, ties by token): the retrieval primitive
  behind relevance-filtered corpus selection and RAG candidate
  generation. Two-pass plan: one token aggregate derives df / the
  query terms / corpus stats, then a broadcast of the 5-term query
  frame scores only matching postings.
- ``dedup_embedding_ivf`` — semantic near-dup pairs THROUGH the
  shared IVF index with top-2 multi-assignment: the content-derived
  block that replaces O(n^2) all-pairs scoring with O(sum cell^2).
- ``events_holt_winters`` — additive seasonal (triple exponential)
  smoothing, weekly period: completes SES -> Holt -> Holt-Winters.
- ``graph_label_propagation`` — synchronous majority-label community
  detection (2 rounds) over the shared co-purchase edges: the fifth
  graph-family member, splitting on density where components split
  only on disconnection.
- ``text_substring_removal_plan`` — the substring-dedup ACTION
  statistic: per document, the exact word count inside at least one
  cross-document duplicated 8-gram (the interval union of duplicated
  positions — what a span-deletion pass would remove).
- ``ann_mips_topk`` — exact maximum-inner-product top-k: the third
  similarity objective (cosine ranks by angle, MIPS by angle times
  magnitude); the indexed scale path is the augmented-dimension
  MIPS->cosine reduction through the shared IVF pipeline.
- ``dedup_embedding_ivf_hier`` — the same semantic dedup through the
  TWO-LEVEL quantizer (``ivf_two_level_assign`` + one distributed
  fine-seed Lloyd refinement): the assignment shape that survives
  cell counts past literal codegen, value-checked end to end by an
  independent SQL restatement of the whole hierarchy.
- ``ann_ivf_hier_topk`` — top-k SEARCH through the same two-level
  index (``topk_two_level``): coarse probes -> fine-centroid probes
  over only the probed coarse cells -> exact-cosine rerank of the
  probed inverted file; probing everything degenerates to exact
  brute force (the pinned recall-1 law).

All are registered in round 11 via ``round10_ext.register_r11()``
(this module's STAGED dict is merged into ``round10_ext.STAGED_R11``
at import); the growth simulation at 212 registered queries (201 live
+ 11 staged) keeps the re-verification gap at ceil(212/50) = 5.

Reference parity note: the reference (a 1,172-LoC pandas+Snowflake
ETL, see SURVEY.md) has no corpus-analysis surface; these extend the
engine's training-data family per the build charter, like the rest of
the text/dedup catalog.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from incubyte_vaccination_data_pipeline_spark.operators.dedup import (
    md5_half_decode_sql,
    substring_dup_coverage,
    substring_dup_stats,
    substring_gram_frames,
)
from incubyte_vaccination_data_pipeline_spark.catalog.graph import (
    TRIANGLE_MIN_SUPPORT,
)
from incubyte_vaccination_data_pipeline_spark.shared_cache import register_dict_cache
from incubyte_vaccination_data_pipeline_spark.sources.parquet_io import read_table

#: substring-dedup contract: word-8-gram positions, duplicated =
#: appears in >= 2 distinct docs, flag at 20% duplicated positions.
SUBSTR_K = 8
SUBSTR_MIN_DOCS = 2
SUBSTR_FLAG_FRAC = 0.2

_SUBSTR_FRAMES_CACHE: dict = register_dict_cache({})


def _substr_frames(spark: SparkSession, sf_dir: str):
    """Per-(app, corpus) persisted :func:`substring_gram_frames`
    triple. Round 13: the stats and removal-plan queries each re-ran
    the word-8-gram explode + one-md5-per-occurrence hash AND
    re-shuffled the exploded frame on the gram key per
    materialization — the two heaviest non-streaming catalog entries
    (r12 verdict item 4). The shared triple pays the explode and the
    gram exchange once per corpus; both queries keep only their final
    per-doc aggregation as per-run work. Values are pinned identical
    to the unshared operator paths (tests/test_shared_cache.py)."""
    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _SUBSTR_FRAMES_CACHE:
        pos, per_doc_gram, gram_docs = substring_gram_frames(
            read_table(spark, sf_dir, "documents"), k=SUBSTR_K
        )
        # persist only the two frames the registered queries consume
        # (stats reads per_doc_gram, coverage reads pos); gram_docs
        # stays lazy — pinning a corpus-sized per-gram frame in
        # executor storage with no consumer wastes storage memory and
        # evicts frames that ARE reused (r13 advice)
        _SUBSTR_FRAMES_CACHE[key] = (
            pos.persist(),
            per_doc_gram.persist(),
            gram_docs,
        )
    return _SUBSTR_FRAMES_CACHE[key]


def text_substring_dedup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document duplicated-substring statistics over word-8-gram
    positions (``operators/dedup.substring_dup_stats``): n_shingles =
    k-gram positions, dup_shingles = positions whose k-gram occurs in
    >= 2 distinct documents, dup_frac rounded to 6 dp, dup_heavy at
    20%. The synthetic corpus's planted exact/near duplicates make the
    flag discriminate (pinned in tests) instead of being constant."""
    return substring_dup_stats(
        read_table(spark, sf_dir, "documents"),
        k=SUBSTR_K,
        min_docs=SUBSTR_MIN_DOCS,
        flag_frac=SUBSTR_FLAG_FRAC,
        frames=_substr_frames(spark, sf_dir),
    )


_SUBSTR_V1 = md5_half_decode_sql("m", 1, "strpos")
_SUBSTR_V2 = md5_half_decode_sql("m", 9, "strpos")

_SUBSTR_ORACLE = f"""
    WITH ws AS (
        SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents
    ),
    sh AS (
        SELECT doc_id,
               md5(unnest(list_transform(
                   range(1, greatest(len(w) - {SUBSTR_K - 1}, 0) + 1),
                   i -> array_to_string(
                       list_slice(w, i, i + {SUBSTR_K - 1}), ' ')))) AS m
        FROM ws
    ),
    h AS (
        SELECT doc_id, {_SUBSTR_V1} AS v1, {_SUBSTR_V2} AS v2 FROM sh
    ),
    per AS (
        SELECT v1, v2, doc_id, CAST(COUNT(*) AS BIGINT) AS occ
        FROM h GROUP BY v1, v2, doc_id
    ),
    nd AS (
        SELECT v1, v2, CAST(COUNT(*) AS BIGINT) AS nd
        FROM per GROUP BY v1, v2
    ),
    stats AS (
        SELECT doc_id,
               CAST(SUM(occ) AS BIGINT) AS n_shingles,
               CAST(SUM(CASE WHEN nd >= {SUBSTR_MIN_DOCS} THEN occ
                             ELSE 0 END) AS BIGINT) AS dup_shingles
        FROM per JOIN nd USING (v1, v2)
        GROUP BY doc_id
    )
    SELECT doc_id, n_shingles, dup_shingles,
           round(CAST(dup_shingles AS DOUBLE) / n_shingles, 6) AS dup_frac,
           CAST(round(CAST(dup_shingles AS DOUBLE) / n_shingles, 6)
                >= {SUBSTR_FLAG_FRAC} AS INT) AS dup_heavy
    FROM stats
"""


#: BM25 contract: standard Okapi parameters, 5 corpus-derived query
#: terms (highest df, len >= 4, ties by token), top 20 documents.
BM25_K1 = 1.2
BM25_B = 0.75
BM25_N_TERMS = 5
BM25_TOP_K = 20
BM25_MIN_TOK_LEN = 4


def text_bm25_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-20 documents for the corpus-derived 5-term query.

    Plan shape (the retrieval-filtering pass of corpus curation at
    scale): ONE (doc, token) aggregate feeds both document frequency
    and the query-term derivation; the 5-term query frame and the
    1-row corpus stats broadcast, so scoring touches only the postings
    of the 5 query terms (a broadcast-join prune, never a full-corpus
    re-scan); the global top-20 is ``orderBy().limit()`` — Spark's
    TakeOrdered, a per-partition heap + driver merge of 20-row heads,
    NOT a single-partition global sort — and the dense rank is a
    window over only the 20 surviving rows. idf = ln(1 + (N - df +
    0.5)/(df + 0.5)) (the non-negative Okapi variant); the 6-dp round
    of a <= 5-term double sum is engine-stable (same precedent as
    ``events_value_trend``)."""
    docs = read_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.split(F.lower("text"), " ")).alias("tok")
    ).filter(F.length("tok") >= BM25_MIN_TOK_LEN)
    tf = toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    qterms = dfreq.orderBy(F.col("df").desc(), "tok").limit(BM25_N_TERMS)
    dl = docs.select(
        "doc_id", F.size(F.split(F.lower("text"), " ")).alias("dl")
    )
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    norm = F.col("tf") + F.lit(BM25_K1) * (
        F.lit(1.0 - BM25_B) + F.lit(BM25_B) * F.col("dl") / F.col("avgdl")
    )
    contrib = idf * (F.col("tf") * F.lit(BM25_K1 + 1.0)) / norm
    scored = (
        tf.join(F.broadcast(qterms), "tok")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(
            F.round(F.sum(contrib), 6).alias("bm25"),
            F.count(F.lit(1)).alias("n_query_terms"),
        )
    )
    top = scored.orderBy(F.col("bm25").desc(), "doc_id").limit(BM25_TOP_K)
    from pyspark.sql import Window

    w = Window.orderBy(F.col("bm25").desc(), "doc_id")
    return top.withColumn("rank", F.row_number().over(w))


_BM25_ORACLE = f"""
    WITH toks AS (
        SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok
        FROM documents
    ),
    tf AS (
        SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf
        FROM toks WHERE length(tok) >= {BM25_MIN_TOK_LEN}
        GROUP BY doc_id, tok
    ),
    dfreq AS (
        SELECT tok, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY tok
    ),
    q AS (
        SELECT tok, df FROM dfreq ORDER BY df DESC, tok LIMIT {BM25_N_TERMS}
    ),
    dl AS (
        SELECT doc_id, len(string_split(lower(text), ' ')) AS dl
        FROM documents
    ),
    stats AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_docs, avg(dl) AS avgdl FROM dl
    ),
    scored AS (
        SELECT tf.doc_id,
               round(SUM(
                   ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
                   * (tf * {BM25_K1 + 1.0})
                   / (tf + {BM25_K1} * ({1.0 - BM25_B} + {BM25_B} * dl / avgdl))
               ), 6) AS bm25,
               CAST(COUNT(*) AS BIGINT) AS n_query_terms
        FROM tf
        JOIN q USING (tok)
        JOIN dl USING (doc_id)
        CROSS JOIN stats
        GROUP BY tf.doc_id
    )
    SELECT doc_id, bm25, n_query_terms,
           CAST(rank AS BIGINT) AS rank
    FROM (
        SELECT doc_id, bm25, n_query_terms,
               ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id) AS rank
        FROM scored
    )
    WHERE rank <= {BM25_TOP_K}
"""


def text_substring_removal_plan_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring-dedup REMOVAL PLAN
    (``operators/dedup.substring_dup_coverage``): per document, the
    exact number of words inside at least one cross-document duplicated
    8-gram — the volume a span-deletion pass would remove, computed as
    the interval union of duplicated positions (positions overlap;
    ``text_substring_dedup`` counts positions, this counts deletable
    words). Docs with >= k words all appear, zero-coverage included."""
    return substring_dup_coverage(
        read_table(spark, sf_dir, "documents"),
        k=SUBSTR_K,
        min_docs=SUBSTR_MIN_DOCS,
        frames=_substr_frames(spark, sf_dir),
    )


_REMOVAL_ORACLE = f"""
    WITH ws AS (
        SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents
    ),
    eligible AS (
        SELECT doc_id, w FROM ws WHERE len(w) >= {SUBSTR_K}
    ),
    sh AS (
        SELECT doc_id,
               unnest(range(1, greatest(len(w) - {SUBSTR_K - 1}, 0) + 1)) AS pos,
               unnest(list_transform(
                   range(1, greatest(len(w) - {SUBSTR_K - 1}, 0) + 1),
                   i -> md5(array_to_string(
                       list_slice(w, i, i + {SUBSTR_K - 1}), ' ')))) AS m
        FROM eligible
    ),
    h AS (
        SELECT doc_id, pos, {_SUBSTR_V1} AS v1, {_SUBSTR_V2} AS v2 FROM sh
    ),
    nd AS (
        SELECT v1, v2, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS nd
        FROM h GROUP BY v1, v2
    ),
    covered AS (
        SELECT doc_id, CAST(COUNT(DISTINCT wi) AS BIGINT) AS covered_words
        FROM (
            SELECT h.doc_id,
                   unnest(range(h.pos, h.pos + {SUBSTR_K})) AS wi
            FROM h JOIN nd USING (v1, v2)
            WHERE nd.nd >= {SUBSTR_MIN_DOCS})
        GROUP BY doc_id
    )
    SELECT e.doc_id,
           CAST(len(e.w) AS INT) AS n_words,
           COALESCE(c.covered_words, 0) AS covered_words,
           round(CAST(COALESCE(c.covered_words, 0) AS DOUBLE)
                 / len(e.w), 6) AS removal_frac
    FROM eligible e LEFT JOIN covered c USING (doc_id)
"""


def ann_mips_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact maximum-inner-product top-10 for the first 5 query
    vectors (``operators/similarity.topk_mips``) — the MIPS objective
    the ANN family lacked: cosine ranks by angle, MIPS by angle TIMES
    magnitude, so the two orders diverge wherever norms vary (pinned
    in tests against the cosine twin). Broadcast queries x one corpus
    scan, per-query window top-k; the indexed scale path is the
    augmented-dimension MIPS->cosine reduction through the shared IVF
    pipeline (operator docstring)."""
    from incubyte_vaccination_data_pipeline_spark.catalog.similarity import (
        N_QUERY_VECTORS,
        TOP_K,
    )
    from incubyte_vaccination_data_pipeline_spark.operators.similarity import (
        topk_mips,
    )

    emb = read_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERY_VECTORS)
    return topk_mips(emb, queries, k=TOP_K)


def _mips_oracle() -> str:
    from incubyte_vaccination_data_pipeline_spark.catalog.similarity import (
        N_QUERY_VECTORS,
        TOP_K,
        _dot_sql,
    )

    return f"""
    WITH q AS (
        SELECT vec_id AS query_id, embedding AS qv FROM embeddings
        WHERE vec_id < {N_QUERY_VECTORS}
    ),
    scored AS (
        SELECT q.query_id, e.vec_id AS neighbor_id,
               round({_dot_sql('q.qv', 'e.embedding')}, 6) AS dot
        FROM embeddings e, q
        WHERE e.vec_id <> q.query_id
    ),
    ranked AS (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY query_id ORDER BY dot DESC, neighbor_id) AS rank
        FROM scored
    )
    SELECT query_id, neighbor_id, dot, rank FROM ranked WHERE rank <= {TOP_K}
    """


#: semantic-dedup-through-the-index contract: top-2 multi-assignment
#: over the shared 16-cell IVF quantizer, same near-dup threshold as
#: the label-blocked query (family consistency).
EMB_IVF_ASSIGN_M = 2

_FLAT_CELLS_CACHE: dict = register_dict_cache({})


def _flat_cells_m2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(app, corpus) top-2 multi-assignment over the shared flat
    quantizer (``_ivf_index``), persisted — the dedup twin of
    ``_ivf_assigned_index`` (which is the SEARCH path's m=1 inverted
    file). Round 12: ``dedup_embedding_ivf`` re-ran the O(n x cells)
    literal-expression assignment on BOTH sides of its pair self-join
    on every materialization; precomputing it leaves the same-cell
    pair join as the query's only per-run work (the identical
    ``explode(ivf_probes_expr(..., m))`` rows the operator's
    centroids path would build — semantics and oracle unchanged)."""
    from incubyte_vaccination_data_pipeline_spark.catalog.similarity import (
        _ivf_index,
    )
    from incubyte_vaccination_data_pipeline_spark.operators.similarity import (
        ivf_probes_expr,
    )

    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _FLAT_CELLS_CACHE:
        emb = read_table(spark, sf_dir, "embeddings")
        _FLAT_CELLS_CACHE[key] = (
            emb.select(
                "vec_id",
                "embedding",
                F.explode(
                    ivf_probes_expr(
                        "embedding", _ivf_index(spark, sf_dir), EMB_IVF_ASSIGN_M
                    )
                ).alias("cell"),
            )
            # hash-partition the inverted file by cell — the layout a
            # 100 TB inverted file lives in (same-cell pair self-join
            # co-located, shuffle-free) AND the local fix for the
            # 1-partition parquet lineage that ran the pair join
            # single-threaded (measured 4.7s -> sub-second warm)
            .repartition("cell")
            .persist()
        )
    return _FLAT_CELLS_CACHE[key]


def dedup_embedding_ivf_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs THROUGH the shared IVF index
    (``operators/similarity.cosine_near_dup_pairs_ivf``): every vector
    lands in its 2 nearest cells (multi-assignment — the boundary
    mitigation), candidate pairs share a cell, exact cosine >= the
    family threshold. This is the content-derived-block answer to
    ``dedup_embedding_cosine``'s metadata block: candidate volume is
    O(sum of cell sizes squared), ~linear with corpus-tracking cell
    counts, where the label-blocked query needs a trusted label column
    and all-pairs needs O(n^2). Pairs whose members' assigned cells
    are disjoint are missed (the IVF trade; every RETURNED pair is
    exact and the oracle replays the whole quantizer, so the
    certificate is exact). Index AND assignment build once per corpus
    (``_ivf_index`` + the persisted ``_flat_cells_m2`` frame — round
    12: the unshared assignment re-ran on both sides of the pair
    self-join every materialization)."""
    from incubyte_vaccination_data_pipeline_spark.catalog.similarity import (
        NEAR_DUP_THRESHOLD,
    )
    from incubyte_vaccination_data_pipeline_spark.operators.similarity import (
        cosine_near_dup_pairs_ivf,
    )

    emb = read_table(spark, sf_dir, "embeddings")
    return cosine_near_dup_pairs_ivf(
        emb,
        threshold=NEAR_DUP_THRESHOLD,
        cells=_flat_cells_m2(spark, sf_dir),
    )


def _emb_ivf_oracle() -> str:
    from incubyte_vaccination_data_pipeline_spark.catalog.similarity import (
        NEAR_DUP_THRESHOLD,
        _ivf_oracle,
    )

    return _ivf_oracle(
        pair_threshold=NEAR_DUP_THRESHOLD, assign_m=EMB_IVF_ASSIGN_M
    )


#: Holt-Winters additive seasonal smoothing contract: weekly period,
#: alpha/beta/gamma pinned; seeds are the classic l0 = mean of the
#: first PERIOD observations, b0 = 0, s_i = y_i - l0.
HW_PERIOD = 7
HW_ALPHA = 0.3
HW_BETA = 0.2
HW_GAMMA = 0.4

# the new level, textually duplicated wherever the recurrence needs it
# (Spark lambdas cannot bind a local; duplicating keeps the IEEE-double
# op sequence identical on both engines — events_holt_linear precedent)
_HW_L = (
    f"({HW_ALPHA}D * (cast(x.cents as double)"
    f" - element_at(acc.s, acc.t % {HW_PERIOD} + 1))"
    f" + {1 - HW_ALPHA}D * (acc.l + acc.b))"
)
_HW_SEED_L = (
    f"cast(aggregate(slice(arr, 1, {HW_PERIOD}), cast(0 as bigint),"
    f" (a, x) -> a + x.cents) as double) / {HW_PERIOD}.0D"
)


def events_holt_winters_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt-Winters ADDITIVE SEASONAL (triple exponential) smoothing of
    the daily revenue series per event type — completes the smoothing
    family (SES: 1 state; Holt: 2; this: 2 + a 7-slot weekly
    seasonal array), the operator behind seasonality-aware forecasting
    and deseasonalized anomaly baselines. The accumulator is a STRUCT
    (step counter, level, trend, seasonal list) folded JVM-side by
    ``aggregate()`` over the per-type day-sorted array; the seasonal
    slot for step t is t % period, and the slot update rebuilds the
    list by concat (no index-lambda, so the oracle can restate it with
    ``list_slice`` verbatim). Seeds: l0 = mean of the first period's
    observations, b0 = 0, s_i = y_i - l0. The oracle replays the
    recursion as a recursive CTE stepping (event_type, rn) with the
    seasonal list as a LIST column — same independent-algorithm
    strategy as ``events_holt_linear`` (DuckDB's list_reduce mutates
    struct accumulators field-by-field, so a fold there is unsafe).
    Rows emit from step period+1 on (types with <= period days have no
    seasonal state yet); ``forecast_next`` adds the NEXT step's
    seasonal slot, which this step never touches (consecutive steps
    hit different slots mod 7), so no expression duplication is
    needed to read it pre-update.

    Scale posture: identical to SES/Holt — series length is bounded by
    CALENDAR DAYS, not corpus rows; two keyed aggregations are the
    only shuffles and the per-day prefix fold is O(days^2) on ~30-day
    series."""
    from incubyte_vaccination_data_pipeline_spark.catalog.events_ext import (
        shared_daily_cents,
    )

    # shared per-corpus prefix (events_ext.shared_daily_cents): one
    # scan + one (event_type, day) aggregate serves all five series
    # queries instead of being recomputed per run
    daily = shared_daily_cents(spark, sf_dir)
    series = daily.groupBy("event_type").agg(
        F.sort_array(F.collect_list(F.struct("day", "cents"))).alias("arr")
    )
    p = HW_PERIOD
    seed = (
        f"named_struct('t', {p}, 'l', {_HW_SEED_L}, 'b', 0.0D,"
        f" 's', transform(slice(arr, 1, {p}),"
        f" x -> cast(x.cents as double) - ({_HW_SEED_L})))"
    )
    s_new = (
        f"{HW_GAMMA}D * (cast(x.cents as double) - {_HW_L})"
        f" + {1 - HW_GAMMA}D * element_at(acc.s, acc.t % {p} + 1)"
    )
    fold = F.expr(
        f"aggregate(slice(arr, {p + 1}, pos - {p - 1}), {seed},"
        f" (acc, x) -> named_struct("
        f"'t', acc.t + 1,"
        f" 'l', {_HW_L},"
        f" 'b', {HW_BETA}D * ({_HW_L} - acc.l) + {1 - HW_BETA}D * acc.b,"
        f" 's', concat(slice(acc.s, 1, acc.t % {p}), array({s_new}),"
        f" slice(acc.s, acc.t % {p} + 2, {p - 1} - acc.t % {p}))))"
    )
    slot = F.pmod(F.col("pos"), F.lit(p)) + F.lit(1)
    next_slot = F.pmod(F.col("pos") + 1, F.lit(p)) + F.lit(1)
    return (
        series.select(
            "event_type", "arr", F.posexplode("arr").alias("pos", "e")
        )
        .filter(F.col("pos") >= p)
        .select(
            "event_type",
            F.col("e.day").alias("day"),
            F.col("e.cents").alias("cents"),
            fold.alias("st"),
            slot.alias("slot"),
            next_slot.alias("next_slot"),
        )
        .select(
            "event_type",
            "day",
            "cents",
            F.round(F.col("st.l"), 6).alias("level"),
            F.round(F.col("st.b"), 6).alias("trend"),
            F.round(F.element_at("st.s", F.col("slot")), 6).alias("season"),
            F.round(
                F.col("st.l")
                + F.col("st.b")
                + F.element_at("st.s", F.col("next_slot")),
                6,
            ).alias("forecast_next"),
        )
    )


_HW_ORACLE = f"""
    WITH RECURSIVE daily AS (
        SELECT event_type, date_trunc('day', ts) AS day,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
                   AS cents
        FROM events GROUP BY event_type, date_trunc('day', ts)
    ),
    idx AS (
        SELECT event_type, day, cents,
               ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) AS rn
        FROM daily
    ),
    seed AS (
        SELECT event_type,
               CAST(SUM(cents) AS DOUBLE) / {HW_PERIOD}.0 AS l0,
               list(CAST(cents AS DOUBLE) ORDER BY rn) AS ys
        FROM idx WHERE rn <= {HW_PERIOD}
        GROUP BY event_type HAVING COUNT(*) = {HW_PERIOD}
    ),
    rec AS (
        SELECT event_type, {HW_PERIOD} AS rn,
               CAST(NULL AS TIMESTAMP) AS day, CAST(NULL AS BIGINT) AS cents,
               l0 AS l, CAST(0.0 AS DOUBLE) AS b,
               list_transform(ys, y -> y - l0) AS s
        FROM seed
        UNION ALL
        SELECT i.event_type, i.rn, i.day, i.cents,
               {HW_ALPHA} * (CAST(i.cents AS DOUBLE)
                             - r.s[(i.rn - 1) % {HW_PERIOD} + 1])
               + {1 - HW_ALPHA} * (r.l + r.b),
               {HW_BETA} * (({HW_ALPHA} * (CAST(i.cents AS DOUBLE)
                                           - r.s[(i.rn - 1) % {HW_PERIOD} + 1])
                             + {1 - HW_ALPHA} * (r.l + r.b)) - r.l)
               + {1 - HW_BETA} * r.b,
               list_slice(r.s, 1, (i.rn - 1) % {HW_PERIOD})
               || [{HW_GAMMA} * (CAST(i.cents AS DOUBLE)
                                 - ({HW_ALPHA} * (CAST(i.cents AS DOUBLE)
                                     - r.s[(i.rn - 1) % {HW_PERIOD} + 1])
                                    + {1 - HW_ALPHA} * (r.l + r.b)))
                  + {1 - HW_GAMMA} * r.s[(i.rn - 1) % {HW_PERIOD} + 1]]
               || list_slice(r.s, (i.rn - 1) % {HW_PERIOD} + 2, {HW_PERIOD})
        FROM rec r JOIN idx i
          ON i.event_type = r.event_type AND i.rn = r.rn + 1
    )
    SELECT event_type, day, cents,
           ROUND(l, 6) AS level,
           ROUND(b, 6) AS trend,
           ROUND(s[(rn - 1) % {HW_PERIOD} + 1], 6) AS season,
           ROUND(l + b + s[rn % {HW_PERIOD} + 1], 6) AS forecast_next
    FROM rec WHERE rn > {HW_PERIOD}
"""


#: label-propagation contract: 2 SYNCHRONOUS majority-vote rounds over
#: the shared support-thresholded co-purchase graph; ties break to the
#: smallest label (every step deterministic, so the oracle
#: value-checks each node's community).
LPA_ROUNDS = 2


def graph_label_propagation_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community detection by synchronous majority-label propagation
    (LPA) over the support-thresholded co-purchase graph — the fifth
    member of the graph family, and a different signal from
    ``graph_connected_components``: components split the graph only at
    disconnections, LPA also splits around DENSITY (a bridge edge
    cannot out-vote a community's internal majority). Each round,
    every node adopts the most frequent label among its neighbors
    (count DESC, label ASC — deterministic); labels start as node ids;
    exactly ``LPA_ROUNDS`` rounds so the oracle is a fixed SQL
    pipeline. Returns (node, community).

    Scale posture: one round = one dst-keyed join + one (node, label)
    aggregate (map-side combinable) + one per-node top-1 window —
    keyed shuffles only, skew bounded by the support threshold that
    already caps degrees for the triangle wedge join. A
    run-to-convergence deployment wraps the same round in the
    checkpointed loop of ``operators/dedup.duplicate_clusters``."""
    from incubyte_vaccination_data_pipeline_spark.catalog.graph import (
        _copurchase_pairs,
    )
    from pyspark.sql import Window

    pairs = _copurchase_pairs(spark, sf_dir)
    edges = pairs.select(
        F.col("pa").alias("src"), F.col("pb").alias("dst")
    ).unionByName(pairs.select(F.col("pb").alias("src"), F.col("pa").alias("dst")))
    labels = edges.select(F.col("src").alias("node")).distinct().select(
        "node", F.col("node").alias("label")
    )
    w = Window.partitionBy("node").orderBy(
        F.col("cnt").desc(), F.col("label").asc()
    )
    for _ in range(LPA_ROUNDS):
        labels = (
            edges.join(labels, edges.dst == labels.node)
            .select(F.col("src").alias("node"), "label")
            .groupBy("node", "label")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("node", "label")
        )
    return labels.select("node", F.col("label").alias("community"))


_LPA_ORACLE = f"""
    WITH pairs AS (
        SELECT a.l_partkey AS pa, b.l_partkey AS pb
        FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
        WHERE a.l_partkey < b.l_partkey
        GROUP BY pa, pb HAVING COUNT(*) >= {TRIANGLE_MIN_SUPPORT}
    ),
    edges AS (
        SELECT pa AS src, pb AS dst FROM pairs
        UNION ALL SELECT pb AS src, pa AS dst FROM pairs
    ),
    l0 AS (
        SELECT DISTINCT src AS node, src AS label FROM edges
    ),
    i1 AS (
        SELECT node, label FROM (
            SELECT e.src AS node, l.label, COUNT(*) AS cnt,
                   ROW_NUMBER() OVER (
                       PARTITION BY e.src
                       ORDER BY COUNT(*) DESC, l.label ASC) AS rn
            FROM edges e JOIN l0 l ON l.node = e.dst
            GROUP BY e.src, l.label)
        WHERE rn = 1
    ),
    i2 AS (
        SELECT node, label FROM (
            SELECT e.src AS node, l.label, COUNT(*) AS cnt,
                   ROW_NUMBER() OVER (
                       PARTITION BY e.src
                       ORDER BY COUNT(*) DESC, l.label ASC) AS rn
            FROM edges e JOIN i1 l ON l.node = e.dst
            GROUP BY e.src, l.label)
        WHERE rn = 1
    )
    SELECT node, label AS community FROM i2
"""


STAGED = {
    "text_substring_dedup": (text_substring_dedup_q, _SUBSTR_ORACLE),
    "text_bm25_topk": (text_bm25_topk_q, _BM25_ORACLE),
    "dedup_embedding_ivf": (dedup_embedding_ivf_q, _emb_ivf_oracle()),
    "events_holt_winters": (events_holt_winters_q, _HW_ORACLE),
    "graph_label_propagation": (graph_label_propagation_q, _LPA_ORACLE),
    "text_substring_removal_plan": (
        text_substring_removal_plan_q,
        _REMOVAL_ORACLE,
    ),
    "ann_mips_topk": (ann_mips_topk_q, _mips_oracle()),
}


# --- hierarchical (two-level) semantic dedup ------------------------------
#
# The driver-checkable certificate for ivf_two_level_assign: the whole
# two-level pipeline (coarse seeds -> coarse Lloyd -> coarse assign ->
# per-coarse-cell fine seeds -> distributed fine Lloyd -> top-m fine
# assign -> same-cell pairs -> exact cosine threshold) restated as ONE
# independent SQL pipeline. Small oracle-portable pins: 3 coarse x 4
# fine = 12 cells, top-2 multi-assign, one fine refinement.
HIER_COARSE = 3
HIER_FINE = 4
HIER_ASSIGN_M = 2
HIER_REFINE = 1

_HIER_COARSE_CACHE: dict = register_dict_cache({})


def _hier_coarse(spark: SparkSession, sf_dir: str) -> list:
    from incubyte_vaccination_data_pipeline_spark.operators.similarity import (
        ivf_centroids,
    )

    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _HIER_COARSE_CACHE:
        _HIER_COARSE_CACHE[key] = ivf_centroids(
            read_table(spark, sf_dir, "embeddings"), n_centroids=HIER_COARSE
        )
    return _HIER_COARSE_CACHE[key]


def dedup_embedding_ivf_hier_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic near-dup pairs through the TWO-LEVEL (hierarchical)
    IVF quantizer (``operators/similarity.ivf_two_level_assign`` with
    one distributed groupwise Lloyd refinement of the fine seeds, fed
    to ``cosine_near_dup_pairs_ivf(cells=...)``): the assignment shape
    that survives cell counts past literal codegen — O(n*sqrt(cells))
    scoring, no cells x dims expression, no driver collect in the
    refinement. Pinned small for the oracle: 3 coarse x 4 fine cells,
    top-2 multi-assignment. The 100x stress measured the refinement
    worth 2.5x on pair generation (SCALE.md: unrefined fine seeds skew
    and the pair join pays sum(cell^2))."""
    from incubyte_vaccination_data_pipeline_spark.catalog.similarity import (
        NEAR_DUP_THRESHOLD,
    )
    from incubyte_vaccination_data_pipeline_spark.operators.similarity import (
        cosine_near_dup_pairs_ivf,
    )

    emb = read_table(spark, sf_dir, "embeddings")
    return cosine_near_dup_pairs_ivf(
        emb,
        threshold=NEAR_DUP_THRESHOLD,
        cells=_hier_cells(spark, sf_dir),
    )


def _hier_ctes(m: int) -> str:
    """Full SQL restatement of the two-level pipeline — an independent
    algorithm over the same exact arithmetic contracts (md5-addressed
    seeds, quantized-integer Lloyd means, in-order double folds,
    score-DESC/id-ASC ties), so every pair's cosine value-checks."""
    # the CTE chain below hand-writes exactly ONE fine Lloyd refinement
    # (fa0 -> fcid0 -> fmean -> fcent); the Spark side derives its count
    # from HIER_REFINE, so bumping that constant without rewriting these
    # CTEs would silently desynchronize query and oracle
    assert HIER_REFINE == 1, "_hier_ctes hardcodes one fine refinement"
    from incubyte_vaccination_data_pipeline_spark.catalog.similarity import (
        NEAR_DUP_THRESHOLD,
        _dot_sql,
    )
    from incubyte_vaccination_data_pipeline_spark.operators.similarity import (
        MEAN_SCALE,
    )

    def unit(v: str) -> str:
        n = f"sqrt({_dot_sql(v, v)})"
        return (
            f"list_transform({v}, x -> CAST(x AS DOUBLE) /"
            f" (CASE WHEN {n} = 0.0 THEN 1.0 ELSE {n} END))"
        )

    nc, nf, scale = HIER_COARSE, HIER_FINE, MEAN_SCALE
    return f"""cseed_raw AS (
        SELECT sid, embedding FROM (
            SELECT embedding,
                   ROW_NUMBER() OVER (
                       ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS sid
            FROM embeddings)
        WHERE sid < {nc}
    ),
    cseed AS (
        SELECT sid, {unit('embedding')} AS sv FROM cseed_raw
    ),
    ca0 AS (
        SELECT e.vec_id, s.sid, {_dot_sql('e.embedding', 's.sv')} AS score
        FROM embeddings e CROSS JOIN cseed s
    ),
    ccid0 AS (
        SELECT vec_id, sid AS cid FROM (
            SELECT vec_id, sid, ROW_NUMBER() OVER (
                PARTITION BY vec_id ORDER BY score DESC, sid) AS rn
            FROM ca0)
        WHERE rn = 1
    ),
    cexpl AS (
        SELECT c.cid, unnest(e.embedding) AS val,
               unnest(range(len(e.embedding))) AS pos
        FROM ccid0 c JOIN embeddings e USING (vec_id)
    ),
    cmean AS (
        SELECT cid, pos,
               CAST(SUM(CAST(floor(CAST(val AS DOUBLE) * {scale}) AS BIGINT))
                    AS DOUBLE) / (COUNT(*) * {scale}.0) AS mv
        FROM cexpl GROUP BY cid, pos
    ),
    cmeanvec AS (
        SELECT cid, list(mv ORDER BY pos) AS mvec FROM cmean GROUP BY cid
    ),
    ccent AS (
        SELECT s.sid AS cid,
               COALESCE({unit('m.mvec')}, s.sv) AS cv
        FROM cseed s LEFT JOIN cmeanvec m ON m.cid = s.sid
    ),
    ca1 AS (
        SELECT e.vec_id, c.cid, {_dot_sql('e.embedding', 'c.cv')} AS score
        FROM embeddings e CROSS JOIN ccent c
    ),
    cassigned AS (
        SELECT vec_id, cid AS ccid FROM (
            SELECT vec_id, cid, ROW_NUMBER() OVER (
                PARTITION BY vec_id ORDER BY score DESC, cid) AS rn
            FROM ca1)
        WHERE rn = 1
    ),
    fseed AS (
        SELECT ccid, fid, {unit('e.embedding')} AS sv FROM (
            SELECT ca.ccid, ca.vec_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY ca.ccid
                       ORDER BY md5(CAST(ca.vec_id AS VARCHAR)), ca.vec_id
                   ) - 1 AS fid
            FROM cassigned ca) f
        JOIN embeddings e ON e.vec_id = f.vec_id
        WHERE fid < {nf}
    ),
    fa0 AS (
        SELECT c.vec_id, c.ccid, s.fid,
               {_dot_sql('e.embedding', 's.sv')} AS score
        FROM cassigned c
        JOIN embeddings e ON e.vec_id = c.vec_id
        JOIN fseed s ON s.ccid = c.ccid
    ),
    fcid0 AS (
        SELECT vec_id, ccid, fid FROM (
            SELECT vec_id, ccid, fid, ROW_NUMBER() OVER (
                PARTITION BY vec_id ORDER BY score DESC, fid) AS rn
            FROM fa0)
        WHERE rn = 1
    ),
    fexpl AS (
        SELECT f.ccid, f.fid, unnest(e.embedding) AS val,
               unnest(range(len(e.embedding))) AS pos
        FROM fcid0 f JOIN embeddings e USING (vec_id)
    ),
    fmean AS (
        SELECT ccid, fid, pos,
               CAST(SUM(CAST(floor(CAST(val AS DOUBLE) * {scale}) AS BIGINT))
                    AS DOUBLE) / (COUNT(*) * {scale}.0) AS mv
        FROM fexpl GROUP BY ccid, fid, pos
    ),
    fmeanvec AS (
        SELECT ccid, fid, list(mv ORDER BY pos) AS mvec
        FROM fmean GROUP BY ccid, fid
    ),
    fcent AS (
        SELECT s.ccid, s.fid,
               COALESCE({unit('m.mvec')}, s.sv) AS cv
        FROM fseed s LEFT JOIN fmeanvec m
          ON m.ccid = s.ccid AND m.fid = s.fid
    ),
    fa1 AS (
        SELECT c.vec_id, c.ccid, s.fid,
               {_dot_sql('e.embedding', 's.cv')} AS score
        FROM cassigned c
        JOIN embeddings e ON e.vec_id = c.vec_id
        JOIN fcent s ON s.ccid = c.ccid
    ),
    fassigned AS (
        SELECT vec_id, ccid * {nf} + fid AS cell FROM (
            SELECT vec_id, ccid, fid, ROW_NUMBER() OVER (
                PARTITION BY vec_id ORDER BY score DESC, fid) AS rn
            FROM fa1)
        WHERE rn <= {m}
    )
"""


def _hier_oracle() -> str:
    """Pair (dedup) tail over the shared hierarchy CTEs."""
    from incubyte_vaccination_data_pipeline_spark.catalog.similarity import (
        NEAR_DUP_THRESHOLD,
        _cos_sql,
    )

    return f"""
    WITH {_hier_ctes(HIER_ASSIGN_M)},
    hpairs AS (
        SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
        FROM fassigned a JOIN fassigned b USING (cell)
        WHERE a.vec_id < b.vec_id
    )
    SELECT p.vec_a, p.vec_b,
           round({_cos_sql('ea.embedding', 'eb.embedding')}, 6) AS cosine
    FROM hpairs p
    JOIN embeddings ea ON ea.vec_id = p.vec_a
    JOIN embeddings eb ON eb.vec_id = p.vec_b
    WHERE round({_cos_sql('ea.embedding', 'eb.embedding')}, 6)
          >= {NEAR_DUP_THRESHOLD}
"""


STAGED["dedup_embedding_ivf_hier"] = (dedup_embedding_ivf_hier_q, _hier_oracle())


#: search-through-the-hierarchy contract: probe the 2 nearest coarse
#: cells, keep the 4 best fine cells overall, exact-cosine top-10.
HIER_PROBE_COARSE = 2
HIER_PROBE_FINE = 4

_HIER_FINE_CACHE: dict = register_dict_cache({})


def _hier_fine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(app, corpus) fine-centroid frame — shared by the
    hierarchical dedup and search queries (build once, probe many).
    PERSISTED (round 12): the frame is coarse x fine = 12 rows, but
    its lineage is the full distributed Lloyd chain (corpus scan +
    posexplode groupBy); every unpersisted reference re-paid that
    chain per materialization — the dedup query 4x per bench sample,
    the search queries once per probe-scoring run. Persisting does
    not change the ANALYZED plan (cache substitution is
    post-analysis), so the query fingerprints are untouched — the r9
    shared-cache precedent, re-verified for all three hier queries."""
    from incubyte_vaccination_data_pipeline_spark.operators.similarity import (
        ivf_two_level_centroids,
    )

    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _HIER_FINE_CACHE:
        _HIER_FINE_CACHE[key] = ivf_two_level_centroids(
            read_table(spark, sf_dir, "embeddings"),
            _hier_coarse(spark, sf_dir),
            HIER_FINE,
            refine_fine=HIER_REFINE,
        ).persist()
    return _HIER_FINE_CACHE[key]


_HIER_CELLS_CACHE: dict = register_dict_cache({})


def _hier_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(app, corpus) assign_m=2 two-level multi-assignment,
    persisted — the DEDUP path's inverted file (the search path's
    assign_m=1 twin lives in :func:`_hier_inv`; they rank with the
    same tie-breaks, so rank-1 rows agree, but search must not see a
    vector twice and dedup must). Round 12: the dedup query rebuilt
    this frame on every materialization — fc's Lloyd chain plus the
    broadcast-score window, 4x per bench sample — while only the
    same-cell pair join is the query's actual work."""
    from incubyte_vaccination_data_pipeline_spark.operators.similarity import (
        ivf_two_level_assign,
    )

    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _HIER_CELLS_CACHE:
        _HIER_CELLS_CACHE[key] = ivf_two_level_assign(
            read_table(spark, sf_dir, "embeddings"),
            _hier_coarse(spark, sf_dir),
            n_fine_per_coarse=HIER_FINE,
            assign_m=HIER_ASSIGN_M,
            fine_centroids=_hier_fine(spark, sf_dir),
        ).persist()
    return _HIER_CELLS_CACHE[key]


_HIER_INV_CACHE: dict = register_dict_cache({})


def _hier_inv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(app, corpus) assign_m=1 two-level inverted file, persisted
    — shared by the hierarchical SEARCH queries (``ann_ivf_hier_topk``
    and the staged radius twin), exactly as ``_ivf_assigned_index``
    amortizes the flat inverted file. Persisting does not change the
    ANALYZED plan (cache substitution is post-analysis), so the query
    fingerprints are untouched — the r9 shared-cache precedent,
    re-verified explicitly for both hier queries."""
    from incubyte_vaccination_data_pipeline_spark.operators.similarity import (
        ivf_two_level_assign,
    )

    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _HIER_INV_CACHE:
        _HIER_INV_CACHE[key] = ivf_two_level_assign(
            read_table(spark, sf_dir, "embeddings"),
            _hier_coarse(spark, sf_dir),
            HIER_FINE,
            assign_m=1,
            fine_centroids=_hier_fine(spark, sf_dir),
        ).persist()
    return _HIER_INV_CACHE[key]


def ann_ivf_hier_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate cosine top-10 THROUGH the two-level index
    (``operators/similarity.topk_two_level``): the search twin of
    ``dedup_embedding_ivf_hier`` — queries probe their 2 nearest
    coarse cells, score only those cells' fine centroids (a broadcast
    join, O(probe_coarse x fine) dots per query instead of O(cells)),
    keep the 4 best fine cells, and exact-cosine-rerank the probed
    cells' inverted file. Index = assign_m=1 over the SAME shared
    fine-centroid frame as the dedup query. Probing every fine cell
    of one coarse cell degenerates to exact brute force (recall-1 law,
    pinned in tests); the oracle replays both levels and the probe
    tail in SQL."""
    from incubyte_vaccination_data_pipeline_spark.catalog.similarity import (
        N_QUERY_VECTORS,
        TOP_K,
    )
    from incubyte_vaccination_data_pipeline_spark.operators.similarity import (
        topk_two_level,
    )

    emb = read_table(spark, sf_dir, "embeddings")
    fc = _hier_fine(spark, sf_dir)
    inv = _hier_inv(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < N_QUERY_VECTORS)
    return topk_two_level(
        emb,
        queries,
        _hier_coarse(spark, sf_dir),
        fc,
        inv,
        HIER_FINE,
        k=TOP_K,
        n_probe_coarse=HIER_PROBE_COARSE,
        n_probe_fine=HIER_PROBE_FINE,
        # operator default (broadcast probe frame, 15x on the probe
        # join at 10x data — SCALE.md r11). Round 11 pinned False to
        # hold its driver-window fingerprint; flipped at the round-12
        # kickoff refresh, which re-fronts the query as stale.
    )


def _hier_search_oracle() -> str:
    """Probe/search tail over the shared hierarchy CTEs (index built
    at assign_m=1)."""
    from incubyte_vaccination_data_pipeline_spark.catalog.similarity import (
        TOP_K,
    )

    return f"""{_hier_scored_ctes()}
    SELECT query_id, neighbor_id, cosine, rank FROM (
        SELECT query_id, neighbor_id, cosine, ROW_NUMBER() OVER (
            PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
        FROM hscored)
    WHERE rank <= {TOP_K}
"""


def _hier_scored_ctes() -> str:
    """The probe + exact-score WITH-chain through ``hscored`` —
    shared by the rank tail (``ann_ivf_hier_topk``) and the staged
    round-12 radius tail, mirroring the operator-side factoring of
    ``_two_level_scored``. MUST render byte-identically under the
    registered rank oracle (hash-pinned in tests)."""
    from incubyte_vaccination_data_pipeline_spark.catalog.similarity import (
        N_QUERY_VECTORS,
        _cos_sql,
        _dot_sql,
    )

    npc, npf, nf = HIER_PROBE_COARSE, HIER_PROBE_FINE, HIER_FINE
    return f"""
    WITH {_hier_ctes(1)},
    qprobes AS (
        SELECT vec_id AS query_id, cid AS ccid FROM (
            SELECT vec_id, cid, ROW_NUMBER() OVER (
                PARTITION BY vec_id ORDER BY score DESC, cid) AS rn
            FROM ca1 WHERE vec_id < {N_QUERY_VECTORS})
        WHERE rn <= {npc}
    ),
    fprobe AS (
        SELECT p.query_id, s.ccid * {nf} + s.fid AS cell,
               {_dot_sql('e.embedding', 's.cv')} AS score
        FROM qprobes p
        JOIN embeddings e ON e.vec_id = p.query_id
        JOIN fcent s ON s.ccid = p.ccid
    ),
    pcells AS (
        SELECT query_id, cell FROM (
            SELECT query_id, cell, ROW_NUMBER() OVER (
                PARTITION BY query_id ORDER BY score DESC, cell) AS rn
            FROM fprobe)
        WHERE rn <= {npf}
    ),
    hcand AS (
        SELECT DISTINCT p.query_id, a.vec_id AS neighbor_id
        FROM pcells p JOIN fassigned a USING (cell)
        WHERE a.vec_id <> p.query_id
    ),
    hscored AS (
        SELECT c.query_id, c.neighbor_id,
               round({_cos_sql('q.embedding', 'n.embedding')}, 6) AS cosine
        FROM hcand c
        JOIN embeddings q ON q.vec_id = c.query_id
        JOIN embeddings n ON n.vec_id = c.neighbor_id
    )"""


STAGED["ann_ivf_hier_topk"] = (ann_ivf_hier_topk_q, _hier_search_oracle())
