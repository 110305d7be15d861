"""Round-14 staging registry (window protection: registering mid-round
would re-sort the driver window under the slots round 13 promised —
``register_r14()`` lands these at the round-14 kickoff, exactly like
``round13_staged.register_r13()`` did).

- ``corpus_source_overlap`` — pairwise dataset-overlap matrix across
  document SOURCES via k-minimum-values (KMV) signatures over word
  3-gram content hashes: the "how much of dump B is already in dump A"
  question a training-data pipeline answers before paying a full
  cross-dump dedup. Per source, the K smallest distinct md5(gram)
  values form the signature; for each source pair the K smallest of
  the signature UNION are inspected and the Jaccard estimate is
  |both| / |inspected| (the standard KMV merge estimator — EXACT when
  the union fits inside K). Everything is deterministic (md5 order),
  so the DuckDB oracle replays the estimator bit-for-bit.

- ``embedding_vector_qc`` — the vector-quality report every embedding
  ingest needs before indexing: per label, vector count, exact
  duplicate-vector count (grouping on the raw float array — no lossy
  string round-trip), zero-norm and NaN counts, and the norm
  min/median/max at 8 dp (the testdata vectors are unit-normalized
  in float32, so the QC signal IS the float32 normalization residual
  — 6 dp would round it away). One map-side-combinable pass over the corpus (the
  exact median is the small-SF certificate; approx_percentile is the
  documented 100 TB swap).

- ``agg_bootstrap_ci`` — subsampling-bootstrap confidence intervals
  for a per-group mean: 32 deterministic hash-drawn 80% replicates
  (md5 of (orderkey, replicate) — the same portable-hash contract as
  ``sample_hash_deterministic``), replicate means in exact DECIMAL
  arithmetic, CI = the 2.5/97.5 interpolated percentiles of the
  replicate means. The replicate fan-out is a constant x32 explode
  with map-side combine — no extra shuffle class at any scale.

- ``events_ohlc_bars`` — hourly OHLC bars per event type: the
  first/last-by-time aggregation every hypertable serves
  (TimescaleDB first()/last()), one exchange on the bar key serving
  the ordered window, the partition aggregates, and the rn = 1 cut.

- ``events_asof_nearest`` — nearest-direction as-of join (pandas
  ``merge_asof(direction='nearest')``), completing the engine's
  backward / backward+tolerance / nearest as-of matrix: the backward
  union-carry run twice (max/min of the payload struct over mirrored
  windows) + a row-local gap CASE — never a range join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from incubyte_vaccination_data_pipeline_spark.operators.dedup import (
    md5_half_decode_sql,
)
from incubyte_vaccination_data_pipeline_spark.operators.partitioning import (
    fanout_repartition,
)
from incubyte_vaccination_data_pipeline_spark.operators.similarity import norm_expr
from incubyte_vaccination_data_pipeline_spark.sources.parquet_io import read_table

STAGED: dict = {}


# ---------------------------------------------------------------------------
# corpus_source_overlap
# ---------------------------------------------------------------------------

#: KMV signature size: at the testdata's ~1.2-1.5k distinct 3-grams
#: per source this resolves the planted cross-source near-dup overlap
#: (top exact Jaccard ~0.08 -> expected ~20 of 256 signature hits)
#: while staying a constant-size per-source summary at any corpus size
KMV_K = 256
#: word 3-grams: short enough that common phrasing overlaps across
#: sources (5-grams leave only the verbatim near-dups; doc-level
#: hashes find nothing — measured on the testdata corpus)
OVERLAP_SHINGLE_K = 3


def corpus_source_overlap_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise KMV-Jaccard estimates between document sources.

    Scale shape: the corpus-wide work is ONE distinct over
    (source, gram-hash) — the same O(total tokens) shuffle class as
    the substring-dedup family, after ``fanout_repartition`` spreads
    the explode — followed by a per-source top-K (window over the
    source partition; K rows survive per source). Everything
    downstream operates on the signature frame (n_sources x K rows):
    the pair fan-out, union ranking, and estimator are a rounding
    error at any corpus size, so dump-vs-dump overlap costs one
    corpus scan regardless of how many dumps are compared."""
    k = OVERLAP_SHINGLE_K
    docs = read_table(spark, sf_dir, "documents")
    # pre-explode spread is keyed by (source, doc_id), NOT source
    # alone: with few large dumps (the query's use case) a source-keyed
    # layout caps the corpus-sized explode + md5 at n_sources tasks
    # regardless of cluster size (r13 advice). The distinct then pays
    # one real (source, m) shuffle — map-side partial dedup first —
    # and the signature cut re-establishes the source layout on the
    # already-distinct (far smaller) frame.
    words = fanout_repartition(
        docs.select(
            "source",
            "doc_id",
            F.split(F.lower(F.col("text")), " ").alias("w"),
        ).filter(F.size("w") >= k),
        "source",
        "doc_id",
    )
    gram_expr = (
        f"transform(sequence(1, size(w) - {k - 1}),"
        f" i -> array_join(slice(w, i, {k}), ' '))"
    )
    grams = words.select(
        "source", F.explode(F.expr(gram_expr)).alias("g")
    ).select("source", F.md5("g").alias("m"))
    sig = (
        grams.distinct()
        .withColumn(
            "rn",
            F.row_number().over(Window.partitionBy("source").orderBy("m")),
        )
        .filter(F.col("rn") <= KMV_K)
        .drop("rn")
    )
    sources = docs.select("source").distinct()
    pairs = (
        sources.alias("a")
        .join(sources.alias("b"), F.col("a.source") < F.col("b.source"))
        .select(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
        )
    )
    # fan each pair out to its two members, attach both signatures via
    # one equi-join (pairs frame is tiny -> broadcast), dedup hashes
    # across the two signatures, rank the union, cut at K
    mem = pairs.select(
        "source_a",
        "source_b",
        F.explode(F.array("source_a", "source_b")).alias("source"),
    )
    u = (
        mem.join(sig, "source")
        .groupBy("source_a", "source_b", "m")
        .agg(
            F.max((F.col("source") == F.col("source_a")).cast("int")).alias(
                "in_a"
            ),
            F.max((F.col("source") == F.col("source_b")).cast("int")).alias(
                "in_b"
            ),
        )
    )
    topu = u.withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("source_a", "source_b").orderBy("m")
        ),
    ).filter(F.col("rn") <= KMV_K)
    return (
        topu.groupBy("source_a", "source_b")
        .agg(
            F.count(F.lit(1)).alias("k_used"),
            F.sum(F.col("in_a") * F.col("in_b"))
            .cast("bigint")
            .alias("k_inter"),
        )
        .select(
            "source_a",
            "source_b",
            "k_used",
            "k_inter",
            F.round(F.col("k_inter") / F.col("k_used"), 6).alias(
                "kmv_jaccard"
            ),
        )
    )


_OVERLAP_ORACLE = f"""
    WITH toks AS (
        SELECT source, string_split(lower(text), ' ') AS w FROM documents
        WHERE len(string_split(lower(text), ' ')) >= {OVERLAP_SHINGLE_K}
    ),
    sh AS (
        SELECT DISTINCT source, m FROM (
            SELECT source,
                   md5(unnest(list_transform(
                       range(1, greatest(len(w) - {OVERLAP_SHINGLE_K - 1}, 0) + 1),
                       i -> array_to_string(
                           list_slice(w, i, i + {OVERLAP_SHINGLE_K - 1}),
                           ' ')))) AS m
            FROM toks)
    ),
    sig AS (
        SELECT source, m FROM (
            SELECT source, m,
                   ROW_NUMBER() OVER (PARTITION BY source ORDER BY m) AS rn
            FROM sh)
        WHERE rn <= {KMV_K}
    ),
    srcs AS (SELECT DISTINCT source FROM documents),
    pairs AS (
        SELECT a.source AS source_a, b.source AS source_b
        FROM srcs a JOIN srcs b ON a.source < b.source
    ),
    u AS (
        SELECT p.source_a, p.source_b, s.m,
               MAX(CASE WHEN s.source = p.source_a THEN 1 ELSE 0 END) AS in_a,
               MAX(CASE WHEN s.source = p.source_b THEN 1 ELSE 0 END) AS in_b
        FROM pairs p
        JOIN sig s ON s.source = p.source_a OR s.source = p.source_b
        GROUP BY p.source_a, p.source_b, s.m
    ),
    topu AS (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY source_a, source_b ORDER BY m) AS rn
        FROM u
    )
    SELECT source_a, source_b,
           CAST(COUNT(*) AS BIGINT) AS k_used,
           CAST(SUM(in_a * in_b) AS BIGINT) AS k_inter,
           ROUND(CAST(SUM(in_a * in_b) AS DOUBLE) / COUNT(*), 6)
               AS kmv_jaccard
    FROM topu WHERE rn <= {KMV_K}
    GROUP BY source_a, source_b
"""

STAGED["corpus_source_overlap"] = (corpus_source_overlap_q, _OVERLAP_ORACLE)


# ---------------------------------------------------------------------------
# embedding_vector_qc
# ---------------------------------------------------------------------------


def embedding_vector_qc_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding-quality report: counts, exact duplicate
    vectors (count - count(DISTINCT embedding) — grouping on the raw
    float array, no lossy serialization), zero-norm and NaN vectors,
    and the norm min/median/max (in-order double fold -> identical
    across engines; the exact median is the small-SF certificate,
    approx_percentile the documented one-pass 100 TB swap).

    Scale shape: one scan, one map-side-combinable groupBy on the
    low-cardinality label (countDistinct rewrites to a two-phase
    aggregate on (label, embedding) — the only corpus-sized shuffle,
    keyed by the vector itself so duplicates collapse map-side)."""
    emb = read_table(spark, sf_dir, "embeddings")
    norm = norm_expr("embedding")
    rows = emb.select(
        "label",
        "embedding",
        norm.alias("nrm"),
        F.exists("embedding", lambda x: F.isnan(x)).cast("int").alias("has_nan"),
    ).withColumn(
        # a NaN component makes the norm NaN, which would poison
        # min/median/max (NaN sorts above every number in both
        # engines): NaN vectors are reported in n_nan and EXCLUDED
        # from the norm statistics
        "nrm_ok",
        F.when(F.col("has_nan") == 0, F.col("nrm")),
    )
    return (
        rows.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            (F.count(F.lit(1)) - F.countDistinct("embedding"))
            .cast("bigint")
            .alias("n_dup_vecs"),
            F.sum((F.col("nrm_ok") == 0).cast("int"))
            .cast("bigint")
            .alias("n_zero_norm"),
            F.sum("has_nan").cast("bigint").alias("n_nan"),
            F.round(F.min("nrm_ok"), 8).alias("norm_min"),
            F.round(F.percentile(F.col("nrm_ok"), F.lit(0.5)), 8).alias(
                "norm_p50"
            ),
            F.round(F.max("nrm_ok"), 8).alias("norm_max"),
        )
        .select(
            "label",
            "n_vecs",
            "n_dup_vecs",
            "n_zero_norm",
            "n_nan",
            "norm_min",
            "norm_p50",
            "norm_max",
        )
    )


def _vector_qc_oracle() -> str:
    from incubyte_vaccination_data_pipeline_spark.catalog.similarity import (
        _dot_sql,
    )

    nrm = f"sqrt({_dot_sql('embedding', 'embedding')})"
    return f"""
    WITH rows_n AS (
        SELECT label, embedding, {nrm} AS nrm,
               CASE WHEN list_bool_or(list_transform(
                   embedding, x -> isnan(x))) THEN 1 ELSE 0 END AS has_nan
        FROM embeddings
    ),
    rows_c AS (
        SELECT *, CASE WHEN has_nan = 0 THEN nrm END AS nrm_ok FROM rows_n
    )
    SELECT label,
           CAST(COUNT(*) AS BIGINT) AS n_vecs,
           CAST(COUNT(*) - COUNT(DISTINCT embedding) AS BIGINT)
               AS n_dup_vecs,
           CAST(SUM(CASE WHEN nrm_ok = 0 THEN 1
                         WHEN nrm_ok IS NULL THEN NULL
                         ELSE 0 END) AS BIGINT) AS n_zero_norm,
           CAST(SUM(has_nan) AS BIGINT) AS n_nan,
           ROUND(MIN(nrm_ok), 8) AS norm_min,
           ROUND(quantile_cont(nrm_ok, 0.5), 8) AS norm_p50,
           ROUND(MAX(nrm_ok), 8) AS norm_max
    FROM rows_c
    GROUP BY label
"""


STAGED["embedding_vector_qc"] = (embedding_vector_qc_q, _vector_qc_oracle())


# ---------------------------------------------------------------------------
# agg_bootstrap_ci
# ---------------------------------------------------------------------------

#: replicate count and subsample rate: 32 deterministic 80% draws —
#: enough replicates for a stable 2.5/97.5 interpolation, constant
#: fan-out cost
BOOT_REPS = 32
#: inclusion threshold on the first 32 md5 bits: floor(0.8 * 2^32)
BOOT_THRESHOLD = int(0.8 * 2**32)


def agg_bootstrap_ci_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Subsampling-bootstrap CI for the mean order price per priority:
    each order joins replicate r when the first 32 bits of
    md5(orderkey || ':' || r) fall under the 80% threshold (the
    portable-hash determinism contract of ``sample_hash_deterministic``
    — same replicate membership on every engine and run). Replicate
    means use exact DECIMAL sums divided in double (the repo's
    cross-engine float discipline); the CI is the interpolated
    2.5/97.5 percentile of the 32 means.

    Scale shape: the x32 explode is a constant fan-out with map-side
    combine into (priority, rep) partials — no new shuffle class; the
    percentile runs over 32 rows per group."""
    orders = read_table(spark, sf_dir, "orders")
    dec = F.col("o_totalprice").cast("decimal(18,2)")
    # the x32 explode + per-row md5 multiplies the input's parallelism
    # deficit: a single-file parquet scan arrives as 1 split and would
    # run the whole fan-out on one core (measured 21s -> ~1s at sf0.1)
    # — the module-standard pre-explode fanout spreads it
    fan = fanout_repartition(
        orders.select("o_orderpriority", dec.alias("p"), "o_orderkey"),
        "o_orderkey",
    ).select(
        "o_orderpriority",
        "p",
        "o_orderkey",
        F.explode(F.sequence(F.lit(0), F.lit(BOOT_REPS - 1))).alias("r"),
    )
    h = F.md5(
        F.concat_ws(
            ":",
            F.col("o_orderkey").cast("string"),
            F.col("r").cast("string"),
        )
    )
    drawn = fan.withColumn("h", h).filter(
        F.expr(md5_half_decode_sql("h", 1)) < F.lit(BOOT_THRESHOLD)
    )
    rep_means = drawn.groupBy("o_orderpriority", "r").agg(
        (F.sum("p").cast("double") / F.count(F.lit(1))).alias("m")
    )
    ci = rep_means.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_replicates"),
        F.round(F.percentile(F.col("m"), F.lit(0.025)), 6).alias("ci_lo"),
        F.round(F.percentile(F.col("m"), F.lit(0.975)), 6).alias("ci_hi"),
    )
    full = orders.groupBy("o_orderpriority").agg(
        F.round(
            F.sum(dec).cast("double") / F.count(F.lit(1)), 6
        ).alias("mean_full")
    )
    return full.join(ci, "o_orderpriority").select(
        "o_orderpriority",
        "mean_full",
        "n_replicates",
        "ci_lo",
        "ci_hi",
    )


_BOOT_V1 = md5_half_decode_sql("h", 1, "strpos")

_BOOT_ORACLE = f"""
    WITH fan AS (
        SELECT o_orderpriority,
               CAST(o_totalprice AS DECIMAL(18,2)) AS p,
               o_orderkey,
               unnest(range(0, {BOOT_REPS})) AS r
        FROM orders
    ),
    drawn AS (
        SELECT o_orderpriority, p, r
        FROM (SELECT *,
                     md5(CAST(o_orderkey AS VARCHAR) || ':' ||
                         CAST(r AS VARCHAR)) AS h
              FROM fan)
        WHERE {_BOOT_V1} < {BOOT_THRESHOLD}
    ),
    rep_means AS (
        SELECT o_orderpriority, r,
               CAST(SUM(p) AS DOUBLE) / COUNT(*) AS m
        FROM drawn GROUP BY o_orderpriority, r
    ),
    ci AS (
        SELECT o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n_replicates,
               ROUND(quantile_cont(m, 0.025), 6) AS ci_lo,
               ROUND(quantile_cont(m, 0.975), 6) AS ci_hi
        FROM rep_means GROUP BY o_orderpriority
    ),
    base_mean AS (
        SELECT o_orderpriority,
               ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                     / COUNT(*), 6) AS mean_full
        FROM orders GROUP BY o_orderpriority
    )
    SELECT f.o_orderpriority, f.mean_full, c.n_replicates, c.ci_lo, c.ci_hi
    FROM base_mean f JOIN ci c USING (o_orderpriority)
"""

STAGED["agg_bootstrap_ci"] = (agg_bootstrap_ci_q, _BOOT_ORACLE)


def register_r14(names: list[str] | None = None) -> None:
    """Land the round-14 staged queries in the live registry — call
    from ``catalog/__init__.py`` at the round-14 kickoff, AFTER the
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


# ---------------------------------------------------------------------------
# events_ohlc_bars
# ---------------------------------------------------------------------------


def events_ohlc_bars_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly OHLC bars per event type — the first/last-by-time
    aggregation every hypertable serves (TimescaleDB ``first()`` /
    ``last()``, Druid firstAggregator): open = value of the earliest
    event in the bar, close = the latest (total order via the unique
    event_id tie-break), high/low = max/min value, volume = row count.

    Plan shape: ONE exchange on the bar key serves everything — the
    ordered window (first_value/last_value over the full frame), the
    unordered partition aggregates (max/min/count), and the rn = 1
    cut all reuse the same hash partitioning and sort. At warehouse
    scale the same frame computes incrementally per arriving time
    partition (bars never span partitions); a groupBy max_by/min_by
    form would skip the sort but Spark/DuckDB disagree on composite
    argmax tie-breaks, so the window form IS the portable contract."""
    events = read_table(spark, sf_dir, "events")
    bar = F.date_trunc("hour", F.col("ts"))
    wp = Window.partitionBy("event_type", "bar")
    wo = wp.orderBy("ts", "event_id")
    wfull = wo.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return (
        events.select("event_type", bar.alias("bar"), "ts", "event_id", "value")
        .withColumn("open", F.first("value").over(wfull))
        .withColumn("close", F.last("value").over(wfull))
        .withColumn("high", F.max("value").over(wp))
        .withColumn("low", F.min("value").over(wp))
        .withColumn("volume", F.count(F.lit(1)).over(wp))
        .withColumn("rn", F.row_number().over(wo))
        .filter(F.col("rn") == 1)
        .select(
            "event_type",
            F.col("bar").alias("bar_start"),
            F.round("open", 6).alias("open"),
            F.round("high", 6).alias("high"),
            F.round("low", 6).alias("low"),
            F.round("close", 6).alias("close"),
            "volume",
        )
    )


_OHLC_ORACLE = """
    WITH b AS (
        SELECT event_type, date_trunc('hour', ts) AS bar, ts, event_id, value,
               FIRST_VALUE(value) OVER w_ord AS open,
               LAST_VALUE(value) OVER
                   (PARTITION BY event_type, date_trunc('hour', ts)
                    ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING
                             AND UNBOUNDED FOLLOWING) AS close,
               MAX(value) OVER w_part AS high,
               MIN(value) OVER w_part AS low,
               COUNT(*) OVER w_part AS volume,
               ROW_NUMBER() OVER w_ord AS rn
        FROM events
        WINDOW
            w_part AS (PARTITION BY event_type, date_trunc('hour', ts)),
            w_ord AS (PARTITION BY event_type, date_trunc('hour', ts)
                      ORDER BY ts, event_id)
    )
    SELECT event_type, bar AS bar_start,
           ROUND(open, 6) AS open, ROUND(high, 6) AS high,
           ROUND(low, 6) AS low, ROUND(close, 6) AS close,
           CAST(volume AS BIGINT) AS volume
    FROM b WHERE rn = 1
"""

STAGED["events_ohlc_bars"] = (events_ohlc_bars_q, _OHLC_ORACLE)


# ---------------------------------------------------------------------------
# events_asof_nearest
# ---------------------------------------------------------------------------


def events_asof_nearest_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAREST as-of join (pandas ``merge_asof(direction='nearest')``,
    completing the engine's backward / backward+tolerance / nearest
    as-of matrix): every purchase event gets the view event of the
    same user CLOSEST in time — before or after — with equal distance
    resolving to the earlier view. The right side is pre-deduplicated
    per (user, ts) keeping the max event_id, so the pick is total-
    ordered at any SF.

    Plan shape (``operators/asof.asof_join_nearest``): both sides
    union once, ONE exchange on user_id serves the backward
    max(struct) carry and the mirrored forward min(struct) carry (the
    second window re-sorts in place), and the final pick is a
    row-local CASE on the two gaps — never a range join, never
    per-key Python."""
    from incubyte_vaccination_data_pipeline_spark.operators.asof import (
        asof_join_nearest,
    )

    events = read_table(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    views = (
        events.filter(F.col("event_type") == "view")
        .select("user_id", "ts", "event_id", "value")
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("user_id", "ts").orderBy(
                    F.col("event_id").desc()
                )
            ),
        )
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    out = asof_join_nearest(
        purchases,
        views,
        on=["user_id"],
        payload_cols=["event_id", "value"],
        payload_prefix="view_",
    )
    return out.select(
        "event_id",
        "user_id",
        "ts",
        F.round("value", 6).alias("value"),
        "view_ts",
        "view_event_id",
        F.round("view_value", 6).alias("view_value"),
    )


_ASOF_NEAREST_ORACLE = """
    WITH views AS (
        SELECT user_id, ts, event_id, value FROM (
            SELECT user_id, ts, event_id, value,
                   ROW_NUMBER() OVER (PARTITION BY user_id, ts
                                      ORDER BY event_id DESC) AS rn
            FROM events WHERE event_type = 'view')
        WHERE rn = 1
    )
    SELECT p.event_id, p.user_id, p.ts,
           ROUND(p.value, 6) AS value,
           v.ts AS view_ts,
           v.event_id AS view_event_id,
           ROUND(v.value, 6) AS view_value
    FROM events p
    LEFT JOIN LATERAL (
        SELECT ts, event_id, value
        FROM views v
        WHERE v.user_id = p.user_id
        ORDER BY abs(epoch(v.ts) - epoch(p.ts)), v.ts
        LIMIT 1
    ) v ON TRUE
    WHERE p.event_type = 'purchase'
"""

STAGED["events_asof_nearest"] = (events_asof_nearest_q, _ASOF_NEAREST_ORACLE)
