"""Round-4-staged queries: dataset split + cross-split contamination.

The driver verifies the first 50 registered queries per round, so a
new registration displaces one re-verification slot in the current
window (see README §"Driver verification rotation"). These queries
are complete — Spark side, DuckDB oracle, tests (tests/test_staged_queries.py
runs the same side-by-side compare the driver does) — but registration
is gated behind :func:`register` so the round-3 window keeps all 49
round-1 re-verifications. Round 4: call ``register()`` from
``catalog/__init__.py`` (one line) and they lead that window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from incubyte_vaccination_data_pipeline_spark.catalog.registry import query
from incubyte_vaccination_data_pipeline_spark.operators.contamination import (
    exact_contamination,
    ngram_contamination,
)
from incubyte_vaccination_data_pipeline_spark.operators.sampling import with_split
from incubyte_vaccination_data_pipeline_spark.sources.parquet_io import read_table

# DuckDB restatement of operators/sampling.split_bucket_expr: first 4
# md5 hex chars of (salt || key) as an int in [0, 65536). Spark's
# conv(hex, 16, 10) == positional strpos arithmetic (same trick as the
# dedup family's md5_half_decode_sql).
_HEX = "0123456789abcdef"
_BUCKET_SQL = (
    "((strpos('{hex}', substring(md5('split-v1' || CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 4096"
    " + (strpos('{hex}', substring(md5('split-v1' || CAST(doc_id AS VARCHAR)), 2, 1)) - 1) * 256"
    " + (strpos('{hex}', substring(md5('split-v1' || CAST(doc_id AS VARCHAR)), 3, 1)) - 1) * 16"
    " + (strpos('{hex}', substring(md5('split-v1' || CAST(doc_id AS VARCHAR)), 4, 1)) - 1))"
).format(hex=_HEX)

SPLIT_COUNTS_ORACLE = f"""
    WITH b AS (SELECT doc_id, {_BUCKET_SQL} AS bucket FROM documents),
    s AS (
        SELECT doc_id,
               CASE WHEN bucket < 58982 THEN 'train'
                    WHEN bucket < 62259 THEN 'val'
                    ELSE 'test' END AS split
        FROM b
    )
    SELECT split, COUNT(*) AS n_docs, MIN(doc_id) AS min_doc_id,
           MAX(doc_id) AS max_doc_id
    FROM s GROUP BY split
"""


def split_train_val_test_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic content-addressed 90/5/5 split of ``documents``,
    summarized per split (count + id range — the full assignment is
    row-per-doc and verified by the same bucket arithmetic in the
    oracle). operators/sampling.py; boundaries 58982/62259 are
    round(0.90*65536)/round(0.95*65536)."""
    docs = read_table(spark, sf_dir, "documents")
    return (
        with_split(docs, "doc_id")
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("min_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
        )
    )


CONTAMINATION_ORACLE = f"""
    WITH b AS (SELECT doc_id, text, {_BUCKET_SQL} AS bucket FROM documents),
    tr AS (SELECT doc_id, md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS h
           FROM b WHERE bucket < 58982),
    te AS (SELECT doc_id, md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS h
           FROM b WHERE bucket >= 62259),
    leaked AS (SELECT doc_id, h FROM te
               UNION ALL
               SELECT doc_id + 5000000, h FROM tr
               WHERE doc_id % 50 = 0)
    SELECT l.doc_id AS eval_doc_id, tr.doc_id AS train_doc_id
    FROM leaked l JOIN tr ON l.h = tr.h
"""


def split_contamination_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cross-split contamination over the deterministic split,
    with planted leaks (every 50th train doc re-inserted into the eval
    side at +5,000,000) so the detector's output is non-vacuous: both
    engines must find exactly the planted pairs (the un-tampered
    corpus has no cross-split duplicates)."""
    from incubyte_vaccination_data_pipeline_spark.operators.sampling import take_split

    docs = read_table(spark, sf_dir, "documents")
    train = take_split(docs, "doc_id", "train")
    test = take_split(docs, "doc_id", "test")
    planted = train.filter(F.col("doc_id") % 50 == 0).withColumn(
        "doc_id", F.col("doc_id") + 5000000
    )
    return exact_contamination(train, test.unionByName(planted))


NGRAM_CONTAMINATION_ORACLE = """
    WITH aug AS (
        SELECT doc_id, text FROM documents WHERE doc_id % 97 = 0
    ),
    evals AS (
        SELECT doc_id + 7000000 AS doc_id,
               text || ' fresh evaluation continuation material' AS text
        FROM aug
    ),
    tw AS (
        SELECT doc_id,
               string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ') AS w
        FROM aug
    ),
    ew AS (
        SELECT doc_id,
               string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ') AS w
        FROM evals
    ),
    tg AS (
        SELECT DISTINCT unnest(CASE WHEN len(w) >= 8 THEN
                   list_transform(range(1, len(w) - 6),
                       i -> array_to_string(w[i:i+7], ' '))
               ELSE [] END) AS g
        FROM tw
    ),
    eg AS (
        SELECT doc_id, unnest(CASE WHEN len(w) >= 8 THEN
                   list_transform(range(1, len(w) - 6),
                       i -> array_to_string(w[i:i+7], ' '))
               ELSE [] END) AS g
        FROM ew
    )
    SELECT eg.doc_id AS eval_doc_id,
           COUNT(*) AS n_grams,
           CAST(SUM(CASE WHEN tg.g IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
           round(SUM(CASE WHEN tg.g IS NOT NULL THEN 1 ELSE 0 END) * 1.0
                 / COUNT(*), 6) AS overlap
    FROM eg LEFT JOIN tg ON eg.g = tg.g
    GROUP BY eg.doc_id
    HAVING round(SUM(CASE WHEN tg.g IS NOT NULL THEN 1 ELSE 0 END) * 1.0
                 / COUNT(*), 6) >= 0.3
"""


def ngram_contamination_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word-8-gram partial-leak detection: every 97th document is
    'quoted' inside a synthetic eval doc that then continues with
    fresh words — the detector must flag each eval doc with its
    measured overlap fraction (exact hashing would miss these)."""
    docs = read_table(spark, sf_dir, "documents")
    train = docs.filter(F.col("doc_id") % 97 == 0)
    evals = train.select(
        (F.col("doc_id") + 7000000).alias("doc_id"),
        F.concat(
            F.col("text"), F.lit(" fresh evaluation continuation material")
        ).alias("text"),
    )
    return ngram_contamination(train, evals, n=8, min_overlap=0.3)


CORPUS_REPORT_ORACLE = """
    SELECT source, lang,
           COUNT(*) AS n_docs,
           CAST(SUM(len(string_split(trim(text), ' '))) AS BIGINT) AS n_tokens,
           round(AVG(CAST(n_chars AS DOUBLE)), 6) AS avg_chars,
           CAST(COUNT(DISTINCT md5(text)) AS BIGINT) AS n_unique_texts,
           round(COUNT(DISTINCT md5(text)) * 1.0 / COUNT(*), 6) AS unique_ratio
    FROM documents
    GROUP BY source, lang
"""


def corpus_report_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset-card rollup per (source, lang): doc/token counts, mean
    length, and content-hash uniqueness ratio — the summary a training
    pipeline publishes per corpus slice before mixing. One scan, one
    grouped aggregate; the distinct-hash count is the only expansion
    and rides the same shuffle."""
    docs = read_table(spark, sf_dir, "documents")
    return docs.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(F.split(F.trim("text"), " "))).alias("n_tokens"),
        F.round(F.avg(F.col("n_chars").cast("double")), 6).alias("avg_chars"),
        F.countDistinct(F.md5("text")).alias("n_unique_texts"),
        F.round(
            F.countDistinct(F.md5("text")) / F.count(F.lit(1)), 6
        ).alias("unique_ratio"),
    )


STAGED: dict[str, tuple] = {
    "corpus_report": (corpus_report_q, CORPUS_REPORT_ORACLE),
    "split_train_val_test": (split_train_val_test_q, SPLIT_COUNTS_ORACLE),
    "split_contamination": (split_contamination_q, CONTAMINATION_ORACLE),
    "ngram_contamination_partial_leak": (
        ngram_contamination_q,
        NGRAM_CONTAMINATION_ORACLE,
    ),
}


def register() -> None:
    """Round-4 hook: move the staged queries into the live registry."""
    for name, (fn, oracle) in STAGED.items():
        query(name, oracle=oracle)(fn)
