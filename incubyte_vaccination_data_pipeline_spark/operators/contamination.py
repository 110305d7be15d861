"""Cross-split contamination detection for training pipelines.

After splitting a corpus (``operators/sampling.py``), eval quality
claims only hold if eval documents do not leak from train. Two passes,
both pure equi-joins on content hashes (the 100 TB shape — never
all-pairs):

- **exact**: whitespace-normalized text hash match (the classic
  "same doc in both splits" leak);
- **n-gram overlap**: fraction of an eval doc's word n-grams that
  occur anywhere in train (catches partial/near leaks — e.g. a train
  doc quoted inside an eval doc — that exact hashing misses). Train
  grams are distinct-ed before the join, so the join's build side
  scales with the UNIQUE gram vocabulary, not corpus size; gram keys
  are bigints decoded from md5 halves (``md5_half_decode_sql``), not
  strings.

Reference parity: the reference has no contamination tooling (it is a
vaccination-record ETL); this extends the training-data family like
dedup/ANN do, reusing their hashing conventions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from incubyte_vaccination_data_pipeline_spark.operators.dedup import md5_half_decode_sql

_WS_NORM = r"\s+"


def _norm_text(text_col: str) -> F.Column:
    return F.lower(F.trim(F.regexp_replace(F.col(text_col), _WS_NORM, " ")))


def exact_contamination(
    train: DataFrame,
    evaluation: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(eval_doc_id, train_doc_id) pairs with identical normalized
    text. Hash-equi-join; each side's hash is computed map-side."""
    t = train.select(
        F.md5(_norm_text(text_col)).alias("__h"),
        F.col(id_col).alias("train_doc_id"),
    )
    e = evaluation.select(
        F.md5(_norm_text(text_col)).alias("__h"),
        F.col(id_col).alias("eval_doc_id"),
    )
    return e.join(t, "__h").select("eval_doc_id", "train_doc_id")


def _gram_frame(df: DataFrame, text_col: str, id_col: str, n: int) -> DataFrame:
    # guard the short-doc case explicitly: Spark's sequence(1, 0) is a
    # DESCENDING [1, 0], not empty, so an unguarded transform would
    # fabricate grams for docs shorter than n words
    grams = F.expr(
        f"CASE WHEN size(__w) >= {n} THEN"
        f" transform(sequence(1, size(__w) - {n - 1}),"
        f" i -> concat_ws(' ', slice(__w, i, {n})))"
        f" ELSE array() END"
    )
    d1 = md5_half_decode_sql("md5(g)", 1)
    return (
        df.select(
            F.col(id_col).alias("doc_id"), F.split(_norm_text(text_col), " ").alias("__w")
        )
        .select("doc_id", F.explode(grams).alias("g"))
        .select("doc_id", F.expr(f"cast({d1} as bigint)").alias("gram_key"))
    )


def ngram_contamination(
    train: DataFrame,
    evaluation: DataFrame,
    n: int = 8,
    min_overlap: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per eval doc: the fraction of its word ``n``-grams that appear
    anywhere in train; rows with overlap >= ``min_overlap`` (docs
    shorter than ``n`` words have no grams and are never flagged —
    exact_contamination covers those). Output:
    (eval_doc_id, n_grams, n_hit, overlap)."""
    train_grams = _gram_frame(train, text_col, id_col, n).select("gram_key").distinct()
    eval_grams = _gram_frame(evaluation, text_col, id_col, n)
    joined = eval_grams.join(
        train_grams.withColumn("__in_train", F.lit(True)), "gram_key", "left"
    )
    hit = F.when(F.coalesce(F.col("__in_train"), F.lit(False)), 1).otherwise(0)
    per_doc = joined.groupBy(F.col("doc_id").alias("eval_doc_id")).agg(
        F.count(F.lit(1)).alias("n_grams"),
        F.sum(hit).alias("n_hit"),
    )
    overlap = F.round(F.col("n_hit") / F.col("n_grams"), 6)
    return (
        per_doc.withColumn("overlap", overlap)
        .filter(F.col("overlap") >= F.lit(min_overlap))
        .select("eval_doc_id", "n_grams", "n_hit", "overlap")
    )
