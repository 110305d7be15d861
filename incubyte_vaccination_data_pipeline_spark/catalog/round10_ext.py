"""Round-10 additions: the scale-safe default verify pass.

- ``dedup_ngram_jaccard_prefix`` — exact char-3-gram Jaccard through
  the operator's NEW defaulted blocking (language + 20-char length
  bucket + 12-char ``lower(ltrim(text))`` content prefix,
  ``operators/dedup._resolve_block_cols``). The content-prefix key is
  what de-quadratics the verify join at corpus scale: within a fixed
  (lang, length-bucket) block the population grows linearly with the
  corpus so the self-join grows quadratically (round-9 stress measured
  28x cold at 10x data); the prefix key's cardinality grows WITH the
  corpus, so block populations are bounded by boilerplate-sharing, not
  corpus size (round-10 stress: see SCALE.md). The original 2-column
  blocking stays available as ``dedup_ngram_jaccard`` (catalog pins it
  explicitly — its oracle contract and driver fingerprint are
  unchanged).

The oracle is the exact DuckDB restatement of the refined blocking:
same grams CTE as ``dedup_ngram_jaccard`` plus the
``substr(ltrim(lower(text)), 1, 12)`` prefix key in the block-join
predicate — every jaccard value is value-checked, nothing estimated.

Registered from ``catalog/__init__.py`` AFTER ``round8_ext`` so the
four round-8 queries keep their promised round-10 driver slots (new
registrations tie on the due-now key and break ties by registration
order); the growth simulation at 201 queries keeps the
re-verification gap at ceil(201/50) = 5
(tests/test_rotation.py::test_simulated_growth_keeps_gap_bounded).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from incubyte_vaccination_data_pipeline_spark.catalog.dedup import (
    AUG_SQL,
    augmented_documents,
)
from incubyte_vaccination_data_pipeline_spark.catalog.registry import ORACLES, QUERIES
from incubyte_vaccination_data_pipeline_spark.operators.dedup import (
    DEFAULT_PREFIX_LEN,
    ngram_gram_sets,
    ngram_jaccard_pairs,
)
from incubyte_vaccination_data_pipeline_spark.shared_cache import BoundedCache

#: per-(app, corpus) char-3-gram sets carrying the REFINED
#: (lang, len_bucket, text_prefix) block keys — same rows as
#: catalog/dedup._SHARED_NGRAMS, one extra key column; cached
#: separately because the two queries pin different block contracts.
_SHARED_NGRAMS_PREFIX = BoundedCache()


def _shared_prefix_grams(spark: SparkSession, sf_dir: str) -> DataFrame:
    key = (spark.sparkContext.applicationId, sf_dir)
    return _SHARED_NGRAMS_PREFIX.get_or_build(
        key,
        # block_cols defaulted -> (lang, len_bucket, text_prefix)
        lambda: ngram_gram_sets(
            augmented_documents(spark, sf_dir), n=3, len_bucket_width=20
        ),
    )


def dedup_ngram_jaccard_prefix_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact char-3-gram Jaccard over the operator's defaulted
    (lang, 20-char-length-bucket, 12-char-content-prefix) blocks — the
    corpus-scale-safe verify pass. Same exact per-pair Jaccard as
    ``dedup_ngram_jaccard``; the additional prefix key scopes the
    operator to near-dups whose first ``DEFAULT_PREFIX_LEN`` lowered,
    left-trimmed chars agree (edits inside the prefix belong to the
    MinHash+LSH discovery pass), which is what keeps block populations
    independent of corpus size. Gram sets build once per corpus
    (:data:`_SHARED_NGRAMS_PREFIX`); the blocked verify join runs per
    call."""
    return ngram_jaccard_pairs(
        augmented_documents(spark, sf_dir),
        n=3,
        min_jaccard=0.5,
        len_bucket_width=20,
        gram_sets=_shared_prefix_grams(spark, sf_dir),
    )


_NGRAM_PREFIX_ORACLE = f"""
    WITH aug AS ({AUG_SQL}),
    grams AS (
        SELECT doc_id AS doc, lang,
               CAST(n_chars // 20 AS INT) AS len_bucket,
               substr(ltrim(lower(text)), 1, {DEFAULT_PREFIX_LEN}) AS text_prefix,
               list_distinct(list_transform(
                   range(1, greatest(length(lower(text)) - 2, 0) + 1),
                   i -> substr(lower(text), i, 3))) AS grams
        FROM aug
    ),
    pairs AS (
        SELECT a.doc AS doc_a, b.doc AS doc_b, a.grams AS ga, b.grams AS gb
        FROM grams a
        JOIN grams b ON a.lang = b.lang AND a.len_bucket = b.len_bucket
                    AND a.text_prefix = b.text_prefix
                    AND a.doc < b.doc
        WHERE len(a.grams) > 0 AND len(b.grams) > 0
    )
    SELECT doc_a, doc_b,
           round(CAST(len(list_intersect(ga, gb)) AS DOUBLE)
                 / (len(ga) + len(gb)
                    - len(list_intersect(ga, gb))), 6)
               AS jaccard
    FROM pairs
    WHERE round(CAST(len(list_intersect(ga, gb)) AS DOUBLE)
                / (len(ga) + len(gb)
                   - len(list_intersect(ga, gb))), 6) >= 0.5
"""


STAGED = {
    "dedup_ngram_jaccard_prefix": (dedup_ngram_jaccard_prefix_q, _NGRAM_PREFIX_ORACLE),
}


def register(names: list[str] | None = None) -> None:
    """Move the round-10 queries into the live registry (called from
    catalog/__init__.py)."""
    for name in (names if names is not None else list(STAGED)):
        fn, oracle = STAGED[name]
        QUERIES[name] = fn
        ORACLES[name] = oracle
