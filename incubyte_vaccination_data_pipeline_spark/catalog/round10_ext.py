"""Round-10 additions: the scale-safe default verify pass (registered)
plus the round-11 staging registry (STAGED_R11: the wide-SimHash pairs
path and IVF radius search defined here, and the second batch merged
in from ``catalog/round11_staged`` — see the staging section at the
bottom; registration deferred to round 11).

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
from pyspark.sql import functions as F

from incubyte_vaccination_data_pipeline_spark.catalog.dedup import (
    AUG_SQL,
    augmented_documents,
    simhash_oracle_ctes,
)
from incubyte_vaccination_data_pipeline_spark.operators.dedup import (
    simhash_fingerprints,
    simhash_near_pairs,
)
from incubyte_vaccination_data_pipeline_spark.plans.checkpoints import (
    durable_checkpoint,
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


# --- staged for round 11: the WIDE SimHash pairs path --------------------
#
# The round-10 30x stress priced the catalog's oracle-pinned 32-bit
# dedup_simhash_hamming at 184s/63x (saturated band buckets, ~24M junk
# pairs) while the operator-default derived width did the same corpus
# in 14.1s/134k pairs (SCALE.md). This query makes the WIDE path
# driver-value-checkable: 48-bit fingerprints (the width
# derived_simhash_bits picks for the 10x corpus) with 12-bit bands —
# same decode/vote/pack arithmetic as the 32-bit oracle, generated at
# 12 hex digits. STAGED (not registered) in round 10 so the four
# round-8 queries and dedup_ngram_jaccard_prefix keep their promised
# round-10 window slots; round 11 registers it (growth sim at 202
# keeps the gap bound at ceil(202/50)=5).

_WIDE_BITS = 48
# ONE shared generator (catalog/dedup.simhash_oracle_ctes) produces the
# decode/vote/pack SQL for every width — the 32-bit oracle and this one
# can never diverge arithmetically (round-10 review finding)
_SIMHASHW_CTES = simhash_oracle_ctes(_WIDE_BITS, "w")

_WIDE_BAND_W = _WIDE_BITS // 4  # 4 bands of 12 bits
_WIDE_MASK = (1 << _WIDE_BAND_W) - 1

_SIMHASH_WIDE_ORACLE = f"""
    WITH {_SIMHASHW_CTES},
    wbanded AS (
        SELECT doc_id, simhash,
               unnest(list_transform(range(0, 4),
                   b -> CAST(b AS VARCHAR) || '|'
                        || CAST((simhash >> (b * {_WIDE_BAND_W})) & {_WIDE_MASK}
                                AS VARCHAR))) AS band
        FROM fpw
    ),
    wpairs AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM wbanded a JOIN wbanded b ON a.band = b.band AND a.doc_id < b.doc_id
    )
    SELECT p.doc_a, p.doc_b,
           CAST(bit_count(xor(fa.simhash, fb.simhash)) AS INT) AS hamming
    FROM wpairs p
    JOIN fpw fa ON fa.doc_id = p.doc_a
    JOIN fpw fb ON fb.doc_id = p.doc_b
    WHERE bit_count(xor(fa.simhash, fb.simhash)) <= 3
"""

#: per-(app, corpus) 48-bit fingerprint frame (both sides of the band
#: self-join reference it — same caching rationale as _SHARED_SIMHASH32)
_SHARED_SIMHASH48 = BoundedCache()


def _shared_simhash48(spark: SparkSession, sf_dir: str) -> DataFrame:
    key = (spark.sparkContext.applicationId, sf_dir)
    return _SHARED_SIMHASH48.get_or_build(
        key,
        lambda: durable_checkpoint(
            simhash_fingerprints(
                augmented_documents(spark, sf_dir), bits=_WIDE_BITS
            )
        ),
    )


def dedup_simhash_hamming_wide_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs (Hamming <= 3) over a 48-BIT fingerprint
    with 12-bit bands — the production-width path the 30x stress
    showed is the difference between 14.1s and 184s at 30x data
    (SCALE.md): per-band bucket space 4096 vs the 32-bit query's 256,
    so band buckets keep ~constant population as the corpus grows.
    48 bits is exactly what the operator default
    (``derived_simhash_bits``) picks for the 10x corpus; the width is
    pinned here as this query's oracle contract, with the SAME
    decode/vote/pack arithmetic as the 32-bit oracle generated at 12
    hex digits."""
    return simhash_near_pairs(
        _shared_simhash48(spark, sf_dir),
        max_hamming=3,
        bits=_WIDE_BITS,
        bands=4,
    )


# --- staged for round 11: radius search through the IVF index ------------

def ann_radius_ivf_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (radius) search THROUGH the shared IVF index: every
    neighbor with cosine >= 0.25 for the query vectors, scoring only
    each query's probed cells — the indexed twin of
    ``ann_cosine_range`` (whose broadcast-queries x full-corpus scan
    is exactly what a 100 TB corpus cannot afford per query batch).
    Candidates outside the probed cells are missed (the IVF trade);
    every returned pair carries its exact cosine, so results are a
    subset of the brute-force range query with identical scores —
    pinned in tests. The oracle replays the whole index pipeline in
    SQL (seeds -> integer-Lloyd -> assign -> probe) with a threshold
    tail instead of the rank window."""
    from incubyte_vaccination_data_pipeline_spark.catalog.similarity import (
        IVF_N_PROBE,
        N_QUERY_VECTORS,
        RANGE_THRESHOLD,
        _ivf_assigned_index,
        _ivf_index,
    )
    from incubyte_vaccination_data_pipeline_spark.operators.similarity import (
        radius_search_ivf,
    )
    from incubyte_vaccination_data_pipeline_spark.sources.parquet_io import read_table

    emb = read_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERY_VECTORS)
    return radius_search_ivf(
        None,
        queries,
        threshold=RANGE_THRESHOLD,
        n_probe=IVF_N_PROBE,
        centroids=_ivf_index(spark, sf_dir),
        assigned_corpus=_ivf_assigned_index(spark, sf_dir),
    )


def _radius_oracle() -> str:
    from incubyte_vaccination_data_pipeline_spark.catalog.similarity import (
        RANGE_THRESHOLD,
        _ivf_oracle,
    )

    return _ivf_oracle(radius=RANGE_THRESHOLD)


#: round-11 registrations: staged now (window protection — see module
#: docstring), moved into the live registry by catalog/__init__.py
#: NEXT round via register_r11().
STAGED_R11 = {
    "dedup_simhash_hamming_wide": (dedup_simhash_hamming_wide_q, _SIMHASH_WIDE_ORACLE),
    "ann_radius_ivf": (ann_radius_ivf_q, _radius_oracle()),
}

# second staging batch (substring dedup + BM25) — see that module's
# docstring; merged here so register_r11() and the staged-query test
# parametrization cover every round-11 registration in one place.
from incubyte_vaccination_data_pipeline_spark.catalog import round11_staged  # noqa: E402

STAGED_R11.update(round11_staged.STAGED)


def register_r11(names: list[str] | None = None) -> None:
    """Move the round-11 staged queries into the live registry (to be
    called from catalog/__init__.py in round 11)."""
    for name in (names if names is not None else list(STAGED_R11)):
        fn, oracle = STAGED_R11[name]
        QUERIES[name] = fn
        ORACLES[name] = oracle
