"""Deduplication operator family for large-scale training-data
pipelines: exact, MinHash+LSH, SimHash, and n-gram Jaccard.

Design for 100 TB (the whole point of these shapes):

- **Explode, hash in codegen, partially aggregate.** Shingle/n-gram
  generation is an ``explode`` to one row per (doc, gram); all md5
  hashing then runs on flat string columns inside whole-stage codegen,
  and the per-doc signature/gram-set is rebuilt with a map-side
  combinable ``groupBy``. This deliberately avoids nesting expensive
  expressions inside ``transform``/``aggregate`` lambdas: Spark's
  higher-order functions are interpreted (not codegen'd) and Catalyst
  inlines upstream projections into lambda bodies, so an array-lambda
  formulation re-evaluates the whole upstream pipeline once per array
  element (measured 20x slowdown at sf0.001).
- **The only shuffles are (a) a pre-explode fan-out of the compact
  input keyed by doc (so the 100-1000x explode stage uses every core,
  not the handful of file splits a small parquet input arrives as —
  the per-doc re-aggregation then reuses that layout instead of
  shuffling again) and (b) the LSH band / block self-join**, an
  equi-join on band keys — Catalyst shuffles both sides by band, so
  candidate generation is O(sum of bucket sizes squared), never the
  O(n^2) cross product.
- **Portable hashing**: md5 hex strings are identical in every engine,
  and the lexicographic MIN of md5 strings is a valid MinHash (any
  uniform injective order works), so signatures validate bit-for-bit
  against the DuckDB oracle with no custom UDFs on either side.

SimHash bit arithmetic uses explicit hex-digit positional decoding
(``instr('0123456789abcdef', c) - 1``) instead of engine-specific
``conv``/``from_hex`` so the oracle can mirror it exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from incubyte_vaccination_data_pipeline_spark.operators.partitioning import (
    fanout_repartition,
)

HEX_DIGITS = "0123456789abcdef"


def word_shingles(text_col: str, k: int = 3) -> Column:
    """Array of k-word shingles of the lower-cased, space-split text."""
    return F.expr(
        f"""
        transform(
            sequence(1, greatest(size(split(lower({text_col}), ' ')) - {k - 1}, 0)),
            i -> array_join(slice(split(lower({text_col}), ' '), i, {k}), ' '))
        """
    )


def char_ngrams(text_col: str, n: int = 3) -> Column:
    """Distinct character n-grams of the lower-cased text."""
    return F.expr(
        f"""
        array_distinct(transform(
            sequence(1, greatest(length(lower({text_col})) - {n - 1}, 0)),
            i -> substring(lower({text_col}), i, {n})))
        """
    )


def minhash_signature(shingles_col: str, n_hashes: int = 12) -> Column:
    """MinHash signature: per seed, the lexicographic min of
    ``md5(seed || '|' || shingle)`` over all shingles. NULL-free only
    when the shingle array is non-empty — filter first."""
    return F.expr(
        f"""
        transform(sequence(0, {n_hashes - 1}),
                  h -> array_min(transform({shingles_col},
                                           s -> md5(concat(cast(h as string), '|', s)))))
        """
    )


def lsh_band_keys(sig_col: str, bands: int, rows_per_band: int) -> Column:
    """Band keys: md5 of each band's concatenated signature slice.
    Docs sharing any band key become candidate pairs."""
    return F.expr(
        f"""
        transform(sequence(0, {bands - 1}),
                  b -> md5(concat(cast(b as string), '|',
                                  array_join(slice({sig_col},
                                                   b * {rows_per_band} + 1,
                                                   {rows_per_band}), '|'))))
        """
    )


def signature_agreement(sig_a: str, sig_b: str, n_hashes: int) -> Column:
    """Estimated Jaccard: fraction of agreeing signature positions."""
    return F.expr(
        f"""
        cast(size(filter(zip_with({sig_a}, {sig_b}, (x, y) -> x = y),
                         v -> v)) as double) / {n_hashes}
        """
    )


def simhash16(tokens_col: str) -> Column:
    """16-bit SimHash over a token array.

    Each token votes +-1 per bit of the first 4 hex digits of its md5;
    the fingerprint sets bit j iff the vote sum is positive.
    """
    # token -> 16-bit int from 4 hex digits (positional decode)
    tok_val = (
        "(instr('{h}', substring(md5(t), 1, 1)) - 1) * 4096"
        " + (instr('{h}', substring(md5(t), 2, 1)) - 1) * 256"
        " + (instr('{h}', substring(md5(t), 3, 1)) - 1) * 16"
        " + (instr('{h}', substring(md5(t), 4, 1)) - 1)"
    ).format(h=HEX_DIGITS)
    return F.expr(
        f"""
        aggregate(
            transform(sequence(0, 15),
                      j -> aggregate({tokens_col}, 0L,
                                     (acc, t) -> acc + CASE WHEN ({tok_val}) div
                                         CASE j WHEN 0 THEN 1 WHEN 1 THEN 2 WHEN 2 THEN 4
                                                WHEN 3 THEN 8 WHEN 4 THEN 16 WHEN 5 THEN 32
                                                WHEN 6 THEN 64 WHEN 7 THEN 128 WHEN 8 THEN 256
                                                WHEN 9 THEN 512 WHEN 10 THEN 1024 WHEN 11 THEN 2048
                                                WHEN 12 THEN 4096 WHEN 13 THEN 8192
                                                WHEN 14 THEN 16384 ELSE 32768 END % 2 = 1
                                         THEN 1L ELSE -1L END)),
            0L,
            (acc, v) -> acc * 2L + CASE WHEN v > 0 THEN 1L ELSE 0L END)
        """
    )


def simhash_fingerprints(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, simhash) 16-bit SimHash per document, distributed form.

    Tokens explode to rows, each token's md5 is decoded ONCE into a
    16-bit value (the array-lambda form recomputed md5 per bit — 16x),
    the 16 per-bit +-1 votes are codegen'd columns, and a map-side
    combinable groupBy sums votes per doc before packing the
    fingerprint. Arithmetic is bit-identical to ``simhash16``.
    """
    toks = fanout_repartition(
        df.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("__t")),
        "doc_id",
    ).select(
        "doc_id",
        F.explode(F.split(F.lower(F.col("__t")), " ")).alias("t"),
    ).select("doc_id", F.md5("t").alias("m"))
    dec = " + ".join(
        f"(instr('{HEX_DIGITS}', substring(m, {p + 1}, 1)) - 1) * {16 ** (3 - p)}"
        for p in range(4)
    )
    vals = toks.select("doc_id", F.expr(f"cast({dec} as bigint)").alias("v"))
    votes = [
        F.sum(
            F.when(F.expr(f"(v div {1 << j}) % 2 = 1"), F.lit(1)).otherwise(F.lit(-1))
        ).alias(f"_s{j}")
        for j in range(16)
    ]
    packed = sum(
        (F.when(F.col(f"_s{j}") > 0, F.lit(1 << (15 - j))).otherwise(F.lit(0))
         for j in range(16)),
        F.lit(0),
    )
    return (
        vals.groupBy("doc_id").agg(*votes)
        .select("doc_id", packed.cast("bigint").alias("simhash"))
    )


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup via content-hash groupBy: one representative (min
    id) per distinct text, with the duplicate count. Map-side partial
    aggregation makes this one cheap shuffle at any scale."""
    return (
        df.select(F.md5(F.col(text_col)).alias("text_hash"), F.col(id_col))
        .groupBy("text_hash")
        .agg(
            F.min(id_col).alias("rep_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 12,
    shingle_k: int = 3,
) -> DataFrame:
    """(doc, sig) MinHash signatures via explode + groupBy.

    One row per (doc, shingle); the ``n_hashes`` seeded md5s are flat
    codegen'd columns, re-aggregated per doc with map-side-combined
    MINs. Docs with fewer than ``shingle_k`` words yield no shingles
    and are dropped (same as the array formulation's size>0 filter).
    """
    words = fanout_repartition(
        df.select(
            F.col(id_col).alias("doc"),
            F.split(F.lower(F.col(text_col)), " ").alias("words"),
        ).filter(F.size("words") >= shingle_k),
        "doc",
    )
    shingles = words.select(
        "doc",
        F.expr(
            f"""
            explode(transform(sequence(1, size(words) - {shingle_k - 1}),
                              i -> array_join(slice(words, i, {shingle_k}), ' ')))
            """
        ).alias("shingle"),
    )
    mins = [
        F.min(F.md5(F.concat(F.lit(f"{h}|"), F.col("shingle")))).alias(f"_h{h}")
        for h in range(n_hashes)
    ]
    return (
        shingles.groupBy("doc")
        .agg(*mins)
        .select("doc", F.array(*[f"_h{h}" for h in range(n_hashes)]).alias("sig"))
    )


def minhash_candidate_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 12,
    bands: int = 4,
    shingle_k: int = 3,
    min_est_jaccard: float = 0.5,
) -> DataFrame:
    """MinHash+LSH near-duplicate pairs.

    explode shingles -> seeded md5 columns -> groupBy-min signature ->
    band keys -> explode -> band self-join (equi-join shuffle; the
    aggregated signature exchange is reused across both sides) ->
    distinct pairs -> estimated Jaccard filter.
    Returns (doc_a, doc_b, est_jaccard).
    """
    rows_per_band = n_hashes // bands
    sigs = minhash_signatures(df, text_col, id_col, n_hashes, shingle_k)
    # sig is an aggregation output attribute here, so the band-key
    # lambda slices a materialized 12-element array — cheap per band.
    banded = sigs.select(
        "doc", "sig", F.explode(lsh_band_keys("sig", bands, rows_per_band)).alias("band")
    )
    a = banded.select(
        F.col("doc").alias("doc_a"), F.col("sig").alias("sig_a"), "band"
    )
    b = banded.select(
        F.col("doc").alias("doc_b"), F.col("sig").alias("sig_b"), "band"
    )
    pairs = (
        a.join(b, on="band")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "sig_a", "sig_b")
        .dropDuplicates(["doc_a", "doc_b"])
    )
    est = signature_agreement("sig_a", "sig_b", n_hashes)
    return (
        pairs.select("doc_a", "doc_b", F.round(est, 6).alias("est_jaccard"))
        .filter(F.col("est_jaccard") >= min_est_jaccard)
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    block_cols: list[str] | None = None,
    n: int = 3,
    min_jaccard: float = 0.3,
    len_bucket_width: int = 100,
) -> DataFrame:
    """Exact character-n-gram Jaccard over blocked candidate pairs.

    Blocking (default: language + length bucket) keeps the pair join
    far from O(n^2); the set intersection runs per-pair as an array
    expression. Narrower ``len_bucket_width`` cuts candidate pairs
    quadratically at the cost of missing near-dups whose lengths
    straddle a bucket boundary (recall-oriented discovery belongs to
    MinHash+LSH; this is the precision/verify-style operator).
    Returns (doc_a, doc_b, jaccard)."""
    if block_cols is None:
        block_cols = ["lang", "len_bucket"]
        df = df.withColumn(
            "len_bucket", (F.col("n_chars") / len_bucket_width).cast("int")
        )
    # explode to one row per (doc, position), substring in codegen,
    # rebuild the distinct gram set with collect_set — avoids the
    # interpreted per-element lower(text) re-evaluation of an
    # array-lambda formulation.
    lowered = fanout_repartition(
        df.select(
            F.col(id_col).alias("doc"),
            *block_cols,
            F.lower(F.col(text_col)).alias("lt"),
        ).filter(F.length("lt") >= n),
        "doc",
    )
    gram_rows = lowered.select(
        "doc",
        *block_cols,
        F.explode(F.expr(f"sequence(1, length(lt) - {n - 1})")).alias("pos"),
        "lt",
    ).select("doc", *block_cols, F.expr(f"substring(lt, pos, {n})").alias("gram"))
    grams = gram_rows.groupBy("doc", *block_cols).agg(
        F.collect_set("gram").alias("grams")
    )
    a = grams.select(
        *block_cols, F.col("doc").alias("doc_a"), F.col("grams").alias("ga")
    )
    b = grams.select(
        *block_cols, F.col("doc").alias("doc_b"), F.col("grams").alias("gb")
    )
    # size-ratio prefilter: J(A,B) <= min(|A|,|B|)/max(|A|,|B|), so
    # pairs whose set sizes are too far apart can never clear the
    # threshold — an O(1) test that skips the O(|A|+|B|) intersection
    na, nb = F.size("ga"), F.size("gb")
    size_ok = F.least(na, nb) >= F.lit(min_jaccard) * F.greatest(na, nb)
    # Evaluate the O(|ga|+|gb|) hash-set intersection exactly ONCE per
    # pair: alias it in its own projection (CollapseProject keeps a
    # non-cheap multi-referenced alias materialized), then gate the
    # threshold filter behind a non-deterministic fence so
    # PushDownPredicates cannot substitute the alias back into the
    # predicate (which would re-run the intersection per comparison —
    # measured 1.7x on the whole query at sf0.1).
    p1 = (
        a.join(b, on=block_cols)
        .filter((F.col("doc_a") < F.col("doc_b")) & size_ok)
        .select(
            "doc_a",
            "doc_b",
            F.size(F.array_intersect("ga", "gb")).alias("c"),
            (na + nb).alias("s"),
        )
    )
    jac = F.round(F.col("c").cast("double") / (F.col("s") - F.col("c")), 6)
    return (
        p1.select(
            "doc_a", "doc_b", jac.alias("jaccard"), F.rand(seed=0).alias("__fence")
        )
        .filter((F.col("jaccard") >= min_jaccard) | (F.col("__fence") < -1))
        .select("doc_a", "doc_b", "jaccard")
    )


def duplicate_clusters(
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_iters: int = 4,
) -> DataFrame:
    """Connected components over near-duplicate candidate pairs:
    assign every document in a duplicate group the group's minimum
    doc id (its canonical representative).

    Iterative min-label propagation, fully distributed: each round is
    one equi-join (edges against current labels) + one min-aggregate,
    i.e. two hash-partitioned shuffles — no driver-side graph, no
    collect. ``max_iters`` bounds the propagation radius; it must be
    >= the largest component's diameter (near-dup clusters are
    planted pairs/triples here, so 4 is ample; raise it for corpora
    with long duplicate chains). The loop exits early once a round
    changes no label (converged components).

    Lineage discipline: without truncation, round i+1's plan embeds
    round i's plan twice (the union branch and the join branch), so
    the candidate-pair pipeline would be re-optimized and re-executed
    ~2^iters times. Edges are materialized once up front and labels
    are ``localCheckpoint``-ed every round, keeping each iteration's
    plan two shuffles wide regardless of iteration count. (On a
    multi-node cluster, swap for reliable ``checkpoint`` with a
    checkpoint dir — same semantics, executor-loss-safe.)

    Replaces the reference's absent grouping step — its window dedup
    (view_generator.py:42-45) keys on exact CUST_I equality only.
    """
    fwd = pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
    edges = fwd.unionByName(
        pairs.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst"))
    ).localCheckpoint()
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint()
    )
    for _ in range(max_iters):
        neighbor = edges.join(
            labels, edges.dst == labels.node
        ).select(F.col("src").alias("node"), "label")
        new_labels = (
            labels.unionByName(neighbor)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(
                labels.alias("o"),
                F.col("n.node") == F.col("o.node"),
            )
            .filter(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels.select(
        F.col("node").alias("doc_id"), F.col("label").alias("cluster_id")
    )
