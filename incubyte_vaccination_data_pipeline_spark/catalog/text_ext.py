"""Training-corpus text operators, batch 2: PII redaction, sliding
window chunking, and the quality-filter funnel.

``text_pii_redaction`` — the scrubbing pass every pre-training
pipeline runs before a corpus ships. The synthetic ``documents`` text
contains no PII, so the query first *derives* a PII-bearing variant
deterministically from ``doc_id`` (the same derive-then-verify pattern
as ``snapshot_diff_orders``: both engines restate the identical
derivation, so the redaction logic itself is what the oracle checks),
then masks emails / NANP-style phone numbers / IPv4 addresses with
typed placeholders and reports per-type match counts. All regex work
is JVM-side ``regexp_replace`` / ``regexp_count`` — codegen'd, no UDF;
patterns are restricted to the RE2 ∩ Java-regex common subset so both
engines compile them identically.

``text_chunk_overlap`` — fixed-size sliding-window chunking (window
32 tokens, stride 24) that turns documents into training samples.
Chunk starts are generated distributed via ``sequence`` + ``explode``
(one row per chunk, never a driver loop); the chunk itself is an
``slice`` + ``array_join`` over the tokenized text. Chunking rule:
chunk ``i`` covers tokens ``[i*stride, i*stride + window)`` for
``i`` in ``0 .. floor((n_tokens-1)/stride)`` — full coverage, short
tail chunks allowed, restated verbatim by the oracle.

``text_filter_funnel`` — sequential quality-gate attrition (the
C4/Gopher-style keep/drop report): word-count floor, mean-word-length
band, distinct-token ratio, stopword presence, applied in order, with
per-source survivor counts at every stage. ONE scan, conditional
aggregates only — the funnel needs no joins and no explode because
every rule is an array expression over the tokenized text.

Reference parity: the reference has no text surface; these extend the
LLM-pipeline family required beyond it (see also ``text.py``,
``operators/text.py``).

100 TB posture: all three are single-scan; redaction and funnel are
pure per-row expressions (embarrassingly parallel, no shuffle except
the funnel's tiny per-source aggregate); chunking's only growth is
its output (~n_tokens/stride rows per doc), which is the product the
pipeline exists to make.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from incubyte_vaccination_data_pipeline_spark.catalog.registry import query
from incubyte_vaccination_data_pipeline_spark.sources.parquet_io import read_table

# regex subset valid in both Java regex (Spark) and RE2 (DuckDB)
_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PHONE_RE = r"\+1-[0-9]{3}-[0-9]{4}"
_IP_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"

# deterministic PII derivation (both engines restate it; the point
# under test is the masking, not the synthesis)
_DIRTY_SQL = (
    "text || ' contact user' || doc_id || '@example.com or +1-' "
    "|| lpad(CAST(500 + doc_id % 500 AS STRING), 3, '0') || '-' "
    "|| lpad(CAST(doc_id % 10000 AS STRING), 4, '0') "
    "|| ' from 10.' || CAST(doc_id % 256 AS STRING) || '.' "
    "|| CAST((doc_id * 7) % 256 AS STRING) || '.' "
    "|| CAST((doc_id * 13) % 256 AS STRING)"
)


@query(
    "text_pii_redaction",
    oracle=f"""
    WITH dirty AS (
        SELECT doc_id, source, {_DIRTY_SQL} AS t FROM documents
    )
    SELECT doc_id,
           source,
           CAST(len(regexp_extract_all(t, '{_EMAIL_RE}')) AS INT) AS n_emails,
           CAST(len(regexp_extract_all(t, '{_PHONE_RE}')) AS INT) AS n_phones,
           CAST(len(regexp_extract_all(t, '{_IP_RE}')) AS INT) AS n_ips,
           md5(regexp_replace(
                 regexp_replace(
                   regexp_replace(t, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                   '{_PHONE_RE}', '<PHONE>', 'g'),
                 '{_IP_RE}', '<IP>', 'g')) AS redacted_md5
    FROM dirty
    """,
)
def text_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mask emails / phones / IPv4s with typed placeholders and count
    matches per type. Pure codegen'd regexp expressions over one scan
    — the shape that redacts a 100 TB corpus at scan speed."""
    docs = read_table(spark, sf_dir, "documents")
    dirty = docs.select("doc_id", "source", F.expr(_DIRTY_SQL).alias("t"))
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("t"), F.lit(_EMAIL_RE), F.lit("<EMAIL>")),
            F.lit(_PHONE_RE),
            F.lit("<PHONE>"),
        ),
        F.lit(_IP_RE),
        F.lit("<IP>"),
    )
    return dirty.select(
        "doc_id",
        "source",
        F.regexp_count(F.col("t"), F.lit(_EMAIL_RE)).cast("int").alias("n_emails"),
        F.regexp_count(F.col("t"), F.lit(_PHONE_RE)).cast("int").alias("n_phones"),
        F.regexp_count(F.col("t"), F.lit(_IP_RE)).cast("int").alias("n_ips"),
        F.md5(redacted).alias("redacted_md5"),
    )


_CHUNK = 32
_STRIDE = 24


@query(
    "text_chunk_overlap",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id,
               string_split_regex(trim(lower(text)), '\\s+') AS ws
        FROM documents
    )
    SELECT t.doc_id,
           CAST(i.i AS INT) AS chunk_id,
           CAST(len(list_slice(t.ws, i.i * {_STRIDE} + 1,
                               i.i * {_STRIDE} + {_CHUNK})) AS INT) AS n_tokens,
           md5(array_to_string(
                 list_slice(t.ws, i.i * {_STRIDE} + 1,
                            i.i * {_STRIDE} + {_CHUNK}), ' ')) AS chunk_md5
    FROM toks t,
         LATERAL (SELECT UNNEST(generate_series(
                    0, (len(t.ws) - 1) // {_STRIDE})) AS i) i
    """,
)
def text_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window chunking: window 32 tokens, stride
    24. ``sequence``+``explode`` generates chunk indices
    distributed; each chunk is ``slice``+``array_join`` — no UDF, no
    shuffle, output-bound growth only."""
    docs = read_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.split(F.lower(F.trim(F.col("text"))), r"\s+").alias("ws")
    )
    n = F.size("ws")
    exploded = toks.select(
        "doc_id",
        "ws",
        F.explode(
            F.sequence(F.lit(0), ((n - F.lit(1)) / F.lit(_STRIDE)).cast("int"))
        ).alias("chunk_id"),
    )
    chunk = F.slice(
        F.col("ws"), F.col("chunk_id") * _STRIDE + 1, _CHUNK
    )
    return exploded.select(
        "doc_id",
        F.col("chunk_id").cast("int").alias("chunk_id"),
        F.size(chunk).cast("int").alias("n_tokens"),
        F.md5(F.array_join(chunk, " ")).alias("chunk_md5"),
    )


_STOPWORDS = ["the", "a", "of", "and", "to"]
_MIN_WORDS = 30
_WLEN_LO = 2.0
_WLEN_HI = 12.0
_DISTINCT_FLOOR = 0.3


@query(
    "text_filter_funnel",
    oracle=f"""
    WITH toks AS (
        SELECT source,
               string_split_regex(trim(lower(text)), '\\s+') AS ws
        FROM documents
    ),
    rules AS (
        SELECT source,
               len(ws) >= {_MIN_WORDS} AS r1,
               len(array_to_string(ws, '')) * 1.0 / len(ws)
                   BETWEEN {_WLEN_LO} AND {_WLEN_HI} AS r2,
               len(list_distinct(ws)) * 1.0 / len(ws)
                   >= {_DISTINCT_FLOOR} AS r3,
               list_has_any(ws, {_STOPWORDS!r}) AS r4
        FROM toks
    )
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN r1 THEN 1 ELSE 0 END) AS BIGINT)
               AS pass_minlen,
           CAST(SUM(CASE WHEN r1 AND r2 THEN 1 ELSE 0 END) AS BIGINT)
               AS pass_wordlen,
           CAST(SUM(CASE WHEN r1 AND r2 AND r3 THEN 1 ELSE 0 END) AS BIGINT)
               AS pass_distinct,
           CAST(SUM(CASE WHEN r1 AND r2 AND r3 AND r4 THEN 1 ELSE 0 END)
                AS BIGINT) AS pass_all
    FROM rules
    GROUP BY source
    """,
)
def text_filter_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential quality-gate attrition per source: word-count floor
    → mean-word-length band → distinct-token ratio → stopword
    presence. One scan, conditional aggregates; every rule is an
    array expression (no explode), so the funnel costs one tiny
    per-source shuffle regardless of corpus size."""
    docs = read_table(spark, sf_dir, "documents")
    toks = docs.select(
        "source", F.split(F.lower(F.trim(F.col("text"))), r"\s+").alias("ws")
    )
    n = F.size("ws")
    mean_wlen = F.length(F.array_join(F.col("ws"), "")) / n
    r1 = n >= _MIN_WORDS
    r2 = (mean_wlen >= _WLEN_LO) & (mean_wlen <= _WLEN_HI)
    r3 = F.size(F.array_distinct("ws")) / n >= _DISTINCT_FLOOR
    r4 = F.arrays_overlap("ws", F.array(*[F.lit(s) for s in _STOPWORDS]))
    rules = toks.select(
        "source",
        r1.alias("r1"),
        r2.alias("r2"),
        r3.alias("r3"),
        r4.alias("r4"),
    )
    as_long = lambda c: F.sum(F.when(c, 1).otherwise(0)).cast("bigint")  # noqa: E731
    return rules.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        as_long(F.col("r1")).alias("pass_minlen"),
        as_long(F.col("r1") & F.col("r2")).alias("pass_wordlen"),
        as_long(F.col("r1") & F.col("r2") & F.col("r3")).alias("pass_distinct"),
        as_long(F.col("r1") & F.col("r2") & F.col("r3") & F.col("r4")).alias(
            "pass_all"
        ),
    )


_BPE_TOP2 = 20


@query(
    "text_bpe_apply_merge",
    oracle=f"""
    WITH words AS (
        SELECT UNNEST(string_split_regex(trim(lower(text)), '\\s+')) AS w
        FROM documents
    ),
    wc AS (
        SELECT w, COUNT(*) AS n FROM words
        WHERE len(w) >= 2 AND strpos(w, chr(1)) = 0 GROUP BY w
    ),
    p1 AS (
        SELECT substr(wc.w, i.i, 2) AS pair, SUM(wc.n) AS cnt
        FROM wc, LATERAL (SELECT UNNEST(generate_series(1, len(wc.w) - 1)) AS i) i
        GROUP BY 1
    ),
    top1 AS (SELECT pair AS mp FROM p1 ORDER BY cnt DESC, pair LIMIT 1),
    marked AS (
        SELECT replace(w, mp, chr(1)) AS mw, n, mp FROM wc, top1
    ),
    p2 AS (
        SELECT m.mp, replace(substr(m.mw, i.i, 2), chr(1), m.mp) AS pair, m.n
        FROM marked m,
             LATERAL (SELECT UNNEST(generate_series(1, len(m.mw) - 1)) AS i) i
        WHERE len(m.mw) >= 2
    )
    SELECT mp AS merge_applied, pair,
           CAST(SUM(n) AS BIGINT) AS n_occurrences
    FROM p2 GROUP BY 1, 2
    ORDER BY n_occurrences DESC, pair
    LIMIT {_BPE_TOP2}
    """,
)
def text_bpe_apply_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One full BPE tokenizer-training iteration materialized: learn
    the best merge from corpus-weighted pair counts (max count,
    lexicographic tie-break), APPLY it to the word symbol table, and
    recount — the loop body of BPE training, where
    ``text_bpe_merge_candidates`` is only the first count. The merge
    application is Spark's native ``replace`` (greedy left-to-right
    non-overlapping, identical semantics in DuckDB), with the merged
    token carried as a single sentinel symbol (``chr(1)``) so
    iteration-2 pairs are SYMBOL pairs, not character pairs — exactly
    how a production trainer represents its growing vocabulary; output
    pair labels expand the sentinel back for readability.

    Scale design (the reason BPE training is feasible at 100 TB): all
    per-iteration work runs over the DISTINCT-WORD table weighted by
    corpus frequency — vocabulary-bounded (millions of rows), never
    corpus-bounded (trillions); the winning merge is a one-row
    aggregate broadcast back (never a driver-side argmax over a
    collect); each iteration adds one narrow map stage + one keyed
    count. Words are pre-filtered to exclude the sentinel char on both
    engines, and merged-to-single-symbol words drop out of pair
    generation explicitly (Spark's ``sequence(1, 0)`` is a DESCENDING
    sequence, not empty — the ``length >= 2`` filter keeps the two
    engines' explode domains identical)."""
    docs = read_table(spark, sf_dir, "documents")
    words = docs.select(
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("w")
    ).filter((F.length("w") >= 2) & (F.expr("instr(w, chr(1))") == 0))
    wc = words.groupBy("w").agg(F.count(F.lit(1)).alias("n"))
    # wc feeds both the iteration-1 count (top merge) and the marked
    # re-expansion; checkpoint the compact vocabulary frame so the two
    # branches share one scan + aggregate (self-join subtree policy).
    wc = wc.localCheckpoint(eager=False)
    p1 = (
        wc.select(
            F.explode(F.expr("sequence(1, length(w) - 1)")).alias("i"), "w", "n"
        )
        .select(F.expr("substr(w, i, 2)").alias("pair"), "n")
        .groupBy("pair")
        .agg(F.sum("n").alias("cnt"))
    )
    top1 = p1.agg(
        F.min(F.struct((-F.col("cnt")).alias("neg"), F.col("pair").alias("p"))).alias(
            "s"
        )
    ).select(F.col("s.p").alias("mp"))
    marked = wc.crossJoin(F.broadcast(top1)).select(
        F.expr("replace(w, mp, chr(1))").alias("mw"), "n", "mp"
    )
    p2 = (
        marked.filter(F.length("mw") >= 2)
        .select(
            F.explode(F.expr("sequence(1, length(mw) - 1)")).alias("i"),
            "mw",
            "n",
            "mp",
        )
        .select(
            "mp",
            F.expr("replace(substr(mw, i, 2), chr(1), mp)").alias("pair"),
            "n",
        )
    )
    return (
        p2.groupBy("mp", "pair")
        .agg(F.sum("n").cast("bigint").alias("n_occurrences"))
        .select(F.col("mp").alias("merge_applied"), "pair", "n_occurrences")
        .orderBy(F.desc("n_occurrences"), "pair")
        .limit(_BPE_TOP2)
    )
