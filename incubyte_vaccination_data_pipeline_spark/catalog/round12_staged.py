"""Round-12 staging registry (window protection: registering mid-round
would re-sort the driver window under the 11 round-11 registrations'
promised slots — ``register_r12()`` lands these at the round-12
kickoff, exactly like ``round10_ext.register_r11()`` did).

Three queries closing this round's new surface:

- ``ann_radius_ivf_hier`` — radius search THROUGH the two-level index
  (``operators/similarity.radius_two_level``, the threshold-tail twin
  ``topk_two_level`` gained when round 11 made the hierarchy the
  automatic routing target): the last member of the
  flat-vs-hierarchical matrix (top-k flat / top-k hier / radius flat /
  radius hier) without a driver certificate. Shares the per-corpus
  coarse/fine index frames and the ``_hier_scored_ctes`` oracle chain
  with ``ann_ivf_hier_topk`` — the two tails cannot diverge from the
  probe machinery.
- ``corpus_curation_funnel`` — the LLM-curation pipeline (exact dedup
  -> MinHash/LSH near-dup components -> split contamination screen ->
  512-token packing estimate) composed over the augmented corpus and
  reduced to ONE value-checked funnel row. ``demo_curation_10x.py``
  certifies the composition at 10x/30x with planted structure; this
  query gives the same composition a DuckDB side-by-side the driver
  can hash — every stage count and the packed-sequence total must
  match an independent SQL restatement (recursive-CTE closure over
  the shared MinHash arithmetic).
- ``graph_triangle_per_node`` — per-part triangle participation over
  the SAME support-2 co-purchase graph as the registered global
  ``graph_triangle_count`` (shared edge frame), the local-clustering
  decomposition bound to it by sum = 3 x global. The degree-ordered
  wedge enumeration is factored into the reusable
  ``operators/graph_metrics.triangle_counts``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from incubyte_vaccination_data_pipeline_spark.plans.checkpoints import (
    durable_checkpoint,
)
from incubyte_vaccination_data_pipeline_spark.sources.parquet_io import read_table

STAGED: dict = {}


def ann_radius_ivf_hier_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (radius) search THROUGH the two-level IVF index
    (``operators/similarity.radius_two_level``): the same
    2-coarse/4-fine probe + in-join exact scoring as
    ``ann_ivf_hier_topk``, with ``ann_cosine_range``'s threshold tail
    (cosine >= 0.25) instead of the per-query rank window — the shape
    a 100 TB corpus needs for radius queries, since the flat
    ``ann_radius_ivf`` still pays O(n x cells) assignment past a few
    thousand cells and ``ann_cosine_range`` scans the whole corpus
    per query batch. Results are a subset of the brute-force range
    search with identical cosines (pinned in tests); the oracle
    replays both quantizer levels, the probe tail, and the threshold
    filter in SQL."""
    from incubyte_vaccination_data_pipeline_spark.catalog.round11_staged import (
        HIER_FINE,
        HIER_PROBE_COARSE,
        HIER_PROBE_FINE,
        _hier_coarse,
        _hier_fine,
        _hier_inv,
    )
    from incubyte_vaccination_data_pipeline_spark.catalog.similarity import (
        N_QUERY_VECTORS,
        RANGE_THRESHOLD,
    )
    from incubyte_vaccination_data_pipeline_spark.operators.similarity import (
        radius_two_level,
    )

    emb = read_table(spark, sf_dir, "embeddings")
    fc = _hier_fine(spark, sf_dir)
    inv = _hier_inv(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < N_QUERY_VECTORS)
    return radius_two_level(
        queries,
        _hier_coarse(spark, sf_dir),
        fc,
        inv,
        HIER_FINE,
        threshold=RANGE_THRESHOLD,
        n_probe_coarse=HIER_PROBE_COARSE,
        n_probe_fine=HIER_PROBE_FINE,
    )


def _hier_radius_oracle() -> str:
    from incubyte_vaccination_data_pipeline_spark.catalog.round11_staged import (
        _hier_scored_ctes,
    )
    from incubyte_vaccination_data_pipeline_spark.catalog.similarity import (
        RANGE_THRESHOLD,
    )

    return f"""{_hier_scored_ctes()}
    SELECT query_id, neighbor_id, cosine FROM hscored
    WHERE cosine >= {RANGE_THRESHOLD}
"""


def corpus_curation_funnel_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The curation pipeline's stage counts as ONE value-checked row:
    corpus size, exact-unique texts, near-dup cluster members
    (MinHash(12)/LSH(4x3) -> connected components), cleaned-corpus
    survivors (exact reps minus cluster members —
    ``dedup_cleaned_corpus``'s frame), the exact-contamination
    casualties of screening the cleaned train side (id % 17 != 0)
    against an eval set sampled from the RAW corpus (id % 17 == 0 —
    benchmarks are built from raw text, and a planted verbatim copy
    in the eval residue leaks its surviving original into train),
    the final trainable count, and its 512-token packed-sequence
    total.

    Composition reuses the certified building blocks end to end:
    ``exact_dedup``, the shared per-corpus duplicate-clusters cache,
    ``exact_contamination``'s normalized-hash equi-join, and
    ``bpe_token_count`` — so this row IS the
    ``scripts/demo_curation_10x.py`` DAG at oracle scale, and every
    number in it hash-checks against an independent recursive-CTE
    restatement. Scalar aggregates attach by broadcast one-row
    crossJoins (no shuffle; the established funnel shape)."""
    from incubyte_vaccination_data_pipeline_spark.catalog.dedup import (
        augmented_documents,
        shared_duplicate_clusters,
    )
    from incubyte_vaccination_data_pipeline_spark.operators.contamination import (
        exact_contamination,
    )
    from incubyte_vaccination_data_pipeline_spark.operators.dedup import exact_dedup
    from incubyte_vaccination_data_pipeline_spark.operators.text import (
        bpe_token_count,
    )

    docs = augmented_documents(spark, sf_dir)
    # r14 restructure (guide §1.2: don't compute things twice): the
    # crossJoin-of-aggregates shape re-executed each branch's WHOLE
    # lineage per run — exact_dedup's md5 groupBy ran ~4x (semi-join,
    # its own count, and again under tr / final) and the contamination
    # join twice (count + anti-join). Now every stage decision becomes
    # a compact per-doc FLAG (reps / members / contaminated are
    # checkpointed id frames; 1:1 left joins cannot fan out because
    # each is unique on doc_id), and ALL funnel counts — including the
    # conditional BPE token sum, evaluated only on final survivors —
    # come out of ONE wide aggregate over one pass of the corpus.
    # n_exact_unique = count of exact_dedup reps (one per distinct
    # md5(text) by construction), so the separate full-text
    # countDistinct(md5) pass is gone. Values are unchanged; only the
    # number of times each subtree executes.
    reps = durable_checkpoint(
        exact_dedup(docs).select(F.col("rep_doc_id").alias("doc_id")),
        eager=False,  # compact: one id per distinct text
    )
    members = (
        shared_duplicate_clusters(spark, sf_dir)
        .filter(F.col("doc_id") != F.col("cluster_id"))
        .select("doc_id")
    )
    flagged = docs.join(
        reps.withColumn("__rep", F.lit(True)), "doc_id", "left"
    ).join(members.withColumn("__mem", F.lit(True)), "doc_id", "left")
    is_rep = F.coalesce("__rep", F.lit(False))
    is_mem = F.coalesce("__mem", F.lit(False))
    is_cleaned = is_rep & ~is_mem
    is_train = is_cleaned & (F.col("doc_id") % 17 != 0)

    # eval samples the RAW corpus (benchmarks are built from raw text;
    # this is also what makes the screen non-vacuous — the cleaned
    # corpus is md5-distinct by construction, so a cleaned-vs-cleaned
    # exact screen could only catch whitespace/case twins): a planted
    # verbatim copy whose id lands in the eval residue leaks its
    # surviving original into the train side, and the screen must
    # catch it
    ev = docs.filter(F.col("doc_id") % 17 == 0)
    tr = flagged.filter(is_train).select("doc_id", "text")
    contaminated = durable_checkpoint(
        exact_contamination(tr, ev)
        .select(F.col("train_doc_id").alias("doc_id"))
        .distinct(),
        eager=False,  # tiny: leaked train ids
    )
    full = flagged.join(
        contaminated.withColumn("__cont", F.lit(True)), "doc_id", "left"
    )
    is_cont = F.coalesce("__cont", F.lit(False))
    is_final = is_train & ~is_cont
    return full.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(is_rep.cast("bigint")).alias("n_exact_unique"),
        F.sum(is_mem.cast("bigint")).alias("n_near_members"),
        F.sum(is_cleaned.cast("bigint")).alias("n_cleaned"),
        F.sum(is_cont.cast("bigint")).alias("n_contaminated_train"),
        F.sum(is_final.cast("bigint")).alias("n_final"),
        F.sum(F.when(is_final, bpe_token_count("text") + 1)).alias("__tok"),
    ).select(
        "n_docs",
        "n_exact_unique",
        "n_near_members",
        "n_cleaned",
        "n_contaminated_train",
        "n_final",
        F.expr("CAST((__tok + 511) DIV 512 AS BIGINT)").alias("n_packed_seqs"),
    )


def _funnel_oracle() -> str:
    from incubyte_vaccination_data_pipeline_spark.catalog.dedup import (
        _MINHASH_CTES,
    )

    norm_t = "lower(trim(regexp_replace(t.text, '\\s+', ' ', 'g')))"
    norm_e = "lower(trim(regexp_replace(e.text, '\\s+', ' ', 'g')))"
    return f"""
    WITH RECURSIVE {_MINHASH_CTES},
    pairs5 AS (
        SELECT doc_a, doc_b FROM est WHERE est_jaccard >= 0.5
    ),
    edges AS (
        SELECT doc_a AS src, doc_b AS dst FROM pairs5
        UNION ALL
        SELECT doc_b, doc_a FROM pairs5
    ),
    reach(a, b) AS (
        SELECT src, dst FROM edges
        UNION
        SELECT r.a, e.dst FROM reach r JOIN edges e ON r.b = e.src
    ),
    members AS (
        SELECT a AS doc_id FROM reach GROUP BY a
        HAVING a <> LEAST(a, MIN(b))
    ),
    reps AS (
        SELECT MIN(doc_id) AS doc_id FROM aug GROUP BY md5(text)
    ),
    cleaned AS (
        SELECT * FROM aug
        WHERE doc_id IN (SELECT doc_id FROM reps)
          AND doc_id NOT IN (SELECT doc_id FROM members)
    ),
    ev AS (SELECT * FROM aug WHERE doc_id % 17 = 0),
    tr AS (SELECT * FROM cleaned WHERE doc_id % 17 <> 0),
    contaminated AS (
        SELECT DISTINCT t.doc_id
        FROM tr t JOIN ev e ON {norm_t} = {norm_e}
    ),
    final AS (
        SELECT * FROM tr
        WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)
    )
    SELECT
        (SELECT CAST(COUNT(*) AS BIGINT) FROM aug) AS n_docs,
        (SELECT CAST(COUNT(DISTINCT md5(text)) AS BIGINT) FROM aug)
            AS n_exact_unique,
        (SELECT CAST(COUNT(*) AS BIGINT) FROM members) AS n_near_members,
        (SELECT CAST(COUNT(*) AS BIGINT) FROM cleaned) AS n_cleaned,
        (SELECT CAST(COUNT(*) AS BIGINT) FROM contaminated)
            AS n_contaminated_train,
        (SELECT CAST(COUNT(*) AS BIGINT) FROM final) AS n_final,
        (SELECT CAST((CAST(SUM(len(regexp_extract_all(lower(text),
            '[a-z]+|[0-9]+|[^a-z0-9 ]')) + 1) AS BIGINT) + 511) // 512
            AS BIGINT) FROM final) AS n_packed_seqs
"""


def graph_triangle_per_node_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PER-PART triangle participation over the same support-2
    co-purchase graph as the registered GLOBAL ``graph_triangle_count``
    (edge frame shared via ``catalog/graph._copurchase_pairs``): the
    local-clustering decomposition — each triangle contributes 1 to
    each of its three corners, so sum(n_triangles) = 3 x the global
    count (the cross-query law pinned in tests). Same degree-ordered
    O(m^1.5) wedge enumeration, factored into the reusable
    ``operators/graph_metrics.triangle_counts`` (orient up the
    (degree, id) order, wedge from out-neighbors, close against the
    canonical edge set); the oracle restates all three stages in
    SQL."""
    from incubyte_vaccination_data_pipeline_spark.catalog.graph import (
        _copurchase_pairs,
    )
    from incubyte_vaccination_data_pipeline_spark.operators.graph_metrics import (
        triangle_counts,
    )

    edges = _copurchase_pairs(spark, sf_dir).select(
        F.col("pa").alias("lo"), F.col("pb").alias("hi")
    )
    return triangle_counts(edges).select(
        F.col("node").alias("part"), "n_triangles"
    )


def _triangle_oracle() -> str:
    from incubyte_vaccination_data_pipeline_spark.catalog.graph import (
        PAIRS_LOHI_CTE,
    )

    return f"""
    WITH {PAIRS_LOHI_CTE},
    deg AS (
        SELECT node, COUNT(*) AS d FROM (
            SELECT lo AS node FROM pairs
            UNION ALL SELECT hi FROM pairs)
        GROUP BY node
    ),
    oriented AS (
        SELECT CASE WHEN (dl.d < dh.d) OR (dl.d = dh.d AND p.lo < p.hi)
                    THEN p.lo ELSE p.hi END AS src,
               CASE WHEN (dl.d < dh.d) OR (dl.d = dh.d AND p.lo < p.hi)
                    THEN p.hi ELSE p.lo END AS dst
        FROM pairs p
        JOIN deg dl ON dl.node = p.lo
        JOIN deg dh ON dh.node = p.hi
    ),
    tri AS (
        SELECT w.src, w.lo, w.hi FROM (
            SELECT e1.src, e1.dst AS lo, e2.dst AS hi
            FROM oriented e1 JOIN oriented e2
              ON e1.src = e2.src AND e1.dst < e2.dst) w
        JOIN pairs p ON p.lo = w.lo AND p.hi = w.hi
    )
    SELECT node AS part, CAST(COUNT(*) AS BIGINT) AS n_triangles
    FROM (
        SELECT src AS node FROM tri
        UNION ALL SELECT lo FROM tri
        UNION ALL SELECT hi FROM tri)
    GROUP BY node
"""


STAGED["ann_radius_ivf_hier"] = (ann_radius_ivf_hier_q, _hier_radius_oracle())
STAGED["corpus_curation_funnel"] = (corpus_curation_funnel_q, _funnel_oracle())
STAGED["graph_triangle_per_node"] = (graph_triangle_per_node_q, _triangle_oracle())


def register_r12(names: list[str] | None = None) -> None:
    """Land the round-12 staged queries in the live registry — call
    from ``catalog/__init__.py`` at the round-12 kickoff, AFTER the
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
