#!/usr/bin/env python
"""LLM-training-data curation leg of the scale story (VERDICT r10 #5):
ingest -> exact dedup -> near-dup dedup -> eval-contamination screen ->
sequence-packing plan, composed as ONE lazy DataFrame DAG over the Nx
disjoint-content stress corpus (default 10x sf0.1 = 50k documents),
with every stage's effect PLANTED at a known deterministic rate and
ASSERTED, not just timed — the same discipline as
``demo_pipeline_sf1.py`` for the reference-shape pipeline.

Planted structure (id arithmetic, reproducible):

- EXACT copies: every doc with ``doc_id % 101 == 3`` re-emitted
  verbatim at ``doc_id + 20e9`` (above any copy-salted id range) -> must collapse in the exact
  stage (content-hash groupBy keep-min-id), count asserted EXACTLY
  (the stress corpus's copy salting makes cross-copy hash collisions
  impossible, so removed == baseline dups + planted copies).
- NEAR-dups: every doc with ``doc_id % 103 == 5`` and >= 200 chars
  re-emitted at ``doc_id + 40e9`` with one word prepended ->
  true 3-word-shingle Jaccard ~0.9; MinHash(12)/LSH(4x3) must pair it
  with its source (recall asserted >= 0.95; the kept-min-id policy
  then drops the planted member, asserted).
- CONTAMINATED eval: every surviving doc with ``doc_id % 107 == 7``
  copied VERBATIM into the eval set, alongside an equal batch of
  synthetic clean eval docs -> the exact screen must flag every
  planted eval doc and no clean one (asserted exactly), and the
  flagged training docs are dropped.
- PACKING plan laws on the final corpus: total sequences ==
  ceil(total_tokens / 512), per-doc span arithmetic consistent,
  stream contiguous (max(start + tokens) == total tokens).

Scale shape: every stage is the operator the catalog already
certifies (exact_dedup / minhash_candidate_pairs /
duplicate_clusters / exact_contamination / global_cumsum) — keyed
aggregates, banded self-joins, and one bounded-metadata prefix sum;
nothing collects a corpus to the driver.

Run:  python scripts/demo_curation_10x.py [--factor 10] [--keep]
"""

from __future__ import annotations

import argparse
import math
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.stress_batch_10x import build_scratch  # noqa: E402

SEQ_LEN = 512  # catalog/corpus_stats._SEQ_LEN — the packing contract

EXACT_MOD, EXACT_OFF = 101, 20_000_000_000
NEAR_MOD, NEAR_OFF = 103, 40_000_000_000
EVAL_MOD = 107
#: clean-eval id floor — above every possible planted-eval id
#: (80e9 shift + the largest planted train id), so hit classification
#: is a single threshold
CLEAN_EVAL_OFF = 1_000_000_000_000


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--keep", action="store_true")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from incubyte_vaccination_data_pipeline_spark.operators.contamination import (
        exact_contamination,
        ngram_contamination,
    )
    from incubyte_vaccination_data_pipeline_spark.operators.dedup import (
        duplicate_clusters,
        exact_dedup,
        minhash_candidate_pairs,
    )
    from incubyte_vaccination_data_pipeline_spark.operators.prefix import (
        global_cumsum,
    )
    from incubyte_vaccination_data_pipeline_spark.operators.text import (
        bpe_token_count,
    )
    from incubyte_vaccination_data_pipeline_spark.session import get_spark

    spark = get_spark(app_name="ivdp-curation-demo")

    t0 = time.perf_counter()
    root = build_scratch(spark, args.factor)
    t_gen = time.perf_counter() - t0
    try:
        base = spark.read.parquet(os.path.join(root, "documents.parquet"))

        # ---- plant curation dirt (lazy — part of the one DAG) ------
        exact_src = base.filter(F.col("doc_id") % EXACT_MOD == 3)
        exact_planted = exact_src.withColumn(
            "doc_id", F.col("doc_id") + EXACT_OFF
        )
        near_src = base.filter(
            (F.col("doc_id") % NEAR_MOD == 5) & (F.col("n_chars") >= 200)
        )
        near_planted = near_src.select(
            (F.col("doc_id") + NEAR_OFF).alias("doc_id"),
            F.concat(F.lit("zq "), F.col("text")).alias("text"),
            "lang",
            "source",
            (F.col("n_chars") + 3).alias("n_chars"),
        )
        train = base.unionByName(exact_planted).unionByName(near_planted)

        n_base = base.count()
        n_exact_planted = exact_planted.count()
        n_near_planted = near_planted.count()
        n_train = n_base + n_exact_planted + n_near_planted
        # the stress corpus itself may carry natural exact dups
        baseline_dups = n_base - base.select("text").distinct().count()

        print(
            f"corpus: {args.factor}x = {n_base:,} docs "
            f"(+{n_exact_planted:,} planted exact copies, "
            f"+{n_near_planted:,} planted near-dups) "
            f"generated in {t_gen:.1f}s"
        )

        # ---- stage 1+2: exact dedup then near-dup dedup ------------
        t0 = time.perf_counter()
        reps = exact_dedup(train).select(
            F.col("rep_doc_id").alias("doc_id")
        )
        exact_clean = train.join(reps, "doc_id", "left_semi")

        pairs = minhash_candidate_pairs(exact_clean)
        clusters = duplicate_clusters(pairs)
        near_members = clusters.filter(
            F.col("doc_id") != F.col("cluster_id")
        ).select("doc_id")
        cleaned = exact_clean.join(near_members, "doc_id", "left_anti")
        # two downstream consumers (contamination screen + packing):
        # persist the survivor frame once
        cleaned = cleaned.persist()

        n_exact_clean = exact_clean.count()
        n_cleaned = cleaned.count()
        t_dedup = time.perf_counter() - t0

        removed_exact = n_train - n_exact_clean
        expect_exact = baseline_dups + n_exact_planted
        assert removed_exact == expect_exact, (
            f"exact stage removed {removed_exact}, expected {expect_exact}"
        )
        # every planted near-dup that the LSH found is dropped by the
        # keep-min-id policy (source id < planted id by construction)
        found_planted_pairs = pairs.filter(
            (F.col("doc_b") - F.col("doc_a") == NEAR_OFF)
        ).count()
        recall = found_planted_pairs / max(n_near_planted, 1)
        assert recall >= 0.95, (
            f"planted near-dup recall {recall:.3f} < 0.95 "
            f"({found_planted_pairs}/{n_near_planted})"
        )
        dropped_near = n_exact_clean - n_cleaned
        assert dropped_near >= found_planted_pairs, (
            f"near stage dropped {dropped_near} < found {found_planted_pairs}"
        )
        print(
            f"dedup: exact removed {removed_exact:,} "
            f"(= {baseline_dups:,} baseline + {n_exact_planted:,} planted), "
            f"near-dup removed {dropped_near:,} "
            f"(planted recall {recall:.3f}), "
            f"{n_cleaned:,} survivors in {t_dedup:.1f}s"
        )

        # ---- stage 3: eval-contamination screen --------------------
        t0 = time.perf_counter()
        eval_planted = cleaned.filter(F.col("doc_id") % EVAL_MOD == 7).select(
            (F.col("doc_id") + 80_000_000_000).alias("doc_id"), "text"
        )
        n_eval_planted = eval_planted.count()
        # clean-eval ids live above CLEAN_EVAL_OFF, strictly ABOVE any
        # planted eval id (a surviving planted near-dup — LSH recall
        # is asserted >= 0.95, not 1.0 — carries id NEAR_OFF + x, so
        # its eval copy lands at 80e9 + NEAR_OFF + x; a fixed [80e9,
        # 90e9) classification window misread those as clean hits)
        clean_eval = spark.range(n_eval_planted).select(
            (F.col("id") + CLEAN_EVAL_OFF).alias("doc_id"),
            F.concat(
                F.lit("pristine eval item "),
                F.md5(F.col("id").cast("string")),
                F.lit(" never in any training corpus "),
                F.md5((F.col("id") + 7).cast("string")),
            ).alias("text"),
        )
        eval_set = eval_planted.unionByName(clean_eval)

        hits = exact_contamination(cleaned, eval_set).persist()
        n_hits = hits.count()
        n_hit_planted = hits.filter(
            F.col("eval_doc_id") < CLEAN_EVAL_OFF
        ).count()
        n_hit_clean = n_hits - n_hit_planted
        # drop every contaminated training doc
        decontaminated = cleaned.join(
            hits.select(F.col("train_doc_id").alias("doc_id")).distinct(),
            "doc_id",
            "left_anti",
        ).persist()
        n_final = decontaminated.count()
        t_contam = time.perf_counter() - t0

        assert n_hit_planted >= n_eval_planted, (
            f"exact screen missed planted eval docs: "
            f"{n_hit_planted}/{n_eval_planted}"
        )
        assert n_hit_clean == 0, f"{n_hit_clean} clean eval docs flagged"
        assert n_final <= n_cleaned - n_eval_planted, (
            "contaminated training docs not dropped"
        )
        # n-gram screen must at minimum re-flag the verbatim copies
        # long enough to carry 8-grams
        ngram_hits = ngram_contamination(cleaned, eval_set, min_overlap=0.5)
        n_ngram_hits = ngram_hits.count()
        print(
            f"contamination: {n_eval_planted:,} planted + "
            f"{n_eval_planted:,} clean eval docs; exact screen flagged "
            f"{n_hit_planted:,} planted / {n_hit_clean} clean, "
            f"ngram screen {n_ngram_hits:,}; "
            f"{n_cleaned - n_final:,} train docs dropped in {t_contam:.1f}s"
        )

        # ---- stage 4: sequence-packing plan ------------------------
        t0 = time.perf_counter()
        toks = decontaminated.select(
            "doc_id", (bpe_token_count("text") + 1).alias("n_tokens")
        )
        cum = global_cumsum(toks, "doc_id", "n_tokens", out_col="__cum")
        plan = cum.select(
            "doc_id",
            "n_tokens",
            (F.col("__cum") - F.col("n_tokens")).alias("start_global"),
            (F.col("__cum") - 1).alias("__last"),
        ).select(
            "doc_id",
            "n_tokens",
            "start_global",
            F.expr(f"start_global div {SEQ_LEN}").alias("seq_first"),
            F.expr(f"__last div {SEQ_LEN}").alias("seq_last"),
        )
        agg = plan.agg(
            F.sum("n_tokens").alias("total_tokens"),
            F.max(F.col("start_global") + F.col("n_tokens")).alias("stream_end"),
            F.max("seq_last").alias("max_seq"),
            F.sum(
                F.col("seq_last") - F.col("seq_first") + 1
            ).alias("doc_seq_spans"),
            F.count(F.lit(1)).alias("n_docs"),
        ).collect()[0]
        t_pack = time.perf_counter() - t0

        assert agg["stream_end"] == agg["total_tokens"], "stream not contiguous"
        n_seqs = agg["max_seq"] + 1
        assert n_seqs == math.ceil(agg["total_tokens"] / SEQ_LEN), (
            f"{n_seqs} sequences != ceil({agg['total_tokens']}/{SEQ_LEN})"
        )
        assert agg["n_docs"] == n_final
        print(
            f"packing: {agg['total_tokens']:,} tokens over "
            f"{n_final:,} docs -> {n_seqs:,} sequences of {SEQ_LEN} "
            f"({agg['doc_seq_spans']:,} doc-sequence spans) in {t_pack:.1f}s"
        )
        total = t_dedup + t_contam + t_pack
        print(
            f"curation total (post-generate): {total:.1f}s for "
            f"{n_train:,} -> {n_final:,} docs at {args.factor}x"
        )
    finally:
        if args.keep:
            print(f"scratch kept at {root}")
        else:
            shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
