#!/usr/bin/env python
"""The CLOSED LOOP of the two scale stories (round-12 verdict item 7):
the reference-shaped pipeline (multi-dialect CSV -> synonym projection
-> validate -> dead-letter -> warehouse parquet -> per-country
dedup-latest views, `demo_pipeline_sf1.py`'s corpus at sf1 volume)
FEEDING the LLM-curation funnel (exact dedup -> MinHash/LSH near-dup
-> eval-contamination screen -> 512-token packing plan,
`demo_curation_10x.py`'s stages) — one run, one DAG per leg, every
stage's effect derived from the pipeline's own planted structure and
ASSERTED, not just timed.

The bridge: each warehouse row becomes a "patient record narrative"
document. The narrative repeats a per-customer token through every
shingle (cross-customer Jaccard ~ 0) and ends with the row's
vaccination id (within-customer variants differ in ONE trailing
token: true near-dups, J ~ 0.9). The pipeline's planted structure
then yields EXACT curation laws:

- ~4 consults per customer, vaccination id varying per consult ->
  exact dedup must collapse to EXACTLY
  countDistinct(country, customer, vaccination) documents;
- the surviving per-customer variants are genuine near-dups ->
  MinHash(12)/LSH(4x3) + connected components + keep-min-id must
  reduce toward EXACTLY one document per customer (recall measured
  against the exactly-known member count; overdrop impossible:
  cleaned >= n_customers asserted);
- eval set = cleaned texts of customers with cust % 107 == 7
  (verbatim) + an equal batch of synthetic clean docs -> the exact
  screen must flag every planted doc and no clean one;
- packing ceil/contiguity laws exact on the final corpus.

Run:  python scripts/demo_pipeline_to_curation_sf1.py [--rows 10000000]
"""

from __future__ import annotations

import argparse
import glob
import math
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.demo_pipeline_sf1 import COUNTRIES, _gen_country  # noqa: E402

SEQ_LEN = 512
EVAL_MOD = 107


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=10_000_000)
    ap.add_argument("--keep", action="store_true")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from incubyte_vaccination_data_pipeline_spark.operators.contamination import (
        exact_contamination,
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
    from incubyte_vaccination_data_pipeline_spark.pipeline import run_pipeline
    from incubyte_vaccination_data_pipeline_spark.session import get_spark

    spark = get_spark(app_name="ivdp-pipeline-to-curation")
    root = tempfile.mkdtemp(prefix="ivdp-p2c-")
    data_dir = os.path.join(root, "csv")
    os.makedirs(data_dir)
    rows_per_country = args.rows // len(COUNTRIES)
    n_rows = rows_per_country * len(COUNTRIES)

    try:
        # ---- leg 1: the reference-shaped pipeline at volume --------
        t0 = time.perf_counter()
        for idx, country in enumerate(COUNTRIES):
            df = _gen_country(spark, country, idx, rows_per_country)
            tmp_out = os.path.join(root, f"_gen_{country}")
            df.coalesce(1).write.option("header", True).mode("overwrite").csv(
                tmp_out
            )
            part = glob.glob(os.path.join(tmp_out, "part-*.csv"))[0]
            shutil.move(part, os.path.join(data_dir, f"{country}.csv"))
            shutil.rmtree(tmp_out)
        t_gen = time.perf_counter() - t0

        t0 = time.perf_counter()
        stored, views = run_pipeline(
            spark,
            data_dir,
            warehouse_path=os.path.join(root, "warehouse"),
            dead_letter_path=os.path.join(root, "dead_letter"),
            as_of="2023-01-01",
        )
        n_warehouse = stored.count()
        t_pipe = time.perf_counter() - t0
        n_dead = spark.read.parquet(os.path.join(root, "dead_letter")).count()
        print(
            f"pipeline: {n_rows:,} CSV rows -> {n_warehouse:,} warehouse "
            f"+ {n_dead:,} dead-lettered in {t_pipe:.1f}s "
            f"(generate {t_gen:.1f}s)"
        )

        # ---- the bridge: warehouse rows -> record narratives -------
        # per-customer token U repeats through every shingle (cross-
        # customer Jaccard ~ 0); the trailing vaccination id is the
        # ONLY varying token across one customer's consult rows.
        # doc_id must be ROW-unique (a triple-derived id would make
        # the exact stage's semi-join keep every copy of a kept id):
        # deterministic 62-bit content hash of the full row identity —
        # collision odds ~ n^2 / 2^63, immaterial at 1e8 rows
        cust = F.col("Cust_I").cast("long")
        u = F.concat_ws("_", F.col("Country"), F.col("Cust_I"))
        # the generator gives each of a customer's 4 consults a
        # DISTINCT vaccination code (gid steps of 8 are distinct mod
        # 5), so a VAC_ID-suffixed narrative has no exact twins;
        # customers with cust % 11 == 0 get a fixed token instead —
        # their consult rows become VERBATIM duplicates, making the
        # exact stage non-vacuous at an exactly-computable rate
        vac_tok = F.when(cust % 11 == 0, F.lit("none")).otherwise(
            F.col("VAC_ID")
        )
        docs = stored.select(
            F.pmod(
                F.xxhash64("Country", "Cust_I", "VAC_ID", "Open_Dt",
                           "Consul_Dt", "DOB"),
                F.lit(1 << 62),
            ).alias("doc_id"),
            F.concat_ws(
                " ",
                F.lit("patient"), u, F.lit("registry"), u,
                F.lit("country"), F.col("Country"),
                F.lit("name"), F.col("Name"),
                F.lit("case"), u, F.lit("review"), u,
                F.lit("intake"), u, F.lit("followup"), u,
                F.lit("clinic"), u, F.lit("record"), u,
                F.lit("vaccination"), vac_tok,
            ).alias("text"),
            F.col("Country").alias("country"),
            cust.alias("cust"),
        )

        # independent restatement of the expected distinct-text count
        # (from warehouse COLUMNS, not from the texts the dedup sees)
        n_exact_expect = (
            stored.select("Country", "Cust_I", vac_tok.alias("vt"))
            .distinct()
            .count()
        )
        n_customers = stored.select("Country", "Cust_I").distinct().count()
        n_warehouse_docs = n_warehouse

        # ---- leg 2 stage 1+2: exact then near-dup dedup ------------
        t0 = time.perf_counter()
        reps = exact_dedup(docs).select(F.col("rep_doc_id").alias("doc_id"))
        exact_clean = docs.join(reps, "doc_id", "left_semi").persist()
        n_exact = exact_clean.count()
        t_exact = time.perf_counter() - t0
        assert n_exact == n_exact_expect, (
            f"exact dedup kept {n_exact}, expected EXACTLY {n_exact_expect} "
            f"(distinct country x customer x vaccination-token)"
        )
        assert n_warehouse_docs - n_exact > 0, "exact stage vacuous"

        t0 = time.perf_counter()
        pairs = minhash_candidate_pairs(
            exact_clean, n_hashes=12, bands=4, shingle_k=3,
            min_est_jaccard=0.5,
        )
        clusters = duplicate_clusters(pairs)
        near_members = clusters.filter(
            F.col("doc_id") != F.col("cluster_id")
        ).select("doc_id")
        cleaned = exact_clean.join(near_members, "doc_id", "left_anti").persist()
        n_cleaned = cleaned.count()
        t_near = time.perf_counter() - t0

        expect_members = n_exact - n_customers  # every extra variant
        dropped = n_exact - n_cleaned
        recall = dropped / max(expect_members, 1)
        # overdrop impossible if no cross-customer cluster formed
        assert n_cleaned >= n_customers, (
            f"near-dup stage merged ACROSS customers: {n_cleaned} < "
            f"{n_customers} customers"
        )
        assert recall >= 0.9, (
            f"near-dup recall {recall:.3f} < 0.9 "
            f"({dropped}/{expect_members} variant docs dropped)"
        )
        print(
            f"dedup: {n_warehouse:,} records -> {n_exact:,} exact-unique "
            f"(EXACT law) in {t_exact:.1f}s; near-dup dropped {dropped:,} "
            f"of {expect_members:,} known variants (recall {recall:.3f}, "
            f"0 cross-customer merges) -> {n_cleaned:,} in {t_near:.1f}s"
        )

        # ---- leg 2 stage 3: eval-contamination screen --------------
        t0 = time.perf_counter()
        # planted eval ids keep the (nonnegative) train doc hash;
        # synthetic clean eval ids are NEGATIVE — classification is a
        # sign test, collision-free by construction
        eval_planted = cleaned.filter(F.col("cust") % EVAL_MOD == 7).select(
            F.col("doc_id"), "text"
        )
        n_eval = eval_planted.count()
        clean_eval = spark.range(n_eval).select(
            (-(F.col("id") + 1)).alias("doc_id"),
            F.concat(
                F.lit("pristine eval item "),
                F.md5(F.col("id").cast("string")),
                F.lit(" never in any registry "),
                F.md5((F.col("id") + 7).cast("string")),
            ).alias("text"),
        )
        hits = exact_contamination(
            cleaned.select("doc_id", "text"),
            eval_planted.unionByName(clean_eval),
        ).persist()
        n_hit_planted = hits.filter(F.col("eval_doc_id") >= 0).count()
        n_hit_clean = hits.count() - n_hit_planted
        final = cleaned.join(
            hits.select(F.col("train_doc_id").alias("doc_id")).distinct(),
            "doc_id",
            "left_anti",
        ).persist()
        n_final = final.count()
        t_contam = time.perf_counter() - t0
        assert n_hit_planted >= n_eval, (
            f"exact screen missed planted eval docs: {n_hit_planted}/{n_eval}"
        )
        assert n_hit_clean == 0, f"{n_hit_clean} clean eval docs flagged"
        assert n_final <= n_cleaned - n_eval
        print(
            f"contamination: {n_eval:,} planted + {n_eval:,} clean eval "
            f"docs; flagged {n_hit_planted:,}/0 false; "
            f"{n_cleaned - n_final:,} train docs dropped in {t_contam:.1f}s"
        )

        # ---- leg 2 stage 4: packing plan ----------------------------
        t0 = time.perf_counter()
        toks = final.select(
            "doc_id", (bpe_token_count("text") + 1).alias("n_tokens")
        )
        cum = global_cumsum(toks, "doc_id", "n_tokens", out_col="__cum")
        agg = cum.agg(
            F.sum("n_tokens").alias("total_tokens"),
            F.max("__cum").alias("stream_end"),
            F.count(F.lit(1)).alias("n_docs"),
        ).collect()[0]
        t_pack = time.perf_counter() - t0
        assert agg["stream_end"] == agg["total_tokens"], "stream not contiguous"
        n_seqs = math.ceil(agg["total_tokens"] / SEQ_LEN)
        assert agg["n_docs"] == n_final
        print(
            f"packing: {agg['total_tokens']:,} tokens over {n_final:,} "
            f"docs -> {n_seqs:,} sequences of {SEQ_LEN} in {t_pack:.1f}s"
        )
        total = t_exact + t_near + t_contam + t_pack
        print(
            f"pipeline->curation total: pipeline {t_pipe:.1f}s + curation "
            f"{total:.1f}s for {n_rows:,} CSV rows -> {n_final:,} "
            f"training documents"
        )
    finally:
        if args.keep:
            print(f"scratch kept at {root}")
        else:
            shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
