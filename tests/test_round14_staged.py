"""Round-14 staged queries: driver-style DuckDB side-by-sides BEFORE
registration (window protection keeps them staged this round — see
catalog/round14_staged.py) plus the semantic pins the oracle alone
cannot express."""

from __future__ import annotations

import hashlib
import math

import duckdb
import pytest

from incubyte_vaccination_data_pipeline_spark import catalog
from incubyte_vaccination_data_pipeline_spark.catalog import round14_staged as r14
from incubyte_vaccination_data_pipeline_spark.sources.parquet_io import (
    TESTDATA_TABLES,
    read_table,
)
from tests.test_oracle import _normalize, _values_equal


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    yield con
    con.close()


def test_staged_r14_not_yet_registered():
    """Registering mid-round would re-sort the driver window under the
    slots round 13 promised; register_r14() lands these at the
    round-14 kickoff."""
    assert not (set(r14.STAGED) & set(catalog.QUERIES))
    assert not (set(r14.STAGED) & set(catalog.ORACLES))


@pytest.mark.parametrize("name", sorted(r14.STAGED))
def test_staged_r14_query_matches_oracle(spark, sf_dir, duck, name):
    fn, oracle = r14.STAGED[name]
    spark_df = fn(spark, sf_dir).toPandas()
    duck_df = duck.execute(oracle).df()
    assert len(spark_df) == len(duck_df)
    spark_df.columns = [c.lower() for c in spark_df.columns]
    duck_df.columns = [c.lower() for c in duck_df.columns]
    s, d = _normalize(spark_df), _normalize(duck_df)
    assert sorted(s.columns) == sorted(d.columns)
    for col in s.columns:
        for av, bv in zip(s[col], d[col]):
            if av is None and bv is None:
                continue
            assert _values_equal(av, bv), (name, col, av, bv)


def test_kmv_exact_when_union_fits(spark):
    """The KMV merge estimator is EXACT Jaccard whenever |A ∪ B| <= K:
    build a tiny two-source corpus whose distinct 3-gram union is far
    under K, compute exact Jaccard independently in Python on the SAME
    shingle definition, and require equality (plus the shared-phrase
    pair beating the disjoint pair)."""
    texts = {
        "sa": [
            "the quick brown fox jumps over the lazy dog",
            "pack my box with five dozen liquor jugs",
        ],
        "sb": [
            "the quick brown fox jumps over the lazy cat",
            "completely different words appear in this line",
        ],
        "sc": ["unrelated corpus text with no shared phrasing at all"],
    }
    rows = [
        (i, t, "xx", src, len(t))
        for i, (src, t) in enumerate(
            (src, t) for src, ts in sorted(texts.items()) for t in ts
        )
    ]
    df = spark.createDataFrame(
        rows,
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )

    import tempfile

    with tempfile.TemporaryDirectory() as tmp:
        df.write.mode("overwrite").parquet(f"{tmp}/documents.parquet")
        out = {
            (r["source_a"], r["source_b"]): r
            for r in r14.corpus_source_overlap_q(spark, tmp).collect()
        }

    def grams(src):
        gs = set()
        for t in texts[src]:
            w = t.lower().split(" ")
            for i in range(len(w) - r14.OVERLAP_SHINGLE_K + 1):
                gs.add(" ".join(w[i : i + r14.OVERLAP_SHINGLE_K]))
        return gs

    for a, b in (("sa", "sb"), ("sa", "sc"), ("sb", "sc")):
        ga, gb = grams(a), grams(b)
        assert len(ga | gb) <= r14.KMV_K  # the exactness precondition
        exact = len(ga & gb) / len(ga | gb)
        got = out[(a, b)]
        assert got["k_used"] == len(ga | gb)
        assert got["k_inter"] == len(ga & gb)
        assert abs(got["kmv_jaccard"] - round(exact, 6)) < 1e-9, (a, b)
    assert out[("sa", "sb")]["kmv_jaccard"] > 0
    assert out[("sa", "sc")]["kmv_jaccard"] == 0


def test_source_overlap_discriminates_and_bounds(spark, sf_dir):
    """On the testdata corpus the planted cross-source near-dups must
    surface: every pair bounded in [0, 1], all C(n,2) pairs present,
    and the top estimate strictly positive."""
    docs = read_table(spark, sf_dir, "documents")
    n_sources = docs.select("source").distinct().count()
    rows = r14.corpus_source_overlap_q(spark, sf_dir).collect()
    assert len(rows) == n_sources * (n_sources - 1) // 2
    assert all(0.0 <= r["kmv_jaccard"] <= 1.0 for r in rows)
    assert all(1 <= r["k_used"] <= r14.KMV_K for r in rows)
    assert max(r["kmv_jaccard"] for r in rows) > 0
    assert all(r["source_a"] < r["source_b"] for r in rows)


def test_source_overlap_plan_shape(spark, sf_dir):
    """The corpus-wide work is the distinct + two ranking windows; the
    only non-equi join is the pair enumeration over the CONTRACT-SMALL
    sources frame (n_sources rows), and the signature attach is a
    broadcast equi-join — no cartesian product anywhere."""
    plan = (
        r14.corpus_source_overlap_q(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert plan.count("Window [") == 2
    assert plan.count("BroadcastNestedLoopJoin") == 1  # the pair fan-out


def test_vector_qc_synthetic_flags(spark):
    """Duplicate / zero-norm / NaN vectors must be counted exactly —
    the testdata corpus is clean, so the flag paths get a planted
    frame: label 1 holds an exact duplicate pair plus a zero vector,
    label 2 holds a NaN vector."""
    import tempfile

    rows = [
        (0, [1.0, 0.0, 0.0], 1),
        (1, [1.0, 0.0, 0.0], 1),  # exact duplicate of vec 0
        (2, [0.0, 0.0, 0.0], 1),  # zero norm
        (3, [0.0, 1.0, 0.0], 1),
        (4, [float("nan"), 1.0, 0.0], 2),  # NaN component
        (5, [0.0, 0.0, 2.0], 2),
    ]
    df = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>, label int"
    )
    with tempfile.TemporaryDirectory() as tmp:
        df.write.mode("overwrite").parquet(f"{tmp}/embeddings.parquet")
        out = {
            r["label"]: r
            for r in r14.embedding_vector_qc_q(spark, tmp).collect()
        }
    assert out[1]["n_vecs"] == 4
    assert out[1]["n_dup_vecs"] == 1  # 4 rows, 3 distinct vectors
    assert out[1]["n_zero_norm"] == 1
    assert out[1]["n_nan"] == 0
    assert out[2]["n_nan"] == 1
    assert out[2]["n_vecs"] == 2 and out[2]["n_dup_vecs"] == 0
    assert out[1]["norm_min"] == 0.0 and out[1]["norm_max"] == 1.0
    assert out[2]["norm_max"] == 2.0


def test_vector_qc_norm_residual_discriminates(spark, sf_dir):
    """The testdata embeddings are float32-unit-normalized: at the
    8 dp contract the QC report must EXPOSE the normalization residual
    (min < max somewhere) instead of rounding every norm to 1.0 — and
    stay ordered min <= p50 <= max."""
    rows = r14.embedding_vector_qc_q(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["norm_min"] <= r["norm_p50"] <= r["norm_max"]
        assert abs(r["norm_p50"] - 1.0) < 1e-5  # unit-normalized corpus
    assert any(r["norm_min"] < r["norm_max"] for r in rows)


def test_bootstrap_ci_laws(spark, sf_dir):
    """Every priority: exactly BOOT_REPS replicates, an interval that
    brackets the full-sample mean, determinism across runs, and the
    replicate membership matching an independent hashlib recomputation
    (the portable-hash contract — Spark's md5+decode IS python's)."""
    rows = {r["o_orderpriority"]: r for r in
            r14.agg_bootstrap_ci_q(spark, sf_dir).collect()}
    assert rows
    for r in rows.values():
        assert r["n_replicates"] == r14.BOOT_REPS
        assert r["ci_lo"] <= r["mean_full"] <= r["ci_hi"]
        assert r["ci_lo"] < r["ci_hi"]
    again = {r["o_orderpriority"]: r for r in
             r14.agg_bootstrap_ci_q(spark, sf_dir).collect()}
    assert {k: tuple(v) for k, v in rows.items()} == {
        k: tuple(v) for k, v in again.items()
    }

    # membership parity: Spark's md5 + hex-decode threshold == hashlib
    keys = [
        r["o_orderkey"]
        for r in read_table(spark, sf_dir, "orders")
        .select("o_orderkey").limit(50).collect()
    ]
    import pyspark.sql.functions as F

    from incubyte_vaccination_data_pipeline_spark.operators.dedup import (
        md5_half_decode_sql,
    )

    frame = spark.createDataFrame(
        [(k, rep) for k in keys for rep in range(4)], "k bigint, r int"
    ).select(
        "k",
        "r",
        (
            F.expr(
                md5_half_decode_sql(
                    "md5(concat_ws(':', cast(k as string), cast(r as string)))",
                    1,
                )
            )
            < r14.BOOT_THRESHOLD
        ).alias("drawn"),
    )
    got = {(r["k"], r["r"]): r["drawn"] for r in frame.collect()}
    for (k, rep), drawn in got.items():
        h = hashlib.md5(f"{k}:{rep}".encode()).hexdigest()
        assert drawn == (int(h[:8], 16) < r14.BOOT_THRESHOLD), (k, rep)
    # the draw rate is ~80% by construction
    frac = sum(got.values()) / len(got)
    assert 0.7 < frac < 0.9


def test_bootstrap_subsample_sizes(spark, sf_dir):
    """Each replicate draws ~80% of each priority group (binomial
    bounds wide enough for the small SFs), and distinct replicates
    draw DIFFERENT subsets (the whole point of the resample)."""
    import pyspark.sql.functions as F

    from incubyte_vaccination_data_pipeline_spark.operators.dedup import (
        md5_half_decode_sql,
    )

    orders = read_table(spark, sf_dir, "orders")
    n = orders.count()
    fan = orders.select(
        "o_orderkey",
        F.explode(F.sequence(F.lit(0), F.lit(r14.BOOT_REPS - 1))).alias("r"),
    )
    h = "md5(concat_ws(':', cast(o_orderkey as string), cast(r as string)))"
    drawn = fan.filter(
        F.expr(md5_half_decode_sql(h, 1)) < F.lit(r14.BOOT_THRESHOLD)
    )
    sizes = {r["r"]: r["count"] for r in drawn.groupBy("r").count().collect()}
    assert len(sizes) == r14.BOOT_REPS
    for c in sizes.values():
        assert abs(c / n - 0.8) < 0.1
    assert len(set(sizes.values())) > 1  # replicates differ
    # ceil-law sanity on the expectation
    assert abs(sum(sizes.values()) / (n * r14.BOOT_REPS) - 0.8) < 0.02


@pytest.mark.parametrize("seed", [11, 23])
def test_kmv_estimator_random_corpora_vs_reference(spark, seed):
    """Randomized cross-check of the FULL estimator path (union > K is
    exercised by construction): seeded random word soups with planted
    shared phrases, a pure-Python KMV replay (hashlib md5, sorted-hex
    signatures, merge-and-cut) computed independently of any Spark
    code path, exact equality on (k_used, k_inter, estimate) for
    every pair."""
    import random
    import tempfile

    rng = random.Random(seed)
    vocab = [f"w{i}" for i in range(120)]
    shared = " ".join(rng.choice(vocab) for _ in range(60))
    texts = {}
    for s in range(4):
        docs = []
        for _ in range(12):
            body = " ".join(rng.choice(vocab) for _ in range(80))
            # plant the shared passage into some docs of sources 0/1
            if s < 2 and rng.random() < 0.5:
                body = body + " " + shared
            docs.append(body)
        texts[f"s{s}"] = docs

    rows = []
    i = 0
    for src in sorted(texts):
        for t in texts[src]:
            rows.append((i, t, "xx", src, len(t)))
            i += 1
    df = spark.createDataFrame(
        rows,
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    with tempfile.TemporaryDirectory() as tmp:
        df.write.mode("overwrite").parquet(f"{tmp}/documents.parquet")
        got = {
            (r["source_a"], r["source_b"]): (
                r["k_used"], r["k_inter"], r["kmv_jaccard"]
            )
            for r in r14.corpus_source_overlap_q(spark, tmp).collect()
        }

    def sig(src):
        grams = set()
        for t in texts[src]:
            w = t.lower().split(" ")
            for j in range(len(w) - r14.OVERLAP_SHINGLE_K + 1):
                grams.add(
                    hashlib.md5(
                        " ".join(w[j : j + r14.OVERLAP_SHINGLE_K]).encode()
                    ).hexdigest()
                )
        return set(sorted(grams)[: r14.KMV_K]), len(grams)

    any_union_over_k = False
    for a in sorted(texts):
        for b in sorted(texts):
            if a >= b:
                continue
            sa, na = sig(a)
            sb, nb = sig(b)
            if na > r14.KMV_K or nb > r14.KMV_K:
                any_union_over_k = True
            merged = sorted(sa | sb)[: r14.KMV_K]
            inter = sum(1 for m in merged if m in sa and m in sb)
            want = (len(merged), inter, round(inter / len(merged), 6))
            assert got[(a, b)] == want, (a, b, got[(a, b)], want)
    assert any_union_over_k, "fuzz corpus too small to exercise the cut"


def test_ohlc_bars_laws(spark, sf_dir):
    """Bar invariants the oracle can't state by itself: low <= open,
    close <= high per bar; volumes sum to the table count; open/close
    equal an independently collected first/last event value per bar
    (total order via the unique event_id tie-break); bars are
    hour-aligned."""
    from collections import defaultdict

    rows = r14.events_ohlc_bars_q(spark, sf_dir).collect()
    assert rows
    events = read_table(spark, sf_dir, "events").collect()
    assert sum(r["volume"] for r in rows) == len(events)

    by_bar = defaultdict(list)
    for e in events:
        bar = e["ts"].replace(minute=0, second=0, microsecond=0)
        by_bar[(e["event_type"], bar)].append((e["ts"], e["event_id"], e["value"]))
    for r in rows:
        key = (r["event_type"], r["bar_start"])
        assert r["bar_start"].minute == 0 and r["bar_start"].second == 0
        evs = sorted(by_bar[key])
        assert r["volume"] == len(evs)
        assert r["open"] == round(evs[0][2], 6)
        assert r["close"] == round(evs[-1][2], 6)
        assert r["low"] <= min(r["open"], r["close"]) + 1e-9
        assert r["high"] >= max(r["open"], r["close"]) - 1e-9


def test_ohlc_plan_single_exchange(spark, sf_dir):
    """The family contract: every window and the final cut ride ONE
    hash exchange on the bar key — a second exchange means a window
    stopped reusing the partitioning."""
    plan = (
        r14.events_ohlc_bars_q(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 1
    assert "CartesianProduct" not in plan


def test_asof_nearest_vs_python_reference(spark, sf_dir):
    """Every purchase's picked view equals an independent Python
    nearest-scan over the collected events (min |gap|, tie -> earlier
    view, per-(user, ts) dedup keeping max event_id) — the operator's
    two window carries vs a direct reference."""
    events = read_table(spark, sf_dir, "events").collect()
    views = {}
    for e in events:
        if e["event_type"] != "view":
            continue
        key = (e["user_id"], e["ts"])
        if key not in views or e["event_id"] > views[key]["event_id"]:
            views[key] = e
    by_user = {}
    for (u, _), e in views.items():
        by_user.setdefault(u, []).append(e)

    rows = r14.events_asof_nearest_q(spark, sf_dir).collect()
    n_purch = sum(1 for e in events if e["event_type"] == "purchase")
    assert len(rows) == n_purch
    for r in rows:
        cands = by_user.get(r["user_id"], [])
        if not cands:
            assert r["view_event_id"] is None
            continue
        best = min(
            cands,
            key=lambda v: (abs((v["ts"] - r["ts"]).total_seconds()), v["ts"]),
        )
        assert r["view_event_id"] == best["event_id"], (
            r["event_id"], r["view_event_id"], best["event_id"]
        )
        assert r["view_ts"] == best["ts"]


def test_asof_nearest_tie_and_direction_laws(spark):
    """Planted frame: equal-distance ties pick the EARLIER right row;
    a right row at the exact left timestamp wins outright; keys with
    no right rows keep NULL payload."""
    from incubyte_vaccination_data_pipeline_spark.operators.asof import (
        asof_join_nearest,
    )
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    s = dt.timedelta(seconds=1)
    left = spark.createDataFrame(
        [
            (1, t0, 100),        # right at +/-2s: tie -> earlier (-2s)
            (2, t0, 200),        # right exactly AT t0 -> itself
            (3, t0, 300),        # only a future right -> forward pick
            (4, t0, 400),        # no right rows -> NULL
        ],
        "user_id int, ts timestamp, event_id int",
    )
    right = spark.createDataFrame(
        [
            (1, t0 - 2 * s, 11, 1.0),
            (1, t0 + 2 * s, 12, 2.0),
            (2, t0, 21, 3.0),
            (2, t0 + 5 * s, 22, 4.0),
            (3, t0 + 30 * s, 31, 5.0),
        ],
        "user_id int, ts timestamp, event_id int, value double",
    )
    out = {
        r["user_id"]: r
        for r in asof_join_nearest(
            left, right, on=["user_id"],
            payload_cols=["event_id", "value"], payload_prefix="r_",
        ).collect()
    }
    assert out[1]["r_event_id"] == 11  # tie -> earlier
    assert out[2]["r_event_id"] == 21  # exact timestamp wins
    assert out[3]["r_event_id"] == 31  # forward-only pick
    assert out[4]["r_event_id"] is None and out[4]["r_ts"] is None


def test_asof_nearest_plan_shape(spark, sf_dir):
    """No range join, no cartesian: the view dedup pays one exchange
    on (user, ts) and the union carry one on user — both carries ride
    the SAME second exchange (a third exchange means the mirrored
    window stopped reusing the partitioning)."""
    plan = (
        r14.events_asof_nearest_q(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert plan.count("Exchange") <= 2
