"""Third wave of relational breadth: the TPC-H query shapes that the
first two waves left out, adapted to the testdata's columns (the
generator ships no ``partsupp`` table and ``lineitem`` has no
commit/receipt dates or ship modes — see TESTDATA.md), so Q4/Q8/Q12/
Q13/Q15/Q16/Q17/Q20/Q21 keep their *plan shape* (exists/not-exists,
eight-table snowflake, conditional counts, left-outer distribution,
argmax-by-group, distinct-count post-join, correlated-average
prefilter, group-having semi join) with predicates rewritten onto the
columns that exist.

Determinism conventions as elsewhere in the catalog: decimal(18,2)
money math cast to double only after aggregation, division avoided in
cross-engine comparisons where an exact rearrangement exists (Q17's
``5*qty*cnt < sum`` instead of ``qty < 0.2*avg``), explicit
tie-breaks on every LIMIT, ``round(..,6)`` on ratios.

Scale posture (100 TB design point): nation/region (25/5 rows, fixed
cardinality) always broadcast; supplier-side joins stay equi-joins on
keys AQE can re-plan; every exists/not-exists is a semi/anti join —
never a correlated per-row subquery — so the physical plan is one
hash-partitioned pass per side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from incubyte_vaccination_data_pipeline_spark.catalog.registry import query
from incubyte_vaccination_data_pipeline_spark.sources.parquet_io import read_table

_DEC = "decimal(18,2)"


def _dec(col: str):
    return F.col(col).cast(_DEC)


def _revenue():
    return _dec("l_extendedprice") * (F.lit(1).cast(_DEC) - _dec("l_discount"))


_REVENUE_SQL = (
    "CAST(l_extendedprice AS DECIMAL(18,2))"
    " * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))"
)


@query(
    "q4_priority_exists",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS n_orders
    FROM orders
    WHERE date_part('year', o_orderdate) = 2000
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
    GROUP BY o_orderpriority
    """,
)
def q4_priority_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (commit/receipt dates absent -> EXISTS predicate
    rewritten onto returned lines): order-priority counts for orders
    with at least one matching lineitem. The EXISTS is a left-semi
    join on the order key — one shuffle each side, no per-row
    subquery, and the year predicate prunes the probe side at the
    scan."""
    orders = read_table(spark, sf_dir, "orders").filter(
        F.year(F.col("o_orderdate").cast("date")) == 2000
    )
    returned = read_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    return (
        orders.join(
            returned, orders.o_orderkey == returned.l_orderkey, "left_semi"
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


@query(
    "q8_market_share",
    oracle=f"""
    WITH rev AS (
        SELECT date_part('year', o_orderdate) AS o_year,
               sn.n_name AS supp_nation,
               {_REVENUE_SQL} AS rev
        FROM lineitem
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation cn ON cn.n_nationkey = c_nationkey
        JOIN region   ON r_regionkey = cn.n_regionkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation sn ON sn.n_nationkey = s_nationkey
        JOIN part     ON p_partkey = l_partkey
        WHERE r_name = 'ASIA' AND p_type = 'PROMO'
    )
    SELECT o_year,
           ROUND(CAST(SUM(CASE WHEN supp_nation = 'NATION_7' THEN rev
                               ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
                 / CAST(SUM(rev) AS DOUBLE), 6) AS mkt_share,
           COUNT(*) AS n_items
    FROM rev GROUP BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of PROMO-part revenue sold
    into ASIA-region customers, per order year — the eight-table
    snowflake. Nation and region broadcast onto customer/supplier
    before the fact joins; the part-type predicate pushes to the part
    scan, so the lineitem-part join probes only PROMO parts."""
    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders")
    customer = read_table(spark, sf_dir, "customer")
    supplier = read_table(spark, sf_dir, "supplier")
    nation = read_table(spark, sf_dir, "nation")
    region = read_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    part = read_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")

    cust_asia = (
        customer.join(
            F.broadcast(
                nation.join(
                    F.broadcast(region),
                    nation.n_regionkey == region.r_regionkey,
                ).select("n_nationkey")
            ),
            customer.c_nationkey == F.col("n_nationkey"),
        ).select("c_custkey")
    )
    supp_nat = supplier.join(
        F.broadcast(
            nation.select(
                F.col("n_nationkey").alias("snk"),
                F.col("n_name").alias("supp_nation"),
            )
        ),
        supplier.s_nationkey == F.col("snk"),
    ).select("s_suppkey", "supp_nation")

    rev = _revenue()
    zero = F.lit(0).cast(_DEC)
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust_asia, orders.o_custkey == cust_asia.c_custkey)
        .join(supp_nat, li.l_suppkey == supp_nat.s_suppkey)
        .groupBy(
            F.year(F.col("o_orderdate").cast("date"))
            .cast("bigint")
            .alias("o_year")
        )
        .agg(
            F.round(
                F.sum(
                    F.when(F.col("supp_nation") == "NATION_7", rev).otherwise(
                        zero
                    )
                ).cast("double")
                / F.sum(rev).cast("double"),
                6,
            ).alias("mkt_share"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query(
    "q12_priority_by_linestatus",
    oracle="""
    SELECT l_linestatus,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    WHERE date_part('year', l_shipdate) = 2000
    GROUP BY l_linestatus
    """,
)
def q12_priority_by_linestatus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (ship modes absent -> grouped by l_linestatus):
    conditional counts of urgent vs non-urgent orders per line status.
    Only three columns survive the scans; the join carries one string
    column per side into a two-group aggregate."""
    orders = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem").filter(
        F.year(F.col("l_shipdate").cast("date")) == 2000
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


@query(
    "q13_order_count_distribution",
    oracle="""
    WITH per_cust AS (
        SELECT c_custkey, COUNT(o_orderkey) AS n_orders
        FROM customer LEFT JOIN orders ON o_custkey = c_custkey
        GROUP BY c_custkey
    )
    SELECT n_orders, COUNT(*) AS n_customers
    FROM per_cust GROUP BY n_orders
    """,
)
def q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: distribution of customers by order count,
    including zero-order customers via the left outer join. Two
    aggregations: per-customer (shuffle on custkey — the outer join
    reuses the same partitioning) then the tiny distribution rollup."""
    customer = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders")
    return (
        customer.join(
            orders, customer.c_custkey == orders.o_custkey, "left_outer"
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
        .groupBy("n_orders")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


@query(
    "q15_top_supplier",
    oracle=f"""
    WITH rev AS (
        SELECT l_suppkey AS supplier_no,
               SUM({_REVENUE_SQL}) AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= DATE '2000-01-01'
          AND l_shipdate <  DATE '2000-04-01'
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name,
           CAST(total_revenue AS DOUBLE) AS total_revenue
    FROM supplier JOIN rev ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: argmax-by-group — the supplier(s) with maximum
    quarterly revenue. The revenue aggregate is computed once and
    reused for both the max (a 1-row broadcast) and the final
    equality filter; ties (exact decimal equality) all surface, as in
    the spec. Money stays decimal through the comparison."""
    li = read_table(spark, sf_dir, "lineitem")
    sd = F.col("l_shipdate").cast("date")
    rev = (
        li.filter(
            (sd >= F.lit("2000-01-01").cast("date"))
            & (sd < F.lit("2000-04-01").cast("date"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.sum(_revenue()).alias("total_revenue"))
    )
    top = rev.agg(F.max("total_revenue").alias("max_revenue"))
    supplier = read_table(spark, sf_dir, "supplier")
    return (
        rev.join(F.broadcast(top), rev.total_revenue == top.max_revenue)
        .join(supplier, F.col("supplier_no") == supplier.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            F.col("total_revenue").cast("double").alias("total_revenue"),
        )
    )


@query(
    "q16_supplier_count_by_part",
    oracle="""
    SELECT p_brand, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM part JOIN lineitem ON l_partkey = p_partkey
    WHERE p_brand <> 'Brand#45' AND p_size IN (1, 5, 9, 14, 19, 23)
    GROUP BY p_brand, p_size
    """,
)
def q16_supplier_count_by_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (no partsupp table -> the part-supplier
    relation is derived from lineitem): distinct suppliers per
    (brand, size) bucket. Both predicates push to the part scan;
    count_distinct expands to a two-phase aggregate (partial distinct
    on the shuffle key) — no driver-side distinct."""
    part = read_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#45")
        & F.col("p_size").isin(1, 5, 9, 14, 19, 23)
    )
    li = read_table(spark, sf_dir, "lineitem")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "q17_small_quantity_revenue",
    oracle="""
    WITH pavg AS (
        SELECT l_partkey AS pk,
               SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sq,
               COUNT(*) AS cq
        FROM lineitem GROUP BY l_partkey
    )
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0
               AS avg_yearly,
           COUNT(*) AS n_items
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN pavg ON pk = l_partkey
    WHERE p_brand = 'Brand#23'
      AND CAST(l_quantity AS DECIMAL(18,2)) * 5 * cq < sq
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue from below-20%%-of-average-quantity
    line items of one brand. The correlated AVG subquery is a
    per-partkey aggregate joined back to the fact table; the
    comparison is rearranged division-free (``5*qty*cnt < sum``) so
    both engines compare exact decimals — no float threshold
    flakiness. The brand predicate prunes the part side; the pavg
    aggregate shuffles on the same key the join needs, so the
    exchange is reused."""
    li = read_table(spark, sf_dir, "lineitem")
    part = read_table(spark, sf_dir, "part").filter(
        F.col("p_brand") == "Brand#23"
    )
    pavg = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.sum(_dec("l_quantity")).alias("sq"), F.count(F.lit(1)).alias("cq")
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(pavg, li.l_partkey == pavg.pk)
        .filter(_dec("l_quantity") * 5 * F.col("cq") < F.col("sq"))
        .agg(
            (F.sum(_dec("l_extendedprice")).cast("double") / 7.0).alias(
                "avg_yearly"
            ),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query(
    "q20_supplier_part_quantity",
    oracle="""
    SELECT s_suppkey, s_name
    FROM supplier
    WHERE s_suppkey IN (
        SELECT l_suppkey
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE p_name LIKE '%widget%'
          AND l_shipdate >= DATE '2000-01-01'
          AND l_shipdate <  DATE '2001-01-01'
        GROUP BY l_suppkey
        HAVING SUM(CAST(l_quantity AS DECIMAL(18,2)))
                   > CAST(300 AS DECIMAL(18,2)))
    """,
)
def q20_supplier_part_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (no partsupp -> availability derived from
    shipped quantity): suppliers who moved more than a threshold
    quantity of widget parts in a year — a group-HAVING feeding a
    semi join. The name LIKE prunes part before the join; the HAVING
    output is tiny and broadcasts into the semi join."""
    li = read_table(spark, sf_dir, "lineitem")
    sd = F.col("l_shipdate").cast("date")
    part = read_table(spark, sf_dir, "part").filter(
        F.col("p_name").contains("widget")
    )
    qualifying = (
        li.filter(
            (sd >= F.lit("2000-01-01").cast("date"))
            & (sd < F.lit("2001-01-01").cast("date"))
        )
        .join(part, li.l_partkey == part.p_partkey)
        .groupBy("l_suppkey")
        .agg(F.sum(_dec("l_quantity")).alias("total_qty"))
        .filter(F.col("total_qty") > F.lit(300).cast(_DEC))
        .select("l_suppkey")
    )
    supplier = read_table(spark, sf_dir, "supplier")
    return supplier.join(
        F.broadcast(qualifying),
        supplier.s_suppkey == qualifying.l_suppkey,
        "left_semi",
    ).select("s_suppkey", "s_name")


@query(
    "q21_sole_returning_supplier",
    oracle="""
    SELECT s_name, COUNT(*) AS numwait
    FROM supplier
    JOIN lineitem l1 ON l1.l_suppkey = s_suppkey
    JOIN orders ON o_orderkey = l1.l_orderkey
    WHERE o_orderstatus = 'F'
      AND l1.l_returnflag = 'R'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_returnflag = 'R')
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 20
    """,
)
def q21_sole_returning_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (receipt/commit dates absent -> "kept waiting"
    rewritten as "sole returning supplier"): per supplier, finished
    multi-supplier orders where only that supplier's lines came back
    returned. The EXISTS/NOT-EXISTS pair compiles to a left-semi and
    a left-anti join, each an equi-join on the order key with the
    supplier inequality as a residual — all three lineitem passes
    shuffle on l_orderkey, so AQE coalesces them onto one exchange
    layout; nothing is correlated per-row."""
    supplier = read_table(spark, sf_dir, "supplier")
    li = read_table(spark, sf_dir, "lineitem")
    orders_f = read_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    )
    l1 = li.filter(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("ok"), F.col("l_suppkey").alias("sk")
    )
    l2 = li.select(
        F.col("l_orderkey").alias("ok2"), F.col("l_suppkey").alias("sk2")
    )
    l3 = li.filter(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("ok3"), F.col("l_suppkey").alias("sk3")
    )
    waiting = (
        l1.join(orders_f, F.col("ok") == orders_f.o_orderkey, "left_semi")
        .join(
            l2,
            (F.col("ok") == F.col("ok2")) & (F.col("sk") != F.col("sk2")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("ok") == F.col("ok3")) & (F.col("sk") != F.col("sk3")),
            "left_anti",
        )
    )
    return (
        waiting.join(supplier, F.col("sk") == supplier.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name"))
        .limit(20)
    )


@query(
    "q2_min_cost_supplier",
    oracle="""
    WITH ps AS (
        SELECT l_partkey, l_suppkey,
               MIN(CAST(l_extendedprice AS DECIMAL(18,2))) AS supplycost
        FROM lineitem GROUP BY 1, 2
    ), eu AS (
        SELECT s_suppkey, s_name, s_acctbal, n_name
        FROM supplier
        JOIN nation ON n_nationkey = s_nationkey
        JOIN region ON r_regionkey = n_regionkey
        WHERE r_name = 'EUROPE'
    ), costed AS (
        SELECT p_partkey, p_brand, s_name, s_acctbal, n_name, supplycost,
               MIN(supplycost) OVER (PARTITION BY p_partkey) AS best
        FROM ps
        JOIN eu ON s_suppkey = l_suppkey
        JOIN part ON p_partkey = l_partkey
        WHERE p_size = 25
    )
    SELECT s_acctbal, s_name, n_name, p_partkey, p_brand,
           CAST(supplycost AS DOUBLE) AS supplycost
    FROM costed WHERE supplycost = best
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (no ``partsupp`` table in the testdata -> the
    part-supplier relation is derived from lineitem: supplycost :=
    MIN(l_extendedprice) per (part, supplier)): for size-25 parts,
    the EUROPE-region suppliers offering the per-part minimum cost —
    the classic correlated-MIN argmin, compiled as a window MIN over
    p_partkey instead of a per-row subquery.

    Scale posture: the part-supplier rollup is one hash aggregate on
    (l_partkey, l_suppkey); the region-restricted supplier dimension
    broadcasts onto it; the argmin window and the part join both
    hash on the part key, so AQE reuses one exchange layout for the
    window and the join. Costs stay decimal(18,2) end-to-end — the
    min/equality comparisons are exact, cast to double only at
    output."""
    from pyspark.sql import Window

    li = read_table(spark, sf_dir, "lineitem")
    supplier = read_table(spark, sf_dir, "supplier")
    nation = read_table(spark, sf_dir, "nation")
    region = read_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "EUROPE"
    )
    part = read_table(spark, sf_dir, "part").filter(F.col("p_size") == 25)

    ps = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(_dec("l_extendedprice")).alias("supplycost")
    )
    eu = supplier.join(
        F.broadcast(
            nation.join(
                F.broadcast(region), nation.n_regionkey == region.r_regionkey
            ).select("n_nationkey", "n_name")
        ),
        supplier.s_nationkey == F.col("n_nationkey"),
    ).select("s_suppkey", "s_name", "s_acctbal", "n_name")

    w = Window.partitionBy("p_partkey")
    return (
        ps.join(F.broadcast(eu), ps.l_suppkey == eu.s_suppkey)
        .join(part, ps.l_partkey == part.p_partkey)
        .withColumn("best", F.min("supplycost").over(w))
        .filter(F.col("supplycost") == F.col("best"))
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            "p_brand",
            F.col("supplycost").cast("double").alias("supplycost"),
        )
        .orderBy(
            F.col("s_acctbal").desc(),
            F.col("n_name"),
            F.col("s_name"),
            F.col("p_partkey"),
        )
        .limit(100)
    )


@query(
    "q9_product_type_profit",
    oracle=f"""
    SELECT n_name AS nation,
           date_part('year', o_orderdate) AS o_year,
           CAST(SUM({_REVENUE_SQL}
                - CAST(p_retailprice AS DECIMAL(18,2))
                  * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS profit
    FROM lineitem
    JOIN part     ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation   ON n_nationkey = s_nationkey
    JOIN orders   ON o_orderkey = l_orderkey
    WHERE p_name LIKE '%widget%'
    GROUP BY 1, 2
    """,
)
def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (no ``partsupp``/supplycost -> cost proxied by
    p_retailprice * quantity): profit on 'widget' parts by supplier
    nation and order year. Five-table snowflake anchored on lineitem;
    the p_name LIKE predicate pushes into the part scan so the
    lineitem-part join probes only matching parts, nation broadcasts
    onto supplier, and the money math stays decimal until the final
    per-group cast.

    At 100 TB the only large-large exchange is lineitem-orders on the
    order key; part after the LIKE filter and the supplier dimension
    both fit AQE's broadcast threshold."""
    li = read_table(spark, sf_dir, "lineitem")
    part = read_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("%widget%")
    )
    supplier = read_table(spark, sf_dir, "supplier")
    nation = read_table(spark, sf_dir, "nation")
    orders = read_table(spark, sf_dir, "orders")

    supp_nat = supplier.join(
        F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey
    ).select("s_suppkey", F.col("n_name").alias("nation"))
    profit = _revenue() - _dec("p_retailprice") * _dec("l_quantity")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp_nat), li.l_suppkey == F.col("s_suppkey"))
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(
            "nation",
            F.year(F.col("o_orderdate").cast("date"))
            .cast("bigint")
            .alias("o_year"),
        )
        .agg(F.sum(profit).cast("double").alias("profit"))
    )


@query(
    "q11_important_stock",
    oracle="""
    WITH pv AS (
        SELECT l_partkey AS partkey,
               SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                   * CAST(l_quantity AS DECIMAL(18,2))) AS value
        FROM lineitem
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation   ON n_nationkey = s_nationkey
        WHERE n_name = 'NATION_3'
        GROUP BY 1
    )
    SELECT partkey, CAST(ROUND(value, 2) AS DOUBLE) AS value
    FROM pv
    WHERE CAST(value AS DOUBLE)
          > (SELECT CAST(SUM(value) AS DOUBLE) FROM pv) * 0.001
    """,
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (no ``partsupp`` -> per-part "stock value" is
    SUM(extendedprice * quantity) of one nation's suppliers' lines):
    parts whose value exceeds 0.1% of the nation-wide total — the
    global-scalar-subquery HAVING.

    The scalar total is a second aggregate over the same grouped
    result, attached with a broadcast cross join (one row), so the
    threshold comparison runs map-side with no driver collect and no
    recomputation of the base join. Values are exact decimals on
    both engines; the double cast happens only at the comparison and
    output."""
    li = read_table(spark, sf_dir, "lineitem")
    supplier = read_table(spark, sf_dir, "supplier")
    nation = read_table(spark, sf_dir, "nation").filter(
        F.col("n_name") == "NATION_3"
    )

    nat_supp = supplier.join(
        F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey
    ).select("s_suppkey")
    pv = (
        li.join(F.broadcast(nat_supp), li.l_suppkey == F.col("s_suppkey"))
        .groupBy(F.col("l_partkey").alias("partkey"))
        .agg(F.sum(_dec("l_extendedprice") * _dec("l_quantity")).alias("value"))
    )
    total = pv.agg(F.sum("value").cast("double").alias("total"))
    return (
        pv.crossJoin(F.broadcast(total))
        .filter(F.col("value").cast("double") > F.col("total") * 0.001)
        .select("partkey", F.round("value", 2).cast("double").alias("value"))
    )
