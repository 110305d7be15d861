"""Entity resolution: blocked fuzzy matching with edit-distance
verification.

``fuzzy_match_customers`` resolves "dirty" customer records (one
corrupted character in the name) back to the master table — the
classic MDM / record-linkage task. The dirty side is derived
deterministically from the master (the ``snapshot_diff_orders``
derive-then-verify pattern: a third of the customers get one digit of
their name replaced by ``'X'`` at a key-dependent position), so both
engines restate the identical corruption and the oracle checks the
*matching logic*.

Blocking is the deletion-neighborhood / masked-band scheme (the
edit-distance analogue of the SimHash band trick used in
``operators/dedup.py``): the last six digits of the name are split
into three 2-character bands; each record emits three blocking keys,
each with one band masked out (``'##'``). A single substitution
corrupts exactly one band, so the key with that band masked equals
the master's same-masked key — candidate generation is therefore an
**equi-join, recall-complete for edit distance ≤ 1 within the banded
region, never all-pairs**. Block size is bounded by the masked band's
alphabet (≤ 10² names share a masked key), independent of corpus
size, so candidate volume grows linearly at 100 TB. Survivors are
verified with exact ``levenshtein() ≤ 1`` and the best match per
dirty record is picked by a ``(distance, custkey)`` window — one
shuffle for the join, one for the window.

Reference parity: the reference's fuzzy surface is only
``name.strip()`` hygiene (``data_validator.py:171``); this family is
part of the required beyond-reference dedup/linkage breadth.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from incubyte_vaccination_data_pipeline_spark.catalog.registry import query
from incubyte_vaccination_data_pipeline_spark.sources.parquet_io import read_table

_DIRTY_MOD = 3          # every 3rd customer gets a dirty twin
_DIRTY_OFFSET = 9_000_000
#: c_name = 'Customer#' + 9 digits; bands cover its last 6 digits
_BAND_OFFSETS = [13, 15, 17]

_DIRTY_SQL = f"""
    SELECT c_custkey + {_DIRTY_OFFSET} AS dirty_id,
           concat(substr(c_name, 1, 12 + c_custkey % 6),
                  'X',
                  substr(c_name, 14 + c_custkey % 6)) AS dirty_name
    FROM customer
    WHERE c_custkey % {_DIRTY_MOD} = 0
"""


def _masked_sql(name_col: str) -> str:
    """One (band_off, masked_key) row per band, as a UNION ALL."""
    parts = [
        f"SELECT *, {off} AS band_off, "
        f"concat(substr({name_col}, 1, {off - 1}), '##', "
        f"substr({name_col}, {off + 2})) AS masked FROM base"
        for off in _BAND_OFFSETS
    ]
    return " UNION ALL ".join(parts)


@query(
    "fuzzy_match_customers",
    oracle=f"""
    WITH dirty AS ({_DIRTY_SQL}),
    dirty_bands AS (
        WITH base AS (SELECT dirty_id, dirty_name FROM dirty)
        {_masked_sql("dirty_name")}
    ),
    clean_bands AS (
        WITH base AS (SELECT c_custkey, c_name FROM customer)
        {_masked_sql("c_name")}
    ),
    cand AS (
        SELECT DISTINCT d.dirty_id, d.dirty_name, c.c_custkey, c.c_name
        FROM dirty_bands d JOIN clean_bands c
          ON d.band_off = c.band_off AND d.masked = c.masked
    ),
    verified AS (
        SELECT dirty_id, dirty_name, c_custkey, c_name,
               levenshtein(dirty_name, c_name) AS lev,
               COUNT(*) OVER (PARTITION BY dirty_id) AS n_candidates
        FROM cand
    )
    SELECT dirty_id, dirty_name,
           c_custkey AS matched_custkey,
           c_name AS matched_name,
           CAST(lev AS INT) AS lev,
           CAST(n_candidates AS BIGINT) AS n_candidates
    FROM (
        SELECT *, ROW_NUMBER() OVER (
                   PARTITION BY dirty_id ORDER BY lev, c_custkey) AS rn
        FROM verified WHERE lev <= 1
    ) WHERE rn = 1
    """,
)
def fuzzy_match_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Masked-band blocked candidate join + exact levenshtein verify +
    best-match window. All joins are equi-joins on the blocking key;
    no cartesian pair generation anywhere."""
    customer = read_table(spark, sf_dir, "customer").select("c_custkey", "c_name")

    pos = F.lit(13) + F.col("c_custkey") % 6
    dirty = customer.filter(F.col("c_custkey") % _DIRTY_MOD == 0).select(
        (F.col("c_custkey") + _DIRTY_OFFSET).alias("dirty_id"),
        F.concat(
            F.substring(F.col("c_name"), F.lit(1), pos - 1),
            F.lit("X"),
            F.col("c_name").substr(pos + 1, F.lit(20)),
        ).alias("dirty_name"),
    )

    def bands(df: DataFrame, name_col: str) -> DataFrame:
        rows = F.array(
            *[
                F.struct(
                    F.lit(off).alias("band_off"),
                    F.concat(
                        F.substring(F.col(name_col), 1, off - 1),
                        F.lit("##"),
                        F.expr(f"substr({name_col}, {off + 2})"),
                    ).alias("masked"),
                )
                for off in _BAND_OFFSETS
            ]
        )
        return df.select("*", F.explode(rows).alias("b")).select(
            "*", F.col("b.band_off").alias("band_off"), F.col("b.masked").alias("masked")
        ).drop("b")

    # r14 note: an explicit .repartition("dirty_id") before the
    # distinct removes 2 of the 6 exchanges (the distinct and the
    # window re-key), but measured a wash at sf0.1 (1.23s -> 1.26s
    # interleaved A/B) because it also forfeits the distinct's
    # map-side partial dedup before the exchange — kept as-is.
    cand = (
        bands(dirty, "dirty_name")
        .join(bands(customer, "c_name"), ["band_off", "masked"])
        .select("dirty_id", "dirty_name", "c_custkey", "c_name")
        .distinct()
    )
    verified = cand.select(
        "*",
        F.levenshtein("dirty_name", "c_name").alias("lev"),
        F.count(F.lit(1)).over(Window.partitionBy("dirty_id")).alias("n_candidates"),
    ).filter(F.col("lev") <= 1)
    rn = F.row_number().over(
        Window.partitionBy("dirty_id").orderBy("lev", "c_custkey")
    )
    return (
        verified.withColumn("rn", rn)
        .filter(F.col("rn") == 1)
        .select(
            "dirty_id",
            "dirty_name",
            F.col("c_custkey").alias("matched_custkey"),
            F.col("c_name").alias("matched_name"),
            F.col("lev").cast("int").alias("lev"),
            F.col("n_candidates").cast("bigint").alias("n_candidates"),
        )
    )
