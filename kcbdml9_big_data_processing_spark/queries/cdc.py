"""Driver-checked CDC suite over the orders table: latest-wins merge
(snapshot) + type-2 history from one deterministic change scenario,
exercising operators/cdc.py end-to-end against a window-function
oracle.

The scenario (all arithmetic exact-by-construction across engines:
+100.0 / +200.0 and a divide-by-2 on doubles are IEEE-identical):

- version 1: every key % 3 == 0 upserted with price + 100
- version 1: inserts at key + 1e7 (from keys % 7 == 0) at price / 2
- version 2: every key % 6 == 0 upserted again with price + 200
  (so those keys carry a two-step history)
- version 3: every key % 5 == 0 deleted (closing any open interval)

Versions are plain BIGINTs — both operators are generic over any
orderable version column; timestamps add nothing to the check but
cost an engine-portability hazard.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.cdc import OP_DELETE, OP_UPSERT, merge_changes, scd2_history
from ..sources.parquet import read_table
from .registry import register

_INSERT_OFFSET = 10_000_000


def _scenario(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    base = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    k = F.col("o_orderkey")

    def change(rows: DataFrame, price, ts: int, op: str) -> DataFrame:
        return rows.select(
            "o_orderkey",
            price.alias("o_totalprice"),
            "o_orderstatus",
            F.lit(ts).cast("long").alias("change_ts"),
            F.lit(op).alias("op"),
        )

    price = F.col("o_totalprice")
    changes = (
        change(base.where(k % 3 == 0), price + 100.0, 1, OP_UPSERT)
        .unionAll(change(base.where(k % 6 == 0), price + 200.0, 2, OP_UPSERT))
        .unionAll(change(base.where(k % 5 == 0), price, 3, OP_DELETE))
        .unionAll(
            change(
                base.where(k % 7 == 0).withColumn(
                    "o_orderkey", k + _INSERT_OFFSET
                ),
                price / 2.0,
                1,
                OP_UPSERT,
            )
        )
    )
    return base, changes


_CDC_ORACLE = f"""
    WITH base AS (
        SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders
    ),
    changes AS (
        SELECT o_orderkey, o_totalprice + 100.0 AS o_totalprice,
               o_orderstatus, CAST(1 AS BIGINT) AS ts, 'U' AS op
        FROM base WHERE o_orderkey % 3 = 0
        UNION ALL
        SELECT o_orderkey, o_totalprice + 200.0, o_orderstatus,
               CAST(2 AS BIGINT), 'U'
        FROM base WHERE o_orderkey % 6 = 0
        UNION ALL
        SELECT o_orderkey, o_totalprice, o_orderstatus,
               CAST(3 AS BIGINT), 'D'
        FROM base WHERE o_orderkey % 5 = 0
        UNION ALL
        SELECT o_orderkey + {_INSERT_OFFSET}, o_totalprice / 2.0,
               o_orderstatus, CAST(1 AS BIGINT), 'U'
        FROM base WHERE o_orderkey % 7 = 0
    ),
    versions AS (
        SELECT o_orderkey, o_totalprice, o_orderstatus,
               CAST(NULL AS BIGINT) AS ts, 'U' AS op
        FROM base
        UNION ALL
        SELECT * FROM changes
    ),
    snap AS (
        SELECT o_orderkey, o_totalprice, o_orderstatus
        FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY o_orderkey ORDER BY ts DESC NULLS LAST) AS rn
            FROM versions
        )
        WHERE rn = 1 AND op <> 'D'
    ),
    hist AS (
        SELECT o_orderkey, o_totalprice, o_orderstatus,
               ts AS valid_from, valid_to,
               valid_to IS NULL AS is_current
        FROM (
            SELECT *, LEAD(ts) OVER (
                PARTITION BY o_orderkey
                ORDER BY ts ASC NULLS FIRST) AS valid_to
            FROM versions
        )
        WHERE op <> 'D'
    )
    SELECT 'snapshot' AS variant, o_orderkey, o_totalprice, o_orderstatus,
           CAST(NULL AS BIGINT) AS valid_from, CAST(NULL AS BIGINT) AS valid_to,
           CAST(NULL AS BOOLEAN) AS is_current
    FROM snap
    UNION ALL
    SELECT 'history', o_orderkey, o_totalprice, o_orderstatus,
           valid_from, valid_to, is_current
    FROM hist
"""


@register("cdc_orders_suite", oracle=_CDC_ORACLE, headline=True, prepare=True)
def cdc_orders_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC merge + SCD2 history in one registration: the latest-wins
    snapshot (operators/cdc.merge_changes) and the validity-interval
    history (operators/cdc.scd2_history) of the same deterministic
    change scenario, tagged by a variant column. Hash-checking the
    union pins per-key winners, delete semantics, insert handling, and
    every interval boundary against the oracle's window-function
    phrasing. Both operators are one shuffle on the key; the suite
    runs them independently (two shuffles total) so each operator's
    own plan is what executes."""
    base, changes = _scenario(spark, sf_dir)
    null_v = F.lit(None).cast("long")
    snap = merge_changes(base, changes, ["o_orderkey"]).select(
        F.lit("snapshot").alias("variant"),
        "o_orderkey",
        "o_totalprice",
        "o_orderstatus",
        null_v.alias("valid_from"),
        null_v.alias("valid_to"),
        F.lit(None).cast("boolean").alias("is_current"),
    )
    hist = scd2_history(base, changes, ["o_orderkey"]).select(
        F.lit("history").alias("variant"),
        "o_orderkey",
        "o_totalprice",
        "o_orderstatus",
        "valid_from",
        "valid_to",
        "is_current",
    )
    return snap.unionAll(hist)
