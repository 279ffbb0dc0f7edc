"""Scale-technique queries: the skew and storage-layout levers
(operators/skew.py, sinks/bucketed.py) exercised as driver-checked
registry queries, so the techniques SCALE.md prescribes for 100 TB are
oracle-verified end-to-end, not just unit-tested.

The reference has no skew or layout handling at all (its dimension is
20 rows and its joins trivially broadcast — provisioner/
JdbcProvisioner.scala:30-49); both operators are north-star extensions.
"""

from __future__ import annotations


from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.exact import DEFAULT_SCALE, dsum_sql
from ..operators.skew import salted_aggregate
from ..sinks.bucketed import write_join_ready_pair
from ..tmpdirs import scratch_dir
from ..sources.parquet import read_table
from .registry import register

_P = float(10**DEFAULT_SCALE)


@register(
    "skew_salted_agg",
    oracle=f"""
        SELECT event_type,
               {dsum_sql('value')} AS total_value,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               MIN(value) AS min_value,
               MAX(value) AS max_value
        FROM events
        GROUP BY event_type
    """,
    prepare=True,
)
def skew_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key aggregation through the two-phase salted aggregate:
    events has only 5 event_type values, so a plain groupBy funnels
    ~N/5 rows into each of 5 reducers no matter how many cores exist —
    the exact shape AQE cannot fix (it splits skewed JOIN partitions,
    not the final aggregation state of a hot GROUP BY key). Phase 1
    groups by (event_type, hash-salt) spreading each hot key over 16
    reducers; phase 2 merges the 16 partial rows per key. Only
    re-aggregable measures ride through: the fixed-point sum and count
    merge with SUM, min/max with MIN/MAX. The oracle is the plain
    single-phase GROUP BY — hash equality proves the decomposition is
    lossless."""
    ev = read_table(spark, sf_dir, "events")
    out = salted_aggregate(
        ev,
        keys=["event_type"],
        salt_col="event_id",
        aggs={
            # fixed-point partial: exact bigint partials merge with SUM
            "total_fixed": F.sum(F.floor(F.col("value") * F.lit(_P))),
            "n_events": F.count(F.lit(1)),
            "min_value": (F.min("value"), F.min),
            "max_value": (F.max("value"), F.max),
        },
        n_salts=16,
    )
    return out.select(
        "event_type",
        (F.col("total_fixed").cast("double") / F.lit(_P)).alias("total_value"),
        F.col("n_events").cast("long").alias("n_events"),
        "min_value",
        "max_value",
    )


@register(
    "bucketed_join_roundtrip",
    oracle="""
        SELECT o.o_orderkey, o.o_custkey, c.c_name, o.o_totalprice
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    """,
)
def bucketed_join_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Storage-layout round-trip (bench-excluded, like
    archive_partition_roundtrip — it performs a full write inside the
    query): orders and customer are written as bucketed+sorted tables
    sharing one bucket count on the join key, re-read from the
    catalog, and joined — the join planning as a SortMergeJoin with NO
    Exchange on either side (asserted in tests/test_bucketing.py; at
    100 TB this converts the recurring fact-join shuffle into a scan,
    paid once at write time). The oracle is the plain join on the
    original tables, so hash equality proves the bucketed layout
    round-trips losslessly."""
    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    cust = read_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    base = scratch_dir("bucketed_")
    ob, cb = write_join_ready_pair(
        spark,
        orders,
        cust,
        "o_custkey",
        "c_custkey",
        "orders_bjr",
        "customer_bjr",
        n_buckets=8,
        paths=(base + "/orders", base + "/customer"),
    )
    return ob.join(cb, ob.o_custkey == cb.c_custkey).select(
        "o_orderkey", "o_custkey", "c_name", "o_totalprice"
    )
