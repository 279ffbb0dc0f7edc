"""Plan-shape assertions — the 100 TB discipline, tested.

Correct rows are necessary, not sufficient: these tests pin the
physical plans (partition pruning, pushed filters, broadcast of
provably-small dims, codegen coverage) so a regression that keeps
results right but wrecks the plan still fails CI.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from kcbdml9_big_data_processing_spark.operators.enrich import enrich
from kcbdml9_big_data_processing_spark.plans.inspect import (
    has_broadcast_hash_join,
    partition_filters,
    pushed_filters,
    wholestage_codegen_spans,
)
from kcbdml9_big_data_processing_spark.sinks.parquet import write_partitioned_archive
from kcbdml9_big_data_processing_spark.sources.parquet import (
    read_partitioned_archive,
    read_table,
)

from conftest import SF_SMOKE


def test_partition_pruning_on_archive(spark, tiny_events, tmp_path_factory):
    """S2/F1: equality filters on hive partition cols must land in
    PartitionFilters (directory pruning), not post-scan Filter
    (batch/BatchJobImpl.scala:17-27)."""
    path = str(tmp_path_factory.mktemp("archive")) + "/events"
    write_partitioned_archive(tiny_events, path, ts_col="ts", mode="overwrite")
    import datetime as dt

    df = read_partitioned_archive(spark, path, at=dt.datetime(2024, 1, 1, 0, 0))
    pf = partition_filters(df)
    assert pf, "expected non-empty PartitionFilters"
    joined = " ".join(pf)
    for col in ("year", "month", "day", "hour"):
        assert col in joined
    assert df.count() == 6


def test_predicate_pushdown_on_lineitem(spark):
    """Filters + projection must reach the parquet scan."""
    li = read_table(spark, SF_SMOKE, "lineitem")
    q = li.where(F.col("l_quantity") < 10.0).select("l_orderkey", "l_quantity")
    assert pushed_filters(q), "expected non-empty PushedFilters"


def test_small_dim_broadcasts_with_hint(tiny_events, tiny_users):
    """J1: a provably-small dim with the explicit hint plans a
    BroadcastHashJoin (fact side unshuffled)."""
    out = enrich(tiny_events, tiny_users, "user_id", "id", broadcast_dim=True)
    assert has_broadcast_hash_join(out)


def test_small_dim_broadcasts_under_aqe(spark):
    """Without any hint, a dim far below autoBroadcastJoinThreshold
    still broadcasts — AQE/stats pick it, we don't force it."""
    ev = read_table(spark, SF_SMOKE, "events")
    cust = read_table(spark, SF_SMOKE, "customer")
    out = enrich(ev, cust, "user_id", "c_custkey")
    # materialize so AQE finalizes the plan, then check the final plan
    out.write.format("noop").mode("overwrite").save()
    assert has_broadcast_hash_join(out)


def test_agg_stays_in_codegen(spark):
    """The hot aggregation path must be whole-stage codegen'd."""
    ev = read_table(spark, SF_SMOKE, "events")
    q = ev.groupBy("event_type").agg(F.sum("value"))
    assert wholestage_codegen_spans(q) >= 1
