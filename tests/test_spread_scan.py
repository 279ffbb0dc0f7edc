"""spread_scan (r16 optimization): the input-skew remedy for
single-row-group scans (guide §2.5) must spread exactly when the scan
under-parallelizes, stay a no-op otherwise, and never change rows."""

from __future__ import annotations

from pyspark.sql import functions as F

from kcbdml9_big_data_processing_spark.sources import parquet as P
from kcbdml9_big_data_processing_spark.sources.parquet import (
    read_table,
    spread_scan,
)

from conftest import SF_SMOKE


def test_spreads_single_split_scan_to_core_count(spark):
    """The driver testdata tables are one file / one row group — the
    scan is ONE task; spread_scan must rebalance it to the session's
    parallelism."""
    docs = read_table(spark, SF_SMOKE, "documents")
    assert docs.rdd.getNumPartitions() < spark.sparkContext.defaultParallelism
    out = spread_scan(docs)
    assert (
        out.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism
    )


def test_noop_when_scan_already_parallel(spark):
    """At a healthy layout (>= cores splits) spread_scan must return
    the frame UNCHANGED — no exchange added at real scale."""
    cores = spark.sparkContext.defaultParallelism
    df = spark.range(0, 1000, 1, cores + 3)
    assert spread_scan(df) is df


def test_explicit_min_tasks_floor(spark):
    df = read_table(spark, SF_SMOKE, "documents")
    assert spread_scan(df, 4).rdd.getNumPartitions() == 4


def test_rows_unchanged_and_filter_still_pushes(spark):
    """Spread must not change the row set, and predicates written
    after it must still reach the parquet scan (Catalyst pushes
    filters through Repartition)."""
    from kcbdml9_big_data_processing_spark.plans.inspect import pushed_filters

    base = read_table(spark, SF_SMOKE, "documents")
    spread = spread_scan(base)
    a = sorted(r.doc_id for r in base.select("doc_id").collect())
    b = sorted(r.doc_id for r in spread.select("doc_id").collect())
    assert a == b
    q = spread.where(F.col("doc_id") > 100).select("doc_id")
    assert pushed_filters(q), "filter stopped reaching the scan"


def test_disable_hook_is_identity(spark):
    """tools/ab_spread.py relies on the module flag turning every
    spread into identity."""
    df = read_table(spark, SF_SMOKE, "documents")
    old = P._SPREAD_DISABLED
    P._SPREAD_DISABLED = True
    try:
        assert spread_scan(df) is df
    finally:
        P._SPREAD_DISABLED = old
