"""Sorted-layout sink: compaction sizing, range-disjoint files, and
the actual data skip (scan metrics, not vibes)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from kcbdml9_big_data_processing_spark.sinks.layout import (
    compact_sorted,
    scan_file_stats,
)
from kcbdml9_big_data_processing_spark.sources.parquet import read_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def layout_dir(spark, tmp_path_factory):
    """orders compacted+sorted by o_orderkey into ~4 files (tiny
    target so the test data yields several range-disjoint files)."""
    path = str(tmp_path_factory.mktemp("layout") / "orders_sorted")
    orders = read_table(spark, SF, "orders")
    n = compact_sorted(orders, path, "o_orderkey", target_file_bytes=32 << 10)
    return path, n, orders


def test_compaction_preserves_data(spark, layout_dir):
    path, _, orders = layout_dir
    back = spark.read.parquet(path)
    assert back.count() == orders.count()
    a = {r["o_orderkey"] for r in back.select("o_orderkey").collect()}
    b = {r["o_orderkey"] for r in orders.select("o_orderkey").collect()}
    assert a == b


def test_files_sized_and_range_disjoint(spark, layout_dir):
    path, n, _ = layout_dir
    files = [f for f in os.listdir(path) if f.endswith(".parquet")]
    assert len(files) == n > 1
    stats = scan_file_stats(spark, path).orderBy("min").collect()
    # parquet footer min/max of o_orderkey: consecutive files must not
    # overlap — the property row-group skipping needs
    for prev, cur in zip(stats, stats[1:]):
        assert prev["max"] <= cur["min"]


def test_point_filter_skips_row_groups(spark, layout_dir):
    """A point filter on the sort key must emit rows from ONLY the one
    file whose [min,max] range contains the key — every other file's
    row groups are skipped by the pushed min/max predicate. Measured
    from the executed scan's numOutputRows (vanilla Spark plans all
    files — planning-time per-file stat pruning is a table-format
    feature; the parquet reader then drops non-matching row groups at
    task time, which is what this pins)."""
    path, n, _ = layout_dir
    df = spark.read.parquet(path)
    key = df.agg(F.min("o_orderkey")).collect()[0][0]
    q = df.where(F.col("o_orderkey") == key)
    q.collect()
    metrics = {}
    stack = [q._jdf.queryExecution().executedPlan()]
    while stack:
        cur = stack.pop()
        if "Scan" in cur.nodeName():
            it = cur.metrics().iterator()
            while it.hasNext():
                kv = it.next()
                metrics[kv._1()] = kv._2().value()
        for i in range(cur.children().size()):
            stack.append(cur.children().apply(i))
    stats = scan_file_stats(spark, path).collect()
    total = sum(r["rows"] for r in stats)
    expected = sum(
        r["rows"] for r in stats if r["min"] <= key <= r["max"]
    )
    assert n > 1 and expected < total
    assert metrics.get("numOutputRows") == expected, metrics
