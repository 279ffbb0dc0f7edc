"""Bucketed parquet table writer — the storage-layout lever for
repeated big joins (SCALE.md; extends the reference's plain parquet
sink, batch/BatchJobImpl.scala:80-88, which has no layout control).

Writing both fact tables bucketed (and sorted) on the join key means
every later equi-join on that key is shuffle-free on both sides: each
bucket pair meets already co-partitioned and pre-sorted, so the
SortMergeJoin needs no Exchange and no Sort. At 100 TB this converts
the single most expensive recurring shuffle (fact x fact join) into a
scan — the write-time cost is one shuffle, paid once, amortized over
every downstream join.

Sizing: pick ``n_buckets`` so one bucket of the LARGER table fits an
executor's working memory (~128-256 MB of parquet per bucket); both
tables must use the SAME bucket count and key for the co-located join
to kick in.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed_table(
    df: DataFrame,
    table: str,
    n_buckets: int,
    bucket_cols: list[str],
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
    path: str | None = None,
) -> None:
    """Save ``df`` as a bucketed (optionally sorted) parquet table.
    Bucketed layout requires the table catalog (``saveAsTable``) — a
    plain ``.parquet(path)`` write cannot record bucket metadata,
    which is what lets the planner elide the join-side Exchange.
    ``path`` makes it an external table at that location (use when the
    session's warehouse dir may not be writable)."""
    writer = df.write.bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    if path is not None:
        writer = writer.option("path", path)
    writer.mode(mode).format("parquet").saveAsTable(table)


def write_join_ready_pair(
    spark: SparkSession,
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_table: str,
    right_table: str,
    n_buckets: int,
    paths: tuple[str, str] | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Bucket two tables on their join keys with one shared bucket
    count, so every later ``left_key = right_key`` join is
    shuffle-free; returns the two catalog-backed frames."""
    lp, rp = paths if paths is not None else (None, None)
    write_bucketed_table(left, left_table, n_buckets, [left_key], [left_key], path=lp)
    write_bucketed_table(right, right_table, n_buckets, [right_key], [right_key], path=rp)
    return spark.table(left_table), spark.table(right_table)
