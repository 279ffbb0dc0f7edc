"""Sorted, size-targeted parquet layout — the data-skipping and
small-file levers for a 100 TB table (sibling of the bucketed sink;
no reference counterpart — the reference's plain parquet sink,
batch/BatchJobImpl.scala:80-88, has no layout control).

Two production problems, one writer:

- **Small files.** A streaming or fine-partitioned writer leaves
  thousands of KB-scale files; at cluster scale every file is an open
  + footer read + task, and the NameNode/manifest pays per file.
  ``compact_sorted`` rewrites to ~``target_file_bytes`` files by
  computing the output file count from the input's actual on-disk
  size (one planning-time metadata pass, no data scan).

- **Data skipping.** Parquet keeps min/max stats per row group;
  the reader drops whole row groups whose [min,max] cannot satisfy a
  pushed filter — but only if the writer CLUSTERED the data so ranges
  are narrow. ``repartitionByRange`` on the sort key gives globally
  disjoint per-file key ranges (plus an in-file sort for row-group
  and page stats), so a point/range filter on that key decodes ~one
  row group instead of the whole table. (Planning-time per-FILE stat
  pruning is a table-format feature — Delta/Iceberg manifests; plain
  parquet still schedules a task per file, which the compaction half
  keeps cheap. Partition-DIRECTORY pruning is operators/partitions.py
  territory.) ``tests/test_layout.py`` proves the skip with the
  executed scan's numOutputRows against per-file footer stats, not
  assertion by vibes.

Multi-column z-ordering is deliberately NOT implemented: for one
dominant filter column (the common case: time, tenant, id-range),
range-partition + sort is optimal and costs one shuffle; interleaved
orderings only pay when several uncorrelated columns are filtered
with similar frequency, and an honest implementation needs
bit-interleaving over rank-normalized columns — a different tool.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession


def _input_bytes(df: DataFrame) -> int | None:
    """Best-effort on-disk size of ``df``'s source files (public
    ``inputFiles()`` + filesystem stat — planning-time metadata only,
    no data scan). None when the frame is not a file scan or the
    scheme is not local (callers then fall back to one output file —
    at cluster scale pass an explicit count or use catalog stats)."""
    import os
    from urllib.parse import unquote, urlparse

    try:
        files = df.inputFiles()
    except Exception:
        return None
    if not files:
        return None
    total = 0
    for uri in files:
        parsed = urlparse(uri)
        if parsed.scheme not in ("", "file"):
            return None
        total += os.path.getsize(unquote(parsed.path))
    return total


def compact_sorted(
    df: DataFrame,
    path: str,
    sort_col: str,
    target_file_bytes: int = 256 << 20,
    mode: str = "overwrite",
) -> int:
    """Rewrite ``df`` under ``path`` as ~``target_file_bytes`` parquet
    files, range-partitioned and sorted by ``sort_col`` (disjoint
    per-file key ranges -> file- and row-group-level min/max
    skipping). Returns the output file count used.

    One shuffle (the range exchange; its sampling pass is
    planning-cheap), one write. File count derives from the source's
    actual on-disk bytes so compaction is stable under input file
    fragmentation — 10k tiny files and 10 big ones with the same data
    produce the same output layout.
    """
    size = _input_bytes(df)
    n_files = max(1, math.ceil((size or 0) / target_file_bytes)) if size else 1
    (
        df.repartitionByRange(n_files, sort_col)
        .sortWithinPartitions(sort_col)
        .write.mode(mode)
        .parquet(path)
    )
    return n_files


def scan_file_stats(spark: SparkSession, path: str) -> DataFrame:
    """Per-file (file, min, max, rows) over the FIRST column of a
    parquet directory's footer metadata — the evidence table for
    range-disjointness, read without scanning data rows."""
    import pyarrow.parquet as pq
    import os

    rows = []
    for name in sorted(os.listdir(path)):
        if not name.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(path, name)).metadata
        mins, maxs, nrows = [], [], 0
        for rg in range(md.num_row_groups):
            col = md.row_group(rg).column(0)
            st = col.statistics
            if st is not None and st.has_min_max:
                mins.append(st.min)
                maxs.append(st.max)
            nrows += md.row_group(rg).num_rows
        rows.append(
            (name, min(mins) if mins else None, max(maxs) if maxs else None, nrows)
        )
    return spark.createDataFrame(rows, "file string, min long, max long, rows long")
