"""CDC merge + slowly-changing-dimension history: the incremental
ingestion primitives of a large-scale pipeline — a base snapshot plus
a stream of keyed changes (upserts/deletes) materialized into either
the latest-wins snapshot (``merge_changes``) or the full type-2
validity-interval history (``scd2_history``).

No reference counterpart (the reference overwrites nothing — its
batch layer only appends, BatchJobImpl.scala:88-100); this is the
north-star extension that lets the engine maintain mutable state
(user metadata, document versions, label corrections) over an
append-only lake, the way Delta/Hudi/Iceberg MERGE INTO does — but
expressed as plain DataFrame ops so it runs on bare parquet.

Scale shape: both operators are ONE shuffle on the key columns (the
window partition), and the window evaluates with WindowGroupLimit /
streaming-safe partial ordering — no driver state, no collect, no
iteration. Change volume per key is typically tiny; a pathological
hot key degrades to a single partition's sort, the same failure mode
as any keyed window, and salting does not apply (per-key order is the
semantics).

Determinism contract: within ``changes``, (keys..., ts_col) must be
unique — two changes to one key at the same version have no defined
winner. ``base`` rows carry a null version and order before every
change.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: op_col values: upsert (insert-or-update) and delete tombstone
OP_UPSERT = "U"
OP_DELETE = "D"


def _aligned_versions(
    base: DataFrame,
    changes: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    op_col: str,
) -> DataFrame:
    """Union base (as the null-version, pre-history row) with the
    change set, aligned to (keys..., payload..., ts_col, op_col)."""
    payload = [c for c in base.columns if c not in keys]
    missing = [c for c in [*keys, *payload, ts_col, op_col] if c not in changes.columns]
    if missing:
        raise ValueError(f"changes is missing columns: {missing}")
    ts_type = changes.schema[ts_col].dataType.simpleString()
    base_v = base.select(
        *keys,
        *payload,
        F.lit(None).cast(ts_type).alias(ts_col),
        F.lit(OP_UPSERT).alias(op_col),
    )
    return base_v.unionAll(changes.select(*keys, *payload, ts_col, op_col))


def merge_changes(
    base: DataFrame,
    changes: DataFrame,
    keys: Sequence[str],
    ts_col: str = "change_ts",
    op_col: str = "op",
) -> DataFrame:
    """Latest-wins merge (MERGE INTO semantics): apply ``changes``
    (upserts + delete tombstones, versioned by ``ts_col``) to
    ``base`` and return the resulting snapshot with base's schema.

    Per key, the highest-version row wins (base is the null-version
    row, ordered before every change); a winning delete removes the
    key. Keys present only in ``changes`` are inserts. One shuffle on
    the keys; the row_number window plans a per-partition top-1
    (WindowGroupLimit) so the exchange carries one candidate row per
    key per map partition, not the full change history."""
    versions = _aligned_versions(base, changes, keys, ts_col, op_col)
    w = Window.partitionBy(*keys).orderBy(F.desc_nulls_last(ts_col))
    return (
        versions.withColumn("__rn", F.row_number().over(w))
        .where((F.col("__rn") == 1) & (F.col(op_col) != OP_DELETE))
        .select(*base.columns)
    )


def scd2_history(
    base: DataFrame,
    changes: DataFrame,
    keys: Sequence[str],
    ts_col: str = "change_ts",
    op_col: str = "op",
) -> DataFrame:
    """Type-2 history: every version of every key with its validity
    interval — base's columns plus ``valid_from`` (this version's
    ``ts_col``; null for the base version), ``valid_to`` (the next
    change's version; null while open), and ``is_current``. A delete
    tombstone closes its predecessor's interval and emits no row of
    its own, so a deleted key has no current version. Same one-shuffle
    window shape as :func:`merge_changes` (lead() instead of top-1)."""
    versions = _aligned_versions(base, changes, keys, ts_col, op_col)
    w = Window.partitionBy(*keys).orderBy(F.asc_nulls_first(ts_col))
    return (
        versions.withColumn("valid_to", F.lead(ts_col).over(w))
        .where(F.col(op_col) != OP_DELETE)
        .select(
            *base.columns,
            F.col(ts_col).alias("valid_from"),
            "valid_to",
            F.col("valid_to").isNull().alias("is_current"),
        )
    )
