"""Temporal join operators Spark lacks natively: as-of join and
interval (range) join — generalized from the registry queries that
prove them against DuckDB oracles (asof_last_click_before_purchase,
events_near_errors) so any caller can use them on arbitrary frames.

Both avoid the quadratic formulations a naive translation would hit:

- ``asof_join``: NOT a join at all — a union + one event-time window
  per key. One shuffle on the key; a theta-join on key + ts<=ts
  explodes quadratically on hot keys.
- ``interval_join``: w-sized time bucketing with neighbor replication
  on the right side, equi-join on (key, bucket), exact |Δt| filter,
  dedup. Any pair within |Δt| <= w shares one of the three buckets by
  construction, so the blocking is complete; shuffle is on
  (key, bucket) and per-bucket density bounds the work, not per-key
  history.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.exact import epoch_micros, epoch_millis


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    prefix: str = "asof_",
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right.right_ts <= left.left_ts`` and the same ``on`` key —
    backward as-of join semantics (pandas ``merge_asof``, kdb ``aj``).

    Returns the left frame plus ``{prefix}{right_ts}`` and
    ``{prefix}{c}`` for each requested right column (null when no
    right row precedes). Ties on the right timestamp resolve to the
    greatest (right_ts, *right_cols) struct — deterministic when the
    right columns make rows unique.

    Scale shape: union both sides, ONE window over (key, event-time)
    with a running ``max`` of the right-side struct — a single shuffle
    on the key, linear state, no self-join. The range frame makes a
    right row at exactly left_ts visible to that left row ("at or
    before")."""
    right_cols = right_cols or []
    lcols = left.columns
    tagged_left = left.select(
        *[F.col(c) for c in lcols],
        F.lit(None).cast("long").alias("__r_us"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in right_cols],
        F.lit(1).alias("__is_left"),
        F.col(left_ts).alias("__ts"),
        F.col(on).alias("__key"),
    )
    tagged_right = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        epoch_micros(right_ts).alias("__r_us"),
        *[F.col(c).alias(f"__r_{c}") for c in right_cols],
        F.lit(0).alias("__is_left"),
        F.col(right_ts).alias("__ts"),
        F.col(on).alias("__key"),
    )
    unioned = tagged_left.unionAll(tagged_right)
    # rangeBetween frames order by a single expression; epoch micros of
    # the event time keeps "at or before" exact at full precision
    w = (
        Window.partitionBy("__key")
        .orderBy(epoch_micros("__ts"))
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # a right row with a null timestamp must not form a struct: null
    # __r_us sorts lowest in struct comparison, so as the only right
    # row for a key it would become __best and hand the left row a
    # phantom match with a null as-of timestamp
    right_struct = F.when(
        (F.col("__is_left") == 0) & F.col("__r_us").isNotNull(),
        F.struct(F.col("__r_us"), *[F.col(f"__r_{c}") for c in right_cols]),
    )
    best = F.max(right_struct).over(w)
    out = unioned.withColumn("__best", best).where(F.col("__is_left") == 1)
    proj = [F.col(c) for c in lcols]
    proj.append(
        F.timestamp_micros(F.col("__best.__r_us")).alias(f"{prefix}{right_ts}")
        if dict(right.dtypes).get(right_ts) == "timestamp"
        else F.expr(
            "timestampadd(MICROSECOND, __best.__r_us,"
            " TIMESTAMP_NTZ'1970-01-01 00:00:00')"
        ).alias(f"{prefix}{right_ts}")
    )
    for c in right_cols:
        proj.append(F.col(f"__best.__r_{c}").alias(f"{prefix}{c}"))
    return out.select(*proj)


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    tolerance_ms: int,
    left_id: str,
    right_id: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
) -> DataFrame:
    """All (left_id, right_id) pairs with the same ``on`` key and
    ``|left_ts - right_ts| <= tolerance_ms`` — a complete interval
    join without the per-key cross product.

    Both sides bucket into tolerance-sized epochs; the right side
    replicates into its bucket and both neighbors (any qualifying pair
    shares one of those by construction), the equi-join runs on
    (key, bucket), the exact millisecond filter decides, and bucket
    replication duplicates are dropped on the id pair. Bucketing uses
    the same epoch arithmetic on both sides, so any timezone offset
    cancels; the exact filter is tz-free epoch math."""
    bucket = F.floor(epoch_millis(left_ts) / F.lit(tolerance_ms))
    lhs = left.select(
        F.col(left_id).alias("__lid"),
        F.col(on).alias("__key"),
        epoch_millis(left_ts).alias("__lms"),
        bucket.alias("__bk"),
    )
    rbucket = F.floor(epoch_millis(right_ts) / F.lit(tolerance_ms))
    rhs = (
        right.select(
            F.col(right_id).alias("__rid"),
            F.col(on).alias("__rkey"),
            epoch_millis(right_ts).alias("__rms"),
            rbucket.alias("__rbk"),
        )
        .withColumn(
            "__bk",
            F.explode(
                F.array(F.col("__rbk") - 1, F.col("__rbk"), F.col("__rbk") + 1)
            ),
        )
    )
    return (
        lhs.join(rhs, (lhs.__key == rhs.__rkey) & (lhs.__bk == rhs.__bk))
        .where(F.abs(F.col("__lms") - F.col("__rms")) <= tolerance_ms)
        .select(
            F.col("__lid").alias(left_id), F.col("__rid").alias(right_id)
        )
        .distinct()
    )
