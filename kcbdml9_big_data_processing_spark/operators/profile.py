"""Dataset profiling: per-column null counts, bounds, and
cardinalities in ONE pass.

The first step of any ingest pipeline at 100 TB — you profile before
you trust. All measures ride a single hash aggregate (no per-column
jobs); exact distinct counts expand to the two-phase plan, so for
very wide tables swap them for approx_count_distinct and keep the
single-pass property.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def profile_columns(
    df: DataFrame,
    columns: list[str],
    exact_distinct: bool = True,
) -> DataFrame:
    """One row per profiled column: nulls, non-nulls, distincts, and
    min/max rendered as strings (so heterogeneous column types fit one
    result schema)."""
    aggs: list[Column] = [F.count(F.lit(1)).alias("__n")]
    for c in columns:
        col = F.col(c)
        aggs += [
            F.sum(F.when(col.isNull(), 1).otherwise(0)).alias(f"{c}__nulls"),
            (
                F.countDistinct(col)
                if exact_distinct
                else F.approx_count_distinct(col)
            ).alias(f"{c}__distinct"),
            F.min(col).cast("string").alias(f"{c}__min"),
            F.max(col).cast("string").alias(f"{c}__max"),
        ]
    wide = df.agg(*aggs)
    # unpivot the single wide row into (column, metric...) rows
    structs = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col("__n").alias("n_rows"),
                F.col(f"{c}__nulls").cast("long").alias("n_nulls"),
                F.col(f"{c}__distinct").cast("long").alias("n_distinct"),
                F.col(f"{c}__min").alias("min_value"),
                F.col(f"{c}__max").alias("max_value"),
            )
            for c in columns
        ]
    )
    return wide.select(F.explode(structs).alias("p")).select("p.*")
