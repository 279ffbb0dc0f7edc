"""SQL front-end: the driver testdata as named temp views + raw SQL.

The DataFrame registry (queries/) is the primary surface; this is the
other half of Spark's dual interface — a user who writes ANSI SQL can
point it at the same tables (same nanos-safe readers, same session
discipline) and Catalyst plans it identically to the DataFrame
phrasing. Views are session-scoped temp views: no catalog state
leaks across sessions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .schemas import TESTDATA_TABLES
from .sources.parquet import read_table


def register_views(
    spark: SparkSession, sf_dir: str, tables: tuple[str, ...] = TESTDATA_TABLES
) -> list[str]:
    """Register each testdata table as a temp view named after it
    (events gets the nanos->micros conversion like every other read
    path). Returns the view names."""
    for t in tables:
        read_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return list(tables)


def run_sql(spark: SparkSession, sf_dir: str, query: str) -> DataFrame:
    """One-shot: register views, run the statement."""
    register_views(spark, sf_dir)
    return spark.sql(query)
