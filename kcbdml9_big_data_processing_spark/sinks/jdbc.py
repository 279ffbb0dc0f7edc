"""Batch JDBC sink.

K3 in SURVEY.md §2.2 (batch/BatchJobImpl.scala:90-100): append a
DataFrame to a JDBC table. Executors open one connection per
partition, so at scale ``coalesce`` the DataFrame to a connection
count the database can take, and set ``batchsize`` so each round trip
carries thousands of rows. The reference leaves both at defaults.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    user: str | None = None,
    password: str | None = None,
    driver: str | None = None,
    mode: str = "append",
    batch_size: int = 10_000,
    max_connections: int | None = None,
    **options: str,
) -> None:
    """Append ``df`` to a JDBC table (blocking Spark action)."""
    if max_connections is not None:
        df = df.coalesce(max_connections)
    writer = (
        df.write.mode(mode)
        .format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batch_size))
    )
    if user is not None:
        writer = writer.option("user", user)
    if password is not None:
        writer = writer.option("password", password)
    if driver is not None:
        writer = writer.option("driver", driver)
    for k, v in options.items():
        writer = writer.option(k, v)
    writer.save()
