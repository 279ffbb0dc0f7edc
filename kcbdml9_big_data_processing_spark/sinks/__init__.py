"""Batch sinks: JDBC append, partitioned parquet archive."""

from .jdbc import write_jdbc
from .parquet import write_partitioned_archive

__all__ = ["write_jdbc", "write_partitioned_archive"]
