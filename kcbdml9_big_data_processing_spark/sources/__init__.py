"""Sources: parquet (batch + partition-pruned archive), JDBC, Kafka, files."""

from .parquet import read_table, read_partitioned_archive
from .jdbc import read_jdbc

__all__ = ["read_table", "read_partitioned_archive", "read_jdbc"]
