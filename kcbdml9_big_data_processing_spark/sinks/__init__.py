"""Batch sinks: JDBC append, partitioned parquet archive, training
shards."""

from .jdbc import write_jdbc
from .parquet import write_partitioned_archive
from .shards import (
    audit_training_shards,
    read_export_meta,
    read_training_shards,
    shard_assignments,
    write_training_shards,
)

__all__ = [
    "write_jdbc",
    "write_partitioned_archive",
    "shard_assignments",
    "write_training_shards",
    "read_training_shards",
    "audit_training_shards",
    "read_export_meta",
]
