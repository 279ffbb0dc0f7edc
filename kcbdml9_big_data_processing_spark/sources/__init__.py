"""Sources: parquet (batch + partition-pruned archive), JDBC, Kafka,
files, and corpus ingestion (raw text dirs / JSONL -> documents)."""

from .corpus import ingest_jsonl, ingest_text_dir
from .jdbc import read_jdbc
from .parquet import read_partitioned_archive, read_table

__all__ = [
    "read_table",
    "read_partitioned_archive",
    "read_jdbc",
    "ingest_text_dir",
    "ingest_jsonl",
]
