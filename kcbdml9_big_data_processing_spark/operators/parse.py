"""JSON payload parsing.

P2-P4 in SURVEY.md §2.3 (streaming/StreamingJobImpl.scala:27-41): cast
a binary/string payload, parse with an explicit schema via from_json
(PERMISSIVE: malformed rows become a null struct), flatten. Used on
the Kafka ``value`` column and on the testdata ``events.props`` JSON.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def parse_json_payload(
    df: DataFrame,
    payload_col: str,
    schema: T.StructType,
    keep: list[str] | None = None,
) -> DataFrame:
    """Parse ``payload_col`` as JSON with ``schema`` and flatten it.

    ``keep`` lists pass-through columns to retain alongside the parsed
    fields (default: none, matching the reference, which keeps only
    the parsed device message).
    """
    parsed = df.withColumn(
        "__parsed", F.from_json(F.col(payload_col).cast("string"), schema)
    )
    cols = [F.col(c) for c in (keep or [])] + [F.col("__parsed.*")]
    return parsed.select(*cols)
