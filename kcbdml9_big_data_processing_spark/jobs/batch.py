"""Batch layer job: enrich once, cache, fan out to four aggregations.

Mirrors batch/BatchJob.scala:28-47: read one hour of the archive,
read the user dimension, inner-join, ``.cache()`` the enriched frame
(M1), then derive bytes-per-antenna / per-email / per-app hourly
metrics plus the quota-violation report from the SAME cached input —
four actions, one scan+join (the first action materializes the cache,
the other three reuse it).

Scale: the cache holds one filter's worth of enriched fact rows (an
hour-partition in the reference); at 100 TB-of-archive that is the
working set, not the table. If the fan-out ever grows past memory,
swap ``cache()`` for a checkpoint/persist(DISK_ONLY) — the orchestration
shape stays the same.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame

from ..functions.exact import dsum
from ..operators.enrich import enrich
from ..operators.metrics import conform_metric, windowed_sum
from ..operators.quota import quota_violations

#: named-output writer, e.g. a JDBC append (sinks/jdbc.py) or a test dict
OutputWriter = Callable[[str, DataFrame], None]


@dataclass
class BatchJobConfig:
    fact_key: str
    dim_key: str
    ts_col: str
    value_col: str
    #: (key column in the enriched frame, metric tag) fan-out
    metrics: list[tuple[str, str]] = field(default_factory=list)
    #: quota report columns (None disables it)
    quota_user_col: str | None = None
    quota_col: str | None = None
    window: str = "1 hour"


class BatchJob:
    """run(fact, dim, write) -> join once, cache, fan out (BJ:28-47)."""

    def __init__(self, config: BatchJobConfig):
        self.config = config

    def run(self, fact: DataFrame, dim: DataFrame, write: OutputWriter) -> None:
        """``write(name, df)`` MUST materialize the frame (collect or
        sink it) — the cache is released when run() returns."""
        cfg = self.config
        enriched = enrich(fact, dim, cfg.fact_key, cfg.dim_key).cache()
        try:
            for key, tag in cfg.metrics:
                agg = windowed_sum(
                    enriched,
                    key,
                    cfg.window,
                    ts_col=cfg.ts_col,
                    value_col=cfg.value_col,
                    agg=dsum(cfg.value_col),
                )
                write(tag, conform_metric(agg, key, tag))
            if cfg.quota_user_col and cfg.quota_col:
                write(
                    "quota_violations",
                    quota_violations(
                        enriched,
                        user_col=cfg.quota_user_col,
                        quota_col=cfg.quota_col,
                        ts_col=cfg.ts_col,
                        value_col=cfg.value_col,
                        window_duration=cfg.window,
                        usage_agg=dsum(cfg.value_col),
                    ),
                )
        finally:
            enriched.unpersist()
