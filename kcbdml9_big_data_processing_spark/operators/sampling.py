"""Deterministic sampling / dataset-mixing operators.

A training-data pipeline rarely takes sources at their natural
proportions: the mix is a per-source sampling rate (downweight the
crawl, upweight curated sources). These operators implement the
scan-parallel formulation the stratified_sample registry query's
docstring prescribes for 100 TB: a hash-mod predicate per row — no
window, no sort, no shuffle; the mixing-rate table is a broadcast.

Determinism is the point: ``xxhash64(id)`` makes the kept set a pure
function of the ids, so reruns, retries, and repartitioning produce
the identical sample, and a changed mix re-uses every row it keeps
(rates are nested: lowering a source's rate keeps a SUBSET of the
previous sample — useful for ablations).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: hash-bucket resolution: rates are exact multiples of 1e-6
_RESOLUTION = 1_000_000


def _bucket(id_col: str) -> Column:
    return F.pmod(F.xxhash64(F.col(id_col)), F.lit(_RESOLUTION))


def deterministic_sample(
    df: DataFrame, frac: float, id_col: str = "doc_id"
) -> DataFrame:
    """Keep ~``frac`` of rows, chosen by id hash — reproducible across
    runs, engines, and partitionings; nested across rates (a 1%
    sample is a subset of a 10% sample)."""
    return df.where(_bucket(id_col) < int(frac * _RESOLUTION))


def weighted_mix(
    df: DataFrame,
    rates: dict[str, float],
    by: str = "source",
    id_col: str = "doc_id",
    default_rate: float = 0.0,
) -> DataFrame:
    """Per-group sampling rates in one scan: keep each row iff its id
    hash falls under its group's rate. Groups absent from ``rates``
    get ``default_rate`` (0.0 = drop unknown sources — the safe
    default for a curated mix). The rate table enters the plan as a
    broadcast map lookup (a when-chain over the handful of sources a
    mix names), so the fact scan is the only data movement."""
    rate_col = None
    for k, v in rates.items():
        cond = F.col(by) == F.lit(k)
        rate_col = (
            F.when(cond, F.lit(v))
            if rate_col is None
            else rate_col.when(cond, F.lit(v))
        )
    rate_col = (
        rate_col.otherwise(F.lit(default_rate))
        if rate_col is not None
        else F.lit(default_rate)
    )
    threshold = F.ceil(rate_col * F.lit(_RESOLUTION)).cast("long")
    return df.where(_bucket(id_col) < threshold)
