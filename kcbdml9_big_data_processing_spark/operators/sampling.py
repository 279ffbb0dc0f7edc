"""Deterministic sampling / dataset-mixing operators.

A training-data pipeline rarely takes sources at their natural
proportions: the mix is a per-source sampling rate (downweight the
crawl, upweight curated sources). These operators implement the
scan-parallel formulation the stratified_sample registry query's
docstring prescribes for 100 TB: a hash-mod predicate per row — no
window, no sort, no shuffle; the mixing-rate table is a broadcast.

Determinism is the point: hashing the id makes the kept set a pure
function of the ids, so reruns, retries, and repartitioning produce
the identical sample, and a changed mix re-uses every row it keeps
(rates are nested: lowering a source's rate keeps a SUBSET of the
previous sample — useful for ablations). The hash is the first 48
bits of sha256 over the decimal id string — chosen over xxhash64
because every engine computes it bit-identically (DuckDB included),
which makes the sample itself value-hash-checkable against a SQL
oracle and portable across a heterogeneous pipeline. sha256-per-row
costs more than xxhash64 but is noise next to the scan it rides on.

Both operators share ONE threshold rounding rule (half-up to the
1e-6 bucket grid, :func:`_threshold`), so the same fraction keeps the
identical id set whichever operator applies it — the nesting story
holds across them, not just within each.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: hash-bucket resolution: rates are exact multiples of 1e-6
_RESOLUTION = 1_000_000


def _bucket(id_col: str) -> Column:
    """Uniform bucket in [0, 1e6): first 48 bits of sha256 of the id,
    mod the resolution. 48 bits keep the conv() result positive-long
    exact; the decimal-string encoding is what DuckDB's sha256 sees
    too, so both engines agree bit-for-bit."""
    h48 = F.conv(
        F.substring(F.sha2(F.col(id_col).cast("string"), 256), 1, 12), 16, 10
    ).cast("long")
    return F.pmod(h48, F.lit(_RESOLUTION))


def bucket_sql(id_expr: str) -> str:
    """DuckDB twin of :func:`_bucket` — used by the registry oracle."""
    return (
        f"(CAST(('0x' || substr(sha256(CAST({id_expr} AS VARCHAR)), 1, 12))"
        f" AS BIGINT) % {_RESOLUTION})"
    )


def _threshold(frac: float) -> int:
    """Half-up rounding of a rate onto the bucket grid — the single
    rounding rule both operators use, so a given fraction keeps the
    same id set whether applied globally or per-source."""
    return int(frac * _RESOLUTION + 0.5)


def deterministic_sample(
    df: DataFrame, frac: float, id_col: str = "doc_id"
) -> DataFrame:
    """Keep ~``frac`` of rows, chosen by id hash — reproducible across
    runs, engines, and partitionings; nested across rates (a 1%
    sample is a subset of a 10% sample)."""
    return df.where(_bucket(id_col) < F.lit(_threshold(frac)))


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
    mix names), so the fact scan is the only data movement. Thresholds
    are pre-rounded per rate with the same rule as
    :func:`deterministic_sample`, so the two operators agree on every
    fraction."""
    rate_col = None
    for k, v in rates.items():
        cond = F.col(by) == F.lit(k)
        thr = F.lit(_threshold(v))
        rate_col = (
            F.when(cond, thr) if rate_col is None else rate_col.when(cond, thr)
        )
    default_thr = F.lit(_threshold(default_rate))
    threshold = (
        rate_col.otherwise(default_thr) if rate_col is not None else default_thr
    )
    return df.where(_bucket(id_col) < threshold)
