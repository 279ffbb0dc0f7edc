"""Deterministic cross-engine aggregate arithmetic.

Floating-point sums are order-dependent, and Spark and DuckDB
aggregate in different orders — so ``SUM(double)`` differs in the last
bits between engines, which breaks exact value-hash comparison against
the DuckDB oracle. These helpers make double aggregation exact and
order-independent in BOTH engines:

    fixed-point:  floor(x * 10^s)  -> BIGINT   (IEEE multiply + floor:
                  bit-identical in any IEEE-754 engine)
    sum BIGINT                                  (exact, order-free)
    -> DOUBLE, / 10^s                           (deterministic rounding)

Every Spark-side helper has a ``*_sql`` twin that renders the
equivalent DuckDB SQL, so a query and its oracle share arithmetic by
construction.

``bucket_start`` mirrors Spark's ``window(ts, dur).start`` (epoch-
aligned tumbling windows) as integer epoch math, for oracle SQL.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: default fixed-point scale: 6 decimal digits
DEFAULT_SCALE = 6


def _pow10(scale: int) -> float:
    return float(10**scale)


def dsum(col: Column | str, scale: int = DEFAULT_SCALE) -> Column:
    """Order-independent SUM over a double column, as double.

    Values are truncated to ``scale`` decimal digits first; keep
    |x| * 10^scale well under 2^63 / row_count.
    """
    c = F.col(col) if isinstance(col, str) else col
    fixed = F.floor(c * F.lit(_pow10(scale)))  # floor(double) -> LONG in Spark
    return F.sum(fixed).cast("double") / F.lit(_pow10(scale))


def davg(col: Column | str, scale: int = DEFAULT_SCALE) -> Column:
    """Order-independent AVG over a double column, as double."""
    c = F.col(col) if isinstance(col, str) else col
    fixed = F.floor(c * F.lit(_pow10(scale)))
    return (F.sum(fixed).cast("double") / F.lit(_pow10(scale))) / F.count(c).cast(
        "double"
    )


def dsum_sql(expr: str, scale: int = DEFAULT_SCALE) -> str:
    """DuckDB SQL equivalent of :func:`dsum` over SQL expression ``expr``."""
    p = 10**scale
    return (
        f"(CAST(CAST(SUM(CAST(FLOOR(({expr}) * {p}.0) AS BIGINT)) AS BIGINT) "
        f"AS DOUBLE) / {p}.0)"
    )


def davg_sql(expr: str, scale: int = DEFAULT_SCALE) -> str:
    """DuckDB SQL equivalent of :func:`davg`."""
    return f"({dsum_sql(expr, scale)} / CAST(COUNT({expr}) AS DOUBLE))"


def epoch_millis(ts: Column | str) -> Column:
    """Epoch milliseconds of a timestamp column, robust to BOTH
    ``TIMESTAMP`` and ``TIMESTAMP_NTZ`` inputs — and, for NTZ, to the
    consumer's session timezone.

    ``F.unix_millis`` rejects TIMESTAMP_NTZ (DATATYPE_MISMATCH), and
    the driver's events.parquet has shipped ``ts`` as both types across
    versions. ``unix_millis(cast("timestamp"))`` would work but is
    SESSION-TZ-DEPENDENT on NTZ input (the cast interprets the naive
    value in the session zone — measured +5 h under America/New_York),
    and external drivers own their own sessions. ``timestamp_diff``
    against an NTZ epoch anchor is pure naive-datetime arithmetic:
    exact under ANY session timezone for NTZ input, which is exactly
    DuckDB's ``epoch_ms(ts)`` (naive-as-UTC). For the legacy
    TIMESTAMP input the anchor coerces via the session zone, so that
    path is exact under the UTC sessions this package builds
    (session.py) — the same guarantee as before, now one-sided instead
    of both-sided.
    """
    c = F.col(ts) if isinstance(ts, str) else ts
    anchor = F.lit("1970-01-01 00:00:00").cast("timestamp_ntz")
    return F.timestamp_diff("MILLISECOND", anchor, c)


def epoch_micros(ts: Column | str) -> Column:
    """Epoch microseconds — full timestamp precision; same type and
    timezone robustness story as :func:`epoch_millis`."""
    c = F.col(ts) if isinstance(ts, str) else ts
    anchor = F.lit("1970-01-01 00:00:00").cast("timestamp_ntz")
    return F.timestamp_diff("MICROSECOND", anchor, c)


def bucket_start(ts: Column | str, seconds: int) -> Column:
    """Tumbling-window start (epoch-aligned), equal to
    ``F.window(ts, f'{seconds} seconds').start`` — usable where the
    struct-producing ``window()`` is inconvenient."""
    c = F.col(ts) if isinstance(ts, str) else ts
    epoch = F.unix_timestamp(c)
    return F.timestamp_seconds(F.floor(epoch / F.lit(seconds)) * F.lit(seconds))


def bucket_start_sql(expr: str, seconds: int) -> str:
    """DuckDB SQL for the same epoch-aligned tumbling-window start.

    Pure integer millisecond arithmetic, with an explicit floored
    modulus ``((a % m) + m) % m`` so pre-1970 (negative-epoch)
    timestamps bucket identically to Spark's floor-aligned windows —
    DuckDB's ``//`` and ``%`` truncate toward zero, which would round
    negative epochs the wrong way.
    """
    ms = seconds * 1000
    e = f"epoch_ms({expr})"
    return f"make_timestamp(({e} - ((({e} % {ms}) + {ms}) % {ms})) * 1000)"
