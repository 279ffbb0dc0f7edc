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


def h48(col: Column) -> Column:
    """First 48 bits of sha256 of a string column, as a positive long —
    THE portable deterministic hash of this codebase (cross-engine:
    DuckDB computes the identical value from the identical string;
    48 bits keep conv() exact in a long). Single definition: the
    bucket below, the classifier's feature hash
    (operators/quality_model._feature_id), and corpus-ingestion ids
    (sources/corpus.py) all route through here so the recipe cannot
    drift."""
    return F.conv(F.substring(F.sha2(col, 256), 1, 12), 16, 10).cast("long")


def _bucket(id_col: str | Column, salt: str | None = None) -> Column:
    """Uniform bucket in [0, 1e6): first 48 bits of sha256 of the id,
    mod the resolution. 48 bits keep the conv() result positive-long
    exact; the decimal-string encoding is what DuckDB's sha256 sees
    too, so both engines agree bit-for-bit. ``salt`` prefixes the id
    before hashing (``"<salt>:<id>"``) so different DECISIONS over the
    same ids (sample membership vs split assignment vs per-group rank)
    draw independent uniforms — without it, a 10% sample of the
    'train' split would systematically overlap the sample keep-set."""
    col = F.col(id_col) if isinstance(id_col, str) else id_col
    id_str = col.cast("string")
    if salt is not None:
        id_str = F.concat(F.lit(f"{salt}:"), id_str)
    return F.pmod(h48(id_str), F.lit(_RESOLUTION))


def h48_sql(arg: str) -> str:
    """DuckDB twin of :func:`h48` — the portable 48-bit hash as SQL
    over an already-VARCHAR expression. Single SQL definition so the
    bucket oracle below and the shard-export oracle
    (sinks/shards.py) cannot drift from each other or from the Spark
    side."""
    return f"CAST(('0x' || substr(sha256({arg}), 1, 12)) AS BIGINT)"


def bucket_sql(id_expr: str, salt: str | None = None) -> str:
    """DuckDB twin of :func:`_bucket` — used by the registry oracle."""
    arg = (
        f"CAST({id_expr} AS VARCHAR)"
        if salt is None
        else f"'{salt}:' || CAST({id_expr} AS VARCHAR)"
    )
    return f"({h48_sql(arg)} % {_RESOLUTION})"


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


#: hash salts decorrelating the three decision families (see _bucket)
SPLIT_SALT = "split"
CAP_SALT = "cap"


def split_assign(
    df: DataFrame,
    fractions: dict[str, float],
    id_col: str = "doc_id",
    salt: str = SPLIT_SALT,
) -> DataFrame:
    """Deterministic train/val/test assignment: add a ``split`` column
    mapping each row to the named partition whose cumulative bucket
    range its (salted) id hash falls in. Pure per-row predicate — no
    shuffle, reproducible across runs/engines/partitionings, and
    stable under corpus growth (a doc's split never changes when other
    docs arrive, the property a random assignment lacks). Fractions
    are applied in dict order; if they sum below 1.0 the remainder of
    the hash space is dropped (rows get a null split and are filtered)
    — summing to 1.0 partitions the input exactly. The salt
    decorrelates split assignment from sample membership so
    ``deterministic_sample`` of one split stays unbiased."""
    bucket = _bucket(id_col, salt)
    assign = None
    cum = 0.0
    for name, frac in fractions.items():
        cum += frac
        cond = bucket < F.lit(_threshold(cum))
        assign = (
            F.when(cond, F.lit(name))
            if assign is None
            else assign.when(cond, F.lit(name))
        )
    if assign is None:
        raise ValueError("fractions must name at least one split")
    return df.withColumn("split", assign).where(F.col("split").isNotNull())


def cap_per_group(
    df: DataFrame,
    n: int,
    by: str = "source",
    id_col: str = "doc_id",
    salt: str = CAP_SALT,
) -> DataFrame:
    """Keep at most ``n`` rows per group, chosen by (salted) id-hash
    order — the "cap every crawl domain at N documents" mixing
    primitive. Hash order makes the kept subset a uniform,
    deterministic draw (and nested: cap 10 keeps a subset of cap 20);
    the id tie-break makes it total. One shuffle on the group key, and
    the row_number window plans a partial top-n per map partition
    (WindowGroupLimit) so the exchange carries at most n rows per
    group per partition regardless of group skew. Adds ``cap_rank``
    (1-based position in the group's hash order)."""
    from pyspark.sql import Window

    w = Window.partitionBy(by).orderBy(_bucket(id_col, salt), F.col(id_col))
    return (
        df.withColumn("cap_rank", F.row_number().over(w))
        .where(F.col("cap_rank") <= n)
    )
