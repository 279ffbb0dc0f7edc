"""Skew mitigation: salted aggregation and salted joins.

First line of defense is AQE (`spark.sql.adaptive.skewJoin.enabled`,
on by default in session.py): it splits oversized shuffle partitions
at runtime with no code change — prefer it. Manual salting is for the
cases AQE can't fix:

- a single hot GROUP BY key whose partial-aggregate state still
  funnels to one reducer (AQE splits join partitions, not the final
  aggregation of one key);
- a skewed join against a dimension too big to broadcast, where the
  dim side can be replicated per salt.

Both transforms are deterministic (salt is derived by hashing a
caller-named unique column, never rand()) so results are reproducible
and testable.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    salt_col: str,
    aggs: dict[str, Column | tuple[Column, Callable[[str], Column]]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation: groupBy(keys + salt) partial, then
    groupBy(keys) merge — a hot key's rows spread over ``n_salts``
    reducers in phase 1, and phase 2 merges only ``n_salts`` rows per
    key. Only commutative, re-aggregable measures compose this way.

    ``aggs`` maps output name -> either

    - a phase-1 aggregate ``Column`` (e.g. ``F.sum("v")``,
      ``F.count(F.lit(1))``), merged in phase 2 with ``F.sum`` —
      correct ONLY for sum/count-style partials; or
    - a ``(phase1, phase2)`` tuple where ``phase2`` is the merge
      function applied to the partial column name (e.g.
      ``(F.min("v"), F.min)`` or ``(F.max("v"), F.max)``).

    Non-decomposable measures (avg, distinct counts, percentiles) must
    be rewritten by the caller (avg = salted sum / salted count);
    passing their raw aggregate here would silently sum partials, so
    prefer the tuple form whenever the measure is not a sum or count.
    """
    salt = F.pmod(F.xxhash64(F.col(salt_col)), F.lit(n_salts)).alias("__salt")
    phase1_cols: list[Column] = []
    phase2_cols: list[Column] = []
    for name, spec in aggs.items():
        if isinstance(spec, tuple):
            p1, p2 = spec
        else:
            p1, p2 = spec, F.sum
        phase1_cols.append(p1.alias(name))
        phase2_cols.append(p2(name).alias(name))
    phase1 = df.groupBy(*[F.col(k) for k in keys], salt).agg(*phase1_cols)
    return phase1.groupBy(*keys).agg(*phase2_cols)


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    salt_col: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: the fact side gets a deterministic
    salt in [0, n_salts); the dim side is replicated once per salt
    value (explode of a literal range — n_salts x |dim| rows, which is
    why the dim must be medium-sized, not fact-sized); the join key
    becomes (key, salt), so one hot key's rows land on n_salts
    reducers instead of one.

    Only fact-preserving join types are supported: replicating the dim
    side means a right/full outer join would emit each unmatched dim
    row once per salt (n_salts duplicated null-extended rows), so those
    are rejected.
    """
    safe = {"inner", "left", "left_outer", "leftouter"}
    if how.lower().replace("_", "") not in {h.replace("_", "") for h in safe}:
        raise ValueError(
            f"salted_join supports {sorted(safe)} only; {how!r} would "
            "duplicate unmatched dim rows once per salt"
        )
    salted_fact = fact.withColumn(
        "__salt", F.pmod(F.xxhash64(F.col(salt_col)), F.lit(n_salts))
    )
    replicated_dim = dim.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).withColumn("__salt", F.col("__salt").cast("long"))
    joined = salted_fact.join(
        replicated_dim,
        (salted_fact[fact_key] == replicated_dim[dim_key])
        & (salted_fact["__salt"] == replicated_dim["__salt"]),
        how,
    )
    return joined.drop(replicated_dim[dim_key]).drop(
        salted_fact["__salt"]
    ).drop(replicated_dim["__salt"])
