"""Deterministic training-shard export — the last step of the
curation pipeline: materialize a curated (and optionally packed)
corpus as N pseudo-randomly shuffled shards a training job streams.

Why an explicit operator: pre-training data loaders consume SHARDS
(fixed-count file groups read round-robin by data-parallel workers),
and the global document order inside them must be (a) shuffled — long
runs of same-source documents bias gradients — and (b) DETERMINISTIC,
so a re-run of the export (or of one failed shard) reproduces the
exact byte stream and a training run is replayable from (corpus,
salt). ``df.orderBy(rand())`` fails both: non-reproducible and a full
global sort. The standard recipe (used by large-corpus pipelines and
matched here) is a keyed-hash permutation:

    shard(id) = h48('shard:<salt>:' || id)  mod n_shards
    pos(id)   = (h48('pos:<salt>:'   || id), id)   -- order in shard

Both are pure per-row expressions of the stable document id, so shard
membership and order are independent of the input's partitioning,
file layout, or cluster size — the property the determinism test pins
by re-deriving assignments under a hostile repartition. The hash is
the repo's ONE portable hash (operators/sampling.h48 — first 48 bits
of sha256), not xxhash64: sha256 is computed bit-identically by every
engine, so shard membership AND the exact within-shard permutation
are value-hash checkable by the DuckDB oracle (the ``shard`` /
``shard_pos`` variants of ``llm_curation_suite``) — the same
portability argument that put h48 under every sampling/mix/split
operator. sha256 costs more per row than xxhash64, but the export's
cost is its global shuffle + external sort; two extra hashes per row
ride the same scan for noise. The two hash ROLES are domain-separated
by the ``shard:`` / ``pos:`` prefixes (never derived as salt and
salt+1 — that would make epoch e's sort key equal epoch e+1's shard
hash, coupling consecutive epochs), and the salt is folded into the
hashed string, so ``salt=epoch`` yields an independent permutation
per epoch with no extra machinery — the same decorrelation posture as
operators/sampling.split_assign vs deterministic_sample.

Scale shape: one hash-partitioned exchange on ``shard`` (every row
moves once — the unavoidable cost of a global shuffle), a
within-partition sort (Tungsten external sort, spills if a shard
exceeds memory), and a partitioned write. All rows of one shard land
in ONE task (same key, same partition), so each ``shard=K`` dir holds
one parquet file whose ROW ORDER is the shard's document order. The
exchange over-provisions partitions (16x the shard count, tunable):
Spark hash-partitions on murmur3(shard) mod P, and with P == n_shards
distinct shard values collide into shared tasks (~2-3x skew on the
unlucky task's external sort — a collision does NOT break the
one-ordered-file-per-shard layout, the colliding task just writes
both shards' files, it only makes that task a straggler); at 16x the
expected colliding pairs are n/32. The over-provision is NOT free:
a user-pinned repartition count is exempt from AQE partition
coalescing, so every extra partition pays the per-task dispatch
floor — measured (SCALE_PROBE.json shard_export_width, fixed tiny
corpus): 64 → 1024 partitions cost 0.48 → 3.95 s of pure scheduling.
That floor is constant per task, so at production shard sizes
(corpus_bytes/n_shards in the GBs — the loader-appetite sizing rule)
it amortizes to noise against the external sorts; shrink
``over_provision`` when exporting many tiny shards. Corpus-growth
cost at fixed shard count is flat-linear (shard_export series,
exponent −0.16 at probe scale: one exchange, every row moves once).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.sampling import h48, h48_sql


def _role_hash(id_col: str, salt: int, role: str) -> Column:
    """h48 over ``'<role>:<salt>:<id>'`` — one definition for both
    roles so the domain-separation recipe cannot drift from its SQL
    twins below."""
    return h48(
        F.concat(F.lit(f"{role}:{salt}:"), F.col(id_col).cast("string"))
    )


def shard_sql(id_expr: str, n_shards: int, salt: int = 0) -> str:
    """DuckDB twin of the shard-membership hash — the oracle side of
    the ``shard`` variant in queries/curation.llm_curation_suite."""
    arg = f"'shard:{salt}:' || CAST({id_expr} AS VARCHAR)"
    return f"({h48_sql(arg)} % {n_shards})"


def pos_sql(id_expr: str, salt: int = 0) -> str:
    """DuckDB twin of the within-shard position hash (48-bit — exact
    in a DOUBLE, which is how the oracle melt carries it)."""
    arg = f"'pos:{salt}:' || CAST({id_expr} AS VARCHAR)"
    return h48_sql(arg)


def shard_assignments(
    df: DataFrame,
    n_shards: int,
    id_col: str = "doc_id",
    salt: int = 0,
) -> DataFrame:
    """The input plus ``shard`` (0..n_shards-1) and ``pos`` (the
    within-shard sort key). Pure per-row expressions of ``id_col`` —
    deterministic for any partitioning of ``df``; ties in the 48-bit
    position hash (collisions across distinct ids) are broken by the
    id itself, so the total order is exact, not probabilistic."""
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    return df.withColumn(
        "shard",
        F.pmod(_role_hash(id_col, salt, "shard"), F.lit(n_shards)).cast(
            "int"
        ),
    ).withColumn("pos", _role_hash(id_col, salt, "pos"))


def write_training_shards(
    df: DataFrame,
    path: str,
    n_shards: int,
    id_col: str = "doc_id",
    salt: int = 0,
    mode: str = "error",
    over_provision: int = 16,
    only_shards: list[int] | None = None,
) -> None:
    """Export ``df`` as ``{path}/shard=K/`` parquet dirs, one file per
    shard, rows in the shard's deterministic shuffled order. Every
    column of ``df`` rides along; ``pos`` is kept in the output so a
    reader (or a resumed loader) can verify/re-establish order without
    recomputing hashes. ``over_provision`` trades murmur3-collision
    skew against per-empty-task scheduling (module docstring) — the
    default suits production-sized shards; it does not affect the
    output (shard membership/order are pure hash expressions).

    ``only_shards`` is the FAILED-SHARD RETRY path the determinism
    exists for: with ``only_shards=[k, ...]`` and ``mode="overwrite"``
    only the named ``shard=K`` dirs are recomputed and replaced
    (dynamic partition overwrite, pinned as a write option so the
    session conf can't widen it to a full-table overwrite) — every
    other shard's files are untouched, and because membership/order
    are pure functions of (id, salt) the re-exported shard is
    byte-identical to what the full export wrote."""
    assigned = shard_assignments(df, n_shards, id_col=id_col, salt=salt)
    writer = assigned
    n_writing = n_shards
    if only_shards is not None:
        wanted = [int(s) for s in only_shards]
        bad = [s for s in wanted if not 0 <= s < n_shards]
        if bad or not wanted:
            # a typo'd retry must fail loudly, not commit zero rows
            # and report success while the failed shard stays broken
            raise ValueError(
                f"only_shards must be a non-empty subset of"
                f" 0..{n_shards - 1}, got {only_shards!r}"
            )
        writer = assigned.where(F.col("shard").isin(wanted))
        n_writing = len(set(wanted))
    (
        writer.repartition(max(n_writing * over_provision, 64), "shard")
        .sortWithinPartitions("shard", "pos", id_col)
        .write.mode(mode)
        # pin the one-ordered-file-per-shard invariant against session
        # conf: a caller-set spark.sql.files.maxRecordsPerFile would
        # silently split a shard across files, and the file boundary
        # scrambles order for readers without ordered=True. 0 = never
        # split; the writer option overrides the session conf.
        .option("maxRecordsPerFile", 0)
        # pinned BOTH directions (the session conf must never decide):
        # a retry replaces exactly the named shard dirs (dynamic); a
        # full overwrite truncates the whole export first (static) —
        # under a session-level dynamic conf, a full re-export with a
        # smaller n_shards would otherwise leave stale higher-numbered
        # shard dirs silently mixed into the new corpus
        .option(
            "partitionOverwriteMode",
            "dynamic" if only_shards is not None else "static",
        )
        .partitionBy("shard")
        .parquet(path)
    )


def read_training_shards(
    spark: SparkSession,
    path: str,
    shard: int | None = None,
    ordered: bool = False,
    id_col: str = "doc_id",
) -> DataFrame:
    """Read the exported shards (all, or one by number).

    The export-order guarantee is FILE-level: within one shard's
    single file, parquet ROW order is the export order — but Spark
    splits files larger than spark.sql.files.maxPartitionBytes into
    several read partitions whose order follows split size, not file
    offset, so a collect over a big shard does NOT stream in export
    order by itself. Pass ``ordered=True`` to re-establish the
    deterministic order with an explicit sort on the stored keys (a
    loader that interleaves shards round-robin reads each shard
    sequentially and doesn't need it)."""
    df = spark.read.parquet(path)
    if shard is not None:
        df = df.where(F.col("shard") == shard)
    if ordered:
        df = df.orderBy("shard", "pos", id_col)
    return df
