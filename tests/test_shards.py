"""Deterministic training-shard export (sinks/shards.py): shard
membership and within-shard order are pure functions of (doc_id,
salt) — partition-layout-independent, replayable, salt-decorrelated —
and the written layout is one ordered file per shard that reconstructs
the input exactly.
"""

from __future__ import annotations

import glob

import pytest
from pyspark.sql import functions as F

from kcbdml9_big_data_processing_spark.sinks.shards import (
    read_training_shards,
    shard_assignments,
    write_training_shards,
)
from kcbdml9_big_data_processing_spark.sources.parquet import read_table

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return read_table(spark, SF, "documents").select("doc_id", "text")


def test_assignments_partition_layout_independent(spark):
    docs = _docs(spark)
    base = {
        r["doc_id"]: (r["shard"], r["pos"])
        for r in shard_assignments(docs, 8, salt=3).collect()
    }
    hostile = {
        r["doc_id"]: (r["shard"], r["pos"])
        for r in shard_assignments(
            docs.repartition(13).sortWithinPartitions("text"), 8, salt=3
        ).collect()
    }
    assert base == hostile and len(base) == docs.count()
    shards = {s for s, _ in base.values()}
    assert shards == set(range(8))  # every shard populated
    # balance: keyed-hash assignment keeps shards within ~3x of the
    # mean at this corpus size (a gross skew means a broken hash)
    from collections import Counter

    counts = Counter(s for s, _ in base.values())
    assert max(counts.values()) < 3 * (len(base) / 8)


def test_salt_decorrelates_epochs(spark):
    docs = _docs(spark)
    e0 = {
        r["doc_id"]: r["shard"]
        for r in shard_assignments(docs, 8, salt=0).collect()
    }
    e1 = {
        r["doc_id"]: r["shard"]
        for r in shard_assignments(docs, 8, salt=1).collect()
    }
    moved = sum(1 for d in e0 if e0[d] != e1[d])
    # a fresh permutation reassigns ~7/8 of docs; anything above half
    # proves the epochs are decorrelated, not a shifted copy
    assert moved > len(e0) / 2


def test_written_shards_ordered_and_reconstruct(spark, tmp_path):
    docs = _docs(spark)
    path = str(tmp_path / "shards")
    write_training_shards(docs, path, n_shards=4, salt=7)

    # one data file per shard: all of a shard's rows land in one task
    for k in range(4):
        files = [
            f
            for f in glob.glob(f"{path}/shard={k}/*")
            if f.endswith(".parquet")
        ]
        assert len(files) == 1, (k, files)

    back = read_training_shards(spark, path)
    assert back.count() == docs.count()
    assert {r["doc_id"] for r in back.collect()} == {
        r["doc_id"] for r in docs.collect()
    }
    # text survives byte-for-byte
    joined = back.alias("b").join(docs.alias("d"), "doc_id")
    assert (
        joined.where(F.col("b.text") != F.col("d.text")).count() == 0
    )
    # within one shard's single FILE, parquet row order IS the export
    # order (this shard is one split at this size; big shards need
    # ordered=True — the guarantee is file-level)
    rows = read_training_shards(spark, path, shard=2).collect()
    assert rows == sorted(rows, key=lambda r: (r["pos"], r["doc_id"]))
    # the explicit ordered read gives the same stream regardless of
    # split layout
    assert (
        read_training_shards(spark, path, shard=2, ordered=True).collect()
        == rows
    )
    # and the order matches the pure assignment function
    want = [
        r["doc_id"]
        for r in shard_assignments(docs, 4, salt=7)
        .where(F.col("shard") == 2)
        .orderBy("pos", "doc_id")
        .collect()
    ]
    assert [r["doc_id"] for r in rows] == want


def test_rejects_bad_shard_count(spark):
    with pytest.raises(ValueError, match="n_shards"):
        shard_assignments(_docs(spark), 0)


def test_shard_assignment_differential_fuzz(spark):
    """Differential pin against an independent pure-Python twin
    (hashlib.sha256), beyond the DuckDB oracle: for random ids and
    salts, shard and pos must equal first-48-bits-of-sha256 over the
    exact 'shard:<salt>:<id>' / 'pos:<salt>:<id>' strings — pinning
    the h48 recipe end to end (hex substring length, base conversion,
    role prefixes, decimal id rendering)."""
    import hashlib
    import random

    rng = random.Random(12)
    ids = sorted(rng.sample(range(0, 10**12), 64))
    for salt, n_shards in [(0, 8), (7, 3), (12, 64)]:
        def h48_py(s: str) -> int:
            return int(hashlib.sha256(s.encode()).hexdigest()[:12], 16)

        want = {
            i: (
                h48_py(f"shard:{salt}:{i}") % n_shards,
                h48_py(f"pos:{salt}:{i}"),
            )
            for i in ids
        }
        df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
        got = {
            r["doc_id"]: (r["shard"], r["pos"])
            for r in shard_assignments(df, n_shards, salt=salt).collect()
        }
        assert got == want, (salt, n_shards)


def test_failed_shard_reexport_is_byte_identical(spark, tmp_path):
    """The retry path the determinism exists for: delete one shard's
    dir (a failed export task), re-export ONLY that shard with
    only_shards + mode='overwrite' — the shard comes back with the
    identical rows in the identical order, and no other shard's files
    are touched (same file paths + sizes)."""
    import glob
    import os

    docs = _docs(spark)
    path = str(tmp_path / "retry_shards")
    write_training_shards(docs, path, n_shards=4, salt=7)

    def snapshot(k):
        return sorted(
            (os.path.basename(f), os.path.getsize(f))
            for f in glob.glob(f"{path}/shard={k}/*.parquet")
        )

    before = {k: snapshot(k) for k in range(4)}
    want_rows = read_training_shards(
        spark, path, shard=2, ordered=True
    ).collect()

    import shutil

    shutil.rmtree(f"{path}/shard=2")  # the failed shard
    write_training_shards(
        docs, path, n_shards=4, salt=7, mode="overwrite", only_shards=[2]
    )

    got_rows = read_training_shards(
        spark, path, shard=2, ordered=True
    ).collect()
    assert got_rows == want_rows  # identical rows, identical order
    for k in (0, 1, 3):
        assert snapshot(k) == before[k]  # untouched siblings
    files = glob.glob(f"{path}/shard=2/*.parquet")
    assert len(files) == 1  # still one ordered file


def test_only_shards_validated_and_full_overwrite_static(spark, tmp_path):
    """r12 review pins: (a) a typo'd retry fails loudly instead of
    committing zero rows and reporting success; (b) a FULL overwrite
    stays a full truncate even under a session-level dynamic
    partition-overwrite conf — re-exporting with fewer shards must not
    leave stale higher-numbered shard dirs mixed into the corpus."""
    import os

    import pytest as _pytest

    docs = _docs(spark)
    path = str(tmp_path / "static_shards")
    write_training_shards(docs, path, n_shards=8, salt=1)
    assert os.path.isdir(f"{path}/shard=7")

    with _pytest.raises(ValueError, match="only_shards"):
        write_training_shards(
            docs, path, n_shards=4, mode="overwrite", only_shards=[5]
        )
    with _pytest.raises(ValueError, match="only_shards"):
        write_training_shards(
            docs, path, n_shards=4, mode="overwrite", only_shards=[]
        )

    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "STATIC")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        write_training_shards(docs, path, n_shards=4, salt=1, mode="overwrite")
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    # static pin held: the old shard=4..7 dirs are gone, not stale
    assert not os.path.isdir(f"{path}/shard=7")
    assert read_training_shards(spark, path).count() == docs.count()
