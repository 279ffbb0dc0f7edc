"""Property-based cross-engine invariants (hypothesis): the exact-
arithmetic layer must agree with DuckDB on arbitrary inputs, not just
the fixtures. Example counts are small because each example pays a
Spark job; the properties, not the volume, carry the value."""

from __future__ import annotations

import datetime as dt

import duckdb
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from kcbdml9_big_data_processing_spark.functions.exact import (
    bucket_start,
    bucket_start_sql,
    dsum,
    dsum_sql,
)

#: |x| * 10^6 must stay far below 2^63/row_count — bound the magnitude
_floats = st.floats(
    min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
)

_settings = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(vals=st.lists(_floats, min_size=1, max_size=40))
@_settings
def test_dsum_matches_duckdb_on_arbitrary_doubles(spark, vals):
    sdf = spark.createDataFrame([(v,) for v in vals], "x double")
    got = sdf.agg(dsum("x").alias("s")).first()["s"]
    want = duckdb.sql(
        f"SELECT {dsum_sql('x')} AS s FROM (SELECT unnest(?) AS x)",
        params=[vals],
    ).fetchone()[0]
    assert got == want  # repr-exact, no tolerance


@given(
    stamps=st.lists(
        st.datetimes(
            min_value=dt.datetime(1960, 1, 1),  # includes negative epochs
            max_value=dt.datetime(2100, 1, 1),
        ).map(lambda d: d.replace(microsecond=0)),
        min_size=1,
        max_size=10,
    ),
    seconds=st.sampled_from([30, 90, 300, 3600]),
)
@_settings
def test_bucket_start_matches_spark_window_and_duckdb(spark, stamps, seconds):
    df = spark.createDataFrame([(t,) for t in stamps], "ts timestamp")
    rows = df.select(
        bucket_start("ts", seconds).alias("b"),
        F.window("ts", f"{seconds} seconds").start.alias("w"),
    ).collect()
    for r in rows:
        assert r["b"] == r["w"]  # helper == Spark's own window start
    spark_buckets = sorted(r["b"] for r in rows)
    con = duckdb.connect()
    con.execute("CREATE TABLE t(ts TIMESTAMP)")
    for t in stamps:
        con.execute("INSERT INTO t VALUES (?)", [t])
    duck_buckets = sorted(
        r[0] for r in con.execute(
            f"SELECT {bucket_start_sql('ts', seconds)} FROM t"
        ).fetchall()
    )
    assert spark_buckets == duck_buckets


@given(
    texts=st.lists(
        st.text(
            alphabet=st.sampled_from(list("abz09 .,!\t")), min_size=0, max_size=30
        ),
        min_size=1,
        max_size=8,
    )
)
@_settings
def test_tokenizer_parity_on_arbitrary_text(spark, texts):
    """The shared whitespace tokenizer (queries/text._WS) must count
    identically in both engines for arbitrary spacing/punctuation."""
    sdf = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i long, s string")
    toks = F.split(F.trim(F.col("s")), r"\s+")
    got = {r["i"]: r["n"] for r in sdf.select("i", F.size(toks).alias("n")).collect()}
    con = duckdb.connect()
    for i, t in enumerate(texts):
        want = con.execute(
            "SELECT len(string_split_regex(trim(?), '\\s+'))", [t]
        ).fetchone()[0]
        assert got[i] == want, f"text={t!r}"
