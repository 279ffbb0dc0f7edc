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


_token = st.sampled_from(
    ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta"]
)
_doc = st.lists(_token, min_size=1, max_size=12).map(" ".join)


def _py_shingles(text: str) -> set[str]:
    """Pure-Python twin of queries/dedup.shingle_docs' word-3-gram
    shingling (sequence floor 1: a short doc has one partial gram)."""
    toks = text.strip().split()
    n = len(toks)
    return {" ".join(toks[j : j + 3]) for j in range(max(n - 2, 1))}


@given(texts=st.lists(_doc, min_size=2, max_size=10))
@_settings
def test_exact_jaccard_pairs_match_python_brute_force(spark, texts):
    """_exact_jaccard_pairs on ARBITRARY small corpora equals a pure
    Python all-pairs Jaccard over the same shingle definition — the
    blocked formulation is exact on inputs the fixed oracle corpus
    never shaped (heavy repeats, shared vocabulary, 1-2-token docs)."""
    from kcbdml9_big_data_processing_spark.queries.dedup import (
        _JACCARD_MIN,
        _exact_jaccard_pairs,
        shingle_docs,
    )

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    prepped = shingle_docs(docs).persist()
    prepped.count()
    got = {
        (r.doc_a, r.doc_b, round(r.jaccard, 12))
        for r in _exact_jaccard_pairs(prepped).collect()
    }
    prepped.unpersist()

    sh = [_py_shingles(t) for t in texts]
    want = set()
    for a in range(len(texts)):
        for b in range(a + 1, len(texts)):
            inter = len(sh[a] & sh[b])
            uni = len(sh[a] | sh[b])
            j = inter / uni
            if j >= _JACCARD_MIN:
                want.add((a, b, round(j, 12)))
    assert got == want


_edge = st.tuples(
    st.integers(min_value=0, max_value=14), st.integers(min_value=0, max_value=14)
).filter(lambda e: e[0] != e[1])


@given(edges=st.lists(_edge, min_size=0, max_size=20))
@_settings
def test_connected_components_match_union_find(spark, edges):
    """connected_components on ARBITRARY small graphs equals a pure
    Python union-find min-label answer — chains, cycles, multi-edges,
    self-symmetric duplicates, and isolated nodes all land on the
    smallest reachable id."""
    from kcbdml9_big_data_processing_spark.queries.dedup import (
        connected_components,
    )

    n_nodes = 15
    nodes = spark.createDataFrame([(i,) for i in range(n_nodes)], "doc_id long")
    pairs = spark.createDataFrame(
        [(min(a, b), max(a, b)) for a, b in edges] or [(0, 0)],
        "doc_a long, doc_b long",
    )
    if not edges:
        pairs = pairs.where("doc_a <> doc_a")  # empty frame, same schema
    got = {
        (r.doc_id, r.canonical_id)
        for r in connected_components(nodes, pairs).collect()
    }

    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {(i, find(i)) for i in range(n_nodes)}
    assert got == want


#: hostile-whitespace text: tabs/newlines/CR/VT/NBSP interleaved with
#: words — exactly the inputs where a naive Python twin (Unicode
#: strip/\s) diverges from the engine tokenizer (space-only trim +
#: ASCII \s)
_hostile_doc = st.lists(
    st.sampled_from(["alpha", "beta", "g9", "\t", "\n", "\r", "\x0b", "\xa0", " ", ""]),
    min_size=0,
    max_size=12,
).map(" ".join)


@given(
    rows=st.lists(
        st.tuples(_hostile_doc, st.integers(min_value=0, max_value=1)),
        min_size=1,
        max_size=10,
    ),
)
@_settings
def test_train_classifier_bit_matches_twin_on_arbitrary_corpora(spark, rows):
    """One gradient pass of the distributed trainer on ARBITRARY
    (text, label) corpora produces the IDENTICAL integer weight list
    as the pure-Python twin — the fixed-point quantize-before-
    aggregate design makes the whole trajectory exact, so the property
    is equality, not tolerance. The alphabet interleaves tabs,
    newlines, CR, VT, NBSP, empty strings, and padded spaces: the
    engine tokenizer is space-only trim + ASCII \\s, and the twin must
    mirror it exactly (_toks_py) — a Unicode-wide strip()/re \\s twin
    fails this property on the first tab."""
    from kcbdml9_big_data_processing_spark.operators.quality_model import (
        train_classifier,
        train_classifier_py,
    )

    df = spark.createDataFrame(rows, "text string, label int")
    got = train_classifier(df, dim=16, iters=1, lr_num=1 << 16)
    assert got == train_classifier_py(rows, dim=16, iters=1, lr_num=1 << 16)


@given(
    rows=st.lists(
        st.tuples(
            st.text(alphabet="ab ", min_size=0, max_size=8),
            st.integers(min_value=0, max_value=100),
        ),
        min_size=1,
        max_size=25,
    )
)
@_settings
def test_content_doc_ids_unique_and_partition_invariant(spark, rows):
    """content_doc_ids' uniqueness enforcement is DETERMINISTIC under
    any partitioning and input order: one row per (epoch<<48)+h48(text)
    id, survivor = lexicographic minimum over the struct of remaining
    columns — verified against a pure-Python twin on arbitrary inputs
    (the tiny alphabet makes duplicate texts likely). The survivor rule
    is the invariant the review fix claimed; this is its pin."""
    from conftest import h48_py

    from kcbdml9_big_data_processing_spark.sources.corpus import (
        content_doc_ids,
    )

    want: dict[int, tuple] = {}
    for text, tag in rows:
        i = (3 << 48) + h48_py(text)
        cand = (text, tag)
        if i not in want or cand < want[i]:
            want[i] = cand
    expect = sorted((i, t, g) for i, (t, g) in want.items())

    df = spark.createDataFrame(rows, "text string, tag long")
    for frame in (df, df.repartition(5), df.orderBy(F.desc("tag"))):
        out = content_doc_ids(frame, epoch=3)
        got = sorted(
            (r["doc_id"], r["text"], r["tag"]) for r in out.collect()
        )
        assert got == expect
