"""Corpus ingestion (sources/corpus.py): raw text dirs and JSON-lines
land in the exact documents schema, ids are stable and portable,
malformed JSONL lines are quarantined (not silently dropped), and the
ingested frame feeds the engine end to end."""

from __future__ import annotations

import json

from kcbdml9_big_data_processing_spark.sources.corpus import (
    DOCUMENTS_SCHEMA,
    ingest_jsonl,
    ingest_text_dir,
)


from conftest import h48_py as _h48_py


def test_ingest_text_dir_one_doc_per_file(spark, tmp_path):
    d = tmp_path / "crawl"
    d.mkdir()
    contents = {
        "a.txt": "alpha bravo charlie",
        "b.txt": "multi\nline\ndocument here",
    }
    for name, body in contents.items():
        (d / name).write_text(body)
    # zero-byte files carry no document: Spark's text source emits no
    # row for them (pinned here so the behavior is a contract)
    (d / "empty.txt").write_text("")

    docs = ingest_text_dir(spark, str(d))
    # same names and types (nullability metadata differs: the file
    # path and length are provably non-null, which is strictly better)
    assert [(f.name, f.dataType) for f in docs.schema] == [
        (f.name, f.dataType) for f in DOCUMENTS_SCHEMA
    ]
    rows = {r["source"].rsplit("/", 1)[-1]: r for r in docs.collect()}
    assert set(rows) == set(contents)
    for name, body in contents.items():
        r = rows[name]
        assert r["text"] == body
        assert r["n_chars"] == len(body)
        assert r["lang"] is None
        # portable id: 48-bit sha256 of the full source path
        assert r["doc_id"] == _h48_py(r["source"])
    # stable across re-ingestion
    again = {r["doc_id"] for r in ingest_text_dir(spark, str(d)).collect()}
    assert again == {r["doc_id"] for r in rows.values()}


def test_ingest_jsonl_policy_and_quarantine(spark, tmp_path):
    p = tmp_path / "corpus.jsonl"
    dup_line = json.dumps({"text": "repeated boilerplate line"})
    lines = [
        # fully specified
        json.dumps(
            {
                "doc_id": 7,
                "text": "alpha bravo",
                "lang": "en",
                "source": "s1",
                "n_chars": 11,
            }
        ),
        # minimal: doc_id/n_chars derived, lang/source null
        json.dumps({"text": "charlie delta echo"}),
        # malformed JSON -> quarantined verbatim
        '{"text": "broken',
        # parses but has no text -> quarantined VERBATIM, unknown
        # fields preserved (the line must stay re-driable)
        json.dumps({"source": "s2", "meta": {"keep": "me"}}),
        # identical repeated lines (crawl boilerplate): ONE survives,
        # the others quarantine as duplicate_doc_id — doc_id stays
        # unique engine-wide instead of exact-dedup silently keeping
        # both copies of the same id
        dup_line,
        dup_line,
        # explicit id collision on a DIFFERENT text: deterministic
        # survivor (min text), loser quarantined verbatim
        json.dumps({"doc_id": 7, "text": "zzz later text"}),
    ]
    p.write_text("\n".join(lines) + "\n")

    cleanup = []
    docs, rejects = ingest_jsonl(spark, str(p), cleanup=cleanup)
    assert docs.schema == DOCUMENTS_SCHEMA
    got = {r["doc_id"]: r for r in docs.collect()}
    assert got[7]["lang"] == "en" and got[7]["n_chars"] == 11
    assert got[7]["text"] == "alpha bravo"  # min-text survivor
    derived = _h48_py("charlie delta echo")
    assert got[derived]["n_chars"] == len("charlie delta echo")
    assert got[derived]["source"] is None
    dup_id = _h48_py("repeated boilerplate line")
    assert dup_id in got
    assert len(got) == 3
    # doc_id uniqueness is the enforced invariant
    assert docs.count() == docs.select("doc_id").distinct().count()

    rej = [(r["reason"], r["raw"]) for r in rejects.collect()]
    by_reason: dict[str, list[str]] = {}
    for reason, raw in rej:
        by_reason.setdefault(reason, []).append(raw)
    assert by_reason["malformed"] == ['{"text": "broken']
    # verbatim: the unknown field survives in the quarantined line
    assert "meta" in by_reason["missing_text"][0]
    dups = sorted(by_reason["duplicate_doc_id"])
    assert dup_line in dups
    assert any("zzz later text" in r for r in dups)
    assert len(rej) == 4
    for f in cleanup:
        f.unpersist()


def test_ingested_corpus_feeds_the_engine(spark, tmp_path):
    """The ingested frame IS a documents table: the curator and the
    quality classifier run on it unchanged."""
    from kcbdml9_big_data_processing_spark.jobs.training_data import (
        TrainingDataCurator,
    )
    from kcbdml9_big_data_processing_spark.operators.quality_model import (
        classifier_score,
        default_weights,
    )

    d = tmp_path / "crawl"
    d.mkdir()
    body = "the quick brown fox jumps over the lazy dog again and again"
    (d / "one.txt").write_text(body)
    (d / "two.txt").write_text(body)  # exact duplicate content
    (d / "three.txt").write_text("an entirely different document with words")

    docs = ingest_text_dir(spark, str(d))
    kept, decisions = TrainingDataCurator().run(docs)
    reasons = sorted(r["reason"] for r in decisions.collect())
    assert reasons == ["exact_dup", "kept", "kept"]
    assert classifier_score(docs, default_weights(32)).count() == 3


def test_cli_ingest_lands_docs_and_rejects(spark, tmp_path):
    """The ingest subcommand writes the documents parquet (text-dir
    mode) and the (docs, rejects) pair (jsonl mode) from the shell."""
    from kcbdml9_big_data_processing_spark.__main__ import _ingest_main

    d = tmp_path / "crawl"
    d.mkdir()
    (d / "a.txt").write_text("alpha bravo charlie")
    out = str(tmp_path / "docs")
    assert _ingest_main(["--text-dir", str(d), "--out", out], spark=spark) == 0
    got = spark.read.parquet(out)
    assert got.count() == 1 and "doc_id" in got.columns

    p = tmp_path / "c.jsonl"
    p.write_text(json.dumps({"text": "delta echo"}) + "\n" + '{"broken\n')
    out2 = str(tmp_path / "docs2")
    assert _ingest_main(["--jsonl", str(p), "--out", out2], spark=spark) == 0
    assert spark.read.parquet(out2).count() == 1
    assert spark.read.parquet(out2 + "_rejects").count() == 1


def test_epoch_prefix_namespaces_ids(spark, tmp_path):
    """r13: epoch=(batch sequence) namespaces ingested ids as
    (epoch << 48) + h48 so successive batches satisfy
    run_incremental's monotonic-id precondition. Default epoch=0 is
    bit-identical to the unprefixed ids; every epoch-e id precedes
    every epoch-(e+1) id; both ingest fronts agree; out-of-range
    epochs are rejected."""
    import json

    import pytest as _pytest

    from kcbdml9_big_data_processing_spark.sources.corpus import (
        ingest_jsonl,
        ingest_text_dir,
    )

    raw = tmp_path / "b.jsonl"
    raw.write_text(
        "\n".join(json.dumps({"text": t}) for t in ("alpha doc", "beta doc"))
        + "\n"
    )
    ids0 = {r["doc_id"] for r in ingest_jsonl(spark, str(raw))[0].collect()}
    ids0_again = {
        r["doc_id"] for r in ingest_jsonl(spark, str(raw), epoch=0)[0].collect()
    }
    assert ids0 == ids0_again  # epoch=0 is the identity
    ids1 = {
        r["doc_id"] for r in ingest_jsonl(spark, str(raw), epoch=1)[0].collect()
    }
    ids2 = {
        r["doc_id"] for r in ingest_jsonl(spark, str(raw), epoch=2)[0].collect()
    }
    assert ids1 == {i + (1 << 48) for i in ids0}  # pure namespace shift
    assert max(ids0) < min(ids1) < max(ids1) < min(ids2)  # monotone epochs

    d = tmp_path / "txt"
    d.mkdir()
    (d / "a.txt").write_text("gamma doc")
    t0 = {r["doc_id"] for r in ingest_text_dir(spark, str(d)).collect()}
    t3 = {r["doc_id"] for r in ingest_text_dir(spark, str(d), epoch=3).collect()}
    assert t3 == {i + (3 << 48) for i in t0}

    for bad in (-1, 1 << 15):
        with _pytest.raises(ValueError, match="epoch"):
            ingest_jsonl(spark, str(raw), epoch=bad)


def test_content_doc_ids_refuses_null_text_at_execution(spark):
    """sha2(NULL) would stamp a NULL id, which the uniqueness pass then
    MERGES across distinct null-text rows (null groups as one key —
    silent row loss) and every downstream doc_id join drops invisibly;
    content_doc_ids instead raises when the id expression first
    EXECUTES, telling the caller to quarantine first (the ingest_jsonl
    rejects posture). With unique=True (default) the uniqueness pass's
    violation-set count executes at call time (r15: the enforced
    broadcast contract), so the refusal surfaces right at the call;
    with unique=False construction stays lazy and the refusal waits
    for the first action."""
    import pytest

    from kcbdml9_big_data_processing_spark.sources.corpus import (
        content_doc_ids,
    )

    dirty = spark.createDataFrame(
        [("a b c", 1), (None, 2)], "text string, tag long"
    )
    with pytest.raises(Exception, match="NULL text"):
        content_doc_ids(dirty, epoch=1).collect()
    lazy = content_doc_ids(dirty, epoch=1, unique=False)  # no error yet
    with pytest.raises(Exception, match="NULL text"):
        lazy.collect()


def test_ingest_csv_quarantine_and_defaults(spark, tmp_path):
    """CSV front: pinned types (never inferred), PERMISSIVE quarantine
    byte-verbatim with the same three reasons as JSONL, defaults
    (content-h48 doc_id, length n_chars) derived identically, epoch
    prefix applied to explicit AND derived ids, header line dropped."""
    from kcbdml9_big_data_processing_spark.sources.corpus import ingest_csv

    p = tmp_path / "c.csv"
    p.write_text(
        "doc_id,text,n_chars\n"  # header
        "7,hello world from csv,20\n"  # explicit id
        ",a second document here,\n"  # derived id + n_chars
        ",a second document here,\n"  # same line again -> dup id
        "x,bad id type,3\n"  # type mismatch -> malformed verbatim
        "9,,4\n"  # missing text
    )
    docs, rejects = ingest_csv(
        spark,
        str(p),
        columns=("doc_id", "text", "n_chars"),
        header=True,
        epoch=1,
    )
    rows = {r["doc_id"]: r for r in docs.collect()}
    assert set(rows) == {
        (1 << 48) + 7,
        (1 << 48) + _h48_py("a second document here"),
    }
    got = rows[(1 << 48) + 7]
    assert (got["text"], got["n_chars"], got["lang"], got["source"]) == (
        "hello world from csv", 20, None, None,
    )
    derived = rows[(1 << 48) + _h48_py("a second document here")]
    assert derived["n_chars"] == len("a second document here")
    rej = {r["raw"]: r["reason"] for r in rejects.collect()}
    assert rej == {
        ",a second document here,": "duplicate_doc_id",
        "x,bad id type,3": "malformed",
        "9,,4": "missing_text",
    }

    # bad layouts refuse at construction
    import pytest

    with pytest.raises(ValueError, match="text"):
        ingest_csv(spark, str(p), columns=("doc_id",))
    with pytest.raises(ValueError, match="unknown"):
        ingest_csv(spark, str(p), columns=("text", "body"))
    with pytest.raises(ValueError, match="duplicate"):
        ingest_csv(spark, str(p), columns=("text", "text"))


def test_ingest_csv_tsv_and_curator_composition(spark, tmp_path):
    """TSV separator, quoted embedded separators, and the landed frame
    feeds the curator unchanged (the composition every ingest front
    must satisfy)."""
    from kcbdml9_big_data_processing_spark.jobs.training_data import (
        CurationConfig,
        TrainingDataCurator,
    )
    from kcbdml9_big_data_processing_spark.sources.corpus import ingest_csv

    good = (
        "an entirely different document about spark shuffles and "
        "partition pruning with plenty of distinct words to pass "
        "every quality heuristic in the default configuration"
    )
    tsv = tmp_path / "c.tsv"
    tsv.write_text(f"{good}\ten\ntiny\ten\n")
    docs, rejects = ingest_csv(
        spark, str(tsv), columns=("text", "lang"), sep="\t"
    )
    assert rejects.count() == 0
    assert {(r["text"], r["lang"]) for r in docs.collect()} == {
        (good, "en"), ("tiny", "en"),
    }
    kept, dec = TrainingDataCurator(CurationConfig()).run(docs)
    assert {r["text"] for r in kept.collect()} == {good}
    assert {r["reason"] for r in dec.collect()} == {"kept", "quality"}

    # quoted field with an embedded separator survives intact
    q = tmp_path / "q.csv"
    q.write_text('"alpha, beta gamma delta epsilon zeta",en\n')
    docs2, rej2 = ingest_csv(spark, str(q), columns=("text", "lang"))
    assert rej2.count() == 0
    assert docs2.first()["text"] == "alpha, beta gamma delta epsilon zeta"


def test_cli_ingest_csv(spark, tmp_path):
    """The --csv front door: TSV sep escape, rejects parquet, epoch;
    bad --csv-columns exits 2 with the library's message."""
    from kcbdml9_big_data_processing_spark.__main__ import _ingest_main

    p = tmp_path / "c.tsv"
    p.write_text("text\tlang\nhello shell world from tsv\ten\n\ten\n")
    out = str(tmp_path / "docs")
    assert _ingest_main(
        ["--csv", str(p), "--out", out, "--csv-columns", "text,lang",
         "--csv-sep", "\\t", "--csv-header", "--epoch", "2"],
        spark=spark,
    ) == 0
    docs = spark.read.parquet(out)
    assert docs.count() == 1
    r = docs.first()
    assert r["text"] == "hello shell world from tsv" and r["lang"] == "en"
    assert r["doc_id"] >= (2 << 48)
    rej = spark.read.parquet(out + "_rejects")
    assert {x["reason"] for x in rej.collect()} == {"missing_text"}
    assert _ingest_main(
        ["--csv", str(p), "--out", out, "--csv-columns", "lang"],
        spark=spark,
    ) == 2
    # an out-of-range epoch exits 2 on EVERY front, not just csv
    for front in (["--csv", str(p)], ["--jsonl", str(p)],
                  ["--text-dir", str(p.parent)]):
        assert _ingest_main(
            [*front, "--out", out, "--epoch", str(1 << 15)], spark=spark
        ) == 2


def test_unique_doc_ids_text_shuffles_only_for_duplicates(spark):
    """The r13 'what's wrong #1' fix, pinned structurally: on a real
    corpus scan, unique_doc_ids' plan may carry text through a shuffle
    ONLY below the LeftSemi duplicate-id filter (the violation-set
    subset) — the full-corpus aggregation exchange moves (doc_id,
    partial count) and nothing else, and the clean path crosses no
    shuffle at all (broadcast anti join). The dataType-aware helper
    matters here: the survivor min(struct(...)) hides text inside an
    opaque partial-agg attribute that a column-name scan of the
    formatted plan can never see."""
    from kcbdml9_big_data_processing_spark.plans.inspect import (
        shuffle_exchanges_carrying,
    )
    from kcbdml9_big_data_processing_spark.sources.corpus import (
        unique_doc_ids,
    )
    from kcbdml9_big_data_processing_spark.sources.parquet import read_table

    from conftest import SF_SMOKE

    out = unique_doc_ids(read_table(spark, SF_SMOKE, "documents"))
    exchanges = shuffle_exchanges_carrying(out, "text")
    assert exchanges, "uniqueness plan lost its aggregation exchanges?"
    text_bearing = [dup for carries, dup in exchanges if carries]
    assert text_bearing, (
        "expected the survivor min-struct exchange (duplicate subset)"
    )
    assert all(text_bearing), (
        "a text-carrying exchange outside the LeftSemi duplicate"
        " filter: full-corpus text is riding a shuffle again"
    )
    # r16 (r15 ADVICE): below the cap the duplicate-id detection ran
    # ONCE at call time (take) and both joins read the fetched ids as
    # a LOCAL relation — the detection aggregation (the old text-free
    # exchange) must no longer re-execute inside the consuming plan
    assert all(carries for carries, _ in exchanges), (
        "the dup-id detection exchange is back in the lazy plan: the"
        " corpus aggregation re-executes on every downstream action"
    )
    from kcbdml9_big_data_processing_spark.plans.inspect import (
        physical_plan,
    )

    plan = physical_plan(out, "simple")
    # createDataFrame(rows) parallelizes, so the fetched set shows as
    # an ExistingRDD scan (a LocalTableScan if Spark ever constant-
    # folds it) — either way it is driver-local data, not a replay of
    # the corpus aggregation
    assert "Scan ExistingRDD[__dup_id" in plan or "LocalTableScan" in plan, (
        "expected the fetched violation set as driver-local data"
    )


def test_unique_doc_ids_survivor_rule_unchanged(spark):
    """The hash-first rewrite keeps the survivor rule bit-identical:
    lexicographic min over the struct of non-id columns, singleton ids
    untouched — including a duplicate group whose texts tie and only
    a LATER column breaks the tie."""
    from kcbdml9_big_data_processing_spark.sources.corpus import (
        unique_doc_ids,
    )

    df = spark.createDataFrame(
        [
            (1, "bbb", "en"),
            (1, "aaa", "fr"),   # min text wins
            (2, "solo", "de"),  # singleton passes through
            (3, "same", "zz"),
            (3, "same", "aa"),  # text ties -> lang breaks it
        ],
        "doc_id long, text string, lang string",
    )
    got = sorted(
        tuple(r) for r in unique_doc_ids(df).collect()
    )
    assert got == [(1, "aaa", "fr"), (2, "solo", "de"), (3, "same", "aa")]
    assert unique_doc_ids(df.select("doc_id")).count() == 3


def test_ingest_csv_header_matches_crlf_and_padded(spark, tmp_path):
    """r13 ADVICE: header=True must drop a CRLF-terminated header and
    one written with per-field whitespace ('text, lang') — byte
    equality missed both and the header landed silently as a junk
    document (all-string layouts have no type mismatch to flag it)."""
    from kcbdml9_big_data_processing_spark.sources.corpus import ingest_csv

    p = tmp_path / "crlf.csv"
    with open(p, "wb") as f:
        f.write(b"text, lang\r\n")
        f.write(b"a real document body,en\r\n")
    docs, rejects = ingest_csv(
        spark, str(p), columns=("text", "lang"), header=True
    )
    got = docs.collect()
    assert len(got) == 1
    # the \r is a data artifact of CRLF lines, not the header test's
    # concern — the point is the header row produced NO document
    assert got[0]["text"].startswith("a real document body")
    assert not [r for r in got if r["text"].startswith("text")]


def test_cli_ingest_csv_warns_when_header_never_matched(
    spark, tmp_path, capsys
):
    """r13 ADVICE, CLI side: --csv-header with a layout that matches
    no line (wrong column order here) warns to stderr instead of
    silently ingesting the real header as a document."""
    from kcbdml9_big_data_processing_spark.__main__ import _ingest_main

    p = tmp_path / "h.csv"
    p.write_text("lang,text\nen,a body of text\n")
    out = str(tmp_path / "docs_parquet")
    rc = _ingest_main(
        [
            "--csv", str(p), "--out", out,
            "--csv-columns", "text,lang", "--csv-header",
        ],
        spark=spark,
    )
    assert rc == 0
    err = capsys.readouterr().err
    assert "no line matched the header" in err

    # and the matching layout stays quiet
    rc = _ingest_main(
        [
            "--csv", str(p), "--out", out,
            "--csv-columns", "lang,text", "--csv-header",
        ],
        spark=spark,
    )
    assert rc == 0
    assert "no line matched" not in capsys.readouterr().err


def test_unique_doc_ids_broadcast_cap_falls_back_and_matches(
    spark, capsys
):
    """r14 verdict 'what's wrong' #1: the broadcast contract is now
    ENFORCED — a mostly-duplicate frame (violation set past the cap)
    warns loudly, drops the broadcast hint (no BroadcastHashJoin in
    the plan), and STILL collapses to the identical survivor set the
    hinted path produces: the fallback degrades the shuffle shape,
    never the semantics."""
    from kcbdml9_big_data_processing_spark.plans.inspect import (
        has_broadcast_hash_join,
    )
    from kcbdml9_big_data_processing_spark.sources.corpus import (
        unique_doc_ids,
    )

    df = spark.createDataFrame(
        [
            (1, "bbb"), (1, "aaa"),   # dup group -> min text
            (2, "solo"),              # singleton
            (3, "zz"), (3, "aa"), (3, "mm"),  # dup group
        ],
        "doc_id long, text string",
    )
    hinted = sorted(tuple(r) for r in unique_doc_ids(df).collect())
    capsys.readouterr()  # discard anything from the hinted run
    fallback_df = unique_doc_ids(df, max_broadcast_ids=1)
    err = capsys.readouterr().err
    assert "falling back to shuffle joins" in err
    assert not has_broadcast_hash_join(fallback_df), (
        "the over-cap path must not keep the broadcast hint"
    )
    assert sorted(tuple(r) for r in fallback_df.collect()) == hinted
    assert hinted == [(1, "aaa"), (2, "solo"), (3, "aa")]
    # the fallback keeps the dup-id detection as LINEAGE (it must
    # re-execute per join) — its text-free exchange stays in the plan.
    # Inspect a FRESH frame: collect() above finalized the adaptive
    # plan, which hides the pre-AQE exchanges from the inspector.
    from kcbdml9_big_data_processing_spark.plans.inspect import (
        shuffle_exchanges_carrying,
    )

    fresh_fb = unique_doc_ids(df, max_broadcast_ids=1)
    capsys.readouterr()  # drop the repeated fallback warning
    assert any(
        not carries
        for carries, _ in shuffle_exchanges_carrying(fresh_fb, "text")
    ), "fallback lost its detection aggregation exchange"

    # under the cap the hinted plan is unchanged (the enforced
    # contract costs one pruned count, not the broadcast shape)
    assert has_broadcast_hash_join(unique_doc_ids(df))


def test_unique_doc_ids_cleanup_persists_dup_ids(spark):
    """The cache-handover seam, r16 shape (r15 ADVICE): below the cap
    there is NOTHING to persist — the take() is the one evaluation and
    both joins read the fetched ids as a local relation — so cleanup
    stays empty; on the over-cap fallback the dup-id frame IS
    persisted so the two shuffle joins read one evaluation of the
    pruned aggregation instead of two — caller unpersists; results
    identical either way. content_doc_ids threads the list through."""
    from kcbdml9_big_data_processing_spark.sources.corpus import (
        content_doc_ids,
        unique_doc_ids,
    )

    df = spark.createDataFrame(
        [(1, "bb"), (1, "aa"), (2, "solo")], "doc_id long, text string"
    )
    cleanup: list = []
    got = sorted(
        tuple(r) for r in unique_doc_ids(df, cleanup=cleanup).collect()
    )
    assert got == [(1, "aa"), (2, "solo")]
    assert cleanup == []  # small path: local relation, nothing cached

    fb: list = []
    got_fb = sorted(
        tuple(r)
        for r in unique_doc_ids(df, max_broadcast_ids=0, cleanup=fb).collect()
    )
    assert got_fb == got
    assert len(fb) == 1 and fb[0].is_cached
    for f in fb:
        f.unpersist()

    threaded: list = []
    texted = spark.createDataFrame(
        [("one document text here",), ("one document text here",)],
        "text string",
    )
    assert content_doc_ids(texted, epoch=1, cleanup=threaded).count() == 1
    assert threaded == []  # small path through the front: no cache



def test_unique_doc_ids_collapses_null_id_group(spark):
    """r14 self-review: the violation-set rewrite must keep the NULL
    id group a GROUP (eqNullSafe join keys) — a plain join key treats
    NULL != NULL, so multiple null-id rows would all pass the anti
    join where the old groupBy collapsed them to one deterministic
    survivor. The ingest fronts never emit null ids; this pins the
    public arbitrary-frame contract."""
    from kcbdml9_big_data_processing_spark.sources.corpus import (
        unique_doc_ids,
    )

    df = spark.createDataFrame(
        [(None, "bb"), (None, "aa"), (1, "x"), (None, "cc")],
        "doc_id long, text string",
    )
    got = sorted(
        ((r["doc_id"], r["text"]) for r in unique_doc_ids(df).collect()),
        key=lambda t: (t[0] is None, t[0], t[1]),
    )
    assert got == [(1, "x"), (None, "aa")]
