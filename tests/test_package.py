"""Package import + driver-contract smoke tests.

Round-1 post-mortem: the package's own __init__ imported modules that
didn't exist and the entry stub was never filled — these tests make
that class of delivery failure impossible to miss.
"""

from __future__ import annotations

import importlib


def test_package_imports():
    pkg = importlib.import_module("kcbdml9_big_data_processing_spark")
    assert pkg is not None


def test_registry_populated():
    from kcbdml9_big_data_processing_spark.queries import QUERIES

    assert len(QUERIES) >= 20
    for name, spec in QUERIES.items():
        assert callable(spec.fn), name


def test_registry_names_match_functions():
    """Each registration must capture the function it names. Guards
    against the silent decorator-capture bug: inserting a helper def
    between ``@register("x", ...)`` and ``def x(...)`` registers the
    HELPER as query x — every driver row for x then runs the wrong
    code (caught live in round 5 when dedup_clusters briefly
    registered a checkpoint helper)."""
    from kcbdml9_big_data_processing_spark.queries import QUERIES

    for name, spec in QUERIES.items():
        assert spec.fn.__name__ == name, (
            f"query {name!r} is bound to function {spec.fn.__name__!r}"
        )


def test_entry_module_contract():
    import sys

    sys.path.insert(0, "/root/repo")
    entry_mod = importlib.import_module("__spark_entry__")
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    assert qs, "queries() must not be empty"
    # every oracle key must exist in queries()
    assert set(oracles) <= set(qs)
    # oracles must be non-empty SQL strings
    assert all(isinstance(s, str) and "SELECT" in s.upper() for s in oracles.values())


def test_entry_runs_and_returns_rows(spark):
    import sys

    sys.path.insert(0, "/root/repo")
    entry_mod = importlib.import_module("__spark_entry__")
    df = entry_mod.entry(spark)
    assert df.count() > 0


def test_cli_list_and_unknown_query():
    """The __main__ CLI lists every registered query without touching
    Spark, and an unknown name exits 2 with a hint."""
    import contextlib
    import io

    from kcbdml9_big_data_processing_spark.__main__ import main
    from kcbdml9_big_data_processing_spark.queries import QUERIES

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = main(["--list"])
    assert rc == 0
    listed = {ln.split()[0] for ln in buf.getvalue().splitlines() if ln}
    assert listed == set(QUERIES)
    err = io.StringIO()
    with contextlib.redirect_stderr(err):
        assert main(["no_such_query"]) == 2
    assert "unknown query" in err.getvalue()
