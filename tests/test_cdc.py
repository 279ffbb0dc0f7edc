"""CDC merge + SCD2 history (operators/cdc): known-answer edge
semantics on tiny frames. The bulk numeric correctness is
driver-checked by the cdc_orders_suite registry query against a
window-function oracle; these tests pin the cases a small scenario
can't help but leave thin — delete-then-reinsert, delete-only keys,
pure inserts, and the schema/validation contract.
"""

from __future__ import annotations

import pytest

from kcbdml9_big_data_processing_spark.operators.cdc import (
    merge_changes,
    scd2_history,
)


def _frames(spark):
    base = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k long, v string"
    )
    changes = spark.createDataFrame(
        [
            # k=1: update, delete, re-insert -> history has 3 open/closed
            # intervals, snapshot keeps the re-insert
            (1, "a2", 10, "U"),
            (1, "a2", 20, "D"),
            (1, "a3", 30, "U"),
            # k=2: delete only -> gone from snapshot, base interval closed
            (2, "b", 10, "D"),
            # k=4: pure insert
            (4, "d", 10, "U"),
        ],
        "k long, v string, change_ts long, op string",
    )
    return base, changes


def test_merge_changes_latest_wins(spark):
    base, changes = _frames(spark)
    got = {
        (r.k, r.v) for r in merge_changes(base, changes, ["k"]).collect()
    }
    # k=1 re-inserted as a3; k=2 deleted; k=3 untouched base; k=4 inserted
    assert got == {(1, "a3"), (3, "c"), (4, "d")}


def test_merge_changes_schema_is_base_schema(spark):
    base, changes = _frames(spark)
    assert merge_changes(base, changes, ["k"]).columns == base.columns


def test_scd2_history_intervals(spark):
    base, changes = _frames(spark)
    rows = {
        (r.k, r.v, r.valid_from, r.valid_to, r.is_current)
        for r in scd2_history(base, changes, ["k"]).collect()
    }
    assert rows == {
        # k=1: base closed by U@10, U@10 closed by D@20, re-insert open
        (1, "a", None, 10, False),
        (1, "a2", 10, 20, False),
        (1, "a3", 30, None, True),
        # k=2: base closed by the delete; no current version
        (2, "b", None, 10, False),
        # k=3: untouched base version still open
        (3, "c", None, None, True),
        # k=4: insert open since its version
        (4, "d", 10, None, True),
    }


def test_deleted_key_has_no_current_version(spark):
    base, changes = _frames(spark)
    hist = scd2_history(base, changes, ["k"])
    assert hist.where("k = 2 and is_current").count() == 0


def test_missing_change_columns_raise(spark):
    base, _ = _frames(spark)
    bad = spark.createDataFrame([(1, 10, "U")], "k long, change_ts long, op string")
    with pytest.raises(ValueError, match="missing columns"):
        merge_changes(base, bad, ["k"])
