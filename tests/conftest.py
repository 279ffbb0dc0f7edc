"""Shared fixtures: one session per test run, tiny in-memory frames."""

from __future__ import annotations

import datetime as dt

import pytest

from kcbdml9_big_data_processing_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"


def h48_py(s: str) -> int:
    """Pure-Python twin of the engine's portable 48-bit id hash
    (operators/sampling.h48) — ONE copy for every test that predicts
    doc_ids; five hand-copies had accumulated by the r13 review."""
    import hashlib

    return int(hashlib.sha256(s.encode("utf-8")).hexdigest()[:12], 16)


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="pytest", shuffle_partitions=4)
    yield s


def _ts(minute: int, second: int = 0) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 0, minute, second)


@pytest.fixture(scope="session")
def tiny_events(spark):
    """6 rows, 2 users, spanning two 90s windows and one hour."""
    rows = [
        (1, _ts(0, 10), 7, "click", 10.0, '{"k": 1}'),
        (2, _ts(0, 40), 7, "view", 20.0, '{"k": 2}'),
        (3, _ts(1, 50), 8, "click", 30.0, '{"k": 1}'),
        (4, _ts(2, 10), 8, "error", 40.0, '{"k": 3}'),
        (5, _ts(2, 20), 7, "purchase", 50.0, None),
        (6, _ts(59, 59), 9, "click", 60.0, '{"k": 1}'),
    ]
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )


@pytest.fixture(scope="session")
def tiny_users(spark):
    rows = [(7, "alice", 25.0), (8, "bob", 100.0), (9, "carol", 10.0)]
    return spark.createDataFrame(rows, "id long, email string, quota double")
