"""K4 provisioner: DDL + seed over a DB-API connection (duckdb and
sqlite stand in for the reference's PostgreSQL)."""

from __future__ import annotations

import sqlite3

import duckdb

from kcbdml9_big_data_processing_spark.provisioner import DDL, provision, seed_users


def test_provision_duckdb():
    con = duckdb.connect()
    provision(con)
    assert con.execute("SELECT count(*) FROM user_metadata").fetchone()[0] == 20
    for table in DDL:
        con.execute(f"SELECT * FROM {table} LIMIT 0")  # table exists
    # idempotent: second run doesn't duplicate the seed
    provision(con)
    assert con.execute("SELECT count(*) FROM user_metadata").fetchone()[0] == 20


def test_provision_sqlite():
    con = sqlite3.connect(":memory:")
    provision(con)
    cur = con.cursor()
    cur.execute("SELECT count(*) FROM user_metadata")
    assert cur.fetchone()[0] == 20


def test_seed_is_deterministic():
    assert seed_users() == seed_users()
    ids = [r[0] for r in seed_users()]
    assert len(set(ids)) == 20
