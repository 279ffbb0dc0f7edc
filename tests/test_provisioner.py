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


def test_provision_postgres_paramstyle_path():
    """The reference provisions PostgreSQL (JdbcProvisioner.scala:20-27);
    no Postgres exists in this environment, so pin the psycopg2-shaped
    half of the contract with a recording DB-API fake: the 'format'
    paramstyle renders %s placeholders (never qmark), every DDL runs,
    the seed runs exactly once against an empty table, and parameters
    travel out-of-band (no string interpolation of values)."""
    from kcbdml9_big_data_processing_spark.provisioner import (
        DDL,
        provision,
        seed_users,
    )

    class Cursor:
        def __init__(self, log):
            self.log = log
            self._rows = None

        def execute(self, sql, params=None):
            self.log.append((sql, params))
            if sql.strip().upper().startswith("SELECT COUNT"):
                self._rows = [(0,)]

        def fetchone(self):
            return self._rows[0]

    class Conn:
        def __init__(self):
            self.log = []
            self.committed = False

        def cursor(self):
            return Cursor(self.log)

        def commit(self):
            self.committed = True

    conn = Conn()
    provision(conn, paramstyle="format")
    executed = [sql for sql, _ in conn.log]
    for ddl in DDL.values():
        assert ddl in executed
    inserts = [(sql, p) for sql, p in conn.log if sql.startswith("INSERT")]
    assert len(inserts) == len(seed_users())
    for sql, params in inserts:
        assert "%s" in sql and "?" not in sql
        assert params is not None and len(params) == 4
        # values never leak into the SQL string (injection-safe path)
        assert "@example.com" not in sql
    assert conn.committed
