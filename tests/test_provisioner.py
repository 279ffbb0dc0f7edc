"""K4 provisioner: DDL + seed over a DB-API connection (duckdb and
sqlite stand in for the reference's PostgreSQL)."""

from __future__ import annotations

import sqlite3

import duckdb
from pyspark.sql import types as T

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


def test_serving_ddl_types_match_spark_postgres_dialect(spark):
    """Postgres-compatibility probe without a server: ask Spark's OWN
    PostgresDialect (the exact code path a real pgjdbc write resolves
    types through — JdbcDialects.get on a postgresql:// URL, falling
    back to JdbcUtils' common types, like JdbcUtils.getJdbcType does)
    what column definition it emits for each Catalyst type the serving
    frames carry, and assert the provisioner DDL declares an
    equivalent Postgres type per JdbcProvisioner.scala:26-58.

    Equivalences: FLOAT8 is PG's canonical alias for DOUBLE PRECISION;
    TIMESTAMP accepts both tz-aware (session-UTC) and NTZ writes —
    the engine pins the session to UTC so values agree either way."""
    jvm = spark._jvm
    dialect = jvm.org.apache.spark.sql.jdbc.JdbcDialects.get(
        "jdbc:postgresql://host:5432/serving"
    )

    def pg_type(dt) -> str:
        jdt = jvm.org.apache.spark.sql.types.DataType.fromJson(dt.json())
        opt = dialect.getJDBCType(jdt)
        if not opt.isDefined():
            opt = jvm.org.apache.spark.sql.execution.datasources.jdbc.JdbcUtils.getCommonJDBCType(
                jdt
            )
        assert opt.isDefined(), f"no JDBC type for {dt}"
        return opt.get().databaseTypeDefinition().upper()

    equivalent = {
        "TEXT": {"TEXT"},
        "BIGINT": {"BIGINT"},
        "DOUBLE PRECISION": {"DOUBLE PRECISION", "FLOAT8"},
        "TIMESTAMP": {
            "TIMESTAMP",
            "TIMESTAMP WITHOUT TIME ZONE",
            "TIMESTAMP WITH TIME ZONE",
        },
    }
    # declared DDL type per (table, column), per JdbcProvisioner.scala
    declared = {
        ("user_metadata", "id"): ("TEXT", T.StringType()),
        ("user_metadata", "name"): ("TEXT", T.StringType()),
        ("user_metadata", "email"): ("TEXT", T.StringType()),
        ("user_metadata", "quota"): ("BIGINT", T.LongType()),
        ("bytes", "timestamp"): ("TIMESTAMP", T.TimestampType()),
        ("bytes", "id"): ("TEXT", T.StringType()),
        ("bytes", "value"): ("DOUBLE PRECISION", T.DoubleType()),
        ("bytes", "type"): ("TEXT", T.StringType()),
        ("bytes_hourly", "timestamp"): ("TIMESTAMP", T.TimestampType()),
        ("user_quota_limit", "email"): ("TEXT", T.StringType()),
        ("user_quota_limit", "usage"): ("DOUBLE PRECISION", T.DoubleType()),
        ("user_quota_limit", "quota"): ("DOUBLE PRECISION", T.DoubleType()),
        ("user_quota_limit", "timestamp"): ("TIMESTAMP", T.TimestampType()),
    }
    for (table, col), (ddl_type, catalyst) in declared.items():
        # the declared type really is in the DDL string for that table
        assert ddl_type in DDL[table], (table, col, ddl_type)
        # and the pgjdbc dialect's emission is PG-equivalent to it
        assert pg_type(catalyst) in equivalent[ddl_type], (
            table,
            col,
            pg_type(catalyst),
            ddl_type,
        )
    # NTZ timestamps (what the parquet testdata carries) also land on a
    # TIMESTAMP-equivalent definition
    assert pg_type(T.TimestampNTZType()) in equivalent["TIMESTAMP"]
