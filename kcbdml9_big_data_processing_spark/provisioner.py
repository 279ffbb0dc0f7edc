"""Serving-schema provisioner (K4 in SURVEY.md §2.2).

Re-expresses provisioner/JdbcProvisioner.scala:7-64: create the four
serving tables and seed the ``user_metadata`` dimension with 20 users.
Like the reference, this is plain SQL over a direct connection — no
Spark involved (the serving database is not a Spark concern).

The reference hardcodes PostgreSQL via DriverManager; here the caller
passes any DB-API 2.0 connection (psycopg2 for the reference stack,
duckdb/sqlite in tests), and errors PROPAGATE — the reference's
catch-and-print (JdbcProvisioner.scala:60-62) silently leaves a
half-provisioned schema.
"""

from __future__ import annotations

import uuid

#: serving DDL, types per JdbcProvisioner.scala:26-58 (TIMESTAMP kept
#: as-is; value/usage/quota as DOUBLE PRECISION per the documented
#: divergence in schemas.py — the engine emits doubles)
DDL = {
    "user_metadata": (
        "CREATE TABLE IF NOT EXISTS user_metadata ("
        "id TEXT PRIMARY KEY, name TEXT, email TEXT, quota BIGINT)"
    ),
    "bytes": (
        "CREATE TABLE IF NOT EXISTS bytes ("
        '"timestamp" TIMESTAMP, id TEXT, value DOUBLE PRECISION, type TEXT)'
    ),
    "bytes_hourly": (
        "CREATE TABLE IF NOT EXISTS bytes_hourly ("
        '"timestamp" TIMESTAMP, id TEXT, value DOUBLE PRECISION, type TEXT)'
    ),
    "user_quota_limit": (
        "CREATE TABLE IF NOT EXISTS user_quota_limit ("
        'email TEXT, usage DOUBLE PRECISION, quota DOUBLE PRECISION, "timestamp" TIMESTAMP)'
    ),
}

#: 20 seed users (names/quotas shaped like JdbcProvisioner.scala:30-49;
#: ids are deterministic UUIDv5 so re-provisioning is reproducible)
_SEED_NAMES = [
    ("andres", 200000), ("paco", 300000), ("juan", 100000), ("fede", 5000),
    ("gorka", 240000), ("luis", 180000), ("eric", 15000), ("carlos", 300000),
    ("david", 120000), ("juanchu", 25000), ("charo", 630000), ("delia", 80000),
    ("maria", 1000000), ("luisa", 300000), ("marta", 240000), ("irene", 500000),
    ("paloma", 360000), ("irma", 300000), ("blanca", 240000), ("lucia", 180000),
]


def seed_users() -> list[tuple[str, str, str, int]]:
    """(id, name, email, quota) rows, deterministic across runs."""
    return [
        (
            str(uuid.uuid5(uuid.NAMESPACE_DNS, f"user_metadata:{name}")),
            name,
            f"{name}@example.com",
            quota,
        )
        for name, quota in _SEED_NAMES
    ]


def provision(conn, paramstyle: str = "qmark") -> None:
    """Create the serving tables and (idempotently) seed user_metadata.

    ``conn``: any DB-API connection. ``paramstyle``: 'qmark' (duckdb,
    sqlite) or 'format' (psycopg2).
    """
    ph = "?" if paramstyle == "qmark" else "%s"
    cur = conn.cursor()
    for ddl in DDL.values():
        cur.execute(ddl)
    cur.execute("SELECT count(*) FROM user_metadata")
    if cur.fetchone()[0] == 0:
        for row in seed_users():
            cur.execute(
                f"INSERT INTO user_metadata (id, name, email, quota) "
                f"VALUES ({ph}, {ph}, {ph}, {ph})",
                row,
            )
    conn.commit()
