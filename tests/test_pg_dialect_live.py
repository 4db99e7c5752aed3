"""Execute the PostgreSQL-dialect upsert SQL against a REAL PostgreSQL.

The Derby-backed jdbc tests exercise the MERGE dialect end-to-end but
could only text-pin the PG ``ON CONFLICT`` statements. This module
provisions an ephemeral PostgreSQL (initdb + pg_ctl under /tmp, trust
auth, unix socket only) and runs the EXACT statement sequence
``jdbc_upsert`` issues — stage load, WITH-NO-DATA create, PRIMARY KEY
install, ON CONFLICT apply, stage drop — through a pure-Python wire
client (tests/pg_wire.py), asserting last-write-wins results and
idempotent replay on the genuine engine.

Self-skips when the postgres binaries or the postgres user are absent
(the Spark JDBC *write* path additionally needs the Java driver jar,
which stays environment-gated in test_jdbc.py).
"""

from __future__ import annotations

import os
import shutil
import subprocess
import time

import pytest

from simple_data_engineering_project_spark.operators.jdbc import (
    build_create_sql,
    build_upsert_sql,
)


def _have_pg() -> bool:
    if not (shutil.which("initdb") and shutil.which("pg_ctl")
            and shutil.which("runuser")):
        return False
    try:
        subprocess.run(
            ["runuser", "-u", "postgres", "--", "true"],
            check=True, capture_output=True,
        )
    except (subprocess.CalledProcessError, OSError):
        return False
    return True


pytestmark = pytest.mark.skipif(
    not _have_pg(), reason="postgres binaries / postgres user unavailable"
)


@pytest.fixture(scope="module")
def pg():
    base = f"/tmp/sdep-pg-{os.getpid()}"
    data, sock = f"{base}/data", f"{base}/sock"
    os.makedirs(sock, exist_ok=True)
    subprocess.run(["chown", "-R", "postgres:postgres", base], check=True)
    subprocess.run(
        ["runuser", "-u", "postgres", "--", "initdb", "-D", data,
         "--auth=trust", "--no-sync", "-U", "postgres"],
        check=True, capture_output=True, cwd="/tmp",
    )
    subprocess.run(
        ["runuser", "-u", "postgres", "--", "pg_ctl", "-D", data,
         "-l", f"{base}/log", "-o",
         f"-k {sock} -c listen_addresses=''", "start"],
        check=True, capture_output=True, cwd="/tmp",
    )
    try:
        from .pg_wire import PgWire

        for _ in range(50):  # server accepts connections within ~1 s
            try:
                con = PgWire(sock)
                break
            except OSError:
                time.sleep(0.1)
        else:
            raise RuntimeError("ephemeral postgres did not come up")
        yield con
        con.close()
    finally:
        subprocess.run(
            ["runuser", "-u", "postgres", "--", "pg_ctl", "-D", data,
             "-m", "immediate", "stop"],
            capture_output=True, cwd="/tmp",
        )
        shutil.rmtree(base, ignore_errors=True)


def _stage(con, rows):
    con.query('DROP TABLE IF EXISTS "wh_stage"')
    con.query('CREATE TABLE "wh_stage" ("k" INT, "v" TEXT, "ver" INT)')
    vals = ", ".join(f"({k}, '{v}', {ver})" for k, v, ver in rows)
    con.query(f'INSERT INTO "wh_stage" ("k", "v", "ver") VALUES {vals}')


def test_on_conflict_protocol_last_write_wins(pg):
    pg.query('DROP TABLE IF EXISTS "wh"')
    cols, keys = ["k", "v", "ver"], ["k"]

    # batch 1: stage → create-if-absent (WITH NO DATA + PK) → apply → drop
    _stage(pg, [(1, "a", 1), (2, "b", 1)])
    for ddl in build_create_sql('"wh"', '"wh_stage"', keys, "postgres"):
        pg.query(ddl)
    pg.query(build_upsert_sql('"wh"', '"wh_stage"', cols, keys, "postgres"))
    pg.query('DROP TABLE "wh_stage"')

    # batch 2 updates key 2 and inserts key 3
    _stage(pg, [(2, "B", 2), (3, "c", 1)])
    sql = build_upsert_sql('"wh"', '"wh_stage"', cols, keys, "postgres")
    pg.query(sql)
    got = {
        int(k): (v, int(ver))
        for k, v, ver in pg.query('SELECT "k", "v", "ver" FROM "wh"')
    }
    assert got == {1: ("a", 1), 2: ("B", 2), 3: ("c", 1)}

    # idempotent replay of the same staged batch
    pg.query(sql)
    again = {
        int(k): (v, int(ver))
        for k, v, ver in pg.query('SELECT "k", "v", "ver" FROM "wh"')
    }
    assert again == got
    pg.query('DROP TABLE "wh_stage"')


def test_pk_arbitration_is_required_and_used(pg):
    # ON CONFLICT must arbitrate via the PK build_create_sql installed;
    # a table WITHOUT the unique index makes the same statement fail —
    # proving the DDL half of the protocol is load-bearing, not
    # decorative.
    from .pg_wire import PgError

    pg.query('DROP TABLE IF EXISTS "nopk"')
    pg.query('CREATE TABLE "nopk" ("k" INT, "v" TEXT)')
    _stage(pg, [(1, "a", 1)])
    bad = build_upsert_sql('"nopk"', '"wh_stage"', ["k", "v"], ["k"],
                           "postgres")
    with pytest.raises(PgError, match="no unique or exclusion constraint"):
        pg.query(bad)
    pg.query('DROP TABLE "wh_stage"')
    pg.query('DROP TABLE "nopk"')
