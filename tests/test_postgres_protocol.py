"""REAL PostgreSQL validation of the transactional write protocol.

The reference's only documented validation environment is Postgres/MySQL
(reference README.md:18), and its rollback mechanism is Postgres-specific
(``txid_current()`` ExtJdbcUtils.scala:302, ``xmin`` compensating delete
:324-337). This repo's replacement is a dialect-independent
staging→one-transaction-publish protocol; these tests run THAT protocol's
exact statement lists (single-sourced from
``sinks.transactional.jdbc_publish_statements`` /
``epoch_publish_statements``) against a real in-sandbox PostgreSQL 15
server, pinning on the reference's own validation database that:

- the publish transaction is all-or-nothing (a failing statement rolls
  the whole publish back, target byte-identical);
- the epoch ledger's PRIMARY KEY rejects a double commit atomically
  with the data insert (the exactly-once streaming guarantee);
- none of it needs the reference's ``xmin`` forensics, even though this
  server exposes them.

Honest boundary (SURVEY §2A row-13 addendum): the sandbox has Postgres
SERVER binaries but no Postgres JDBC driver jar and no network to fetch
one, so the Spark-side JDBC TRANSPORT (type mapping incl. ArrayType,
fetch/batch size plumbing) remains validated on embedded Derby + the
DuckDB JDBC dialect, with the Postgres ArrayType mapping pinned at the
dialect-registry level (tests/test_jdbc_integration.py). The protocol
layer — the part the reference hand-rolled per-dialect — is what real
Postgres exercises here.

The server runs as user ``nobody`` (Postgres refuses root) on a private
unix socket; tests auto-skip when the binaries are absent.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import uuid

import pytest

from spark_jdbc_limit_spark.sinks.transactional import (
    epoch_publish_statements,
    jdbc_publish_statements,
)

PG_BIN = "/usr/local/bin"

pytestmark = pytest.mark.skipif(
    not (os.path.exists(f"{PG_BIN}/initdb") and shutil.which("psql")),
    reason="PostgreSQL server binaries not available in this environment",
)


def _as_nobody(cmd: str, **kw) -> subprocess.CompletedProcess:
    # cwd=/tmp: `su nobody` cannot chdir back into /root/repo
    return subprocess.run(
        ["su", "-s", "/bin/bash", "nobody", "-c", cmd],
        capture_output=True,
        text=True,
        cwd="/tmp",
        timeout=120,
        **kw,
    )


@pytest.fixture(scope="module")
def pg():
    """initdb + start a private PostgreSQL on a unix socket; yield a psql
    runner; stop and delete on teardown."""
    root = f"/tmp/pg_protocol_{uuid.uuid4().hex[:8]}"
    data, sock = f"{root}/data", f"{root}/sock"
    os.makedirs(sock)
    os.chmod(root, 0o777)
    os.chmod(sock, 0o777)
    r = _as_nobody(f"{PG_BIN}/initdb -D {data} -A trust")
    if r.returncode != 0:
        pytest.skip(f"initdb failed: {r.stderr[-500:]}")
    r = _as_nobody(
        f"{PG_BIN}/pg_ctl -D {data} -o \"-c listen_addresses='' -k {sock}\""
        f" -l {root}/log -w start"
    )
    if r.returncode != 0:
        pytest.skip(f"pg_ctl start failed: {r.stderr[-500:]}")

    def psql(sql: str, check: bool = True) -> subprocess.CompletedProcess:
        res = _as_nobody(
            f"psql -h {sock} -d postgres -v ON_ERROR_STOP=1 -At -c \"{sql}\""
        )
        if check and res.returncode != 0:
            raise AssertionError(f"psql failed: {res.stderr}")
        return res

    try:
        yield psql
    finally:
        _as_nobody(f"{PG_BIN}/pg_ctl -D {data} -m fast stop")
        shutil.rmtree(root, ignore_errors=True)


def _tx(psql, statements: list[str], check: bool = True):
    """Run the statement list as ONE transaction — psql's single -c sends
    one implicit transaction, exactly like the sink's autocommit=False
    connection with a trailing commit."""
    return psql("; ".join(statements), check=check)


def test_publish_transaction_swaps_atomically(pg):
    pg("CREATE TABLE tgt (id BIGINT, grp BIGINT)")
    pg("INSERT INTO tgt SELECT g, g % 10 FROM generate_series(1, 100) g")
    pg("CREATE TABLE stg (id BIGINT, grp BIGINT)")
    pg("INSERT INTO stg SELECT g, 42 FROM generate_series(1, 7) g")
    _tx(pg, jdbc_publish_statements("tgt", "stg", "overwrite"))
    assert pg("SELECT COUNT(*) FROM tgt").stdout.strip() == "7"
    assert pg("SELECT MIN(grp) || ',' || MAX(grp) FROM tgt").stdout.strip() == "42,42"


def test_failed_publish_rolls_back_whole_transaction(pg):
    """The all-or-nothing claim on real Postgres: when the INSERT fails
    (NOT NULL violation from staging), the DELETE that already ran in the
    same transaction is rolled back too — the target stays byte-identical,
    with no compensating xmin delete needed (the reference's mechanism,
    ExtJdbcUtils.scala:324-337)."""
    pg("CREATE TABLE tgt2 (id BIGINT NOT NULL, grp BIGINT)")
    pg("INSERT INTO tgt2 SELECT g, g FROM generate_series(1, 50) g")
    pg("CREATE TABLE stg2 (id BIGINT, grp BIGINT)")
    pg("INSERT INTO stg2 VALUES (1, 1), (NULL, 2)")
    before = pg("SELECT COUNT(*), COALESCE(SUM(id), 0) FROM tgt2").stdout.strip()
    res = _tx(pg, jdbc_publish_statements("tgt2", "stg2", "overwrite"), check=False)
    assert res.returncode != 0, "NOT NULL violation must fail the transaction"
    after = pg("SELECT COUNT(*), COALESCE(SUM(id), 0) FROM tgt2").stdout.strip()
    assert after == before, "rollback must restore the pre-publish target"


def test_epoch_ledger_rejects_double_commit_atomically(pg):
    """The streaming exactly-once guarantee on real Postgres: replaying a
    committed epoch fails on the ledger PRIMARY KEY, and because the data
    insert shares the transaction, the duplicate rows vanish with it."""
    pg("CREATE TABLE evt (id BIGINT)")
    pg("CREATE TABLE evt__epochs (epoch BIGINT NOT NULL PRIMARY KEY)")
    pg("CREATE TABLE batch0 (id BIGINT)")
    pg("INSERT INTO batch0 SELECT g FROM generate_series(1, 9) g")
    stmts = epoch_publish_statements("evt", "batch0", "evt__epochs", 0)
    _tx(pg, stmts)
    assert pg("SELECT COUNT(*) FROM evt").stdout.strip() == "9"
    # the crash-window replay: same epoch, same statements
    res = _tx(pg, stmts, check=False)
    assert res.returncode != 0 and "duplicate key" in res.stderr
    assert pg("SELECT COUNT(*) FROM evt").stdout.strip() == "9", (
        "replayed epoch's rows must be rolled back with the failed marker"
    )
    assert pg("SELECT COUNT(*) FROM evt__epochs").stdout.strip() == "1"


def test_protocol_needs_no_xmin_forensics(pg):
    """This server exposes the reference's forensics surface (xmin /
    txid_current work), and the protocol above never touched it — the
    statement lists are plain ANSI DML. Pins both halves explicitly."""
    assert pg("SELECT txid_current() > 0").stdout.strip() == "t"
    pg("CREATE TABLE fx (id BIGINT)")
    pg("INSERT INTO fx VALUES (1)")
    assert pg("SELECT COUNT(*) FROM fx WHERE xmin::text::bigint > 0").stdout.strip() == "1"
    for stmts in (
        jdbc_publish_statements("t", "s", "overwrite"),
        epoch_publish_statements("t", "s", "l", 7),
    ):
        joined = " ".join(stmts).lower()
        assert "xmin" not in joined and "txid" not in joined
