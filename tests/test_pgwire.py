"""Postgres wire driver (storage/pgwire.py) against the protocol stub.

Covers every auth mode a default Postgres deployment can present
(trust / cleartext / MD5 / SCRAM-SHA-256), literal escaping, placeholder
arity validation, and server-error propagation.
"""

import datetime as dt

import pytest

from imageprocessor_tpu.storage import pgwire
from tests.pg_stub import PgStubServer


@pytest.mark.parametrize("auth", ["trust", "cleartext", "md5", "scram"])
def test_auth_modes_and_roundtrip(auth):
    stub = PgStubServer(auth=auth)
    try:
        conn = pgwire.connect(stub.dsn())
        cur = conn.cursor()
        cur.execute("CREATE TABLE t (a BIGINT, b VARCHAR(10))")
        cur.execute("INSERT INTO t VALUES (%s, %s)", (42, "hi"))
        assert cur.rowcount == 1
        cur.execute("SELECT a, b FROM t")
        assert cur.fetchall() == [(42, "hi")]
        conn.close()
    finally:
        stub.close()


def test_wrong_password_rejected():
    stub = PgStubServer(auth="scram", password="right")
    try:
        with pytest.raises(pgwire.PgError):
            pgwire.connect(stub.dsn().replace(":right@", ":wrong@"))
    finally:
        stub.close()


def test_literal_escaping_quotes_and_injection():
    stub = PgStubServer()
    try:
        conn = pgwire.connect(stub.dsn())
        cur = conn.cursor()
        cur.execute("CREATE TABLE t (s TEXT)")
        evil = "Rob'); DROP TABLE t; --"
        cur.execute("INSERT INTO t VALUES (%s)", (evil,))
        cur.execute("SELECT s FROM t")
        assert cur.fetchall() == [(evil,)]
        cur.execute("SELECT s FROM t WHERE s = %s", (evil,))
        assert cur.fetchone() == (evil,)
        conn.close()
    finally:
        stub.close()


def test_placeholder_arity_is_validated():
    with pytest.raises(pgwire.PgError, match="arity"):
        pgwire.interpolate("SELECT %s, %s", ("one",))
    with pytest.raises(pgwire.PgError, match="arity"):
        pgwire.interpolate("SELECT 1", ("extra",))


def test_escape_literal_types():
    assert pgwire.escape_literal(None) == "NULL"
    assert pgwire.escape_literal(True) == "TRUE"
    assert pgwire.escape_literal(7) == "7"
    assert pgwire.escape_literal("o'brien") == "'o''brien'"
    assert pgwire.escape_literal("a\\b") == "E'a\\\\b'"
    ts = dt.datetime(2026, 8, 16, 12, 0, 5)
    assert pgwire.escape_literal(ts) == "'2026-08-16 12:00:05'"
    with pytest.raises(pgwire.PgError):
        pgwire.escape_literal("nul\x00byte")


def test_server_error_propagates():
    stub = PgStubServer()
    try:
        conn = pgwire.connect(stub.dsn())
        with pytest.raises(pgwire.PgError, match="syntax|near"):
            conn.cursor().execute("THIS IS NOT SQL")
        # connection stays usable after an error (ReadyForQuery resync)
        cur = conn.cursor()
        cur.execute("SELECT 1")
        assert cur.fetchone() == (1,)
        conn.close()
    finally:
        stub.close()


def test_null_and_float_columns():
    stub = PgStubServer()
    try:
        conn = pgwire.connect(stub.dsn())
        cur = conn.cursor()
        cur.execute("CREATE TABLE t (a BIGINT, f DOUBLE PRECISION, s TEXT)")
        cur.execute("INSERT INTO t VALUES (%s, %s, %s)", (None, 2.5, None))
        cur.execute("SELECT a, f, s FROM t")
        assert cur.fetchall() == [(None, 2.5, None)]
        conn.close()
    finally:
        stub.close()


def test_literal_date_and_special_floats():
    """date params must interpolate (date.isoformat takes no sep arg) and
    non-finite floats must render as quoted Postgres literals, not the
    bare inf/nan tokens."""
    import datetime as dt

    from imageprocessor_tpu.storage.pgwire import escape_literal

    assert escape_literal(dt.date(2026, 1, 2)) == "'2026-01-02'"
    assert escape_literal(
        dt.datetime(2026, 1, 2, 3, 4, 5)) == "'2026-01-02 03:04:05'"
    assert escape_literal(float("inf")) == "'Infinity'::float8"
    assert escape_literal(float("-inf")) == "'-Infinity'::float8"
    assert escape_literal(float("nan")) == "'NaN'::float8"
    assert escape_literal(1.5) == "1.5"


def test_broken_connection_poisons_not_desyncs():
    """A mid-protocol I/O error must poison the connection (every later
    use raises) rather than leaving the stream desynchronized where the
    next query would read the previous response's rows."""
    import pytest

    from imageprocessor_tpu.storage.pgwire import PgError
    from tests.pg_stub import PgStubServer
    from imageprocessor_tpu.storage import pgwire

    stub = PgStubServer()
    try:
        conn = pgwire.connect(stub.dsn())
        conn._query("SELECT 1")          # healthy roundtrip
        conn._sock.close()               # simulate the transport dying
        with pytest.raises(PgError):
            conn._query("SELECT 2")
        assert conn._broken
        with pytest.raises(PgError, match="broken"):
            conn._query("SELECT 3")      # still poisoned, fails loudly
    finally:
        stub.close()


def test_stub_translate_literal_safe():
    """Dialect rewrites must not touch string literals: a stored
    filename containing "now()" used to come back as
    "CURRENT_TIMESTAMP" (silent data corruption in round-trip tests),
    and an E ending an ordinary literal merged two literals."""
    from tests.pg_stub import PgStubServer

    t = PgStubServer._translate
    assert t("INSERT INTO x VALUES ('shot now().png')") == \
        "INSERT INTO x VALUES ('shot now().png')"
    assert t("SELECT NOW()") == "SELECT CURRENT_TIMESTAMP"
    assert t("VALUES (E'a\\\\b')") == "VALUES ('a\\\\b')".replace("\\\\", "\\")
    assert t("VALUES ('x @E', E'a')") == "VALUES ('x @E', 'a')"
