"""In-process PostgreSQL wire-protocol stub server for driver tests.

Speaks the backend side of protocol v3 — startup, trust/cleartext/MD5/
SCRAM-SHA-256 auth, simple query, RowDescription/DataRow/CommandComplete/
ErrorResponse — and executes the SQL on an in-memory SQLite database
(with a light Postgres->SQLite dialect translation). Lets the real wire
driver (imageprocessor_tpu/storage/pgwire.py) and the real metadata store
SQL round-trip over real sockets without a Postgres install.
"""

from __future__ import annotations

import base64
import hashlib
import hmac
import os
import re
import socket
import sqlite3
import struct
import threading


def _cstr(s: str) -> bytes:
    return s.encode() + b"\x00"


class PgStubServer:
    def __init__(self, auth: str = "trust", user: str = "postgres",
                 password: str = "postgres"):
        assert auth in ("trust", "cleartext", "md5", "scram")
        self.auth = auth
        self.user = user
        self.password = password
        self._db = sqlite3.connect(":memory:", check_same_thread=False)
        self._db_lock = threading.Lock()
        self._lsock = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self._lsock.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self._lsock.bind(("127.0.0.1", 0))
        self._lsock.listen(16)
        self.host, self.port = self._lsock.getsockname()
        self._stop = threading.Event()
        threading.Thread(target=self._accept, daemon=True).start()

    def dsn(self) -> str:
        return (f"postgres://{self.user}:{self.password}@{self.host}:"
                f"{self.port}/testdb")

    def close(self):
        self._stop.set()
        try:
            self._lsock.close()
        except OSError:
            pass

    # ------------------------------------------------------------- transport

    def _accept(self):
        while not self._stop.is_set():
            try:
                conn, _ = self._lsock.accept()
            except OSError:
                return
            threading.Thread(target=self._serve, args=(conn,),
                             daemon=True).start()

    @staticmethod
    def _read_exact(conn, n):
        parts, got = [], 0
        while got < n:
            chunk = conn.recv(n - got)
            if not chunk:
                raise ConnectionError("closed")
            parts.append(chunk)
            got += len(chunk)
        return b"".join(parts)

    @classmethod
    def _read_msg(cls, conn):
        t = cls._read_exact(conn, 1)
        (n,) = struct.unpack(">i", cls._read_exact(conn, 4))
        return t, cls._read_exact(conn, n - 4)

    @staticmethod
    def _send(conn, t: bytes, payload: bytes):
        conn.sendall(t + struct.pack(">i", len(payload) + 4) + payload)

    def _serve(self, conn):
        try:
            # startup message (untyped)
            (n,) = struct.unpack(">i", self._read_exact(conn, 4))
            body = self._read_exact(conn, n - 4)
            (proto,) = struct.unpack(">i", body[:4])
            if proto != 196608:
                return  # no SSL negotiation support needed
            if not self._authenticate(conn):
                return
            self._send(conn, b"R", struct.pack(">i", 0))  # AuthenticationOk
            self._send(conn, b"S", _cstr("server_version") + _cstr("15.0"))
            self._send(conn, b"Z", b"I")
            while not self._stop.is_set():
                t, payload = self._read_msg(conn)
                if t == b"X":
                    return
                if t == b"Q":
                    self._query(conn, payload.rstrip(b"\x00").decode())
                    self._send(conn, b"Z", b"I")
        except (ConnectionError, OSError, struct.error):
            pass
        finally:
            try:
                conn.close()
            except OSError:
                pass

    # ------------------------------------------------------------------ auth

    def _authenticate(self, conn) -> bool:
        if self.auth == "trust":
            return True
        if self.auth == "cleartext":
            self._send(conn, b"R", struct.pack(">i", 3))
            t, payload = self._read_msg(conn)
            return (t == b"p"
                    and payload.rstrip(b"\x00").decode() == self.password)
        if self.auth == "md5":
            salt = os.urandom(4)
            self._send(conn, b"R", struct.pack(">i", 5) + salt)
            t, payload = self._read_msg(conn)
            inner = hashlib.md5(
                (self.password + self.user).encode()).hexdigest()
            want = "md5" + hashlib.md5(inner.encode() + salt).hexdigest()
            return t == b"p" and payload.rstrip(b"\x00").decode() == want
        return self._auth_scram(conn)

    def _auth_scram(self, conn) -> bool:
        self._send(conn, b"R",
                   struct.pack(">i", 10) + _cstr("SCRAM-SHA-256") + b"\x00")
        t, payload = self._read_msg(conn)
        if t != b"p":
            return False
        r = payload.index(b"\x00")
        mech = payload[:r].decode()
        if mech != "SCRAM-SHA-256":
            return False
        (ln,) = struct.unpack(">i", payload[r + 1:r + 5])
        client_first = payload[r + 5:r + 5 + ln].decode()
        bare = client_first.split(",", 2)[2]
        cnonce = dict(f.split("=", 1) for f in bare.split(","))["r"]
        snonce = cnonce + base64.b64encode(os.urandom(12)).decode()
        salt = os.urandom(16)
        iters = 4096
        server_first = (f"r={snonce},s={base64.b64encode(salt).decode()},"
                        f"i={iters}")
        self._send(conn, b"R",
                   struct.pack(">i", 11) + server_first.encode())
        t, payload = self._read_msg(conn)
        if t != b"p":
            return False
        final = payload.decode()
        fields = dict(f.split("=", 1) for f in final.split(","))
        without_proof = final[:final.rindex(",p=")]
        auth_msg = ",".join([bare, server_first, without_proof])
        salted = hashlib.pbkdf2_hmac("sha256", self.password.encode(),
                                     salt, iters)
        client_key = hmac.new(salted, b"Client Key", hashlib.sha256).digest()
        stored = hashlib.sha256(client_key).digest()
        sig = hmac.new(stored, auth_msg.encode(), hashlib.sha256).digest()
        proof = base64.b64decode(fields["p"])
        recovered = bytes(a ^ b for a, b in zip(proof, sig))
        if hashlib.sha256(recovered).digest() != stored:
            self._send(conn, b"E", _cstr("SFATAL") + _cstr("C28P01")
                       + _cstr("Mpassword authentication failed") + b"\x00")
            return False
        server_key = hmac.new(salted, b"Server Key", hashlib.sha256).digest()
        verifier = hmac.new(server_key, auth_msg.encode(),
                            hashlib.sha256).digest()
        self._send(conn, b"R", struct.pack(">i", 12)
                   + f"v={base64.b64encode(verifier).decode()}".encode())
        return True

    # ----------------------------------------------------------------- query

    @staticmethod
    def _translate(sql: str) -> str:
        """Postgres -> SQLite dialect for the SQL this framework issues.

        Dialect rewrites apply only OUTSIDE single-quoted literals: a
        filename value containing "now()" must round-trip unchanged
        (the naive regex silently corrupted stored data), and an E that
        merely ends an ordinary literal must not start an E-string.
        """
        # Tokenize into literal / non-literal spans ('' is an escaped
        # quote inside a literal).
        spans = re.split(r"('(?:[^']|'')*')", sql)
        for i in range(0, len(spans), 2):  # even indexes: outside literals
            spans[i] = re.sub(r"\bNOW\(\)", "CURRENT_TIMESTAMP", spans[i],
                              flags=re.IGNORECASE)
        # E'...' = an E immediately before a literal span: unescape the
        # literal, drop the E.
        for i in range(1, len(spans), 2):
            # Postgres adjacency rule: E is a prefix only when it
            # IMMEDIATELY precedes the quote (no whitespace) — an
            # identifier `e` before a literal must survive.
            # \Z, not $: $ also matches before a trailing newline,
            # which would treat "... e\n" as adjacent.
            if re.search(r"\bE\Z", spans[i - 1], flags=re.IGNORECASE):
                spans[i - 1] = re.sub(r"\bE\Z", "", spans[i - 1],
                                      flags=re.IGNORECASE)
                spans[i] = ("'"
                            + spans[i][1:-1].replace("\\\\", "\\") + "'")
        return "".join(spans)

    @staticmethod
    def _split_statements(sql: str) -> list[str]:
        """Split on ';' outside single-quoted strings."""
        out, cur, in_str = [], [], False
        i = 0
        while i < len(sql):
            ch = sql[i]
            if in_str:
                cur.append(ch)
                if ch == "'":
                    if i + 1 < len(sql) and sql[i + 1] == "'":
                        cur.append("'")
                        i += 1
                    else:
                        in_str = False
            elif ch == "'":
                in_str = True
                cur.append(ch)
            elif ch == ";":
                out.append("".join(cur))
                cur = []
            else:
                cur.append(ch)
            i += 1
        out.append("".join(cur))
        return [s for s in out if s.strip()]

    def _query(self, conn, sql: str):
        try:
            with self._db_lock:
                cur = self._db.cursor()
                statements = self._split_statements(sql)
                rows, desc, count = [], None, -1
                for st in statements:
                    cur.execute(self._translate(st))
                    if cur.description is not None:
                        rows = cur.fetchall()
                        desc = cur.description
                    count = cur.rowcount
                self._db.commit()
        except sqlite3.Error as exc:
            self._send(conn, b"E", _cstr("SERROR") + _cstr("C42601")
                       + _cstr(f"M{exc}") + b"\x00")
            return
        verb = (sql.strip().split() or ["SELECT"])[0].upper()
        if desc is not None:
            oids = []
            for col in range(len(desc)):
                sample = next((r[col] for r in rows
                               if r[col] is not None), None)
                oids.append(20 if isinstance(sample, int)
                            else 701 if isinstance(sample, float) else 25)
            w = [struct.pack(">h", len(desc))]
            for (name, *_rest), oid in zip(desc, oids):
                w.append(_cstr(name) + struct.pack(">ihihih", 0, 0, oid,
                                                   -1, -1, 0))
            self._send(conn, b"T", b"".join(w))
            for row in rows:
                parts = [struct.pack(">h", len(row))]
                for v in row:
                    if v is None:
                        parts.append(struct.pack(">i", -1))
                    else:
                        b = str(v).encode()
                        parts.append(struct.pack(">i", len(b)) + b)
                self._send(conn, b"D", b"".join(parts))
            tag = f"SELECT {len(rows)}"
        elif verb in ("INSERT",):
            tag = f"INSERT 0 {max(count, 0)}"
        elif verb in ("UPDATE", "DELETE"):
            tag = f"{verb} {max(count, 0)}"
        else:
            tag = verb
        self._send(conn, b"C", _cstr(tag))
