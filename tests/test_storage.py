"""Storage backend tests: localfs object store, S3 SigV4 client against a
stub server, SQLite metadata store semantics."""

import datetime as dt
import http.server
import threading
import uuid

import pytest

from imageprocessor_tpu.domain import Image, ImageStatus, OperationType, ProcessedImage
from imageprocessor_tpu.storage import LocalFSObjectStore, SQLiteMetadataStore
from imageprocessor_tpu.storage.metadata import NotFound
from imageprocessor_tpu.storage.object_store import (
    ObjectNotFound,
    ObjectStoreError,
    original_object_path,
    sanitize_filename,
    sanitize_object_path,
)
from imageprocessor_tpu.storage.s3 import S3ObjectStore, sign_v4


# --- path logic --------------------------------------------------------------

def test_original_path_scheme():
    ns = 1755300000123456789  # 2025-08-15T...
    path = original_object_path("photo.JPG", now_ns=ns, entropy="abc123")
    t = dt.datetime.fromtimestamp(ns // 10**9, dt.timezone.utc)
    assert path == (f"original/{t.year:04d}/{t.month:02d}/{t.day:02d}/"
                    f"{ns}-abc123.jpg")
    # entropy defaults to fresh randomness: same nanosecond from two
    # processes cannot collide (the cross-process overwrite class)
    a = original_object_path("x.png", now_ns=ns)
    b = original_object_path("x.png", now_ns=ns)
    assert a != b


def test_sanitize_rejects_traversal():
    with pytest.raises(ObjectStoreError):
        sanitize_object_path("../../etc/passwd")
    with pytest.raises(ObjectStoreError):
        sanitize_object_path("a/../../b")
    assert sanitize_object_path("/abs/path") == "abs/path"
    assert sanitize_object_path("a/b/../c") == "a/c"


def test_sanitize_filename():
    assert sanitize_filename("ok.png") == "ok.png"
    assert "/" not in sanitize_filename("../../x/evil.png")
    assert sanitize_filename("") == "upload"


# --- localfs ----------------------------------------------------------------

def test_localfs_crud(tmp_path):
    store = LocalFSObjectStore(str(tmp_path / "objects"))
    path = store.save_original("cat.png", b"PNGDATA", "image/png")
    assert path.startswith("original/")
    assert store.get_object(path) == b"PNGDATA"
    assert store.stat_object(path).size == 7

    store.save_processed("processed/resize/id1/1024x768.jpeg", b"JPEG1")
    store.save_processed("processed/thumbnails/id1/200.jpeg", b"JPEG2")
    store.save_processed("processed/resize/id2/100x100.jpeg", b"JPEG3")
    assert store.get_object("processed/resize/id1/1024x768.jpeg") == b"JPEG1"

    # Overwrite is idempotent (replay safety)
    store.save_processed("processed/resize/id1/1024x768.jpeg", b"JPEG1b")
    assert store.get_object("processed/resize/id1/1024x768.jpeg") == b"JPEG1b"

    n = store.delete_objects_with_prefix("processed/resize/id1/")
    assert n == 1
    with pytest.raises(ObjectNotFound):
        store.get_object("processed/resize/id1/1024x768.jpeg")
    assert store.get_object("processed/resize/id2/100x100.jpeg") == b"JPEG3"

    store.delete_object(path)
    with pytest.raises(ObjectNotFound):
        store.get_object(path)
    store.delete_object(path)  # second delete is a no-op


def test_localfs_blocks_escape(tmp_path):
    store = LocalFSObjectStore(str(tmp_path / "objects"))
    with pytest.raises(ObjectStoreError):
        store.get_object("../../../etc/passwd")


# --- SigV4 -------------------------------------------------------------------

def test_sigv4_official_test_vector():
    """AWS documented get-vanilla-query example (IAM ListUsers)."""
    headers = sign_v4(
        method="GET",
        host="iam.amazonaws.com",
        path="/",
        query={"Action": "ListUsers", "Version": "2010-05-08"},
        headers={"content-type": "application/x-www-form-urlencoded; charset=utf-8"},
        payload_sha256="e3b0c44298fc1c149afbf4c8996fb92427ae41e4649b934ca495991b7852b855",
        access_key="AKIDEXAMPLE",
        secret_key="wJalrXUtnFEMI/K7MDENG+bPxRfiCYEXAMPLEKEY",
        region="us-east-1",
        service="iam",
        now=dt.datetime(2015, 8, 30, 12, 36, 0, tzinfo=dt.timezone.utc),
    )
    assert headers["Authorization"] == (
        "AWS4-HMAC-SHA256 Credential=AKIDEXAMPLE/20150830/us-east-1/iam/"
        "aws4_request, SignedHeaders=content-type;host;x-amz-date, "
        "Signature=5d672d79c15b13162d9279b0855cfba6789a8edb4c82c400e06b5924a6f2b5d7"
    )


# --- S3 client against stub server -------------------------------------------

class _StubS3(http.server.BaseHTTPRequestHandler):
    objects: dict[str, bytes] = {}

    def log_message(self, *a):  # silence
        pass

    def _key(self):
        return self.path.split("?")[0].lstrip("/")

    def do_PUT(self):
        length = int(self.headers.get("Content-Length", 0))
        body = self.rfile.read(length)
        assert self.headers.get("Authorization", "").startswith("AWS4-HMAC-SHA256")
        self.objects[self._key()] = body
        self.send_response(200)
        self.end_headers()

    def do_GET(self):
        key = self._key()
        if "list-type=2" in (self.path.split("?") + [""])[1]:
            import urllib.parse
            q = urllib.parse.parse_qs(self.path.split("?")[1])
            prefix = q.get("prefix", [""])[0]
            bucket = key
            keys = [k[len(bucket) + 1:] for k in self.objects
                    if k.startswith(f"{bucket}/{prefix}") and k != bucket]
            body = ("<?xml version='1.0'?><ListBucketResult>"
                    + "".join(f"<Contents><Key>{k}</Key></Contents>" for k in keys)
                    + "<IsTruncated>false</IsTruncated></ListBucketResult>").encode()
            self.send_response(200)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)
            return
        if key in self.objects:
            body = self.objects[key]
            self.send_response(200)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)
        else:
            self.send_response(404)
            self.end_headers()

    def do_HEAD(self):
        key = self._key()
        if key in self.objects or "/" not in key:  # bucket HEAD always ok
            self.send_response(200)
            self.send_header("Content-Length",
                             str(len(self.objects.get(key, b""))))
            self.end_headers()
        else:
            self.send_response(404)
            self.end_headers()

    def do_DELETE(self):
        self.objects.pop(self._key(), None)
        self.send_response(204)
        self.end_headers()


@pytest.fixture()
def stub_s3():
    _StubS3.objects = {}
    server = http.server.ThreadingHTTPServer(("127.0.0.1", 0), _StubS3)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    yield f"127.0.0.1:{server.server_address[1]}"
    server.shutdown()


def test_s3_store_crud(stub_s3):
    store = S3ObjectStore(endpoint=stub_s3, region="us-east-1",
                          access_key="minioadmin", secret_key="minioadmin",
                          bucket="images", use_ssl=False)
    path = store.save_original("dog.jpeg", b"JPEGDATA", "image/jpeg")
    assert store.get_object(path) == b"JPEGDATA"
    store.save_processed("processed/resize/i1/64x64.jpeg", b"OUT1")
    store.save_processed("processed/resize/i1/32x32.jpeg", b"OUT2")
    store.save_processed("processed/thumbnails/i1/200.jpeg", b"OUT3")
    assert store.stat_object("processed/resize/i1/64x64.jpeg").size == 4
    n = store.delete_objects_with_prefix("processed/resize/i1/")
    assert n == 2
    with pytest.raises(ObjectNotFound):
        store.get_object("processed/resize/i1/64x64.jpeg")
    assert store.get_object("processed/thumbnails/i1/200.jpeg") == b"OUT3"
    store.close()


# --- Metadata stores (shared contract: sqlite + postgres wire) ---------------

@pytest.fixture(params=["sqlite", "postgres"])
def meta_store(request):
    """The same contract suite runs against SQLite and against the real
    Postgres wire driver + metadata SQL over sockets (tests/pg_stub.py)."""
    if request.param == "sqlite":
        store = SQLiteMetadataStore(":memory:")
        stub = None
    else:
        from types import SimpleNamespace

        from imageprocessor_tpu.storage.postgres_meta import (
            PostgresMetadataStore,
        )
        from tests.pg_stub import PgStubServer

        stub = PgStubServer(auth="scram")
        store = PostgresMetadataStore(
            SimpleNamespace(dsn=lambda: stub.dsn()))
    yield store
    store.close()
    if stub is not None:
        stub.close()


def _image(**kw):
    defaults = dict(
        id=str(uuid.uuid4()), original_filename="a.png", original_size=10,
        mime_type="image/png", status=ImageStatus.UPLOADED,
        original_path="original/2026/08/16/1.png", bucket="images")
    defaults.update(kw)
    return Image(**defaults)


def test_metadata_roundtrip(meta_store):
    store = meta_store
    img = _image()
    store.save_image(img)
    got = store.get_image(img.id)
    assert got.id == img.id
    assert got.status is ImageStatus.UPLOADED

    store.update_status(img.id, ImageStatus.PROCESSING)
    assert store.get_image(img.id).status is ImageStatus.PROCESSING

    with pytest.raises(NotFound):
        store.get_image("nope")
    with pytest.raises(NotFound):
        store.update_status("nope", ImageStatus.FAILED)


def test_metadata_soft_delete_hides_image(meta_store):
    store = meta_store
    img = _image()
    store.save_image(img)
    store.update_status(img.id, ImageStatus.DELETED)
    with pytest.raises(NotFound):
        store.get_image(img.id)
    assert store.list_images() == []


def test_metadata_processed_images(meta_store):
    store = meta_store
    img = _image()
    store.save_image(img)
    assert store.get_processed_by_operation(img.id, "resize") is None  # not error
    store.save_processed_image(ProcessedImage(
        id="", image_id=img.id, operation=OperationType.RESIZE,
        path="processed/resize/x/1024x768.jpeg", status="completed"))
    got = store.get_processed_by_operation(img.id, "resize")
    assert got is not None
    assert got.path == "processed/resize/x/1024x768.jpeg"
    assert len(store.list_processed(img.id)) == 1
    store.delete_processed_images(img.id)
    assert store.get_processed_by_operation(img.id, "resize") is None


def test_metadata_list_newest_first_excludes_deleted(meta_store):
    store = meta_store
    now = dt.datetime.now(dt.timezone.utc)
    a = _image(created_at=now - dt.timedelta(minutes=2))
    b = _image(created_at=now - dt.timedelta(minutes=1))
    c = _image(created_at=now)
    for i in (a, b, c):
        store.save_image(i)
    store.update_status(b.id, ImageStatus.DELETED)
    ids = [i.id for i in store.list_images()]
    assert ids == [c.id, a.id]
    assert [i.id for i in store.list_images(limit=1)] == [c.id]
    assert [i.id for i in store.list_images(limit=1, offset=1)] == [a.id]



def test_legacy_duplicate_rows_deduped_on_init(tmp_path):
    """Databases written by the pre-upsert code can hold duplicate
    (image_id, operation, path) rows; store init must dedup them before
    creating the unique replay index instead of failing to start."""
    import sqlite3

    from imageprocessor_tpu.domain import ProcessedImage
    from imageprocessor_tpu.storage.sqlite_meta import SQLiteMetadataStore

    path = str(tmp_path / "legacy.db")
    # build a legacy-shaped DB (no unique index) with duplicates
    conn = sqlite3.connect(path)
    conn.executescript("""
        CREATE TABLE images (id TEXT PRIMARY KEY, original_filename TEXT
            NOT NULL, original_size INTEGER NOT NULL, mime_type TEXT NOT
            NULL, status TEXT NOT NULL, original_path TEXT NOT NULL,
            bucket TEXT NOT NULL, created_at TEXT NOT NULL,
            updated_at TEXT NOT NULL);
        CREATE TABLE processed_images (id TEXT PRIMARY KEY, image_id TEXT
            NOT NULL REFERENCES images(id) ON DELETE CASCADE, operation
            TEXT NOT NULL, parameters TEXT, path TEXT NOT NULL, size
            INTEGER NOT NULL, mime_type TEXT NOT NULL, format TEXT NOT
            NULL, status TEXT NOT NULL, created_at TEXT NOT NULL);
        INSERT INTO images VALUES ('im1','a.png',1,'image/png',
            'completed','o/a','b','2026-01-01T00:00:00',
            '2026-01-01T00:00:00');
        INSERT INTO processed_images VALUES ('p1','im1','thumbnail','',
            'processed/thumbnails/im1/200.jpeg',10,'image/jpeg','jpeg',
            'completed','2026-01-01T00:00:00');
        INSERT INTO processed_images VALUES ('p2','im1','thumbnail','',
            'processed/thumbnails/im1/200.jpeg',12,'image/jpeg','jpeg',
            'completed','2026-01-02T00:00:00');
    """)
    conn.commit()
    conn.close()

    store = SQLiteMetadataStore(path)  # must not raise IntegrityError
    rows = store.list_processed("im1")
    assert len(rows) == 1  # deduped, one survivor per key
    # and the upsert path works on the migrated DB
    store.save_processed_image(ProcessedImage(
        id="", image_id="im1", operation="thumbnail",
        path="processed/thumbnails/im1/200.jpeg", size=99,
        mime_type="image/jpeg", format="jpeg", status="completed"))
    rows = store.list_processed("im1")
    assert len(rows) == 1 and rows[0].size == 99
    store.close()


def test_deleted_image_cannot_be_resurrected(tmp_path):
    """Soft delete is final: a worker callback landing after the user
    deleted the image (its task still queued) must not flip the status
    back and resurrect a blob-less image into list/get results."""
    from imageprocessor_tpu.domain import ImageStatus
    from imageprocessor_tpu.storage.metadata import NotFound
    from imageprocessor_tpu.storage.sqlite_meta import SQLiteMetadataStore

    store = SQLiteMetadataStore(":memory:")
    img = _image()
    store.save_image(img)
    store.update_status(img.id, ImageStatus.DELETED)
    with pytest.raises(NotFound):
        store.update_status(img.id, ImageStatus.FAILED)
    with pytest.raises(NotFound):
        store.update_status(img.id, ImageStatus.COMPLETED)
    assert all(i.id != img.id for i in store.list_images())
    store.close()


def test_localfs_dir_prefix_never_matches_sibling(tmp_path):
    """A directory-style delete prefix ('.../abc/') must not delete the
    sibling 'abcd/...' artifacts after sanitize strips the slash."""
    from imageprocessor_tpu.storage.localfs import LocalFSObjectStore

    store = LocalFSObjectStore(str(tmp_path / "o"))
    store.save_processed("processed/resize/abcd/1024x768.jpeg", b"keep")
    # 'abc' has no artifacts; the directory-style sweep must delete 0
    assert store.delete_objects_with_prefix("processed/resize/abc/") == 0
    assert store.get_object("processed/resize/abcd/1024x768.jpeg") == b"keep"
    # real directory prefixes still sweep
    store.save_processed("processed/resize/abc/1024x768.jpeg", b"gone")
    assert store.delete_objects_with_prefix("processed/resize/abc/") == 1


def test_s3_create_bucket_sends_location_constraint(stub_s3):
    """Real AWS S3 rejects a body-less CreateBucket outside us-east-1
    (IllegalLocationConstraintException): the region must travel in a
    CreateBucketConfiguration body."""
    bodies = {}
    orig_head, orig_put = _StubS3.do_HEAD, _StubS3.do_PUT

    def head_404(self):
        if self._key() == "newbkt" and "newbkt" not in bodies:
            self.send_response(404)
            self.end_headers()
        else:
            orig_head(self)

    def put_capture(self):
        if self._key() == "newbkt":
            length = int(self.headers.get("Content-Length", 0))
            bodies["newbkt"] = self.rfile.read(length)
            self.send_response(200)
            self.end_headers()
        else:
            orig_put(self)

    _StubS3.do_HEAD, _StubS3.do_PUT = head_404, put_capture
    try:
        S3ObjectStore(endpoint=stub_s3, region="eu-west-1",
                      access_key="k", secret_key="s",
                      bucket="newbkt", use_ssl=False)
    finally:
        _StubS3.do_HEAD, _StubS3.do_PUT = orig_head, orig_put
    assert b"<LocationConstraint>eu-west-1</LocationConstraint>" \
        in bodies["newbkt"]


def test_s3_metadata_filename_truncates_before_quoting(stub_s3):
    """A long non-ASCII filename must truncate BEFORE percent-encoding —
    slicing the encoded string could cut mid-%XX escape and store a
    malformed metadata tail."""
    import urllib.parse

    store = S3ObjectStore(endpoint=stub_s3, region="us-east-1",
                          access_key="k", secret_key="s",
                          bucket="images", use_ssl=False)
    name = "ф" * 300 + ".png"   # Cyrillic: 6 encoded chars each
    store.save_original(name, b"data", "image/png")
    # reconstruct what was sent: must round-trip through unquote cleanly
    safe = urllib.parse.quote(" ".join(name.split())[:150],
                              safe=" -._~()[]{}!@#$&+=,")
    assert "%" not in urllib.parse.unquote(safe)
    assert urllib.parse.unquote(safe) == name[:150]


def test_pgwire_parse_error_poisons_connection(monkeypatch):
    """Mid-message parse failures (UnicodeDecodeError from a SQL_ASCII
    database's non-UTF-8 text) must poison the connection like I/O
    errors: the stream is desynchronized, and a retry on the same
    connection would read the aborted query's leftover rows."""
    from imageprocessor_tpu.storage import pgwire

    conn = pgwire.Connection.__new__(pgwire.Connection)
    conn._broken = False

    class _Sock:
        def close(self):
            pass

    conn._sock = _Sock()
    monkeypatch.setattr(
        pgwire.Connection, "_query_inner",
        lambda self, sql: (_ for _ in ()).throw(
            UnicodeDecodeError("utf-8", b"\xff", 0, 1, "invalid")))
    with pytest.raises(pgwire.PgError, match="broken mid-query"):
        conn._query("SELECT 1")
    assert conn._broken
    with pytest.raises(pgwire.PgError, match="broken"):
        conn._query("SELECT 1")


def test_pg_dsn_bare_slash_defaults_dbname():
    from imageprocessor_tpu.storage import pgwire

    class _NoConnect(pgwire.Connection):
        def __init__(self, **kw):
            self.kw = kw

    import unittest.mock as mock
    with mock.patch.object(pgwire, "Connection", _NoConnect):
        c = pgwire.connect("postgres://u:p@h/")
        assert c.kw["dbname"] == "postgres"
        c = pgwire.connect("postgres://u:p@h")
        assert c.kw["dbname"] == "postgres"
        c = pgwire.connect("postgres://u:p@h/mydb")
        assert c.kw["dbname"] == "mydb"
