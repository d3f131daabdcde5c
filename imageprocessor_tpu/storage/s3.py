"""S3-compatible object store with a built-in AWS SigV4 client.

Replaces the reference's minio-go repository (reference:
internal/repository/image/cloud/minio/minio.go) for any S3 API endpoint —
MinIO included. No SDK exists in this environment, so request signing is
implemented directly (AWS Signature Version 4, single-chunk payloads with
x-amz-content-sha256). Processed objects carry the reference's 1-year
Cache-Control (minio.go:126).

Network paths are exercised against a stub S3 server in tests; signing is
verified against the official SigV4 test vector.
"""

from __future__ import annotations

import datetime as _dt
import hashlib
import hmac
import urllib.parse
import xml.etree.ElementTree as ET

import httpx

from imageprocessor_tpu.storage.object_store import (
    ObjectInfo,
    ObjectNotFound,
    ObjectStore,
    ObjectStoreError,
    original_object_path,
    sanitize_object_path,
)

_EMPTY_SHA256 = hashlib.sha256(b"").hexdigest()


def _uri_encode(s: str, *, encode_slash: bool = True) -> str:
    safe = "-._~" if encode_slash else "-._~/"
    return urllib.parse.quote(s, safe=safe)


def sign_v4(method: str, host: str, path: str, query: dict[str, str],
            headers: dict[str, str], payload_sha256: str,
            access_key: str, secret_key: str, region: str,
            now: _dt.datetime | None = None,
            service: str = "s3") -> dict[str, str]:
    """Produce the Authorization header set for one request.

    Returns the full header dict (input headers + x-amz-date +
    x-amz-content-sha256 + Authorization). Pure function — unit-testable
    against AWS's published test vectors.
    """
    now = now or _dt.datetime.now(_dt.timezone.utc)
    amz_date = now.strftime("%Y%m%dT%H%M%SZ")
    date_stamp = now.strftime("%Y%m%d")

    # SigV4 canonicalization: trim AND collapse sequential internal
    # whitespace (AWS SigV4 spec "Trimall"); .strip() alone makes the
    # server's canonical request differ for values like "my  photo.jpg".
    hdrs = {k.lower(): " ".join(v.split()) for k, v in headers.items()}
    hdrs["host"] = host
    hdrs["x-amz-date"] = amz_date
    if service == "s3":  # S3 requires the payload hash header; IAM etc. don't
        hdrs["x-amz-content-sha256"] = payload_sha256

    signed_names = sorted(hdrs)
    canonical_headers = "".join(f"{k}:{hdrs[k]}\n" for k in signed_names)
    signed_headers = ";".join(signed_names)
    canonical_query = "&".join(
        f"{_uri_encode(k)}={_uri_encode(v)}" for k, v in sorted(query.items()))
    canonical_request = "\n".join([
        method,
        _uri_encode(path, encode_slash=False) or "/",
        canonical_query,
        canonical_headers,
        signed_headers,
        payload_sha256,
    ])
    scope = f"{date_stamp}/{region}/{service}/aws4_request"
    string_to_sign = "\n".join([
        "AWS4-HMAC-SHA256",
        amz_date,
        scope,
        hashlib.sha256(canonical_request.encode()).hexdigest(),
    ])

    def _hmac(key: bytes, msg: str) -> bytes:
        return hmac.new(key, msg.encode(), hashlib.sha256).digest()

    k_date = _hmac(("AWS4" + secret_key).encode(), date_stamp)
    k_region = _hmac(k_date, region)
    k_service = _hmac(k_region, service)
    k_signing = _hmac(k_service, "aws4_request")
    signature = hmac.new(k_signing, string_to_sign.encode(),
                         hashlib.sha256).hexdigest()

    out = dict(headers)
    out["x-amz-date"] = amz_date
    if service == "s3":
        out["x-amz-content-sha256"] = payload_sha256
    out["Authorization"] = (
        f"AWS4-HMAC-SHA256 Credential={access_key}/{scope}, "
        f"SignedHeaders={signed_headers}, Signature={signature}")
    return out


class S3ObjectStore(ObjectStore):
    def __init__(self, endpoint: str, region: str, access_key: str,
                 secret_key: str, bucket: str, use_ssl: bool = False,
                 timeout: float = 30.0):
        self.scheme = "https" if use_ssl else "http"
        self.host = endpoint
        self.region = region
        self.access_key = access_key
        self.secret_key = secret_key
        self.bucket = bucket
        self._client = httpx.Client(timeout=timeout)
        self._ensure_bucket()

    # -- low level ----------------------------------------------------------

    def _request(self, method: str, path: str, query: dict[str, str]
                 | None = None, body: bytes = b"",
                 headers: dict[str, str] | None = None) -> httpx.Response:
        query = query or {}
        headers = headers or {}
        payload_hash = hashlib.sha256(body).hexdigest() if body else _EMPTY_SHA256
        signed = sign_v4(method, self.host, path, query, headers,
                         payload_hash, self.access_key, self.secret_key,
                         self.region)
        url = f"{self.scheme}://{self.host}{urllib.parse.quote(path)}"
        if query:
            # quote (not quote_plus): SigV4 canonicalizes spaces as %20;
            # urlencode's '+' would diverge from the signed string.
            url += "?" + urllib.parse.urlencode(
                query, quote_via=urllib.parse.quote)
        return self._client.request(method, url, content=body, headers=signed)

    def _ensure_bucket(self) -> None:
        """Bucket ensure-on-init (minio.go:50-63)."""
        r = self._request("HEAD", f"/{self.bucket}")
        if r.status_code == 404:
            # Real AWS S3 rejects a body-less CreateBucket outside
            # us-east-1 (IllegalLocationConstraintException); MinIO
            # accepts the constraint body too, so always send it when
            # the region needs one.
            body = b""
            if self.region and self.region != "us-east-1":
                body = (
                    '<CreateBucketConfiguration xmlns="http://s3.amazonaws'
                    '.com/doc/2006-03-01/"><LocationConstraint>'
                    f"{self.region}</LocationConstraint>"
                    "</CreateBucketConfiguration>").encode()
            r = self._request("PUT", f"/{self.bucket}", body=body)
            if r.status_code not in (200, 409):
                raise ObjectStoreError(
                    f"failed to create bucket {self.bucket}: {r.status_code}")
        elif r.status_code >= 400 and r.status_code != 403:
            raise ObjectStoreError(
                f"bucket check failed: {r.status_code}")

    def _key_path(self, path: str) -> str:
        return f"/{self.bucket}/{sanitize_object_path(path)}"

    # -- ObjectStore surface --------------------------------------------------

    def save_original(self, filename: str, data: bytes,
                      content_type: str = "") -> str:
        path = original_object_path(filename)
        # Metadata header values must survive both SigV4 canonicalization
        # and HTTP transport (httpx sends headers latin-1): percent-encode
        # non-ASCII / control bytes and collapse whitespace, keeping
        # plain ASCII names readable (reference stores the raw name,
        # minio.go:84 — the SDK RFC-2047-encodes it the same way).
        # Truncate the RAW name before quoting: slicing the encoded
        # string could cut mid-%XX escape and store a malformed tail.
        # 150 chars x <=12 encoded bytes (4-byte UTF-8 worst case) stays
        # under S3's 2 KB user-metadata cap.
        safe_name = urllib.parse.quote(" ".join(filename.split())[:150],
                                       safe=" -._~()[]{}!@#$&+=,")
        headers = {"Content-Type": content_type or "application/octet-stream",
                   "x-amz-meta-original-filename": safe_name}
        r = self._request("PUT", self._key_path(path), body=data, headers=headers)
        if r.status_code != 200:
            raise ObjectStoreError(f"save original failed: {r.status_code}")
        return path

    def save_processed(self, path: str, data: bytes,
                       content_type: str = "") -> None:
        headers = {
            "Content-Type": content_type or "application/octet-stream",
            # Reference sets 1-year cache on processed objects (minio.go:126)
            "Cache-Control": "public, max-age=31536000",
        }
        r = self._request("PUT", self._key_path(path), body=data, headers=headers)
        if r.status_code != 200:
            raise ObjectStoreError(f"save processed failed: {r.status_code}")

    def get_object(self, path: str) -> bytes:
        r = self._request("GET", self._key_path(path))
        if r.status_code == 404:
            raise ObjectNotFound(path)
        if r.status_code != 200:
            raise ObjectStoreError(f"get failed: {r.status_code}")
        return r.content

    def delete_object(self, path: str) -> None:
        r = self._request("DELETE", self._key_path(path))
        if r.status_code not in (200, 204, 404):
            raise ObjectStoreError(f"delete failed: {r.status_code}")

    def delete_objects_with_prefix(self, prefix: str) -> int:
        """List-then-delete pipeline (minio.go:146-176)."""
        count = 0
        token: str | None = None
        # Preserve the trailing '/' sanitize strips: a directory-style
        # prefix 'processed/resize/abc/' must not list 'abcd/...'.
        list_prefix = sanitize_object_path(prefix)
        if prefix.endswith("/"):
            list_prefix += "/"
        while True:
            query = {"list-type": "2", "prefix": list_prefix}
            if token:
                query["continuation-token"] = token
            r = self._request("GET", f"/{self.bucket}", query=query)
            if r.status_code != 200:
                raise ObjectStoreError(f"list failed: {r.status_code}")
            root = ET.fromstring(r.content)
            ns = root.tag.split("}")[0] + "}" if root.tag.startswith("{") else ""
            keys = [el.text for el in root.iter(f"{ns}Key") if el.text]
            for key in keys:
                self.delete_object(key)
                count += 1
            truncated = root.findtext(f"{ns}IsTruncated") == "true"
            token = root.findtext(f"{ns}NextContinuationToken")
            if not truncated or not token:
                return count

    def stat_object(self, path: str) -> ObjectInfo:
        r = self._request("HEAD", self._key_path(path))
        if r.status_code == 404:
            raise ObjectNotFound(path)
        if r.status_code != 200:
            raise ObjectStoreError(f"stat failed: {r.status_code}")
        return ObjectInfo(path=path,
                          size=int(r.headers.get("Content-Length", 0)),
                          content_type=r.headers.get("Content-Type", ""))

    def close(self) -> None:
        self._client.close()
