"""Python client SDK + CLI for the ImageProcessor HTTP API.

The reference only documents curl flows (reference: README.md:62-116);
this client wraps the same five routes so programmatic users can switch
to the framework without writing HTTP plumbing:

    from imageprocessor_tpu.client import ImageProcessorClient
    with ImageProcessorClient("http://localhost:8034") as c:
        img = c.upload("photo.jpg", thumbnail=True, watermark_text="© me")
        c.wait(img["id"])
        c.download(img["id"], "thumb.jpg", operation="thumbnail")

CLI:  python -m imageprocessor_tpu.client upload photo.jpg --thumbnail
"""

from __future__ import annotations

import pathlib
import time
from typing import Any

import httpx


class ClientError(RuntimeError):
    def __init__(self, status: int, message: str):
        super().__init__(f"{status}: {message}")
        self.status = status
        self.message = message


class ImageProcessorClient:
    def __init__(self, base_url: str, timeout: float = 30.0):
        self.base_url = base_url.rstrip("/")
        self._http = httpx.Client(timeout=timeout)

    # -- lifecycle -------------------------------------------------------

    def close(self) -> None:
        self._http.close()

    def __enter__(self) -> "ImageProcessorClient":
        return self

    def __exit__(self, *exc) -> None:
        self.close()

    # -- API -------------------------------------------------------------

    def _raise_for(self, r: httpx.Response) -> None:
        if r.status_code >= 400:
            try:
                message = r.json().get("message", r.text)
            except ValueError:
                message = r.text
            raise ClientError(r.status_code, message)

    def health(self) -> bool:
        r = self._http.get(f"{self.base_url}/api/health")
        return r.status_code == 200 and r.json().get("status") == "ok"

    def upload(self, path: str | pathlib.Path, *, thumbnail: bool = False,
               resize: bool = False, watermark: bool = False,
               watermark_text: str = "",
               content_type: str | None = None) -> dict[str, Any]:
        """POST /api/images/upload. No flags -> server defaults
        (thumbnail + resize, handler/image/image.go:252-275)."""
        p = pathlib.Path(path)
        data: dict[str, str] = {}
        if thumbnail:
            data["thumbnail"] = "true"
        if resize:
            data["resize"] = "true"
        if watermark:
            data["watermark"] = "true"
            if watermark_text:
                data["watermark_text"] = watermark_text
        ext = p.suffix.lower().lstrip(".")
        # Deliberate duplication of runtime/codecs.mime_from_path: the
        # SDK stays import-light (codecs pulls numpy/PIL). Keep the key
        # set in sync with the server's allowed extensions.
        ctype = content_type or {
            "jpg": "image/jpeg", "jpeg": "image/jpeg", "png": "image/png",
            "gif": "image/gif", "webp": "image/webp", "bmp": "image/bmp",
            "tif": "image/tiff", "tiff": "image/tiff"}.get(ext, "image/jpeg")
        with open(p, "rb") as fh:
            r = self._http.post(
                f"{self.base_url}/api/images/upload",
                files={"file": (p.name, fh, ctype)}, data=data)
        self._raise_for(r)
        return r.json()

    def status(self, image_id: str) -> str:
        r = self._http.get(f"{self.base_url}/api/images/{image_id}/status")
        self._raise_for(r)
        return r.json()["status"]

    def wait(self, image_id: str, timeout: float = 120.0,
             poll_interval: float = 0.5) -> str:
        """Poll until completed/failed (the UI polls every 5 s; SDK users
        usually want faster feedback)."""
        deadline = time.monotonic() + timeout
        while True:
            status = self.status(image_id)
            if status in ("completed", "failed"):
                return status
            if time.monotonic() >= deadline:
                raise TimeoutError(
                    f"image {image_id} still {status} after {timeout}s")
            time.sleep(poll_interval)

    def fetch(self, image_id: str, operation: str = "") -> bytes:
        params = {"operation": operation} if operation else None
        r = self._http.get(f"{self.base_url}/api/images/{image_id}",
                           params=params)
        self._raise_for(r)
        return r.content

    def download(self, image_id: str, dest: str | pathlib.Path,
                 operation: str = "") -> pathlib.Path:
        dest = pathlib.Path(dest)
        dest.write_bytes(self.fetch(image_id, operation))
        return dest

    def delete(self, image_id: str) -> None:
        r = self._http.delete(f"{self.base_url}/api/images/{image_id}")
        self._raise_for(r)

    def list_images(self, limit: int = 50, offset: int = 0) -> list[dict]:
        r = self._http.get(f"{self.base_url}/api/images",
                           params={"limit": limit, "offset": offset})
        self._raise_for(r)
        return r.json()

    def metrics(self) -> dict:
        r = self._http.get(f"{self.base_url}/api/metrics")
        self._raise_for(r)
        return r.json()


def main(argv: list[str] | None = None) -> int:
    import argparse
    import json

    parser = argparse.ArgumentParser(prog="imageprocessor_tpu.client")
    parser.add_argument("--url", default="http://localhost:8034")
    sub = parser.add_subparsers(dest="cmd", required=True)

    up = sub.add_parser("upload")
    up.add_argument("path")
    up.add_argument("--thumbnail", action="store_true")
    up.add_argument("--resize", action="store_true")
    up.add_argument("--watermark", action="store_true")
    up.add_argument("--watermark-text", default="")
    up.add_argument("--wait", action="store_true")

    st = sub.add_parser("status")
    st.add_argument("id")
    dl = sub.add_parser("download")
    dl.add_argument("id")
    dl.add_argument("dest")
    dl.add_argument("--operation", default="")
    rm = sub.add_parser("delete")
    rm.add_argument("id")
    sub.add_parser("list")

    args = parser.parse_args(argv)
    with ImageProcessorClient(args.url) as client:
        if args.cmd == "upload":
            out = client.upload(args.path, thumbnail=args.thumbnail,
                                resize=args.resize, watermark=args.watermark,
                                watermark_text=args.watermark_text)
            if args.wait:
                out["final_status"] = client.wait(out["id"])
            print(json.dumps(out, indent=2))
        elif args.cmd == "status":
            print(client.status(args.id))
        elif args.cmd == "download":
            print(client.download(args.id, args.dest, args.operation))
        elif args.cmd == "delete":
            client.delete(args.id)
            print("deleted")
        elif args.cmd == "list":
            print(json.dumps(client.list_images(), indent=2))
    return 0


if __name__ == "__main__":  # pragma: no cover
    import sys

    sys.exit(main())
