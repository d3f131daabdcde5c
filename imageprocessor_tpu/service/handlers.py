"""HTTP handlers — route-for-route with the reference.

DTO field names, status codes, default operations, validation messages and
headers replicate internal/http-server/handler/image/image.go. Notable
parity points:
* 202 Accepted on upload, 204 on delete, 404 splits "Image not found" vs
  "Processed version not found" (:279-325);
* the GET Content-Type is the ORIGINAL's mime type even for processed
  variants (:113) — reference behavior, kept for compatibility;
* download filename is {name}_{operation}{ext} (:327-334);
* no flags at all -> thumbnail(200, crop) + resize(1024x768, aspect)
  (:252-275).
"""

from __future__ import annotations

import datetime as _dt
import posixpath

from aiohttp import web

from imageprocessor_tpu.domain import (
    DEFAULT_MAX_UPLOAD_SIZE,
    OperationParams,
    OperationType,
)
from imageprocessor_tpu.errors import (
    FileTooLargeError,
    ImageNotFoundError,
    InvalidFileFormatError,
    ProcessedImageNotFoundError,
)
from imageprocessor_tpu.utils import get_logger

log = get_logger("http")

# Typed aiohttp application-state keys (web.AppKey) shared by the app
# wiring (app.py) and the handlers.
LOOP_RUNNER_KEY: web.AppKey = web.AppKey("loop_runner", object)
USECASE_KEY: web.AppKey = web.AppKey("usecase", object)
STORES_KEY: web.AppKey = web.AppKey("stores", tuple)

_ALLOWED_EXT = {".jpg", ".jpeg", ".png", ".gif", ".webp", ".bmp",
                ".tiff", ".tif"}
# Cap for non-file multipart parts (operation flags, watermark text).
_MAX_FORM_PART_SIZE = 64 << 10
_MAX_FORM_PARTS = 64  # file + every documented flag, with headroom


def _rfc3339(dt: _dt.datetime) -> str:
    s = dt.isoformat()
    return s.replace("+00:00", "Z")


def _error_body(status: int, message: str, details: str = "") -> dict:
    # ErrorResponse{error,message,details?} (dto.go:18-22); `error` carries
    # the HTTP status text like Go's http.StatusText.
    texts = {400: "Bad Request", 404: "Not Found",
             413: "Request Entity Too Large", 500: "Internal Server Error"}
    body = {"error": texts.get(status, "Error"), "message": message}
    if details:
        body["details"] = details
    return body


def _json_error(status: int, message: str, details: str = "") -> web.Response:
    return web.json_response(_error_body(status, message, details),
                             status=status)


def parse_operations_from_form(form) -> list[OperationParams]:
    """Default-operation rules (handler/image/image.go:222-277)."""
    operations: list[OperationParams] = []
    if form.get("thumbnail") == "true":
        operations.append(OperationParams(
            OperationType.THUMBNAIL, {"size": 200, "crop_to_fit": True}))
    if form.get("resize") == "true":
        operations.append(OperationParams(
            OperationType.RESIZE,
            {"width": 1024, "height": 768, "keep_aspect": True}))
    if form.get("watermark") == "true":
        params = {"text": "© ImageProcessor", "opacity": 0.5,
                  "position": "bottom-right"}
        text = form.get("watermark_text")
        if text:
            params["text"] = text
        operations.append(OperationParams(OperationType.WATERMARK, params))
    if not operations:
        operations = [
            OperationParams(OperationType.THUMBNAIL,
                            {"size": 200, "crop_to_fit": True}),
            OperationParams(OperationType.RESIZE,
                            {"width": 1024, "height": 768,
                             "keep_aspect": True}),
        ]
    return operations


class ImageHandlers:
    def __init__(self, usecase):
        self.usecase = usecase

    async def upload(self, request: web.Request) -> web.Response:
        try:
            reader = await request.multipart()
        except Exception:
            return _json_error(400, "Invalid request format")

        file_bytes: bytes | None = None
        filename = ""
        file_ct = ""
        form: dict[str, str] = {}
        n_parts = 0
        async for part in reader:
            # aiohttp's client_max_size does NOT bound manually streamed
            # multipart: without a part-count cap, millions of ~64 KiB
            # form fields would accumulate unboundedly in `form`.
            n_parts += 1
            if n_parts > _MAX_FORM_PARTS:
                return _json_error(400, "Too many multipart fields")
            if part.name == "file":
                if file_bytes is not None:
                    # First duplicate wins, like the non-file fields —
                    # the reference's r.FormFile("file") returns the
                    # FIRST part (reference: internal/http-server/
                    # handler/image/image.go:51); later ones are skipped
                    # (the reader drains unconsumed parts on advance).
                    continue
                filename = part.filename or ""
                file_ct = part.headers.get("Content-Type", "")
                chunks = []
                total = 0
                while True:
                    chunk = await part.read_chunk(1 << 20)
                    if not chunk:
                        break
                    total += len(chunk)
                    if total > DEFAULT_MAX_UPLOAD_SIZE:
                        return _json_error(
                            413, "File too large")
                    chunks.append(chunk)
                file_bytes = b"".join(chunks)
            else:
                # Non-file parts are tiny flags/strings; stream with a hard
                # cap so a multi-GB form field can't bypass the file-size
                # limit and exhaust memory (upload DoS).
                chunks = []
                total = 0
                while True:
                    chunk = await part.read_chunk(16 << 10)
                    if not chunk:
                        break
                    total += len(chunk)
                    if total > _MAX_FORM_PART_SIZE:
                        return _json_error(400, "Form field too large")
                    chunks.append(chunk)
                # first duplicate part wins, like url.Values.Get over
                # the multipart values appended to r.Form
                form.setdefault(
                    part.name,
                    b"".join(chunks).decode("utf-8", "replace"))

        if file_bytes is None:
            return _json_error(400, "File is required")

        # Go's ParseMultipartForm merges the multipart values into
        # r.Form AFTER the URL query values ParseForm already put
        # there, and form.Get returns the first value — so for
        # multipart uploads the reference reads operation flags from
        # the query string too, and the QUERY value wins on conflict
        # (reference: internal/http-server/handler/image/image.go:46,68,
        # net/http ParseMultipartForm "r.Form[k] = append" ordering).
        for key in request.query:
            form[key] = request.query[key]   # first query value wins

        # validateFile (image.go:194-220)
        ext = posixpath.splitext(filename)[1].lower()
        if ext not in _ALLOWED_EXT:
            return _json_error(
                400,
                "Unsupported file format. Allowed: jpg, jpeg, png, gif, "
                "webp, bmp, tiff")
        if not file_ct.startswith("image/"):
            return _json_error(400, "File must be an image")

        operations = parse_operations_from_form(form)
        loop = request.app[LOOP_RUNNER_KEY]
        try:
            img = await loop(self.usecase.upload_image, file_bytes, filename,
                             file_ct, operations)
        except InvalidFileFormatError:
            return _json_error(400, "Unsupported file format")
        except FileTooLargeError:
            return _json_error(413, "File too large")
        except Exception as exc:
            log.error("Upload failed", filename=filename, error=str(exc))
            return _json_error(500, "Failed to upload file", str(exc))

        return web.json_response({
            "id": img.id,
            "filename": img.original_filename,
            "status": str(img.status),
            "size": img.original_size,
            "created_at": _rfc3339(img.created_at),
        }, status=202)

    async def get_image(self, request: web.Request) -> web.Response:
        image_id = request.match_info.get("id", "")
        operation = request.query.get("operation", "")
        if not image_id:
            return _json_error(400, "Image ID is required")
        loop = request.app[LOOP_RUNNER_KEY]
        try:
            img, blob, _path = await loop(self.usecase.get_image, image_id,
                                          operation)
        except ImageNotFoundError:
            return _json_error(404, "Image not found")
        except ProcessedImageNotFoundError:
            return _json_error(404, "Processed version not found")
        except Exception as exc:
            log.error("Failed to get image", image_id=image_id,
                      error=str(exc))
            return _json_error(500, "Failed to get image", str(exc))

        filename = img.original_filename
        if operation:
            stem, ext = posixpath.splitext(filename)
            filename = f"{stem}_{operation}{ext}"
        # Header-safe filename: strip control chars (a CR/LF smuggled in
        # via an RFC 2231 filename* would make aiohttp reject the header
        # -> permanent 500 for an image that uploaded fine) and escape
        # per RFC 6266 quoted-string rules.
        safe = "".join(c for c in filename if c.isprintable())
        safe = safe.replace("\\", "\\\\").replace('"', '\\"')
        try:
            safe.encode("latin-1")  # HTTP header transport encoding
        except UnicodeEncodeError:
            import urllib.parse
            safe = urllib.parse.quote(safe)
        return web.Response(
            body=blob,
            headers={
                "Content-Type": img.mime_type,
                "Content-Disposition": f'inline; filename="{safe}"',
                "Cache-Control": "public, max-age=3600",
            })

    async def get_status(self, request: web.Request) -> web.Response:
        image_id = request.match_info.get("id", "")
        if not image_id:
            return _json_error(400, "Image ID is required")
        loop = request.app[LOOP_RUNNER_KEY]
        try:
            status = await loop(self.usecase.get_status, image_id)
        except ImageNotFoundError:
            return _json_error(404, "Image not found")
        except Exception as exc:
            log.error("Failed to get status", image_id=image_id,
                      error=str(exc))
            return _json_error(500, "Failed to get status", str(exc))
        return web.json_response({"id": image_id, "status": str(status)})

    async def delete_image(self, request: web.Request) -> web.Response:
        image_id = request.match_info.get("id", "")
        if not image_id:
            return _json_error(400, "Image ID is required")
        loop = request.app[LOOP_RUNNER_KEY]
        try:
            await loop(self.usecase.delete_image, image_id)
        except ImageNotFoundError:
            return _json_error(404, "Image not found")
        except Exception as exc:
            log.error("Failed to delete image", image_id=image_id,
                      error=str(exc))
            return _json_error(500, "Failed to delete image", str(exc))
        return web.Response(status=204)

    async def list_images(self, request: web.Request) -> web.Response:
        limit, offset = 50, 0
        try:
            cand = int(request.query.get("limit", ""))
            if 0 < cand <= 100:
                limit = cand
        except ValueError:
            pass
        try:
            cand = int(request.query.get("offset", ""))
            if cand >= 0:
                offset = cand
        except ValueError:
            pass
        loop = request.app[LOOP_RUNNER_KEY]
        try:
            images = await loop(self.usecase.list_images, limit, offset)
        except Exception as exc:
            log.error("Failed to list images", error=str(exc))
            return _json_error(500, "Failed to list images", str(exc))
        return web.json_response([
            {"id": i.id, "filename": i.original_filename, "size": i.original_size,
             "status": str(i.status), "created_at": _rfc3339(i.created_at)}
            for i in images])

    async def health(self, request: web.Request) -> web.Response:
        return web.json_response({"status": "ok"})
