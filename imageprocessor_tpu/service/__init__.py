"""HTTP API service and queue worker.

Byte-compatible with the reference's external contracts (reference:
internal/http-server/router/router.go:41-50 routes;
handler/image/image.go DTO shapes and status codes; README.md:51-116):

    POST   /api/images/upload       multipart: file, thumbnail, resize,
                                    watermark, watermark_text  -> 202
    GET    /api/images/{id}         ?operation=...             -> bytes
    GET    /api/images/{id}/status                             -> 200
    DELETE /api/images/{id}                                    -> 204
    GET    /api/images              ?limit=&offset=            -> 200
    GET    /api/health                                         -> 200

Two deployables mirroring the reference's two binaries, plus a standalone
mode that runs both in one process with zero external services:

    python -m imageprocessor_tpu.service api         (cmd/image-processor)
    python -m imageprocessor_tpu.service worker      (cmd/worker)
    python -m imageprocessor_tpu.service standalone
"""

from imageprocessor_tpu.service.usecase import ImageUsecase

__all__ = ["ImageUsecase"]
