"""aiohttp application wiring + lifecycle.

Mirrors the reference's app wiring and graceful shutdown (reference:
internal/app/app.go:33-127): construct stores/broker/usecase/handlers,
serve until SIGINT/SIGTERM, drain within the shutdown timeout. Blocking
storage/queue calls run on a thread pool off the event loop.
"""

from __future__ import annotations

import asyncio
import functools
import pathlib
import time
from concurrent.futures import ThreadPoolExecutor

from aiohttp import web

from imageprocessor_tpu.broker.base import build_broker
from imageprocessor_tpu.config import Config
from imageprocessor_tpu.service.handlers import (
    LOOP_RUNNER_KEY,
    STORES_KEY,
    USECASE_KEY,
    ImageHandlers,
)
from imageprocessor_tpu.service.usecase import ImageUsecase
from imageprocessor_tpu.storage.metadata import build_metadata_store
from imageprocessor_tpu.storage.object_store import build_object_store
from imageprocessor_tpu.utils import get_logger, init_logging
from imageprocessor_tpu.utils.metrics import METRICS

log = get_logger("app")

_STATIC_DIR = pathlib.Path(__file__).parent / "static"


@web.middleware
async def logging_middleware(request: web.Request, handler):
    """Request start/duration logging, skipping static assets
    (reference: middleware.go:10-26, router.go:22-30)."""
    is_static = request.path.startswith("/static") or request.path == "/"
    start = time.monotonic()
    if not is_static:
        log.info("Request started", method=request.method, path=request.path)
    try:
        response = await handler(request)
        return response
    finally:
        if not is_static:
            dur_ms = (time.monotonic() - start) * 1000.0
            METRICS.observe("http_request_ms", dur_ms)
            log.info("Request completed", method=request.method,
                     path=request.path, duration_ms=round(dur_ms, 2))


@web.middleware
async def recovery_middleware(request: web.Request, handler):
    """Panic recovery -> 500 (reference: middleware.go:28-40)."""
    try:
        return await handler(request)
    except web.HTTPException:
        raise
    except Exception as exc:  # noqa: BLE001
        log.error("Handler panic recovered", path=request.path,
                  error=str(exc), exc_info=True)
        return web.json_response(
            {"error": "Internal Server Error",
             "message": "Internal server error"}, status=500)


def build_app(cfg: Config, *, meta=None, store=None, broker=None) -> web.Application:
    """Construct the API application; injectable backends for tests
    (the reference's contract.go DI seams)."""
    init_logging(cfg.log_level)
    # Ownership: close on cleanup ONLY what this app constructed.
    # Injected backends (standalone mode shares them with a worker
    # thread that outlives aiohttp's cleanup; tests reuse them across
    # apps) belong to the caller — closing them here crashed in-flight
    # worker jobs on closed connections during standalone shutdown.
    owned = []
    if meta is None:
        meta = build_metadata_store(cfg.db)
        owned.append(meta)
    if store is None:
        store = build_object_store(cfg.storage)
        owned.append(store)
    if broker is None:
        broker = build_broker(cfg.broker)
        owned.append(broker)
    broker.create_topic(cfg.broker.processing_topic, cfg.broker.partitions)
    broker.create_topic(cfg.broker.results_topic, cfg.broker.partitions)

    usecase = ImageUsecase(meta, store, broker,
                           processing_topic=cfg.broker.processing_topic,
                           retries=cfg.retry_strategy())
    handlers = ImageHandlers(usecase)

    # SERVER_READ_TIMEOUT/SERVER_WRITE_TIMEOUT map onto one request
    # deadline covering body read + handler execution (reference:
    # http.Server Read/WriteTimeout, app.go:79-89): aiohttp has no
    # per-phase knobs, and an unbounded handler lets a slow-loris
    # upload hold a connection forever. NOT covered: the final
    # response-drain to a slow-reading client (aiohttp writes the body
    # after the middleware returns); that phase is bounded only by TCP
    # keepalive — an honest gap, not a claim.
    request_deadline_s = max(
        0.0, float(cfg.server.read_timeout_s + cfg.server.write_timeout_s))

    @web.middleware
    async def timeout_middleware(request: web.Request, handler):
        if request_deadline_s <= 0:
            return await handler(request)
        cm = None
        try:
            async with asyncio.timeout(request_deadline_s) as cm:
                return await handler(request)
        except TimeoutError:
            # socket.timeout IS TimeoutError since 3.10: a backend
            # socket timing out inside the handler must surface as a
            # 500 (recovery middleware), not a 408 blaming the client.
            if cm is None or not cm.expired():
                raise
            log.warn("Request deadline exceeded", path=request.path,
                     deadline_s=request_deadline_s)
            return web.json_response(
                {"error": "Request Timeout",
                 "message": "request exceeded the server deadline"},
                status=408)

    app = web.Application(middlewares=[recovery_middleware,
                                       timeout_middleware,
                                       logging_middleware],
                          client_max_size=DEFAULT_UPLOAD_LIMIT)
    pool = ThreadPoolExecutor(max_workers=8, thread_name_prefix="io")

    async def loop_runner(fn, *args):
        return await asyncio.get_running_loop().run_in_executor(
            pool, functools.partial(fn, *args))

    app[LOOP_RUNNER_KEY] = loop_runner
    app[USECASE_KEY] = usecase
    app[STORES_KEY] = (meta, store, broker)

    app.router.add_post("/api/images/upload", handlers.upload)
    app.router.add_get("/api/images/{id}/status", handlers.get_status)
    app.router.add_get("/api/images/{id}", handlers.get_image)
    app.router.add_delete("/api/images/{id}", handlers.delete_image)
    app.router.add_get("/api/images", handlers.list_images)
    app.router.add_get("/api/health", handlers.health)
    app.router.add_get("/api/metrics", _metrics_handler)

    async def index(_request):
        return web.FileResponse(_STATIC_DIR / "index.html")

    if _STATIC_DIR.exists():
        app.router.add_get("/", index)
        app.router.add_static("/static/", _STATIC_DIR, name="static")

    async def on_cleanup(_app):
        pool.shutdown(wait=False)
        for closer in owned:
            try:
                closer.close()
            except Exception:
                pass

    app.on_cleanup.append(on_cleanup)
    return app


async def _metrics_handler(request):
    # ?format=prometheus (or a scraper's Accept header) serves the
    # Prometheus 0.0.4 text format; default stays JSON. Modern Prometheus
    # sends "application/openmetrics-text, text/plain;version=0.0.4, ..."
    # — the 0.0.4 text format is a valid response to BOTH, so any mention
    # of either selects text (refusing openmetrics made real scrapers
    # receive JSON and mark the target down).
    accept = request.headers.get("Accept", "")
    wants_text = ("openmetrics" in accept
                  or ("text/plain" in accept and "json" not in accept
                      and accept.strip() not in ("", "*/*")))
    if request.query.get("format") == "prometheus" or wants_text:
        return web.Response(text=METRICS.prometheus_text(),
                            content_type="text/plain")
    return web.json_response(METRICS.snapshot())


DEFAULT_UPLOAD_LIMIT = (32 << 20) + (1 << 20)  # 32 MiB file + form overhead


def run_api(cfg: Config) -> None:
    app = build_app(cfg)
    log.info("Starting HTTP server", port=cfg.server.port)
    web.run_app(app, port=cfg.server.port,
                shutdown_timeout=cfg.server.shutdown_timeout_s,
                keepalive_timeout=cfg.server.idle_timeout_s,
                print=None)
