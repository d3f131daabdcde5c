"""Structured JSON logging.

The reference uses zerolog via wb-go/wbf (reference: cmd/image-processor/main.go:12-16,
internal/http-server/middleware/middleware.go:10-26): one JSON object per line with
`level`, `time`, `message` and free-form key/value fields. This module reproduces that
observable shape on top of stdlib logging so every component logs uniformly:

    log = get_logger("worker")
    log.info("Message processed", image_id=img.id, duration_ms=12.5)
"""

from __future__ import annotations

import datetime as _dt
import json
import logging
import sys
import threading
from typing import Any

_LEVELS = {
    "debug": logging.DEBUG,
    "info": logging.INFO,
    "warn": logging.WARNING,
    "warning": logging.WARNING,
    "error": logging.ERROR,
}

_init_lock = threading.Lock()
_initialized = False


class _JSONFormatter(logging.Formatter):
    def format(self, record: logging.LogRecord) -> str:
        out: dict[str, Any] = {
            "level": record.levelname.lower().replace("warning", "warn"),
            "time": _dt.datetime.now(_dt.timezone.utc).isoformat(timespec="milliseconds"),
            "logger": record.name,
            "message": record.getMessage(),
        }
        fields = getattr(record, "fields", None)
        if fields:
            out.update(fields)
        if record.exc_info and record.exc_info[0] is not None:
            out["error"] = self.formatException(record.exc_info)
        return json.dumps(out, ensure_ascii=False, default=str)


class StructuredLogger:
    """Thin wrapper adding zerolog-style key/value fields to stdlib logging."""

    __slots__ = ("_log",)

    def __init__(self, log: logging.Logger):
        self._log = log

    def _emit(self, level: int, message: str, exc_info: bool = False, **fields: Any) -> None:
        if self._log.isEnabledFor(level):
            self._log.log(level, message, extra={"fields": fields}, exc_info=exc_info)

    def debug(self, message: str, **fields: Any) -> None:
        self._emit(logging.DEBUG, message, **fields)

    def info(self, message: str, **fields: Any) -> None:
        self._emit(logging.INFO, message, **fields)

    def warn(self, message: str, **fields: Any) -> None:
        self._emit(logging.WARNING, message, **fields)

    warning = warn

    def error(self, message: str, exc_info: bool = False, **fields: Any) -> None:
        self._emit(logging.ERROR, message, exc_info=exc_info, **fields)

    def critical(self, message: str, **fields: Any) -> None:
        self._emit(logging.CRITICAL, message, **fields)

    def is_enabled_for(self, level_name: str) -> bool:
        return self._log.isEnabledFor(_LEVELS.get(level_name, logging.INFO))


def init_logging(level: str | None = None, stream: Any = None) -> None:
    """Install the JSON handler on the framework's root logger (idempotent).

    The level is applied on FIRST init or when passed explicitly —
    implicit re-inits (every get_logger at lazy module import) must not
    reset an operator-configured LOG_LEVEL back to the default.
    """
    global _initialized
    with _init_lock:
        root = logging.getLogger("imageprocessor_tpu")
        if level is not None or not _initialized:
            root.setLevel(_LEVELS.get((level or "info").lower(),
                                      logging.INFO))
        if not _initialized:
            handler = logging.StreamHandler(stream or sys.stderr)
            handler.setFormatter(_JSONFormatter())
            root.addHandler(handler)
            root.propagate = False
            _initialized = True


def get_logger(name: str) -> StructuredLogger:
    init_logging()
    return StructuredLogger(logging.getLogger(f"imageprocessor_tpu.{name}"))
