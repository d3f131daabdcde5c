"""Cross-cutting utilities: structured logging, retry policy, env parsing, metrics."""

from imageprocessor_tpu.utils.logging import get_logger, init_logging
from imageprocessor_tpu.utils.retrying import RetryStrategy, retry_async, retry_sync

__all__ = [
    "get_logger",
    "init_logging",
    "RetryStrategy",
    "retry_sync",
    "retry_async",
]
