"""Retry policy with exponential backoff.

Mirrors wbf's `retry.Strategy{Attempts, Delay, Backoff}` used for every DB,
queue and object-store call in the reference (reference:
internal/config/config.go:76-82; defaults 3 attempts / 2000 ms / 2.0 backoff
per .env.example:19-21). Both sync and asyncio call sites are supported.
"""

from __future__ import annotations

import asyncio
import time
from dataclasses import dataclass
from typing import Awaitable, Callable, TypeVar

T = TypeVar("T")


@dataclass(frozen=True)
class RetryStrategy:
    attempts: int = 3
    delay_ms: int = 2000
    backoff: float = 2.0

    def delays(self) -> list[float]:
        """Sleep (seconds) before each re-attempt; empty when attempts<=1."""
        out = []
        d = self.delay_ms / 1000.0
        for _ in range(max(0, self.attempts - 1)):
            out.append(d)
            d *= self.backoff
        return out


def retry_sync(
    strategy: RetryStrategy,
    fn: Callable[[], T],
    *,
    retryable: Callable[[Exception], bool] = lambda _: True,
    sleep: Callable[[float], None] = time.sleep,
) -> T:
    last: Exception | None = None
    delays = strategy.delays()
    for attempt in range(max(1, strategy.attempts)):
        try:
            return fn()
        # Exception, not BaseException: KeyboardInterrupt/SystemExit/
        # CancelledError must abort immediately, never sleep-and-retry.
        except Exception as exc:
            last = exc
            if attempt >= len(delays) or not retryable(exc):
                raise
            sleep(delays[attempt])
    raise last  # pragma: no cover — unreachable


async def retry_async(
    strategy: RetryStrategy,
    fn: Callable[[], Awaitable[T]],
    *,
    retryable: Callable[[Exception], bool] = lambda _: True,
) -> T:
    last: Exception | None = None
    delays = strategy.delays()
    for attempt in range(max(1, strategy.attempts)):
        try:
            return await fn()
        # Exception, not BaseException: CancelledError (BaseException on
        # 3.8+) must propagate for task cancellation to work.
        except Exception as exc:
            last = exc
            if attempt >= len(delays) or not retryable(exc):
                raise
            await asyncio.sleep(delays[attempt])
    raise last  # pragma: no cover
