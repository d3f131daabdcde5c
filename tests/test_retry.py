"""Retry-strategy behavior tests (reference: wbf retry.Strategy semantics)."""

import asyncio

import pytest

from imageprocessor_tpu.utils.retrying import RetryStrategy, retry_async, retry_sync


def test_sync_succeeds_after_failures():
    calls = []

    def flaky():
        calls.append(1)
        if len(calls) < 3:
            raise IOError("transient")
        return "ok"

    slept = []
    out = retry_sync(RetryStrategy(attempts=3, delay_ms=10, backoff=2.0),
                     flaky, sleep=slept.append)
    assert out == "ok"
    assert len(calls) == 3
    assert slept == [0.01, 0.02]


def test_sync_exhausts_and_raises():
    def always_fail():
        raise IOError("nope")

    with pytest.raises(IOError):
        retry_sync(RetryStrategy(attempts=2, delay_ms=1), always_fail,
                   sleep=lambda _: None)


def test_non_retryable_raises_immediately():
    calls = []

    def fail():
        calls.append(1)
        raise ValueError("fatal")

    with pytest.raises(ValueError):
        retry_sync(RetryStrategy(attempts=5, delay_ms=1), fail,
                   retryable=lambda e: not isinstance(e, ValueError),
                   sleep=lambda _: None)
    assert len(calls) == 1


def test_async_retry():
    calls = []

    async def flaky():
        calls.append(1)
        if len(calls) < 2:
            raise IOError("transient")
        return 42

    out = asyncio.run(retry_async(RetryStrategy(attempts=3, delay_ms=1), flaky))
    assert out == 42
    assert len(calls) == 2
