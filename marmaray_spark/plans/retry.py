"""Retry strategy — reference: M/common/retry/RetryableFunction.java +
SimpleRetryStrategy (3 retries, 1000 ms wait; config keys
marmaray.retry_strategy.simple.*, test default per
marmaray/src/test/resources/config.yaml:13-16)."""

from __future__ import annotations

import functools
import time
from typing import Callable, TypeVar

T = TypeVar("T")

DEFAULT_NUM_RETRIES = 3
DEFAULT_WAIT_MS = 1000


class SimpleRetryStrategy:
    def __init__(self, num_retries: int = DEFAULT_NUM_RETRIES,
                 wait_ms: int = DEFAULT_WAIT_MS,
                 retry_on: tuple[type[BaseException], ...] = (Exception,)) -> None:
        self.num_retries = num_retries
        self.wait_ms = wait_ms
        self.retry_on = retry_on

    def call(self, fn: Callable[..., T], *args, **kwargs) -> T:
        attempt = 0
        while True:
            try:
                return fn(*args, **kwargs)
            except self.retry_on:
                attempt += 1
                if attempt > self.num_retries:
                    raise
                time.sleep(self.wait_ms / 1000.0)


def retryable(num_retries: int = DEFAULT_NUM_RETRIES, wait_ms: int = DEFAULT_WAIT_MS,
              retry_on: tuple[type[BaseException], ...] = (Exception,)):
    """Decorator form: @retryable(3, 1000)."""
    strategy = SimpleRetryStrategy(num_retries, wait_ms, retry_on)

    def deco(fn: Callable[..., T]) -> Callable[..., T]:
        @functools.wraps(fn)
        def wrapper(*args, **kwargs) -> T:
            return strategy.call(fn, *args, **kwargs)
        return wrapper
    return deco
