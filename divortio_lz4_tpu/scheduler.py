"""Concurrency-limited FIFO task scheduler.

Async analog of the reference's semaphore scheduler
(src/stream/scheduler.js:10-41): at most *concurrency* tasks run at once;
excess awaiters queue FIFO. Between chunks this yields the event loop — the
entire "time-slicing" machinery of the reference's async mode.
"""

from __future__ import annotations

import asyncio
from typing import Awaitable, Callable, TypeVar

T = TypeVar("T")


class Scheduler:
    def __init__(self, concurrency: int = 1):
        if concurrency < 1:
            raise ValueError("LZ4: Scheduler concurrency must be >= 1")
        self.concurrency = concurrency
        self._sem: asyncio.Semaphore | None = None

    def _semaphore(self) -> asyncio.Semaphore:
        # Lazily bound to the running loop (a Semaphore created outside a
        # loop cannot be reused across loops).
        if self._sem is None:
            self._sem = asyncio.Semaphore(self.concurrency)
        return self._sem

    async def schedule(self, task: Callable[[], Awaitable[T]]) -> T:
        """Run *task* when a slot frees up; FIFO under contention."""
        async with self._semaphore():
            return await task()

    async def run(self, fn: Callable[..., T], *args, **kw) -> T:
        """Schedule a synchronous callable onto the default executor."""
        loop = asyncio.get_running_loop()
        async with self._semaphore():
            return await loop.run_in_executor(None, lambda: fn(*args, **kw))
