"""Async execution mode (L4c analog).

The reference's async layer time-slices the event loop between chunks
(src/stream/streamAsyncCompress.js:23-98, streamAsyncDecompress.js:23-84)
because JavaScript has one thread. Here the chunk work additionally runs on
an executor thread — the native kernels release the GIL during the C call, so
``compress_async`` genuinely overlaps with other asyncio work.

API parity: compress_async / decompress_async one-shot promise helpers, and
async transform streams with scheduler-gated transforms.
"""

from __future__ import annotations

import asyncio
from typing import AsyncIterator, Iterable, Optional, Union

import numpy as np

from .config import DEFAULT_CONFIG, FrameConfig
from .scheduler import Scheduler
from .stream import LZ4Decoder, LZ4Encoder


class AsyncCompressStream:
    """Async transform stream: chunks in, frame bytes out."""

    def __init__(self, config: FrameConfig = DEFAULT_CONFIG, dictionary=None,
                 scheduler: Optional[Scheduler] = None,
                 backend: Optional[str] = None):
        self._enc = LZ4Encoder(config, dictionary, backend)
        self._sched = scheduler or Scheduler(1)

    async def write(self, chunk) -> bytes:
        parts = await self._sched.run(self._enc.add, chunk)
        return b"".join(parts)

    async def flush(self) -> bytes:
        parts = await self._sched.run(self._enc.finish)
        return b"".join(parts)

    async def pipe(self, chunks) -> AsyncIterator[bytes]:
        async for c in _aiter(chunks):
            out = await self.write(c)
            if out:
                yield out
        tail = await self.flush()
        if tail:
            yield tail


class AsyncDecompressStream:
    """Async transform stream: frame bytes in, plaintext chunks out."""

    def __init__(self, dictionary=None, verify_checksum: bool = True,
                 scheduler: Optional[Scheduler] = None,
                 backend: Optional[str] = None):
        self._dec = LZ4Decoder(dictionary, verify_checksum, backend)
        self._sched = scheduler or Scheduler(1)

    async def write(self, chunk) -> bytes:
        parts = await self._sched.run(self._dec.update, chunk)
        return b"".join(bytes(p) for p in parts)

    async def flush(self) -> bytes:
        return b""  # frames self-terminate

    async def pipe(self, chunks) -> AsyncIterator[bytes]:
        async for c in _aiter(chunks):
            out = await self.write(c)
            if out:
                yield out


def create_async_compress_stream(config: FrameConfig = DEFAULT_CONFIG,
                                 dictionary=None,
                                 scheduler: Optional[Scheduler] = None,
                                 backend: Optional[str] = None
                                 ) -> AsyncCompressStream:
    return AsyncCompressStream(config, dictionary, scheduler, backend)


def create_async_decompress_stream(dictionary=None,
                                   verify_checksum: bool = True,
                                   scheduler: Optional[Scheduler] = None,
                                   backend: Optional[str] = None
                                   ) -> AsyncDecompressStream:
    return AsyncDecompressStream(dictionary, verify_checksum, scheduler,
                                 backend)


async def compress_async(data, dictionary=None,
                         config: FrameConfig = DEFAULT_CONFIG,
                         chunk_size: int = 1 << 22,
                         backend: Optional[str] = None) -> bytes:
    """One-shot async compress: feeds *data* through the async stream in
    chunk_size slices, yielding the event loop between chunks
    (streamAsyncCompress.js:70-98)."""
    from .utils import ensure_buffer
    buf = ensure_buffer(data)
    stream = AsyncCompressStream(config, dictionary, backend=backend)
    parts = []
    for i in range(0, max(len(buf), 1), chunk_size):
        parts.append(await stream.write(buf[i: i + chunk_size]))
    parts.append(await stream.flush())
    return b"".join(parts)


async def decompress_async(data, dictionary=None,
                           verify_checksum: bool = True,
                           chunk_size: int = 1 << 22,
                           backend: Optional[str] = None) -> bytes:
    """One-shot async decompress (streamAsyncDecompress.js:57-84)."""
    from .utils import ensure_buffer
    buf = ensure_buffer(data)
    stream = AsyncDecompressStream(dictionary, verify_checksum,
                                   backend=backend)
    parts = []
    for i in range(0, max(len(buf), 1), chunk_size):
        parts.append(await stream.write(buf[i: i + chunk_size]))
    return b"".join(parts)


async def _aiter(it: Union[Iterable, AsyncIterator]):
    if hasattr(it, "__aiter__"):
        async for x in it:
            yield x
    else:
        for x in it:
            await asyncio.sleep(0)
            yield x
