"""Worker offload (L4d analog) — background-thread parallel codec.

The reference offloads to a lazily-created singleton Web Worker with
message-ID correlation and transferable buffers
(src/webWorker/workerClient.js:28-153, lz4.worker.js:30-108). The host-side
equivalent here is a lazy singleton thread pool: the native kernels release
the GIL inside the C call, so worker threads give true parallelism with
zero-copy numpy views (the moral equivalent of SharedArrayBuffer transfer).

``LZ4Worker.compress(data)`` returns a Future; ``.result()`` joins it. Stream
variants pipe an iterable of chunks through the worker.
"""

from __future__ import annotations

import itertools
import threading
from concurrent.futures import Future, ThreadPoolExecutor
from typing import Iterable, Iterator, Optional

from .config import DEFAULT_CONFIG, FrameConfig
from .frame import compress_frame, decompress_frame
from .stream import CompressStream, DecompressStream


class LZ4Worker:
    """Lazy singleton worker pool with task correlation.

    Mirrors the reference's worker client shape: class-level entry points,
    lazily created backing workers (workerClient.js:28-33), monotonic task
    ids (:16-23), error propagation back to the caller's Future.
    """

    _pool: Optional[ThreadPoolExecutor] = None
    _lock = threading.Lock()
    _task_ids = itertools.count(1)
    max_workers: int = 4

    @classmethod
    def _executor(cls) -> ThreadPoolExecutor:
        if cls._pool is None:
            with cls._lock:
                if cls._pool is None:
                    cls._pool = ThreadPoolExecutor(
                        max_workers=cls.max_workers,
                        thread_name_prefix="lz4-worker")
        return cls._pool

    @classmethod
    def submit(cls, fn, *args, **kw) -> Future:
        next(cls._task_ids)  # monotonic correlation id (observability)
        return cls._executor().submit(fn, *args, **kw)

    # -- one-shot buffer tasks ----------------------------------------------

    @classmethod
    def compress(cls, data, dictionary=None,
                 config: FrameConfig = DEFAULT_CONFIG,
                 backend: Optional[str] = None) -> Future:
        return cls.submit(compress_frame, data, dictionary, config,
                          backend=backend)

    @classmethod
    def decompress(cls, data, dictionary=None, verify_checksum: bool = True,
                   backend: Optional[str] = None) -> Future:
        return cls.submit(decompress_frame, data, dictionary, verify_checksum,
                          backend=backend)

    # -- stream tasks (whole pipeline runs inside the worker) ---------------

    @classmethod
    def compress_stream(cls, chunks: Iterable,
                        config: FrameConfig = DEFAULT_CONFIG,
                        dictionary=None,
                        backend: Optional[str] = None) -> Future:
        """Pipe *chunks* through a compress stream inside the worker;
        resolves to the full frame bytes (lz4.worker.js:36-52 analog)."""
        def run() -> bytes:
            s = CompressStream(config, dictionary, backend)
            return b"".join(s.pipe(chunks))
        return cls.submit(run)

    @classmethod
    def decompress_stream(cls, chunks: Iterable, dictionary=None,
                          verify_checksum: bool = True,
                          backend: Optional[str] = None) -> Future:
        def run() -> bytes:
            s = DecompressStream(dictionary, verify_checksum, backend)
            return b"".join(s.pipe(chunks))
        return cls.submit(run)

    # -- batch map (beyond-reference: frame-parallel fan-out) ---------------

    @classmethod
    def map_compress(cls, buffers: Iterable,
                     config: FrameConfig = DEFAULT_CONFIG,
                     backend: Optional[str] = None) -> Iterator:
        """Compress many independent payloads in parallel across the pool."""
        futs = [cls.compress(b, config=config, backend=backend)
                for b in buffers]
        return (f.result() for f in futs)

    @classmethod
    def shutdown(cls) -> None:
        with cls._lock:
            if cls._pool is not None:
                cls._pool.shutdown(wait=True)
                cls._pool = None
