"""Worker offload (L4d analog) — background thread/process parallel codec.

The reference offloads to a lazily-created singleton Web Worker with
message-ID correlation and transferable buffers
(src/webWorker/workerClient.js:28-153, lz4.worker.js:30-108). The host-side
equivalent here is a lazy singleton pool:

- THREAD pool (default): the native kernels release the GIL inside the C
  call, so worker threads give true parallelism with zero-copy numpy views
  (the moral equivalent of SharedArrayBuffer transfer).
- PROCESS pool (``LZ4Worker.configure(use_processes=True)``): one-shot
  buffer tasks run in separate interpreters — real parallelism even on the
  pure-Python backend, at the cost of pickling the buffers (the moral
  equivalent of structured-clone postMessage). Stream tasks always use
  threads (their chunk iterables are not picklable in general).

``LZ4Worker.compress(data)`` returns a Future; ``.result()`` joins it. Stream
variants pipe an iterable of chunks through the worker.
"""

from __future__ import annotations

import itertools
import threading
from concurrent.futures import Executor, Future, ProcessPoolExecutor, \
    ThreadPoolExecutor
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

    _pool: Optional[Executor] = None
    _thread_pool: Optional[ThreadPoolExecutor] = None
    _lock = threading.Lock()
    _task_ids = itertools.count(1)
    max_workers: int = 4
    use_processes: bool = False

    @classmethod
    def configure(cls, max_workers: Optional[int] = None,
                  use_processes: Optional[bool] = None) -> None:
        """Reconfigure the pool (shuts down any existing one)."""
        with cls._lock:
            if cls._pool is not None:
                cls._pool.shutdown(wait=True)
                cls._pool = None
            if cls._thread_pool is not None:
                cls._thread_pool.shutdown(wait=True)
                cls._thread_pool = None
            if max_workers is not None:
                cls.max_workers = max_workers
            if use_processes is not None:
                cls.use_processes = use_processes

    @classmethod
    def _executor(cls) -> Executor:
        if cls._pool is None:
            with cls._lock:
                if cls._pool is None:
                    if cls.use_processes:
                        # spawn, not fork: the parent process is routinely
                        # multithreaded (JAX runtime threads, the shared
                        # host pool) and fork() under threads is a latent
                        # deadlock — CPython warns and POSIX only promises
                        # async-signal-safe code between fork and exec.
                        import multiprocessing
                        cls._pool = ProcessPoolExecutor(
                            max_workers=cls.max_workers,
                            mp_context=multiprocessing.get_context("spawn"))
                    else:
                        cls._pool = ThreadPoolExecutor(
                            max_workers=cls.max_workers,
                            thread_name_prefix="lz4-worker")
        return cls._pool

    @classmethod
    def _thread_executor(cls) -> ThreadPoolExecutor:
        """Stream tasks always run on threads (closures aren't picklable)."""
        if not cls.use_processes:
            return cls._executor()  # type: ignore[return-value]
        if cls._thread_pool is None:
            with cls._lock:
                if cls._thread_pool is None:
                    cls._thread_pool = ThreadPoolExecutor(
                        max_workers=cls.max_workers,
                        thread_name_prefix="lz4-worker")
        return cls._thread_pool

    @classmethod
    def submit(cls, fn, *args, **kw) -> Future:
        next(cls._task_ids)  # monotonic correlation id (observability)
        return cls._executor().submit(fn, *args, **kw)

    @classmethod
    def _submit_thread(cls, fn, *args, **kw) -> Future:
        next(cls._task_ids)
        return cls._thread_executor().submit(fn, *args, **kw)

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
        return cls._submit_thread(run)

    @classmethod
    def decompress_stream(cls, chunks: Iterable, dictionary=None,
                          verify_checksum: bool = True,
                          backend: Optional[str] = None) -> Future:
        def run() -> bytes:
            s = DecompressStream(dictionary, verify_checksum, backend)
            return b"".join(s.pipe(chunks))
        return cls._submit_thread(run)

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
            if cls._thread_pool is not None:
                cls._thread_pool.shutdown(wait=True)
                cls._thread_pool = None
