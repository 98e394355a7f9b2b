"""Shared host thread pool for the codec's INTERNAL parallelism.

The native select/serialize and record-parse kernels release the GIL
(ctypes), so frame paths fan blocks across threads. Creating a
ThreadPoolExecutor per call costs ~1-2 ms on this class of host — a
visible tax when the whole serialize tail is <10 ms — so every internal
call site shares one lazy pool. Distinct from the user-facing LZ4Worker
pools (worker.py): those carry user tasks and user-configurable sizing;
this one is an implementation detail of the device frame paths.
"""

from __future__ import annotations

import os
import threading
from concurrent.futures import ThreadPoolExecutor

_pool: ThreadPoolExecutor | None = None
_lock = threading.Lock()


def _reset_after_fork() -> None:
    # A forked child inherits a non-None _pool whose worker threads do not
    # exist in the child — queueing work into it would hang forever. Drop
    # the reference (no shutdown: the executor's queue/threads belong to
    # the parent) so the child lazily rebuilds its own pool.
    global _pool, _lock
    _pool = None
    _lock = threading.Lock()


os.register_at_fork(after_in_child=_reset_after_fork)


def host_pool() -> ThreadPoolExecutor:
    """The shared internal pool (lazy, process-lifetime)."""
    global _pool
    if _pool is None:
        with _lock:
            if _pool is None:
                _pool = ThreadPoolExecutor(
                    max_workers=min(os.cpu_count() or 1, 8),
                    thread_name_prefix="lz4-host")
    return _pool
