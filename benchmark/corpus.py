"""Benchmark corpora.

- synthetic_json(size): the reference's repeated ~120B JSON event corpus
  (benchmark/src/base/benchUtils.js:7-22).
- silesia_like(size): deterministic mixed corpus approximating the Silesia
  profile (text, source, binary, logs, long runs, incompressible). The real
  Silesia tarball cannot be fetched in this zero-egress environment
  (benchSilesia.js downloads it, :29-64); if a local copy exists at
  $SILESIA_DIR it is used instead.
"""

from __future__ import annotations

import glob
import os

import numpy as np


def synthetic_json(size: int) -> np.ndarray:
    rec = (b'{"ts":1700000000,"level":"info","service":"api-gateway",'
           b'"msg":"request completed","status":200,"latency_ms":%d,'
           b'"path":"/v1/users/%d","trace":"abcdef0123456789"}\n')
    out = b"".join(rec % (i % 900, i * 7919 % 100000)
                   for i in range(size // 120 + 1))
    return np.frombuffer(out[:size], np.uint8)


def _file_bytes(paths, cap: int) -> np.ndarray:
    data = b""
    for p in paths:
        try:
            with open(p, "rb") as f:
                data += f.read()
        except OSError:
            continue
        if len(data) >= cap:
            break
    return np.frombuffer(data[:cap], np.uint8)


def silesia_files() -> dict[str, np.ndarray] | None:
    """Real Silesia corpus if present locally (dir of files), else None."""
    d = os.environ.get("SILESIA_DIR", "/root/silesia")
    if not os.path.isdir(d):
        return None
    out = {}
    for p in sorted(glob.glob(os.path.join(d, "*"))):
        if os.path.isfile(p):
            with open(p, "rb") as f:
                out[os.path.basename(p)] = np.frombuffer(f.read(), np.uint8)
    return out or None


def silesia_like(size: int, seed: int = 0x51E51A) -> np.ndarray:
    rng = np.random.default_rng(seed)
    chunk = size // 8
    parts = [
        _file_bytes(sorted(glob.glob(
            "/usr/local/lib/python3.12/**/*.py", recursive=True)), 2 * chunk),
        _file_bytes(["/usr/bin/g++-12", "/usr/bin/cmake", "/bin/bash"],
                    2 * chunk),
        synthetic_json(2 * chunk),
        np.repeat(rng.integers(0, 256, max(size // 16 // 512, 1),
                               dtype=np.uint8), 512)[: size // 16],
        rng.integers(0, 256, size // 16, dtype=np.uint8),
    ]
    corpus = np.concatenate(parts)
    if len(corpus) < size:
        corpus = np.tile(corpus, -(-size // len(corpus)))
    return corpus[:size]
