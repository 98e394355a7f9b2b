"""Test harness configuration.

Forces JAX onto a virtual 8-device CPU mesh BEFORE jax initializes, so the
multi-chip sharding paths are exercised without TPU hardware (SURVEY §4:
multi-device simulation via a fake-device mesh). Must run before any module
imports jax.
"""

import os

# Force CPU even when the session env points at real TPU hardware
# (JAX_PLATFORMS=axon): the suite must exercise the virtual 8-device mesh.
# LZ4T_TPU_TESTS=1 opts OUT of the forcing so the
# skipif-not-tpu parity markers run on the real chip
# (`LZ4T_TPU_TESTS=1 python -m pytest tests/ -q -m ''` on hardware —
# serialize with any other TPU job; compiles ride the persistent cache).
_USE_TPU = os.environ.get("LZ4T_TPU_TESTS") == "1"
if not _USE_TPU:
    os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax
import numpy as np
import pytest

# The environment's site hook registers the real-TPU backend and overrides
# jax_platforms at interpreter start; force it back to CPU before any
# backend initializes so the suite runs on the virtual 8-device mesh.
if not _USE_TPU:
    jax.config.update("jax_platforms", "cpu")

# Persistent compile cache: the XLA codec kernels are large graphs; caching
# amortizes their compile time across test runs.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


@pytest.fixture
def rng():
    return np.random.default_rng(0xD1507)


def make_compressible(n: int, rng=None) -> np.ndarray:
    """Synthetic compressible corpus: repeated JSON-ish event records
    (benchmark/src/base/benchUtils.js:7-22 analog)."""
    rng = rng or np.random.default_rng(42)
    record = (b'{"ts":1700000000,"level":"info","service":"api-gateway",'
              b'"msg":"request completed","status":200,"latency_ms":42,'
              b'"path":"/v1/users/12345","trace":"abcdef0123456789"}\n')
    reps = -(-n // len(record))
    return np.frombuffer((record * reps)[:n], dtype=np.uint8)


@pytest.fixture
def compressible():
    return make_compressible
