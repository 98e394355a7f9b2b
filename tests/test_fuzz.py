"""Deterministic robustness fuzz: hostile inputs must raise typed errors or
return data — never crash, hang, or read out of bounds.

The reference's JS memory model silently drops OOB writes (SURVEY §5.2);
the native C++ tier has no such safety net, so this suite is the bounds
discipline proof for both host backends.
"""

import numpy as np
import pytest

from divortio_lz4_tpu import FrameConfig, compress_frame, decompress_frame
from divortio_lz4_tpu.stream import LZ4Decoder


def _try_decode(frame_bytes, backend):
    try:
        decompress_frame(np.frombuffer(frame_bytes, np.uint8),
                         backend=backend)
    except (ValueError, IndexError):
        pass  # typed rejection is fine; crashes/hangs are not


@pytest.mark.parametrize("backend", ["python", "native"])
def test_truncation_fuzz(backend, compressible):
    frame = bytes(compress_frame(
        compressible(5000),
        config=FrameConfig(block_size=65536, content_checksum=True)))
    for cut in range(0, len(frame), 7):
        _try_decode(frame[:cut], backend)


@pytest.mark.parametrize("backend", ["python", "native"])
def test_mutation_fuzz(backend, compressible, rng):
    base = bytes(compress_frame(
        compressible(3000), config=FrameConfig(block_size=65536)))
    for _ in range(150):
        buf = bytearray(base)
        for _ in range(int(rng.integers(1, 4))):
            pos = int(rng.integers(0, len(buf)))
            buf[pos] = int(rng.integers(0, 256))
        _try_decode(bytes(buf), backend)


@pytest.mark.parametrize("backend", ["python", "native"])
def test_garbage_fuzz(backend, rng):
    magic = bytes([0x04, 0x22, 0x4D, 0x18])
    for n in (0, 1, 4, 7, 32, 300):
        _try_decode(bytes(rng.integers(0, 256, n, dtype=np.uint8)), backend)
        _try_decode(magic + bytes(rng.integers(0, 256, n, dtype=np.uint8)),
                    backend)


def test_streaming_fsm_mutation_fuzz(compressible, rng):
    base = bytes(compress_frame(
        compressible(3000), config=FrameConfig(block_size=65536)))
    for _ in range(60):
        buf = bytearray(base)
        buf[int(rng.integers(0, len(buf)))] = int(rng.integers(0, 256))
        dec = LZ4Decoder()
        try:
            for i in range(0, len(buf), 97):
                dec.update(bytes(buf[i: i + 97]))
        except (ValueError, IndexError):
            pass
