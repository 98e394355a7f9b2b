"""Multi-host orchestration (single-process degenerate path) + CLI."""

import subprocess
import sys

import numpy as np
import pytest

from divortio_lz4_tpu import FrameConfig, decompress_frame
from divortio_lz4_tpu.parallel.multihost import (
    MultiHostCodec,
    shard_bounds,
    maybe_distributed_init,
)


def test_shard_bounds_cover_exactly():
    total = 1_000_003
    for nshards in (1, 2, 3, 7, 8):
        spans = [shard_bounds(total, nshards, i) for i in range(nshards)]
        assert spans[0][0] == 0 and spans[-1][1] == total
        for (a, b), (c, d) in zip(spans, spans[1:]):
            assert b == c
        assert all(b >= a for a, b in spans)


def test_maybe_distributed_init_single_process():
    assert maybe_distributed_init() is False


def test_multihost_codec_single_process(compressible):
    codec = MultiHostCodec(FrameConfig(block_size=65536,
                                       block_independence=True))
    data = np.asarray(compressible(200_000))
    stream = codec.compress_corpus(data)
    assert stream is not None
    # Stream decodes with the host frame decoder (single frame) and the
    # multihost decoder (concatenated-frames path).
    np.testing.assert_array_equal(
        decompress_frame(np.frombuffer(stream, np.uint8)), data)
    out = codec.decompress_corpus(stream)
    np.testing.assert_array_equal(out, data)


def test_cli_roundtrip(tmp_path, compressible):
    data = bytes(compressible(300_000))
    src = tmp_path / "file.bin"
    src.write_bytes(data)
    comp = tmp_path / "file.bin.lz4"
    out = tmp_path / "file.out"
    r1 = subprocess.run(
        [sys.executable, "-m", "divortio_lz4_tpu", "compress", str(src),
         "-o", str(comp), "--checksum", "-b", "65536"],
        capture_output=True, text=True, cwd="/root/repo",
        env={"PATH": "/usr/bin:/bin", "JAX_PLATFORMS": "cpu",
             "PYTHONPATH": "/root/repo"})
    assert r1.returncode == 0, r1.stderr
    assert comp.stat().st_size < len(data)
    r2 = subprocess.run(
        [sys.executable, "-m", "divortio_lz4_tpu", "decompress", str(comp),
         "-o", str(out)],
        capture_output=True, text=True, cwd="/root/repo",
        env={"PATH": "/usr/bin:/bin", "JAX_PLATFORMS": "cpu",
             "PYTHONPATH": "/root/repo"})
    assert r2.returncode == 0, r2.stderr
    assert out.read_bytes() == data
