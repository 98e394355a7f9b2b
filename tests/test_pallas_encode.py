"""Pallas encode kernel (interpret mode): byte-identical to the reference
encoder. Compiled-path status in the module docstring (Mosaic compile hang)."""

import numpy as np
import pytest

from divortio_lz4_tpu import compress_raw, decompress_raw
from divortio_lz4_tpu.ops.pallas_encode import encode_block_pallas_host


CASES = {
    "text": np.frombuffer(b"the quick brown fox jumps! " * 200, np.uint8),
    "rle": np.full(4000, 7, np.uint8),
    "offset3": np.tile(np.array([1, 2, 3], np.uint8), 800),
    "json": np.frombuffer(b'{"a":1,"bb":"xyz"}' * 300, np.uint8),
    "long_matches": np.tile(np.frombuffer(b"0123456789abcdef", np.uint8),
                            700),
}


@pytest.mark.parametrize("name", sorted(CASES))
def test_pallas_encode_byte_identical(name):
    data = CASES[name]
    ref = np.asarray(compress_raw(data))  # host tier == reference encoder
    got = encode_block_pallas_host(data)
    np.testing.assert_array_equal(got, ref)


def test_pallas_encode_random(rng):
    data = rng.integers(0, 256, 2000, dtype=np.uint8)
    ref = np.asarray(compress_raw(data))
    got = encode_block_pallas_host(data)
    np.testing.assert_array_equal(got, ref)


def test_pallas_encode_roundtrip(compressible):
    data = np.asarray(compressible(5000))
    comp = encode_block_pallas_host(data)
    out = np.empty(len(data), np.uint8)
    n = decompress_raw(np.asarray(comp), out)
    assert n == len(data)
    np.testing.assert_array_equal(out, data)
