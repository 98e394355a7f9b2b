"""Pallas decode kernel (interpret mode on CPU; compiled path covered by the
TPU bench). Bit-exactness across every copy-strategy branch."""

import numpy as np
import pytest

from divortio_lz4_tpu import compress_raw
from divortio_lz4_tpu.backends import get_backend
from divortio_lz4_tpu.constants import block_bound
from divortio_lz4_tpu.ops.block_ref import new_hash_table
from divortio_lz4_tpu.ops.pallas_decode import (
    decode_block_pallas_host,
    decode_blocks_pallas,
)


def roundtrip(data, hist=None):
    if hist is not None:
        be = get_backend()
        combined = np.concatenate([hist, data])
        table = new_hash_table()
        be.warm_table(table, combined, len(hist))
        out = np.empty(block_bound(len(data)), np.uint8)
        n = be.compress_block(combined, out, len(hist), len(data), table, 0)
        comp = out[:n]
    else:
        comp = np.asarray(compress_raw(data))
    got = decode_block_pallas_host(np.asarray(comp), len(data), hist)
    np.testing.assert_array_equal(got, data)


CASES = {
    "literals_only": None,  # filled in test
    "far_offsets": np.frombuffer(b'{"a":1,"bb":"xyz"}' * 300, np.uint8),
    "offset3_periodize": np.tile(np.array([1, 2, 3], np.uint8), 800),
    "offset2": np.tile(np.array([9, 8], np.uint8), 900),
    "offset1_rle": np.full(4000, 7, np.uint8),
    "text": np.frombuffer(b"the quick brown fox jumps! " * 200, np.uint8),
    "long_matches": np.tile(np.frombuffer(b"0123456789abcdef", np.uint8),
                            700),
}


@pytest.mark.parametrize("name", sorted(k for k in CASES if CASES[k] is not None))
def test_pallas_decode_branches(name):
    roundtrip(CASES[name])


def test_pallas_decode_literals_only(rng):
    roundtrip(rng.integers(0, 256, 2000, dtype=np.uint8))


def test_pallas_decode_long_literal_extension(rng):
    roundtrip(rng.integers(0, 256, 700, dtype=np.uint8))


def test_pallas_decode_mixed(compressible, rng):
    data = np.concatenate([rng.integers(0, 256, 3000, dtype=np.uint8),
                           np.asarray(compressible(8000)),
                           np.full(2000, 3, np.uint8)])
    roundtrip(data)


def test_pallas_decode_with_history(compressible):
    hist = np.asarray(compressible(3000))
    data = np.asarray(compressible(2500))
    roundtrip(data, hist)


def test_pallas_decode_history_spanning():
    hist = np.tile(np.frombuffer(b"ABCDEFGH", np.uint8), 30)
    data = np.tile(np.frombuffer(b"ABCDEFGH", np.uint8), 200)
    roundtrip(data, hist)


def test_pallas_decode_batch(compressible, rng):
    import jax.numpy as jnp
    from divortio_lz4_tpu.ops.pallas_decode import SLACK, _round_up
    blocks = [np.asarray(compressible(2048)),
              rng.integers(0, 256, 2048, dtype=np.uint8),
              np.tile(np.array([5, 4, 3], np.uint8), 683)[:2048],
              np.full(2048, 9, np.uint8),
              np.asarray(compressible(1000))]  # 5 rows -> padded to 8
    comps = [np.asarray(compress_raw(b)) for b in blocks]
    M = _round_up(max(len(c) for c in comps) + SLACK, 1024)
    comp = np.zeros((len(blocks), M), np.int32)
    lens = np.zeros(len(blocks), np.int32)
    for i, c in enumerate(comps):
        comp[i, : len(c)] = c
        lens[i] = len(c)
    hist = np.zeros((len(blocks), 65536), np.int32)
    out, out_lens = decode_blocks_pallas(
        jnp.asarray(comp), jnp.asarray(lens), jnp.asarray(hist), 2048,
        False, True)
    for i, b in enumerate(blocks):
        assert int(out_lens[i]) == len(b)
        np.testing.assert_array_equal(
            np.asarray(out[i][: len(b)]).astype(np.uint8), b)


def test_smem_stream_paths_identical(compressible):
    """The SMEM scalar-parse path and the vreg-extract path must produce
    identical output (same kernel semantics, different parse memory)."""
    import jax.numpy as jnp

    import divortio_lz4_tpu as lz4
    from divortio_lz4_tpu.ops.pallas_decode import (
        SLACK, _round_up, decode_blocks_pallas)

    data = np.asarray(compressible(32768))
    comp_b = np.asarray(lz4.compress_raw(data))
    M = _round_up(len(comp_b) + SLACK, 1024)
    comp = np.zeros((8, M), np.int32)
    lens = np.zeros(8, np.int32)
    for i in range(8):
        comp[i, : len(comp_b)] = comp_b
        lens[i] = len(comp_b)
    hist = jnp.zeros((8, 65536), jnp.int32)
    a = decode_blocks_pallas(jnp.asarray(comp), jnp.asarray(lens), hist,
                             32768, False, True, smem_stream=True)
    b = decode_blocks_pallas(jnp.asarray(comp), jnp.asarray(lens), hist,
                             32768, False, True, smem_stream=False)
    np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))
    np.testing.assert_array_equal(np.asarray(a[1]), np.asarray(b[1]))
    np.testing.assert_array_equal(np.asarray(a[0][0][:32768]).astype(np.uint8),
                                  data)


def test_linked_chunk_kernel_roundtrip(compressible):
    """Chained linked decode: one kernel call decodes dependent blocks with
    cross-block back-references, window carried between calls."""
    import jax.numpy as jnp

    from divortio_lz4_tpu import FrameConfig, compress
    from divortio_lz4_tpu.parallel.device import (
        _decode_linked_pallas, parse_block_index)

    data = np.asarray(compressible(300000))  # 5 linked 64 KB blocks
    cfg = FrameConfig(block_size=65536, block_independence=False)
    frame = np.array(compress(data, config=cfg))
    header, blocks, _ = parse_block_index(frame)
    assert not header["independent"] and len(blocks) > 1
    out = _decode_linked_pallas(frame, blocks, header["block_max"])
    np.testing.assert_array_equal(out, data)


def test_linked_pallas_engine_stored_blocks(rng, compressible):
    """Linked frames mixing compressed and stored blocks through the
    public device decode with engine='pallas'."""
    from divortio_lz4_tpu import FrameConfig, compress
    from divortio_lz4_tpu.parallel.device import device_decompress_frame

    data = np.concatenate([
        np.asarray(compressible(90000)),
        rng.integers(0, 256, 70000, dtype=np.uint8),  # stored rows
        np.asarray(compressible(80000)),
    ])
    cfg = FrameConfig(block_size=65536, block_independence=False)
    frame = np.array(compress(data, config=cfg))
    out = device_decompress_frame(frame, engine="pallas")
    np.testing.assert_array_equal(np.asarray(out), data)


def test_linked_pallas_engine_dictionary(compressible):
    from divortio_lz4_tpu import FrameConfig, compress
    from divortio_lz4_tpu.parallel.device import device_decompress_frame

    d = np.asarray(compressible(5000))
    data = np.asarray(compressible(150000))
    cfg = FrameConfig(block_size=65536, block_independence=False)
    frame = np.array(compress(data, dictionary=d, config=cfg))
    out = device_decompress_frame(frame, engine="pallas", dictionary=d)
    np.testing.assert_array_equal(np.asarray(out), data)


def test_linked_pallas_matches_xla_scan(compressible):
    """Same frame through both linked device decoders."""
    from divortio_lz4_tpu import FrameConfig, compress
    from divortio_lz4_tpu.parallel.device import (
        _decode_linked, _decode_linked_pallas, parse_block_index)

    data = np.asarray(compressible(200000))
    cfg = FrameConfig(block_size=65536, block_independence=False)
    frame = np.array(compress(data, config=cfg))
    _, blocks, _ = parse_block_index(frame)
    np.testing.assert_array_equal(
        _decode_linked_pallas(frame, blocks, 65536),
        _decode_linked(frame, blocks, 65536))


@pytest.mark.skipif("jax.default_backend() != 'tpu'")
def test_linked_pallas_real_tpu_parity(compressible):
    """Hardware parity marker (VERDICT r3 #6) for the compiled linked-chunk
    Mosaic kernel."""
    from divortio_lz4_tpu import FrameConfig, compress
    from divortio_lz4_tpu.parallel.device import device_decompress_frame

    data = np.asarray(compressible(1_000_000))
    cfg = FrameConfig(block_size=65536, block_independence=False)
    frame = np.array(compress(data, config=cfg))
    out = device_decompress_frame(frame, engine="pallas")
    np.testing.assert_array_equal(np.asarray(out), data)


import jax  # noqa: E402,F401  (the TPU-parity skipif marker evaluates it)
