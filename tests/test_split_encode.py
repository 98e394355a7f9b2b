"""Split encoder (scored chains + record-walk kernel + host serializer,
interpret mode on CPU): sequence-identical wire vs the hybrid walk,
round-trips, ratio gate, overflow fallback, frame integration."""

import numpy as np
import pytest

import divortio_lz4_tpu as lz4
from divortio_lz4_tpu.ops.hybrid_encode import encode_block_hybrid_host
from divortio_lz4_tpu.ops.split_encode import (
    REC_CAP,
    _serialize_records_py,
    encode_block_split_host,
    serialize_block,
    walk_blocks_split,
)


def _roundtrip(data, comp):
    out = np.empty(max(len(data), 1), np.uint8)
    n = lz4.decompress_raw(np.asarray(comp), out)
    assert n == len(data)
    np.testing.assert_array_equal(out[: len(data)], data)


CASES = {
    "text": np.frombuffer(b"the quick brown fox jumps! " * 500, np.uint8),
    "rle": np.full(30000, 7, np.uint8),
    "period3": np.tile(np.array([1, 2, 3], np.uint8), 9000),
    "json": np.frombuffer(b'{"a":1,"bb":"xyz"}' * 800, np.uint8),
    "long_matches": np.tile(np.frombuffer(b"0123456789abcdef", np.uint8),
                            1500),
    "tiny": np.frombuffer(b"abcabcabcabc", np.uint8),
    "empty": np.zeros(0, np.uint8),
}


@pytest.mark.parametrize("name", sorted(CASES))
def test_split_encode_matches_hybrid_wire(name):
    data = CASES[name]
    c = encode_block_split_host(data)
    h = encode_block_hybrid_host(data)
    _roundtrip(data, c)
    if len(data):
        # same chains + same greedy semantics => identical byte stream
        np.testing.assert_array_equal(np.asarray(c), np.asarray(h))
    ref = np.asarray(lz4.compress_raw(data))
    assert len(c) <= max(len(ref), 1)


def test_split_encode_random_incompressible(rng):
    data = rng.integers(0, 256, 5000, dtype=np.uint8)
    c = encode_block_split_host(data)
    _roundtrip(data, c)


def test_split_encode_mixed_corpus(compressible):
    data = np.asarray(compressible(40000))
    c = encode_block_split_host(data, block_size=40960)
    _roundtrip(data, c)
    ref = np.asarray(lz4.compress_raw(data))
    assert len(c) <= len(ref)


def test_split_encode_batch_varied_lens(compressible, rng):
    import jax.numpy as jnp

    B = 2048
    rows = [
        np.asarray(compressible(B)),
        np.zeros(B, np.uint8),
        rng.integers(0, 256, B, np.uint8),
        np.concatenate([np.asarray(compressible(B // 2)),
                        np.zeros(B // 2, np.uint8)]),
    ]
    lens = np.array([B, B, B, B // 2], np.int32)
    work = np.zeros((4, B), np.int32)
    for i, r in enumerate(rows):
        work[i] = r
    recs, meta = walk_blocks_split(jnp.asarray(work), jnp.asarray(lens),
                                   B, 0, 0, True)
    recs_np, meta_np = np.asarray(recs), np.asarray(meta)
    for i in range(4):
        payload = rows[i][: lens[i]]
        assert meta_np[i, 2] == 0
        c = serialize_block(payload, recs_np[i], int(meta_np[i, 0]))
        _roundtrip(payload, c)


def test_split_encode_serializers_agree(compressible):
    import jax.numpy as jnp

    data = np.asarray(compressible(8192))
    work = data.astype(np.int32).reshape(1, -1)
    recs, meta = walk_blocks_split(
        jnp.asarray(work), jnp.asarray(np.array([8192], np.int32)),
        8192, 0, 0, True)
    recs_np = np.asarray(recs[0])[: int(np.asarray(meta)[0, 0])]
    a = serialize_block(data, recs_np, len(recs_np))
    b = _serialize_records_py(data, np.ascontiguousarray(recs_np,
                                                         np.uint32))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_split_encode_continuation_merge(rng):
    """A match far longer than the 128-byte compare window must come back
    as ONE sequence (continuations merged by the serializer)."""
    pat = rng.integers(0, 256, 64, dtype=np.uint8)
    data = np.concatenate([pat, np.tile(pat, 20)])  # 64B lit + 1280B match
    c = encode_block_split_host(data)
    _roundtrip(data, c)
    h = encode_block_hybrid_host(data)
    np.testing.assert_array_equal(np.asarray(c), np.asarray(h))


def test_split_encode_frame_paths(compressible):
    from divortio_lz4_tpu.parallel.device import device_compress_frame

    corpus = np.asarray(compressible(150000))
    cfg = lz4.FrameConfig(block_size=65536, block_independence=True)
    f = device_compress_frame(corpus, cfg, engine="split")
    out = lz4.decompress(np.asarray(f))
    np.testing.assert_array_equal(np.asarray(out), corpus)
    assert len(f) <= len(lz4.compress(corpus, config=cfg))
    # dictionary
    d = bytes(corpus[:4096].tobytes())
    fd = device_compress_frame(corpus[:80000], cfg, engine="split",
                               dictionary=d)
    out = lz4.decompress(np.asarray(fd), dictionary=d)
    np.testing.assert_array_equal(np.asarray(out), corpus[:80000])
