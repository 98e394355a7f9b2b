"""Split decode path (host parse + interleaved all-vector Pallas copies,
interpret mode on CPU): bit-exactness vs the host tier, the parser's record
contract, error taxonomy, and hostile-record containment."""

import numpy as np
import pytest

import divortio_lz4_tpu as lz4
from divortio_lz4_tpu.ops.block_ref import compress_block_ref
from divortio_lz4_tpu.ops.pallas_split_decode import (
    LANES,
    NOOP_W0,
    NOOP_W1,
    SLACK,
    W,
    _parse_records_py,
    decode_block_split_host,
    decode_blocks_split,
    parse_block_batch,
    parse_records,
    plan_ways,
)


def _cases(rng, compressible):
    return {
        "text": np.frombuffer(b"the quick brown fox jumps! " * 900,
                              np.uint8),
        "rle": np.full(20000, 7, np.uint8),
        "period3": np.tile(np.array([1, 2, 3], np.uint8), 8000),
        "period200": np.tile(rng.integers(0, 256, 200, np.uint8), 120),
        "period130": np.tile(rng.integers(0, 256, 130, np.uint8), 180),
        "json": np.frombuffer(b'{"a":1,"bb":"xyz"}' * 1300, np.uint8),
        "mixed": np.asarray(compressible(30000)),
        "tiny": np.frombuffer(b"compress me compress me!", np.uint8),
        "longlit": np.concatenate(
            [rng.integers(0, 256, 500, np.uint8),
             np.full(300, 9, np.uint8),
             rng.integers(0, 256, 400, np.uint8)]),
    }


@pytest.mark.parametrize("name", ["text", "rle", "period3", "period200",
                                  "period130", "json", "mixed", "tiny",
                                  "longlit"])
def test_split_decode_bit_exact(name, rng, compressible):
    data = _cases(rng, compressible)[name]
    comp = np.asarray(lz4.compress_raw(data))
    if len(comp) >= len(data):
        pytest.skip("stored-class block")
    out = decode_block_split_host(comp, max(len(data), 1))
    np.testing.assert_array_equal(out, data)


def test_split_decode_with_history(compressible):
    data = np.asarray(compressible(70000))
    hist, plain = data[:30000], data[30000:]
    table = np.zeros(16384, np.int32)
    dst = np.zeros(len(data) * 2 + 1024, np.uint8)
    n = compress_block_ref(data, dst, len(hist), len(plain), table, 0)
    out = decode_block_split_host(dst[:n], 65536, history=hist)
    np.testing.assert_array_equal(out, plain)


def test_split_record_contract(compressible):
    """Every record: mlen <= 128, and its source fully written when it
    runs (replayed sequentially over a coverage map)."""
    data = np.asarray(compressible(40000))
    comp = np.asarray(lz4.compress_raw(data))
    lit = np.zeros(len(data), np.uint8)
    recs, out_len = parse_records(comp, lit, len(data))
    assert out_len == len(data)
    covered = np.zeros(len(data) + 1, bool)
    # literal bytes are pre-placed => conceptually "written" at t=0 only
    # where no record writes them; build the record-written map instead:
    rec_written = np.zeros(len(data), bool)
    for w0, dst in recs.tolist():
        off, mlen = w0 & 0xFFFF, w0 >> 16
        assert 1 <= off
        assert mlen <= 128
        src = dst - off
        assert src >= 0
        # source range must not overlap this record's own output
        assert src + mlen <= dst
        rec_written[dst: dst + mlen] = True
    # replay equality: the records + literal image reproduce the block
    out = lit.copy()
    for w0, dst in recs.tolist():
        off, mlen = w0 & 0xFFFF, w0 >> 16
        out[dst: dst + mlen] = out[dst - off: dst - off + mlen]
    np.testing.assert_array_equal(out, data)


def test_split_parser_py_native_equivalent(compressible):
    """Both parsers produce a valid plan that replays to the same bytes
    (record streams may differ; the decoded output may not)."""
    data = np.asarray(compressible(20000))
    comp = np.asarray(lz4.compress_raw(data))

    def replay(parse):
        lit = np.zeros(len(data), np.uint8)
        recs, out_len = parse(comp, lit, len(data))
        out = lit.copy()
        for w0, dst in np.asarray(recs, np.uint32).tolist():
            off, mlen = int(w0) & 0xFFFF, int(w0) >> 16
            out[dst: dst + mlen] = out[dst - off: dst - off + mlen]
        return out, out_len

    out_py, n_py = replay(lambda c, l, cap: _parse_records_py(c, l, cap))
    np.testing.assert_array_equal(out_py, data)
    assert n_py == len(data)
    try:
        from divortio_lz4_tpu.native import parse_records_native
    except Exception:
        pytest.skip("native unavailable")
    out_nat, n_nat = replay(
        lambda c, l, cap: parse_records_native(c, l, cap))
    np.testing.assert_array_equal(out_nat, data)
    assert n_nat == len(data)


@pytest.mark.parametrize("parse", ["native", "py"])
@pytest.mark.parametrize("case", ["truncated_run", "offset0", "overflow",
                                  "lit_overrun"])
def test_split_parser_error_taxonomy(parse, case):
    if parse == "native":
        try:
            from divortio_lz4_tpu.native import parse_records_native as fn
        except Exception:
            pytest.skip("native unavailable")
    else:
        fn = _parse_records_py
    bad = {
        "truncated_run": bytes([0xF0] + [255] * 3),
        "offset0": bytes([0x10, ord("x"), 0x00, 0x00]),
        "overflow": bytes([0x4F, 1, 2, 3, 4, 0x01, 0x00, 250, 250, 250,
                           250, 0]),
        "lit_overrun": bytes([0xF0, 20, ord("x")]),
    }[case]
    msg = {
        "truncated_run": "Malformed",
        "offset0": "Invalid Offset 0",
        "overflow": "Output Buffer Too Small",
        "lit_overrun": "Malformed",
    }[case]
    lit = np.zeros(64, np.uint8)
    with pytest.raises(ValueError, match=msg):
        fn(np.frombuffer(bad, np.uint8), lit, 64)


def test_split_batched_blocks_with_sorting(compressible, rng):
    """Multi-block batch through the production grouping (sorted by record
    count, padded to the interleave width)."""
    import jax.numpy as jnp

    blocks = [np.asarray(compressible(16384)) for _ in range(5)]
    blocks.append(np.full(16384, 3, np.uint8))
    blocks.append(np.tile(rng.integers(0, 256, 100, np.uint8), 164)[:16384])
    comps = [np.asarray(lz4.compress_raw(b)) for b in blocks]
    lit, recs, counts, out_lens, uh = parse_block_batch(comps, 16384)
    ways = plan_ways(recs.shape[1], lit.shape[1])
    order = np.argsort(counts, kind="stable")
    pad = (-len(order)) % ways
    order_p = np.concatenate([order, np.full(pad, order[-1], np.int64)]) \
        if pad else order
    nsteps = len(order_p) // ways
    counts_s = counts[order_p]
    trips = np.array([int(counts_s[g * ways:(g + 1) * ways].max())
                      for g in range(nsteps)], np.int32)
    out = decode_blocks_split(
        jnp.asarray(lit[order_p]), jnp.asarray(recs[order_p]),
        jnp.asarray(trips), 16384, uh, True)
    out = np.asarray(out).astype(np.uint8)
    for k in range(len(order_p)):
        b = order_p[k]
        np.testing.assert_array_equal(out[k][: out_lens[b]], blocks[b])


def test_split_hostile_records_stay_in_bounds():
    """Garbage records (not from our parser) must not write outside the
    block's io region or hang — clamps in the kernel, not trust."""
    import jax.numpy as jnp

    BSZ = 2048
    io_bytes = ((BSZ + SLACK) + 1023) // 1024 * 1024
    lit = np.zeros((1, io_bytes), np.uint8)
    lit[0, :BSZ] = 7
    rng = np.random.default_rng(3)
    recs = rng.integers(0, 2**31 - 1, (1, 128, 2), dtype=np.int64) \
        .astype(np.uint32)
    recs[:, ::3, 0] = 0  # zero offsets / zero mlen variants
    ways = plan_ways(128, io_bytes)
    nb = ways
    lit = np.repeat(lit, nb, 0)
    recs = np.repeat(recs.view(np.int32), nb, 0)
    trips = np.full(1, 128, np.int32)
    out = decode_blocks_split(jnp.asarray(lit), jnp.asarray(recs),
                              jnp.asarray(trips), BSZ, False, True)
    assert out.shape == (nb, BSZ)  # completed without OOB/hang
    assert int(jnp.sum(out)) >= 0


def test_split_noop_record_is_identity():
    import jax.numpy as jnp

    BSZ = 1024
    io_bytes = 2048
    lit = np.arange(io_bytes, dtype=np.uint8).reshape(1, -1).copy()
    recs = np.empty((1, 128, 2), np.uint32)
    recs[..., 0] = NOOP_W0
    recs[..., 1] = NOOP_W1
    ways = plan_ways(128, io_bytes)
    lit = np.repeat(lit, ways, 0)
    recs = np.repeat(recs.view(np.int32), ways, 0)
    out = decode_blocks_split(jnp.asarray(lit), jnp.asarray(recs),
                              jnp.asarray(np.full(1, 128, np.int32)),
                              BSZ, False, True)
    np.testing.assert_array_equal(
        np.asarray(out[0]).astype(np.uint8), lit[0][:BSZ])


# ---------------------------------------------------------------------------
# Chain-split decode: linked frames and big blocks as dependent piece
# chains through the split kernel (device window carry, host parse with
# piece-base record rebasing). Small shapes — interpret mode is slow.
# ---------------------------------------------------------------------------

def _chain_cases(compressible, rng):
    base = np.asarray(compressible(120000))
    return base, rng


def test_chain_split_linked_frame(compressible, rng):
    from divortio_lz4_tpu.parallel.device import device_decompress_frame

    corpus = np.asarray(compressible(120000))
    cfg = lz4.FrameConfig(block_size=65536, block_independence=False)
    frame = np.asarray(lz4.compress(corpus, config=cfg))
    out = device_decompress_frame(frame, engine="split")
    np.testing.assert_array_equal(np.asarray(out), corpus)


def test_chain_split_linked_dictionary(compressible):
    from divortio_lz4_tpu.parallel.device import device_decompress_frame

    corpus = np.asarray(compressible(90000))
    d = bytes(corpus[:6000].tobytes())
    cfg = lz4.FrameConfig(block_size=65536, block_independence=False)
    frame = np.asarray(lz4.compress(corpus, config=cfg, dictionary=d))
    out = device_decompress_frame(frame, engine="split", dictionary=d)
    np.testing.assert_array_equal(np.asarray(out), corpus)


def test_chain_split_linked_stored_mix(compressible, rng):
    from divortio_lz4_tpu.parallel.device import device_decompress_frame

    corpus = np.concatenate([np.asarray(compressible(80000)),
                             rng.integers(0, 256, 70000, np.uint8)])
    cfg = lz4.FrameConfig(block_size=65536, block_independence=False)
    frame = np.asarray(lz4.compress(corpus, config=cfg))
    out = device_decompress_frame(frame, engine="split")
    np.testing.assert_array_equal(np.asarray(out), corpus)


def test_chain_split_bigblock_independent(compressible):
    from divortio_lz4_tpu.parallel.device import device_decompress_frame

    corpus = np.asarray(compressible(150000))
    cfg = lz4.FrameConfig(block_size=1048576, block_independence=True)
    frame = np.asarray(lz4.compress(corpus, config=cfg))
    out = device_decompress_frame(frame, engine="split")
    np.testing.assert_array_equal(np.asarray(out), corpus)


def test_chain_split_giant_rle_falls_back(rng):
    from divortio_lz4_tpu.parallel.device import device_decompress_frame

    corpus = np.zeros(400000, np.uint8)  # single >256KB-output sequence
    cfg = lz4.FrameConfig(block_size=65536, block_independence=False)
    frame = np.asarray(lz4.compress(corpus, config=cfg))
    out = device_decompress_frame(frame, engine="split")
    np.testing.assert_array_equal(np.asarray(out), corpus)


def test_chain_split_rejects_oob_backref():
    """A linked frame whose first sequence back-references before the
    stream start (no dictionary) must raise the host taxonomy on the
    chain-split path too — not silently decode zeros (r3 review fix)."""
    from divortio_lz4_tpu.parallel.device import device_decompress_frame
    from divortio_lz4_tpu.xxh import xxhash32

    # hand-built: lit 5 "HELLO", match offset 16 (OOB), mlen 4; trailing
    # lit 5 "WORLD"
    block = bytes([0x50]) + b"HELLO" + bytes([0x10, 0x00]) \
        + bytes([0x50]) + b"WORLD"
    desc = bytes([0x40, 0x40])  # linked, 64KB
    hc = bytes([(xxhash32(np.frombuffer(desc, np.uint8), 0) >> 8) & 0xFF])
    frame = (bytes([0x04, 0x22, 0x4D, 0x18]) + desc + hc
             + len(block).to_bytes(4, "little") + block
             + b"\x00\x00\x00\x00")
    with pytest.raises(ValueError, match="Dictionary Offset|Malformed"):
        lz4.decompress(np.frombuffer(frame, np.uint8))
    with pytest.raises(ValueError, match="Dictionary Offset|Malformed"):
        device_decompress_frame(np.frombuffer(frame, np.uint8),
                                engine="split")


def test_sharded_split_decode_respects_frame_block_size(compressible):
    """ShardedCodec configured with one block size must decode frames
    written with ANOTHER block size bit-exactly (r3 review fix: the
    kernel's output capacity comes from the frame header, not the codec
    config)."""
    from divortio_lz4_tpu.parallel.sharding import ShardedCodec, make_mesh

    corpus = np.asarray(compressible(120000))
    frame_cfg = lz4.FrameConfig(block_size=65536, block_independence=True)
    frame = np.asarray(lz4.compress(corpus, config=frame_cfg))
    codec = ShardedCodec(make_mesh(), lz4.FrameConfig(
        block_size=4096, block_independence=True), engine="best")
    out = codec.decompress(frame)
    np.testing.assert_array_equal(np.asarray(out), corpus)
