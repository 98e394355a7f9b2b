"""Wire-direct split decode (round-4 v2 path, ops/pallas_split_decode):
the kernel reads literal slices straight from the compressed bytes, so the
link ships 1x wire. Covers: bit-exactness vs the host tier, the v2 record
contract (native parser == Python fallback == sequential simulation),
dictionary history, stored blocks, batched interleave grouping, error
taxonomy, and hostile-record containment.

Reference semantics: /root/reference/src/block/blockDecompress.js:61-268.
"""

import jax  # noqa: F401  (the TPU-parity skipif marker evaluates it)
import numpy as np
import pytest

import divortio_lz4_tpu as lz4
from divortio_lz4_tpu.ops.block_ref import compress_block_ref
from divortio_lz4_tpu.ops.pallas_split_decode import (
    W,
    _parse_records2_py,
    build_sorted_batch,
    decode_blocks_wire,
    decode_wire_blocks2,
    parse_records_wire,
    parse_wire_batch,
    plan_ways_wire,
    stored_wire_records,
)

try:
    from divortio_lz4_tpu.native import parse_records2_native
except Exception:
    parse_records2_native = None


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


def _simulate(wire, recs, out_len, hist=b""):
    """Execute v2 records sequentially in numpy — the executable spec of
    the record contract (each record: literal slice from the wire, then a
    match copy whose source is fully written when it runs)."""
    hl = len(hist)
    out = np.zeros(hl + out_len + 256, np.uint8)
    out[:hl] = np.frombuffer(bytes(hist), np.uint8) if hl else 0
    o = hl
    for s, w1 in recs:
        off = int(w1) & 0xFFFF
        ll = (int(w1) >> 16) & 0xFF
        ml = (int(w1) >> 24) & 0xFF
        assert ll + ml <= 128
        out[o: o + ll] = wire[s: s + ll]
        o += ll
        src = o - off
        assert src >= 0, "source before history start"
        # contract: the source range is fully written before the record
        assert src + ml <= o, (src, ml, o)
        out[o: o + ml] = out[src: src + ml]
        o += ml
    return out[hl: o]


@pytest.mark.parametrize("name", ["text", "rle", "period3", "period200",
                                  "period130", "json", "mixed", "tiny",
                                  "longlit"])
def test_wire_records_simulation_bit_exact(name, rng, compressible):
    data = _cases(rng, compressible)[name]
    comp = np.asarray(lz4.compress_raw(data))
    if len(comp) >= len(data):
        pytest.skip("stored-class block")
    recs, out_len = parse_records_wire(comp, max(len(data), 1))
    assert out_len == len(data)
    np.testing.assert_array_equal(_simulate(comp, recs, out_len), data)


@pytest.mark.parametrize("name", ["text", "rle", "period3", "mixed",
                                  "longlit"])
def test_wire_parser_native_matches_python(name, rng, compressible):
    if parse_records2_native is None:
        pytest.skip("native unavailable")
    data = _cases(rng, compressible)[name]
    comp = np.ascontiguousarray(np.asarray(lz4.compress_raw(data)))
    if len(comp) >= len(data):
        pytest.skip("stored-class block")
    r_n, ol_n = parse_records2_native(comp, len(data))
    r_p, ol_p = _parse_records2_py(comp, len(data))
    assert ol_n == ol_p
    np.testing.assert_array_equal(r_n, r_p)


@pytest.mark.parametrize("name", ["text", "rle", "period3", "period200",
                                  "json", "mixed", "longlit"])
def test_wire_kernel_bit_exact(name, rng, compressible):
    data = _cases(rng, compressible)[name]
    comp = np.asarray(lz4.compress_raw(data))
    if len(comp) >= len(data):
        pytest.skip("stored-class block")
    out = decode_wire_blocks2([comp], max(len(data), 1))[0]
    np.testing.assert_array_equal(out, data)


def test_partition_by_plan_tiers():
    """One dense block must not cap the whole batch's interleave: the
    sorted order splits into maximal same-plan runs covering every
    block exactly once, caps are monotone, and each part's cap bounds
    its counts."""
    from divortio_lz4_tpu.ops.pallas_split_decode import (
        _cap_bucket, partition_by_plan, plan_ways_wire)

    counts = np.array([900, 5000, 1200, 9000, 4800, 700, 3000, 2000],
                      np.int32)
    order = np.argsort(counts, kind="stable")
    io_bytes = 66560
    parts = partition_by_plan(counts, order, 2, 52224, io_bytes, 0)
    got = np.concatenate([sel for sel, _, _ in parts])
    np.testing.assert_array_equal(np.sort(got), np.arange(len(counts)))
    prev_cap = 0
    for sel, cap, ways in parts:
        assert cap >= prev_cap and cap % 128 == 0
        prev_cap = cap
        assert ways == plan_ways_wire(cap, 2, 52224, io_bytes, 0)
        for b in sel:
            assert _cap_bucket(int(counts[b]) + 1) <= cap
    # the dense 9000-record block must sit in its own lower-ways tier
    ways_of = {int(b): w for sel, _, w in parts for b in sel}
    assert ways_of[3] < ways_of[0]


def test_partitioned_dispatch_ways_respects_plan(rng):
    """Regression (review find): per-tier wire narrowing must not let
    decode_blocks_wire replan a WIDER interleave than the partition's —
    trips grouped for ways=2 applied at ways=4 silently truncated the
    record loop. 256 KB blocks (wide records): 8 well-compressed blocks
    (small wire) + 1 dense block (large wire) put the tier plan and the
    narrowed-wire replan on different ways."""
    from divortio_lz4_tpu.ops.pallas_split_decode import (
        SLACK, _round_up, partition_by_plan)

    bs = 262144
    blocks = []
    for s in range(8):
        # varying block lengths -> varying record counts (records split
        # matches at 128 B, so count ~ len/128), so trips grouped for
        # one ways differ under another grouping
        n = 32768 * (s + 1)
        pat = rng.integers(0, 256, 1024, np.uint8)
        blocks.append(np.tile(pat, -(-n // 1024))[:n])
    # 16-symbol noise: compressible (not stored) but wire ~229 KB, so the
    # light tier's plan (global wire, VMEM-bound ways=2) diverges from a
    # replan on its own narrow wire (ways=4)
    blocks.append(rng.integers(0, 16, bs).astype(np.uint8) * 13)
    comps = [np.asarray(lz4.compress_raw(b)) for b in blocks]
    assert all(len(c) < bs for c in comps)
    # precondition: the plan divergence this test guards actually exists
    wire, recs, counts, out_lens, _ = parse_wire_batch(
        [(c, False) for c in comps], bs)
    rw = 2 if recs.dtype == np.uint16 else 3
    io = _round_up(bs + SLACK, 1024)
    order = np.argsort(counts, kind="stable")
    wire_w = np.array([len(c) for c in comps])
    diverged = False
    for sel, cap, ways in partition_by_plan(counts, order, rw,
                                            wire.shape[1], io, 0):
        wcap = _round_up(int(wire_w[sel].max()) + SLACK, 1024)
        diverged |= plan_ways_wire(cap, rw, wcap, io, 0) != ways
    assert diverged
    outs = decode_wire_blocks2(comps, bs)
    for o, b in zip(outs, blocks):
        np.testing.assert_array_equal(o, b)


@pytest.mark.parametrize("pair", [2, 4])
def test_wire_kernel_paired_records_bit_exact(pair, rng, compressible):
    """pair>1 runs `pair` records per way per loop iteration; the odd-count
    overhang reads zero-pad records which must write nothing."""
    import jax.numpy as jnp

    cases = _cases(rng, compressible)
    blocks = [v for v in cases.values()
              if len(np.asarray(lz4.compress_raw(v))) < len(v)]
    bs = max(len(b) for b in blocks)
    comps = [np.asarray(lz4.compress_raw(b)) for b in blocks]
    wire, recs, counts, out_lens, _ = parse_wire_batch(
        [(c, False) for c in comps], bs)
    rw = 2 if recs.dtype == np.uint16 else 3
    io_bytes = ((bs + 256 + 1023) // 1024) * 1024
    ways = plan_ways_wire(recs.shape[1], rw, wire.shape[1], io_bytes, 0)
    order_p, trips = build_sorted_batch(counts, ways)
    out = np.asarray(decode_blocks_wire(
        jnp.asarray(wire[order_p]), jnp.asarray(recs[order_p]),
        jnp.asarray(trips), bs, False, None, True, pair))
    pos = {}
    for k, b in enumerate(order_p):
        pos.setdefault(int(b), k)
    for i, b in enumerate(blocks):
        np.testing.assert_array_equal(
            out[pos[i]][: int(out_lens[i])], b)


def test_wire_kernel_batched_sorted_groups(rng, compressible):
    cases = _cases(rng, compressible)
    blocks = [v for v in cases.values()
              if len(np.asarray(lz4.compress_raw(v))) < len(v)]
    bs = max(len(b) for b in blocks)
    comps = [np.asarray(lz4.compress_raw(b)) for b in blocks]
    outs = decode_wire_blocks2(comps, bs)
    for o, b in zip(outs, blocks):
        np.testing.assert_array_equal(o, b)


def test_wire_kernel_history(compressible):
    """Back-references into a dictionary window resolve through the seeded
    history rows."""
    import jax.numpy as jnp

    data = np.asarray(compressible(70000))
    hist, plain = data[:30000], data[30000:]
    table = np.zeros(16384, np.int32)
    dst = np.zeros(len(data) * 2 + 1024, np.uint8)
    n = compress_block_ref(data, dst, len(hist), len(plain), table, 0)
    comp = dst[:n]
    win = hist[-W:]
    wire, recs, counts, out_lens, hrows = parse_wire_batch(
        [(comp, False)], len(plain), win)
    assert hrows is not None
    rw = 2 if recs.dtype == np.uint16 else 3
    io_bytes = ((W + len(plain) + 256 + 1023) // 1024) * 1024
    ways = plan_ways_wire(recs.shape[1], rw, wire.shape[1], io_bytes, W)
    padn = (-1) % ways
    if padn:
        wire = np.concatenate(
            [wire, np.zeros((padn,) + wire.shape[1:], np.uint8)])
        recs = np.concatenate(
            [recs, np.zeros((padn,) + recs.shape[1:], recs.dtype)])
        hrows = np.concatenate([hrows, np.zeros((padn, W), np.uint8)])
    trips = np.array([int(counts.max(initial=0))], np.int32)
    out = decode_blocks_wire(jnp.asarray(wire), jnp.asarray(recs),
                             jnp.asarray(trips), len(plain), True,
                             jnp.asarray(hrows), True)
    np.testing.assert_array_equal(np.asarray(out)[0][: int(out_lens[0])],
                                  plain)


def test_stored_wire_records_roundtrip(rng):
    data = rng.integers(0, 256, 33333, np.uint8)  # incompressible
    recs = stored_wire_records(len(data))
    np.testing.assert_array_equal(_simulate(data, recs, len(data)), data)
    assert stored_wire_records(0).shape == (0, 2)


def test_wire_parser_error_taxonomy():
    with pytest.raises(ValueError, match="Malformed"):
        parse_records_wire(np.array([0xF0], np.uint8), 1 << 16)
    with pytest.raises(ValueError, match="Invalid Offset 0"):
        parse_records_wire(
            np.array([0x10, 65, 0x00, 0x00], np.uint8), 1 << 16)
    with pytest.raises(ValueError, match="Dictionary Offset"):
        parse_records_wire(
            np.array([0x10, 65, 0x09, 0x00], np.uint8), 1 << 16)
    with pytest.raises(ValueError, match="Output Buffer Too Small"):
        parse_records_wire(
            np.asarray(lz4.compress_raw(np.zeros(9000, np.uint8))), 100)


def test_wire_kernel_hostile_records_contained(rng):
    """Garbage records (huge dst/ll/ml/offset/src) must stay inside the
    refs: the kernel clamps and cannot crash or write out of the io
    region. Output content is unspecified for hostile input."""
    import jax.numpy as jnp

    bs = 4096
    wire = np.zeros((1, 2048), np.uint8)
    recs = rng.integers(0, 1 << 16, (1, 128, 3)).astype(np.uint16)
    ways = plan_ways_wire(128, 2, 2048, 5120, 0)
    if ways > 1:
        wire = np.concatenate(
            [wire, np.zeros((ways - 1, 2048), np.uint8)])
        recs = np.concatenate(
            [recs, np.zeros((ways - 1, 128, 3), np.uint16)])
    trips = np.array([128], np.int32)
    out = decode_blocks_wire(jnp.asarray(wire), jnp.asarray(recs),
                             jnp.asarray(trips), bs, False, None, True)
    assert np.asarray(out).shape == (ways, bs)  # completed, in bounds


def test_wire_frame_path_engine_split(compressible):
    """device_decompress_frame(engine='split') rides the v2 path end to
    end, stored blocks included."""
    from divortio_lz4_tpu.parallel.device import (device_compress_frame,
                                                  device_decompress_frame)

    rng = np.random.default_rng(7)
    data = np.concatenate([
        np.asarray(compressible(150000)),
        rng.integers(0, 256, 70000, np.uint8),   # stored blocks
        np.asarray(compressible(50000)),
    ])
    cfg = lz4.FrameConfig(block_size=65536, block_independence=True)
    frame = device_compress_frame(data, cfg, engine="hybrid")
    out = device_decompress_frame(frame, engine="split")
    np.testing.assert_array_equal(out, data)


def test_wire_frame_path_dictionary(compressible):
    from divortio_lz4_tpu.parallel.device import (device_compress_frame,
                                                  device_decompress_frame)

    data = np.asarray(compressible(100000))
    d = np.asarray(compressible(30000))
    cfg = lz4.FrameConfig(block_size=65536, block_independence=True)
    frame = device_compress_frame(data, cfg, dictionary=d, engine="hybrid")
    out = device_decompress_frame(frame, engine="split", dictionary=d)
    np.testing.assert_array_equal(out, data)


@pytest.mark.skipif("jax.default_backend() != 'tpu'")
def test_wire_kernel_tpu_parity(compressible):
    """Hardware-gated Mosaic parity: compiled kernel == interpret-mode
    reference on real TPU (VERDICT r3 #6 marker; interpret-vs-Mosaic
    divergence burned rounds 1-2)."""
    data = np.asarray(compressible(200000))
    bs = 65536
    comps = [np.asarray(lz4.compress_raw(data[i * bs:(i + 1) * bs]))
             for i in range(3)]
    outs = decode_wire_blocks2(comps, bs, interpret=False)
    for i, o in enumerate(outs):
        np.testing.assert_array_equal(o, data[i * bs:(i + 1) * bs])
