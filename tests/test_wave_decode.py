"""Chain-wave decode (ops/wave_decode.py): one kernel dispatch per frame.

The wave kernel serves the reference's DEFAULT config — 4 MB independent
blocks (bufferCompress.js:100) — and linked frames of any block size. Its
contract: bit-exact output vs the host tier, spec window semantics
(blockDecompress.js:145-154 — resets at independent block boundaries,
carries across linked blocks and pieces), and graceful None fallbacks for
streams the fixed wave shapes can't hold.

Interpret mode on CPU (conftest forces the 8-device CPU mesh); the
compiled path is covered by the TPU-parity marker at the bottom plus
bench.py's device_bigblock tier on every driver run.
"""

import numpy as np
import pytest

import divortio_lz4_tpu as lz4
from divortio_lz4_tpu.ops.wave_decode import (
    MAX_WAVE_RECS,
    WAVE_CHUNK,
    decompress_frame_waves,
    plan_waves,
)
from divortio_lz4_tpu.parallel.bigblock import _plan_pieces
from divortio_lz4_tpu.parallel.device import (
    device_decompress_frame,
    parse_block_index,
)

from tests.conftest import make_compressible

BS = 262144  # smallest big-block tier — same wave machinery as 1 MB/4 MB


def mixed_corpus(n: int, seed: int = 3) -> np.ndarray:
    rng = np.random.default_rng(seed)
    out = np.array(make_compressible(n))
    for _ in range(max(n // 40000, 1)):
        at = int(rng.integers(0, max(n - 600, 1)))
        out[at: at + 600] = rng.integers(0, 256, 600, dtype=np.uint8)
    return out


def waves_decode(frame: np.ndarray, dictionary=None):
    hdr, blocks, _ = parse_block_index(frame)
    window = None
    if dictionary is not None:
        window = np.asarray(dictionary)
    return decompress_frame_waves(frame, blocks, hdr, window)


# ------------------------------------------------------------ round trips --

def test_wave_independent_bigblocks():
    raw = mixed_corpus(900000)
    cfg = lz4.FrameConfig(block_size=BS, block_independence=True)
    frame = np.asarray(lz4.compress(raw, config=cfg))
    out = waves_decode(frame)
    np.testing.assert_array_equal(out, raw)


def test_wave_linked_frame_carries_window():
    # Linked frames re-use cross-block history: decoding them through the
    # wave chain exercises the no-reset path and cross-wave back-refs.
    raw = mixed_corpus(700000, seed=7)
    cfg = lz4.FrameConfig(block_size=BS, block_independence=False)
    frame = np.asarray(lz4.compress(raw, config=cfg))
    out = waves_decode(frame)
    np.testing.assert_array_equal(out, raw)


def test_wave_linked_small_blocks_via_device_path():
    # engine="split" on a linked 64 KB frame routes through the wave
    # kernel (_decode_linked_split) — block-final short pieces share
    # their wave with the next block's pieces.
    raw = mixed_corpus(500000, seed=9)
    cfg = lz4.FrameConfig(block_size=65536, block_independence=False)
    frame = np.asarray(lz4.compress(raw, config=cfg))
    out = device_decompress_frame(frame, engine="split")
    np.testing.assert_array_equal(out, raw)


def test_wave_dictionary_window_both_modes():
    raw = mixed_corpus(400000, seed=11)
    dic = raw[100000:160000]
    for indep in (True, False):
        cfg = lz4.FrameConfig(block_size=BS, block_independence=indep)
        frame = np.asarray(lz4.compress(raw, dictionary=dic, config=cfg))
        out = device_decompress_frame(frame, engine="split",
                                      dictionary=dic)
        np.testing.assert_array_equal(out, raw)


def test_wave_default_4mb_config():
    # The reference's default block size — one block, multiple waves.
    raw = mixed_corpus(4_500_000, seed=13)
    cfg = lz4.FrameConfig(block_size=4194304, block_independence=True)
    frame = np.asarray(lz4.compress(raw, config=cfg))
    out = device_decompress_frame(frame, engine="split")
    np.testing.assert_array_equal(out, raw)


def test_wave_stored_blocks_inline():
    # Incompressible data stores blocks verbatim; stored pieces ride the
    # wave as pure literal copies from the wire image.
    rng = np.random.default_rng(17)
    raw = rng.integers(0, 256, 600000, dtype=np.uint8)
    raw[100000:140000] = 65  # one compressible island between stored spans
    cfg = lz4.FrameConfig(block_size=BS, block_independence=True)
    frame = np.asarray(lz4.compress(raw, config=cfg))
    out = waves_decode(frame)
    np.testing.assert_array_equal(out, raw)


def test_wave_window_reset_between_independent_blocks():
    # Identical content in consecutive independent blocks: the encoder may
    # not reference across the boundary and the decoder must reset — a
    # carried window would still decode right, so assert the plan itself
    # marks a reset at every block's first wave.
    raw = np.tile(mixed_corpus(BS, seed=19), 3)
    cfg = lz4.FrameConfig(block_size=BS, block_independence=True)
    frame = np.asarray(lz4.compress(raw, config=cfg))
    hdr, blocks, _ = parse_block_index(frame)
    plan = _plan_pieces(frame, blocks, hdr["block_max"])
    planned = plan_waves(frame, plan, True, 0)
    assert planned is not None
    _, _, meta, totals, assign, _chunk = planned
    # every chain's first wave (and only those) resets its way's window
    assert int(meta[:, :, 2].sum()) == len(blocks)
    for way, g0, _n in assign:
        assert meta[g0, way, 2] == 1
    out = waves_decode(frame)
    np.testing.assert_array_equal(out, raw)


def test_wave_ways_interleave_multiblock():
    """>= 4 independent blocks run WAYS interleaved chains in one
    dispatch; mixed compressible/stored content, bit-exact, and the plan
    actually widens past one way."""
    parts = [mixed_corpus(BS, seed=s) for s in (31, 32, 35)]
    rng = np.random.default_rng(33)
    parts.append(rng.integers(0, 256, BS, np.uint8))  # stored block
    parts.append(mixed_corpus(70000, seed=34))  # short tail block
    import jax.numpy as jnp

    from divortio_lz4_tpu.ops.wave_decode import decode_chain_waves

    raw = np.concatenate(parts)
    cfg = lz4.FrameConfig(block_size=BS, block_independence=True)
    frame = np.asarray(lz4.compress(raw, config=cfg))
    hdr, blocks, _ = parse_block_index(frame)
    plan = _plan_pieces(frame, blocks, hdr["block_max"])
    planned = plan_waves(frame, plan, True, 0, max_ways=4)
    assert planned is not None
    wire, recs, meta, totals, assign, chunk = planned
    assert meta.shape[1] >= 2  # ways widened on opt-in
    out = np.asarray(decode_chain_waves(
        jnp.asarray(wire), jnp.asarray(recs), jnp.asarray(meta),
        jnp.asarray(np.zeros(65536, np.uint8)), True, chunk=chunk))
    got = np.concatenate(
        [out[way, g0 + k][: int(totals[g0 + k, way])]
         for way, g0, n in assign for k in range(n)])
    np.testing.assert_array_equal(got, raw)
    # production default stays serial (measured faster; see plan_waves)
    assert plan_waves(frame, plan, True, 0)[2].shape[1] == 1
    np.testing.assert_array_equal(waves_decode(frame), raw)


def test_wave_linked_plan_has_single_reset():
    raw = mixed_corpus(800000, seed=23)
    cfg = lz4.FrameConfig(block_size=BS, block_independence=False)
    frame = np.asarray(lz4.compress(raw, config=cfg))
    hdr, blocks, _ = parse_block_index(frame)
    plan = _plan_pieces(frame, blocks, hdr["block_max"])
    planned = plan_waves(frame, plan, False, 0)
    assert planned is not None
    _, _, meta, _totals, assign, _chunk = planned
    assert meta.shape[1] == 1  # linked = one chain = one way
    assert int(meta[:, :, 2].sum()) == 1  # seed once, chain through


# -------------------------------------------------------------- fallbacks --

def test_wave_giant_rle_returns_none_and_device_falls_back():
    raw = np.zeros(1048576 + 1000, np.uint8)
    cfg = lz4.FrameConfig(block_size=1048576, block_independence=True)
    frame = np.asarray(lz4.compress(raw, config=cfg))
    assert waves_decode(frame) is None  # piece > wave capacity
    out = device_decompress_frame(frame, engine="split")
    np.testing.assert_array_equal(out, raw)


def _dense_sequence_block(n_seq: int) -> bytes:
    """Hand-built valid raw block of n_seq minimal sequences: 1 literal +
    4-byte match at offset 1 (5 output bytes each, RLE of the literal)."""
    parts = [b"\x10A\x01\x00" for _ in range(n_seq)]
    parts.append(b"\x50ABCDE")  # final sequence: 5 literals, no match
    return b"".join(parts)


def test_wave_record_overflow_returns_none_and_device_falls_back():
    # ~3.2 sequences per 16 output bytes would be fine; this stream packs
    # one record per 5 output bytes -> a 256 KB wave needs ~52K records,
    # over MAX_WAVE_RECS. plan_waves declines; the device path still
    # decodes bit-exact via the XLA fallback.
    n_seq = (WAVE_CHUNK // 5) + 1000
    assert n_seq > MAX_WAVE_RECS
    blk = _dense_sequence_block(n_seq)
    out_len = n_seq * 5 + 5
    raw = np.asarray(lz4.decompress_raw(np.frombuffer(blk, np.uint8),
                                        out_len))
    cfg = lz4.FrameConfig(block_size=1048576, block_independence=True)
    frame = np.asarray(lz4.compress(raw, config=cfg))
    hdr, blocks, _ = parse_block_index(frame)
    plan = _plan_pieces(frame, blocks, hdr["block_max"])
    if plan is not None and plan_waves(frame, plan, True, 0) is None:
        assert waves_decode(frame) is None
    out = device_decompress_frame(frame, engine="split")
    np.testing.assert_array_equal(out, raw)


def test_wave_empty_frame():
    frame = np.asarray(lz4.compress(b""))
    hdr, blocks, _ = parse_block_index(frame)
    if blocks:  # encoder may emit a zero-length frame body instead
        out = decompress_frame_waves(frame, blocks, hdr, None)
        assert out is None or len(out) == 0


# ------------------------------------------------------- cross-validation --

def test_wave_matches_pallas_engine():
    raw = mixed_corpus(1_200_000, seed=29)
    cfg = lz4.FrameConfig(block_size=BS, block_independence=True)
    frame = np.asarray(lz4.compress(raw, config=cfg))
    a = device_decompress_frame(frame, engine="split")
    b = device_decompress_frame(frame, engine="pallas")
    np.testing.assert_array_equal(a, b)
    np.testing.assert_array_equal(a, raw)


@pytest.mark.skipif("jax.default_backend() != 'tpu'")
def test_wave_real_tpu_parity():
    """Hardware parity marker (VERDICT r3 #6): the compiled Mosaic wave
    kernel must match the host tier bit-exactly on the default config."""
    raw = mixed_corpus(4_500_000, seed=31)
    cfg = lz4.FrameConfig(block_size=4194304, block_independence=True)
    frame = np.asarray(lz4.compress(raw, config=cfg))
    out = device_decompress_frame(frame, engine="split")
    np.testing.assert_array_equal(np.asarray(out), raw)
    linked = np.asarray(lz4.compress(raw[:1_000_000], config=lz4.FrameConfig(
        block_size=BS, block_independence=False)))
    out2 = device_decompress_frame(linked, engine="split")
    np.testing.assert_array_equal(np.asarray(out2), raw[:1_000_000])


import jax  # noqa: E402,F401  (the TPU-parity skipif marker evaluates it)
