"""Big-block (256 KB - 4 MB) device codec: segmented hybrid encode + piece-
scan Pallas decode (parallel/bigblock.py). Interpret mode on CPU; the
compiled path is covered by bench.py / __graft_entry__ on real TPU.

Cross-validation style per SURVEY §4: compress with one tier, decompress
with another, in both directions, against the reference-identical host
tier. Reference parity targets: bufferCompress.js:100 (4 MB default block
size), blockDecompress.js:55-272 (sequence semantics the scanner mirrors).
"""

import numpy as np
import pytest

import divortio_lz4_tpu as lz4
from divortio_lz4_tpu.parallel.bigblock import (
    PIECE_CAP,
    _scan_pieces_py,
    compress_frame_big,
    decompress_frame_big,
    scan_pieces,
)
from divortio_lz4_tpu.parallel.device import (
    device_compress_frame,
    device_decompress_frame,
    parse_block_index,
)

from tests.conftest import make_compressible

BS = 262144  # smallest big-block tier; 1 MB/4 MB differ only in count


def mixed_corpus(n: int, seed: int = 3) -> np.ndarray:
    """Compressible text + a dash of noise so blocks stay compressed but
    segments carry real literal runs."""
    rng = np.random.default_rng(seed)
    base = make_compressible(n)
    out = np.array(base)
    for _ in range(max(n // 40000, 1)):
        at = int(rng.integers(0, max(n - 600, 1)))
        out[at: at + 600] = rng.integers(0, 256, 600, dtype=np.uint8)
    return out


# ---------------------------------------------------------------- scanner --

def test_scanner_matches_python_oracle():
    raw = mixed_corpus(BS)
    blk = np.asarray(lz4.compress_raw(raw))
    nat = scan_pieces(blk)
    ref = _scan_pieces_py(blk, 65536)
    for a, b in zip(nat, ref):
        assert np.array_equal(a, b)
    # pieces tile the wire and the output exactly
    wo, wl, ol = nat
    assert wo[0] == 0 and wo[-1] + wl[-1] == len(blk)
    assert np.array_equal(wo[1:], wo[:-1] + wl[:-1])
    assert int(ol.sum()) == len(raw)
    assert all(int(x) >= 65536 for x in ol[:-1])


def test_scanner_malformed_taxonomy():
    # truncated 0xFF literal-length run
    with pytest.raises(ValueError, match="Malformed"):
        scan_pieces(np.array([0xF0, 255, 255], np.uint8))
    # zero offset
    with pytest.raises(ValueError, match="Offset 0"):
        scan_pieces(np.array([0x11, ord("a"), 0, 0], np.uint8))


# ----------------------------------------------------------------- encode --

@pytest.mark.parametrize("independent", [True, False])
def test_big_encode_host_decodes(independent):
    raw = mixed_corpus(600000)  # 3 blocks: 256K + 256K + tail
    cfg = lz4.FrameConfig(block_size=BS, block_independence=independent,
                          content_checksum=True)
    frame = compress_frame_big(raw, cfg)
    out = lz4.decompress(frame)
    assert np.array_equal(out, raw)
    # ratio gate: the segmented device encoder must not exceed the
    # reference-identical host encoder (bench.py asserts the same).
    ref = len(lz4.compress(raw, config=cfg))
    assert len(frame) <= ref


def test_big_encode_routing_via_device_compress_frame():
    raw = mixed_corpus(400000)
    cfg = lz4.FrameConfig(block_size=BS, block_independence=True)
    frame = device_compress_frame(raw, cfg, engine="hybrid")
    assert np.array_equal(lz4.decompress(frame), raw)


def test_big_encode_dictionary_both_modes():
    raw = mixed_corpus(300000, seed=9)
    dic = raw[:40000]
    for indep in (True, False):
        cfg = lz4.FrameConfig(block_size=BS, block_independence=indep)
        frame = compress_frame_big(raw, cfg, dictionary=dic)
        assert np.array_equal(lz4.decompress(frame, dictionary=dic), raw)
        with pytest.raises(ValueError, match="Dictionary"):
            lz4.decompress(frame)


def test_big_encode_block_checksums_and_stored_fallback(rng):
    # incompressible corpus: every block takes the stored path
    raw = rng.integers(0, 256, 300000, dtype=np.uint8)
    cfg = lz4.FrameConfig(block_size=BS, block_independence=True,
                          block_checksums=True)
    frame = compress_frame_big(raw, cfg)
    assert np.array_equal(lz4.decompress(frame), raw)
    hdr, blocks, _ = parse_block_index(frame)
    assert all(stored for _, _, stored in blocks)


def test_big_encode_single_short_block():
    raw = mixed_corpus(50000)  # smaller than one segment
    cfg = lz4.FrameConfig(block_size=BS, block_independence=True)
    frame = compress_frame_big(raw, cfg)
    assert np.array_equal(lz4.decompress(frame), raw)


# ----------------------------------------------------------------- decode --

@pytest.mark.parametrize("independent", [True, False])
def test_big_decode_of_host_frames(independent):
    raw = mixed_corpus(600000, seed=5)
    cfg = lz4.FrameConfig(block_size=BS, block_independence=independent,
                          content_checksum=True)
    frame = np.asarray(lz4.compress(raw, config=cfg))
    out = device_decompress_frame(frame, engine="pallas")
    assert np.array_equal(out, raw)


def test_big_decode_dictionary_both_modes():
    raw = mixed_corpus(300000, seed=11)
    dic = raw[100000:160000]
    for indep in (True, False):
        cfg = lz4.FrameConfig(block_size=BS, block_independence=indep)
        frame = np.asarray(lz4.compress(raw, dictionary=dic, config=cfg))
        out = device_decompress_frame(frame, engine="pallas",
                                      dictionary=dic)
        assert np.array_equal(out, raw)


def test_big_decode_stored_blocks(rng):
    raw = rng.integers(0, 256, 300000, dtype=np.uint8)
    cfg = lz4.FrameConfig(block_size=BS, block_independence=True)
    frame = np.asarray(lz4.compress(raw, config=cfg))
    out = device_decompress_frame(frame, engine="pallas")
    assert np.array_equal(out, raw)


def test_big_decode_giant_rle_falls_back():
    # A 1 MB zero block encodes to a single monster sequence whose output
    # exceeds PIECE_CAP: decompress_frame_big declines (None) and the
    # device path falls back to the XLA kernels, still bit-exact.
    raw = np.zeros(1048576 + 1000, np.uint8)
    cfg = lz4.FrameConfig(block_size=1048576, block_independence=True)
    frame = np.asarray(lz4.compress(raw, config=cfg))
    hdr, blocks, _ = parse_block_index(frame)
    wo, wl, ol = scan_pieces(frame[blocks[0][0]: blocks[0][0] + blocks[0][1]])
    assert int(ol.max()) > PIECE_CAP
    assert decompress_frame_big(frame, blocks, hdr, None) is None
    out = device_decompress_frame(frame, engine="pallas")
    assert np.array_equal(out, raw)


def test_big_roundtrip_device_both_directions():
    raw = mixed_corpus(550000, seed=13)
    cfg = lz4.FrameConfig(block_size=BS, block_independence=True)
    frame = device_compress_frame(raw, cfg, engine="hybrid")
    out = device_decompress_frame(frame, engine="pallas")
    assert np.array_equal(out, raw)


@pytest.mark.skipif(
    __import__("jax").default_backend() != "tpu",
    reason="real-TPU parity marker — runs only on hardware; the round-3 "
           "BENCH device-bigblock tier exercises this path on every "
           "driver run (4 MB blocks encode 0.903x ratio, decode "
           "bit-exact, measured on v5e)")
def test_bigblock_real_tpu_parity(compressible):
    import divortio_lz4_tpu as lz4
    from divortio_lz4_tpu.parallel.bigblock import compress_frame_big
    from divortio_lz4_tpu.parallel.device import device_decompress_frame

    corpus = np.asarray(compressible(4_500_000))
    cfg = lz4.FrameConfig(block_size=4194304, block_independence=True)
    frame = compress_frame_big(corpus, cfg)
    assert len(frame) <= len(lz4.compress(corpus, config=cfg))
    out = device_decompress_frame(frame, engine="split")
    np.testing.assert_array_equal(np.asarray(out), corpus)


def test_bigblock_multiframe_pipelined_roundtrip(compressible):
    """compress_frames_big / the wave-deferred decompress_frames path
    (round 5): N big-block frames queue every chain dispatch before one
    stacked fetch, and every wave kernel before one flattened fetch —
    byte-identical to the serial per-frame path."""
    import numpy as np

    import divortio_lz4_tpu as lz4
    from divortio_lz4_tpu.frame import decompress_frame
    from divortio_lz4_tpu.parallel.device import (
        device_compress_frame, device_compress_frames,
        device_decompress_frames)

    cfg = lz4.FrameConfig(block_size=262144, block_independence=True)
    datas = [np.asarray(compressible(260000 + 9000 * i)) for i in range(3)]
    frames = device_compress_frames(datas, cfg)
    for d, f in zip(datas, frames):
        one = device_compress_frame(d, cfg, engine="split")
        np.testing.assert_array_equal(np.asarray(f), np.asarray(one))
        np.testing.assert_array_equal(decompress_frame(np.asarray(f)), d)
    outs = device_decompress_frames(frames)
    for o, d in zip(outs, datas):
        np.testing.assert_array_equal(np.asarray(o), d)
