"""Golden spec vectors — byte-level interop with the LZ4 frame format.

Hex frames and expected header bytes from
/root/reference/tests/golden.test.mjs:17-89. These are the normative
bit-exactness anchors for every decode path in this framework.
"""

import numpy as np
import pytest

from divortio_lz4_tpu import FrameConfig, compress_frame, decompress_frame

GOLDEN_HELLO = "04224D186040820B00008048656c6c6f20576f726c6400000000"
GOLDEN_EMPTY_4MB = "04224D1860707300000000"
GOLDEN_HELLO_CK = "04224D186440A70B00008048656c6c6f20576f726c6400000000EE16FDB1"


def from_hex(s: str) -> np.ndarray:
    return np.frombuffer(bytes.fromhex(s), dtype=np.uint8)


def test_decode_minimal_hello_world_frame():
    out = decompress_frame(from_hex(GOLDEN_HELLO))
    assert bytes(out) == b"Hello World"


def test_decode_empty_frame_4mb_blocks():
    out = decompress_frame(from_hex(GOLDEN_EMPTY_4MB))
    assert len(out) == 0


def test_decode_frame_with_content_checksum():
    out = decompress_frame(from_hex(GOLDEN_HELLO_CK))
    assert bytes(out) == b"Hello World"


def test_decode_frame_with_corrupted_content_checksum():
    bad = bytearray(bytes.fromhex(GOLDEN_HELLO_CK))
    bad[-1] ^= 0xFF
    with pytest.raises(ValueError, match="Content Checksum"):
        decompress_frame(np.frombuffer(bytes(bad), dtype=np.uint8))
    # skip-verify recovers (bufferDecompress.test.mjs:44-56 pattern)
    out = decompress_frame(np.frombuffer(bytes(bad), dtype=np.uint8),
                           verify_checksum=False)
    assert bytes(out) == b"Hello World"


def test_header_generation_standard():
    # golden.test.mjs:62-72 — FLG 0x60, BD 0x40, HC 0x82 for
    # (64KB blocks, independent, no checksum, no content size).
    cfg = FrameConfig(block_size=65536, block_independence=True,
                      content_checksum=False, content_size=False)
    frame = compress_frame(b"Hello World", config=cfg)
    assert frame[4] == 0x60
    assert frame[5] == 0x40
    assert frame[6] == 0x82


def test_header_generation_with_content_checksum():
    cfg = FrameConfig(block_size=65536, block_independence=True,
                      content_checksum=True, content_size=False)
    frame = compress_frame(b"Hello World", config=cfg)
    assert frame[4] == 0x64
    assert frame[5] == 0x40
    assert frame[6] == 0xA7


def test_hello_world_roundtrip_is_bit_exact_golden():
    # An 11-byte input cannot compress; the encoder must emit the stored
    # block exactly as the golden frame does.
    cfg = FrameConfig(block_size=65536, block_independence=True,
                      content_checksum=False, content_size=False)
    frame = compress_frame(b"Hello World", config=cfg)
    assert bytes(frame) == bytes.fromhex(GOLDEN_HELLO)


def test_hello_world_checksum_frame_is_bit_exact_golden():
    cfg = FrameConfig(block_size=65536, block_independence=True,
                      content_checksum=True, content_size=False)
    frame = compress_frame(b"Hello World", config=cfg)
    assert bytes(frame) == bytes.fromhex(GOLDEN_HELLO_CK)


def test_invalid_magic():
    with pytest.raises(ValueError, match="Magic"):
        decompress_frame(np.frombuffer(b"\x00\x00\x00\x00rest", dtype=np.uint8))


def test_unsupported_version():
    frame = bytearray(bytes.fromhex(GOLDEN_HELLO))
    frame[4] = (frame[4] & 0x3F) | (2 << 6)  # version 2
    with pytest.raises(ValueError, match="Version"):
        decompress_frame(np.frombuffer(bytes(frame), dtype=np.uint8))


def test_skippable_frame_is_skipped():
    # Spec skippable frame (magic 0x184D2A50 + size) prepended to a real
    # frame — the reference rejects these; this framework skips them.
    skip = bytes([0x50, 0x2A, 0x4D, 0x18, 0x05, 0, 0, 0]) + b"USER!"
    frame = skip + bytes.fromhex(GOLDEN_HELLO)
    out = decompress_frame(np.frombuffer(frame, np.uint8))
    assert bytes(out) == b"Hello World"
    # streaming FSM path, fed in small fragments
    from divortio_lz4_tpu.stream import LZ4Decoder
    dec = LZ4Decoder()
    got = b""
    for i in range(0, len(frame), 3):
        got += b"".join(bytes(c) for c in dec.update(frame[i: i + 3]))
    assert got == b"Hello World"
