"""Linked-block (dependent) frame codec on device — lax.scan over blocks.

Linked blocks chain through a rolling 64 KB window (the reference's
lz4Encode.js:262-295 / bufferDecompress.js window plumbing). The chain is
inherently serial, but each per-block step is the full vectorized block
kernel; a single jitted lax.scan carries the window in device memory across
all blocks — one compile, no host round-trips per block (unlike a naive
block-at-a-time driver loop).

The window hand-off is one dynamic_slice per step:
  new_window = (window ++ block_plaintext)[advance : advance + 64K].
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import WINDOW_SIZE, block_bound
from .decode_xla import decode_block
from .encode_xla import encode_block

W = WINDOW_SIZE


@functools.partial(jax.jit, static_argnames=("block_size", "use_fingerprints"))
def encode_linked_scan(blocks: jax.Array, lens: jax.Array,
                       init_window: jax.Array, init_filled: jax.Array,
                       block_size: int, use_fingerprints: bool = True):
    """Encode a chain of linked blocks as a serial device scan.

    NOTE: the production linked encode is DATA-PARALLEL
    (parallel/device.py _compress_linked batches per-row plaintext
    windows — byte-identical output, shardable). This scan variant remains
    for streaming-shaped callers that produce blocks incrementally and
    want the window carried in device memory between steps.

    Args:
      blocks: i32[nb, block_size] plaintext rows (zero-padded).
      lens: i32[nb] payload sizes (0 rows are skipped → out_len 0).
      init_window: i32[W] initial dictionary window, RIGHT-aligned.
      init_filled: scalar i32 — how many trailing bytes of init_window are
        real history (dictionary length, ≤ W).
      block_size: static row width.

    Returns:
      (outs: i32[nb, block_bound(block_size)], out_lens: i32[nb]).
    """
    blocks = blocks.astype(jnp.int32)  # uint8 OK: widening on device
    init_window = init_window.astype(jnp.int32)

    def step(carry, inp):
        window, filled = carry
        row, blen = inp
        work = jnp.concatenate([window, row])
        out, out_len = encode_block(work, blen, W, use_fingerprints,
                                    W - filled)
        out_len = jnp.where(blen > 0, out_len, 0)
        ext = jnp.concatenate([window, row])
        new_window = jax.lax.dynamic_slice(ext, (blen,), (W,))
        new_filled = jnp.minimum(filled + blen, W)
        return (new_window, new_filled), (out, out_len)

    (_, _), (outs, out_lens) = jax.lax.scan(
        step, (init_window, init_filled), (blocks, lens))
    return outs, out_lens


@functools.partial(jax.jit, static_argnames=("block_size",))
def decode_linked_scan(comp: jax.Array, lens: jax.Array, stored: jax.Array,
                       init_window: jax.Array, init_filled: jax.Array,
                       block_size: int):
    """Decode a chain of linked blocks.

    comp rows hold compressed bytes, or the raw payload for stored rows
    (stored[i] nonzero). Returns (outs i32[nb, block_size], out_lens).
    """
    M = comp.shape[1]
    comp = comp.astype(jnp.int32)  # uint8 OK: widening on device
    init_window = init_window.astype(jnp.int32)

    def step(carry, inp):
        window, filled = carry
        row, clen, is_stored = inp

        def do_decode(_):
            return decode_block(row, clen, window, block_size)

        def do_stored(_):
            out = jax.lax.dynamic_slice(
                jnp.concatenate([row, jnp.zeros(max(block_size - M, 0) + 1,
                                                row.dtype)]),
                (0,), (block_size,))
            return out, clen

        out, out_len = jax.lax.cond(is_stored > 0, do_stored, do_decode, None)
        out_len = jnp.where(clen > 0, out_len, 0)
        ext = jnp.concatenate([window, out])
        new_window = jax.lax.dynamic_slice(ext, (out_len,), (W,))
        new_filled = jnp.minimum(filled + out_len, W)
        return (new_window, new_filled), (out, out_len)

    (_, _), (outs, out_lens) = jax.lax.scan(
        step, (init_window, init_filled), (comp, lens, stored))
    return outs, out_lens
