"""Multi-chip sharded codec: blocks data-parallel over a device mesh.

The scaling design (SURVEY §2.6 / BASELINE config 5): frame blocks shard
across chips along a 1-D "data" mesh axis via shard_map; each chip runs the
batched block kernels on its shard; compressed sizes combine with an ICI
psum; the frame is assembled in block order on the host.

Linked mode shards as well: at ENCODE time block i's 64 KB window is the
plaintext immediately before it — known from the input — so every block
carries its window as a per-row history slice and the serial chain
disappears (no ICI traffic needed; better than the tail-window ppermute
pipeline sketched in SURVEY §2.6 because there is no step dependency at
all). Linked DECODE is truly sequential (block i's window is block i-1's
OUTPUT) and runs as the single-device lax.scan.

On one host this also expresses multi-host SPMD: under
jax.distributed.initialize each process holds its local shard of the global
batch and the same psum rides DCN (see multihost.py).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..config import FrameConfig
from ..ops.decode_xla import decode_block
from ..ops.encode_xla import encode_block
from .device import device_compress_frame, device_decompress_frame


def make_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    """1-D device mesh over the first n (default: all) local devices."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


class ShardedCodec:
    """Data-parallel frame codec over a device mesh.

    compress/decompress mirror the one-shot frame API but run every block
    kernel sharded across the mesh. Block counts are padded to a multiple of
    the mesh size with empty blocks (dropped at assembly).
    """

    def __init__(self, mesh: Optional[Mesh] = None,
                 config: Optional[FrameConfig] = None,
                 use_fingerprints: bool = True,
                 engine: str = "xla"):
        """engine: "xla" (data-parallel kernels on every chip) or "best"
        (hybrid encoder + Pallas-interpreter decoder on every chip — the
        fastest per-chip engines; falls back to XLA where a shape is
        unsupported, e.g. blocks whose chain exceeds the SMEM budget)."""
        self.mesh = mesh if mesh is not None else make_mesh()
        self.axis = self.mesh.axis_names[0]
        self.ndev = self.mesh.devices.size
        self.config = (config if config is not None
                       else FrameConfig(block_size=65536,
                                        block_independence=True))
        self.use_fingerprints = use_fingerprints
        self.engine = engine
        self._build()

    def _build(self):
        mesh, axis = self.mesh, self.axis
        bs = self.config.resolved_block_size
        use_fp = self.use_fingerprints

        use_best = False
        if self.engine == "best":
            from ..ops.hybrid_encode import hybrid_max_bs
            use_best = bs <= hybrid_max_bs()
        self._use_best = use_best
        interp = jax.default_backend() != "tpu"

        # Encoders are cached per static history length (0 = plain blocks,
        # WINDOW_SIZE = dictionary-warmed blocks).
        self._enc_cache = {}

        def make_enc(hist_len: int):
            if use_best:
                from ..ops.hybrid_encode import encode_blocks_hybrid

                def enc_shard(work, lens, hist_start):
                    out, out_len = encode_blocks_hybrid(
                        work, lens, bs, hist_len, hist_start, interp)
                    total = jax.lax.psum(jnp.sum(out_len), axis)
                    return out, out_len, total
            else:
                def enc_shard(work, lens, hist_start):
                    out, out_len = jax.vmap(
                        lambda w, l, h: encode_block(w, l, hist_len, use_fp,
                                                     h)
                    )(work, lens, hist_start)
                    total = jax.lax.psum(jnp.sum(out_len), axis)
                    return out, out_len, total

            return jax.jit(shard_map(
                enc_shard, mesh=mesh, check_vma=False,
                in_specs=(P(axis, None), P(axis), P(axis)),
                out_specs=(P(axis, None), P(axis), P()),
            ))

        self._make_enc = make_enc

        if use_best:
            from ..ops.pallas_decode import decode_blocks_pallas

            def dec_shard(comp, lens, hist):
                out, out_len = decode_blocks_pallas(
                    comp, lens, hist, bs, True, interp)
                total = jax.lax.psum(jnp.sum(out_len), axis)
                return out, out_len, total
        else:
            def dec_shard(comp, lens, hist):
                out, out_len = jax.vmap(
                    lambda c, l, h: decode_block(c, l, h, bs))(comp, lens,
                                                               hist)
                total = jax.lax.psum(jnp.sum(out_len), axis)
                return out, out_len, total

        self._dec = jax.jit(shard_map(
            dec_shard, mesh=mesh, check_vma=False,
            in_specs=(P(axis, None), P(axis), P(axis, None)),
            out_specs=(P(axis, None), P(axis), P()),
        ))

    # -- padding helpers ----------------------------------------------------

    def _pad_rows(self, arr: np.ndarray) -> np.ndarray:
        nb = arr.shape[0]
        rem = (-nb) % self.ndev
        if rem == 0:
            return arr
        pad = np.zeros((rem,) + arr.shape[1:], dtype=arr.dtype)
        return np.concatenate([arr, pad], axis=0)

    # -- public API ---------------------------------------------------------

    def compress(self, data, dictionary=None) -> np.ndarray:
        """Compress to a spec-exact LZ4 frame, blocks sharded over chips.

        Linked frames shard too: block i's 64 KB window is plaintext known
        up front, carried per row as a history slice (device.py
        _compress_linked) — the chain parallelizes with no ICI traffic at
        encode time.
        """
        def encode_batch(work, lens, hist_len, hist_start):
            nb = work.shape[0]
            work_p = self._pad_rows(np.asarray(work))
            lens_p = self._pad_rows(np.asarray(lens))
            hs = np.broadcast_to(
                np.asarray(hist_start, np.int32), (nb,)).copy()
            # Padding rows carry no valid history.
            hs_p = np.full(work_p.shape[0], hist_len, np.int32)
            hs_p[:nb] = hs
            sh = NamedSharding(self.mesh, P(self.axis, None))
            sh1 = NamedSharding(self.mesh, P(self.axis))
            if hist_len not in self._enc_cache:
                self._enc_cache[hist_len] = self._make_enc(hist_len)
            out, out_len, _ = self._enc_cache[hist_len](
                jax.device_put(jnp.asarray(work_p), sh),
                jax.device_put(jnp.asarray(lens_p), sh1),
                jax.device_put(jnp.asarray(hs_p), sh1))
            return out[:nb], out_len[:nb]
        return device_compress_frame(data, self.config,
                                     self.use_fingerprints, encode_batch,
                                     dictionary)

    def decompress(self, data, verify_checksum: bool = True,
                   dictionary=None) -> np.ndarray:
        """Decompress an independent-block frame, blocks sharded over chips."""
        def decode_batch(comp, lens, hist):
            nb = comp.shape[0]
            comp_p = self._pad_rows(np.asarray(comp))
            lens_p = self._pad_rows(np.asarray(lens))
            hist_p = self._pad_rows(np.asarray(hist))
            if self._use_best:
                # The Pallas kernel wild-reads up to SLACK bytes past a
                # row's compressed length and needs width % 1024 == 0.
                w = comp_p.shape[1]
                w2 = -(-w // 1024) * 1024 + 1024
                comp_p = np.pad(comp_p, ((0, 0), (0, w2 - w)))
            sh = NamedSharding(self.mesh, P(self.axis, None))
            sh1 = NamedSharding(self.mesh, P(self.axis))
            out, out_len, _ = self._dec(
                jax.device_put(jnp.asarray(comp_p), sh),
                jax.device_put(jnp.asarray(lens_p), sh1),
                jax.device_put(jnp.asarray(hist_p), sh))
            return out[:nb], out_len[:nb]
        if self._use_best:
            # Split path: one sharded dispatch of the interleaved copy
            # kernel (host parse -> striped rows over the mesh). The
            # kernel's output capacity comes from the FRAME header's
            # block size (passed through by the device layer), not this
            # codec's config — frames written with a different block
            # size must not truncate.
            return device_decompress_frame(
                data, verify_checksum, dictionary=dictionary,
                engine="split",
                split_sharded=(self.ndev, self._dec_split,
                               self._dec_split_compact))
        return device_decompress_frame(data, verify_checksum, decode_batch,
                                       dictionary=dictionary)

    def _dec_split_compact(self, wire, words2d, bases2d, trips2d, hist,
                           use_history: bool, bs: int, ways: int,
                           pair: int):
        """shard_map'd COMPACT-stream wire decode (round 5): every shard
        receives its own equal-length flat record stream (words2d row),
        shard-local word bases, and shard-local trips — the device layer
        stripes count-sorted rows across the mesh and builds per-shard
        streams (stage_sharded_compact). ways is uniform (compact
        planning is VMEM-bound only → 8 at <= 64 KB blocks), so the SPMD
        constraint costs nothing here."""
        from ..ops.pallas_split_decode import decode_blocks_wire_compact

        interp = jax.default_backend() != "tpu"
        mesh, axis = self.mesh, self.axis
        key = ("compact", wire.shape[1], words2d.shape[1],
               bases2d.shape[1], bool(use_history), bs, ways, pair)
        if not hasattr(self, "_dec_split_cache"):
            self._dec_split_cache = {}
        if key not in self._dec_split_cache:
            if use_history:
                def dec_shard(wire_s, words_s, bases_s, trips_s, hist_s):
                    return decode_blocks_wire_compact(
                        wire_s, words_s[0], bases_s[0], trips_s[0], bs,
                        True, hist_s, interp, pair=pair, ways=ways)
                in_specs = (P(axis, None), P(axis, None), P(axis, None),
                            P(axis, None), P(axis, None))
            else:
                def dec_shard(wire_s, words_s, bases_s, trips_s):
                    return decode_blocks_wire_compact(
                        wire_s, words_s[0], bases_s[0], trips_s[0], bs,
                        False, None, interp, pair=pair, ways=ways)
                in_specs = (P(axis, None), P(axis, None), P(axis, None),
                            P(axis, None))
            self._dec_split_cache[key] = jax.jit(shard_map(
                dec_shard, mesh=mesh, check_vma=False,
                in_specs=in_specs, out_specs=P(axis, None)))
        sh2 = NamedSharding(mesh, P(self.axis, None))
        args = [jax.device_put(jnp.asarray(wire), sh2),
                jax.device_put(jnp.asarray(words2d), sh2),
                jax.device_put(jnp.asarray(bases2d), sh2),
                jax.device_put(jnp.asarray(trips2d), sh2)]
        if use_history:
            args.append(jax.device_put(jnp.asarray(hist), sh2))
        return self._dec_split_cache[key](*args)

    def _dec_split(self, wire, recs, trips, hist, use_history: bool,
                   bs: int, ways: int | None = None):
        """shard_map'd WIRE-DIRECT split decode over the mesh (rows
        pre-striped and padded to ndev*ways by the device layer); *bs* is
        the FRAME's block size. hist is None unless use_history.

        The device layer queues one of these dispatches PER DENSITY TIER
        (each at its own cap/ways — _decode_independent_split), so *ways*
        must be passed through to the kernel exactly as the trips were
        grouped: replanning on a tier's narrowed wire width could pick a
        wider interleave and misapply the record-loop bounds (the same
        corruption class the partitioned host path guards against).
        ways=None (legacy single-dispatch callers) lets the kernel plan —
        safe only because those callers grouped trips over the SAME
        unsliced shapes the kernel replans on."""
        from ..ops.pallas_split_decode import decode_blocks_wire

        interp = jax.default_backend() != "tpu"
        mesh, axis = self.mesh, self.axis
        key = (wire.shape[1], recs.shape[1], bool(use_history), bs, ways)
        if not hasattr(self, "_dec_split_cache"):
            self._dec_split_cache = {}
        if key not in self._dec_split_cache:
            if use_history:
                def dec_shard(wire_s, recs_s, trips_s, hist_s):
                    return decode_blocks_wire(wire_s, recs_s, trips_s, bs,
                                              True, hist_s, interp,
                                              ways=ways)
                in_specs = (P(axis, None), P(axis, None, None), P(axis),
                            P(axis, None))
            else:
                def dec_shard(wire_s, recs_s, trips_s):
                    return decode_blocks_wire(wire_s, recs_s, trips_s, bs,
                                              False, None, interp,
                                              ways=ways)
                in_specs = (P(axis, None), P(axis, None, None), P(axis))

            self._dec_split_cache[key] = jax.jit(shard_map(
                dec_shard, mesh=mesh, check_vma=False,
                in_specs=in_specs, out_specs=P(axis, None)))
        sh2 = NamedSharding(mesh, P(self.axis, None))
        sh3 = NamedSharding(mesh, P(self.axis, None, None))
        sh1 = NamedSharding(mesh, P(self.axis))
        args = [jax.device_put(jnp.asarray(wire), sh2),
                jax.device_put(jnp.asarray(recs), sh3),
                jax.device_put(jnp.asarray(trips), sh1)]
        if use_history:
            args.append(jax.device_put(jnp.asarray(hist), sh2))
        return self._dec_split_cache[key](*args)
