"""OAB (Exchange Offline Address Book .LZX) driver (L3).

Format semantics (reference: libmspack/mspack/oabd.c, oab.h):

* full download (version 3.1): per-block {flags, csize, dsize, crc};
  flags=0 copy, flags=1 LZX DELTA block (window sized from dsize,
  2^17..2^25, no reference data); CRC-32 (initial 0xFFFFFFFF, no final
  inversion) over each block's output.
* incremental patch (version 3.2): per-block {csize, dsize, ssize,
  crc}; the base file provides ssize bytes of LZX reference data and
  the window is round32k(ssize)+dsize.
* trailing padding after each compressed block is consumed via the
  block's declared csize budget.
"""
from __future__ import annotations

import zlib

from ..codecs.lzx import LzxDecompressor
from ..errors import (ArgsError, ChecksumError, DataFormatError, MSPackError,
                      ReadError, SignatureError)
from ..system import (BytesSink, FileSink, PathOrBytes, Sink, open_source,
                      read_exact)

OABHEAD_SIZEOF = 0x10
OABBLK_SIZEOF = 0x10
PATCHHEAD_SIZEOF = 0x1C
PATCHBLK_SIZEOF = 0x10


def crc32_raw(data: bytes, crc: int = 0xFFFFFFFF) -> int:
    """CRC-32 with initial value and NO final inversion
    (reference: crc32.h:9-15, oabd.c:197 starts at 0xffffffff).

    The MXU-batched device version is ops.crc32."""
    return (zlib.crc32(data, crc ^ 0xFFFFFFFF)) ^ 0xFFFFFFFF


class OabDecompressor:
    """Pythonic equivalent of msoab_decompressor (mspack.h:2255-2376)."""

    def __init__(self, message=None, engine: str = "auto"):
        self.buf_size = 4096
        self.message = message or (lambda s: None)
        from ..utils import resolve_engine
        self.engine = resolve_engine(engine)
        self._scratch = None

    def set_param(self, param: int, value: int) -> None:
        if param == 0 and value >= 16:   # MSOABD_PARAM_DECOMPBUF
            self.buf_size = value
        else:
            raise ArgsError("bad OAB param")

    # -- full download ---------------------------------------------------

    def decompress(self, input_: PathOrBytes, output) -> None:
        """reference: oabd.c:103-232."""
        src = open_source(input_)
        hdr = read_exact(src, OABHEAD_SIZEOF)
        if (int.from_bytes(hdr[0:4], "little") != 3
                or int.from_bytes(hdr[4:8], "little") != 1):
            raise SignatureError("not an OAB full download (v3.1)")
        block_max = int.from_bytes(hdr[8:12], "little")
        target_size = int.from_bytes(hdr[12:16], "little")

        sink = output if isinstance(output, Sink) else FileSink(output)
        try:
            while target_size:
                blk = read_exact(src, OABBLK_SIZEOF)
                blk_flags = int.from_bytes(blk[0:4], "little")
                blk_csize = int.from_bytes(blk[4:8], "little")
                blk_dsize = int.from_bytes(blk[8:12], "little")
                blk_crc = int.from_bytes(blk[12:16], "little")

                if blk_dsize > block_max or blk_dsize > target_size \
                        or blk_flags > 1:
                    raise DataFormatError("bad OAB block header")

                if not blk_flags:
                    if blk_dsize != blk_csize:
                        raise DataFormatError("uncompressed block size mismatch")
                    sink.write(read_exact(src, blk_dsize))
                else:
                    window_bits = 17
                    while window_bits < 25 and (1 << window_bits) < blk_dsize:
                        window_bits += 1
                    self._decode_block(src, sink, blk_csize, blk_dsize,
                                       blk_crc, window_bits, None)
                target_size -= blk_dsize
        finally:
            if sink is not output and hasattr(sink, "close"):
                sink.close()

    # -- incremental patch -----------------------------------------------

    def decompress_incremental(self, input_: PathOrBytes, base: PathOrBytes,
                               output) -> None:
        """reference: oabd.c:234-373."""
        src = open_source(input_)
        basesrc = open_source(base)
        hdr = read_exact(src, PATCHHEAD_SIZEOF)
        if (int.from_bytes(hdr[0:4], "little") != 3
                or int.from_bytes(hdr[4:8], "little") != 2):
            raise SignatureError("not an OAB incremental patch (v3.2)")
        block_max = int.from_bytes(hdr[8:12], "little")
        target_size = int.from_bytes(hdr[16:20], "little")
        if block_max < PATCHBLK_SIZEOF:
            block_max = PATCHBLK_SIZEOF

        sink = output if isinstance(output, Sink) else FileSink(output)
        try:
            while target_size:
                blk = read_exact(src, PATCHBLK_SIZEOF)
                blk_csize = int.from_bytes(blk[0:4], "little")
                blk_dsize = int.from_bytes(blk[4:8], "little")
                blk_ssize = int.from_bytes(blk[8:12], "little")
                blk_crc = int.from_bytes(blk[12:16], "little")

                if blk_dsize > block_max or blk_dsize > target_size \
                        or blk_ssize > block_max:
                    raise DataFormatError("bad patch block header")

                window_size = ((blk_ssize + 32767) & ~32767) + blk_dsize
                window_bits = 17
                while window_bits < 25 and (1 << window_bits) < window_size:
                    window_bits += 1

                ref_data = basesrc.read(blk_ssize) if blk_ssize else b""
                if len(ref_data) < blk_ssize:
                    raise ReadError("base file too short for reference data")
                self._decode_block(src, sink, blk_csize, blk_dsize,
                                   blk_crc, window_bits, ref_data)
                target_size -= blk_dsize
        finally:
            if sink is not output and hasattr(sink, "close"):
                sink.close()

    # -- helpers ---------------------------------------------------------

    def _decode_block(self, src, sink, csize: int, dsize: int, crc: int,
                      window_bits: int, ref_data: bytes | None) -> None:
        if self.engine == "tpu":
            # whole-block decode through the Pallas LZX lane kernel
            # (DELTA reference data preloaded at the window tail,
            # lzxd.c:348-382); blocks the kernel declines (window >
            # 2^18, intel E8 with DELTA refs, oversize) fall through
            stream = src.read(csize)
            out = None
            if len(stream) == csize:
                out = self._decode_block_tpu(stream, dsize,
                                             window_bits, ref_data)
            if out is not None:
                if self._crc_tpu(out) != crc:
                    raise ChecksumError("OAB block CRC mismatch")
                sink.write(out)
                return
            # TPU path declined: re-feed the bytes onward
            src = open_source(stream)
        if self.engine == "jax":
            # whole-block LZX DELTA decode on device (ops/lzx_jax)
            stream = src.read(csize)
            if len(stream) == csize:
                try:
                    from ..ops.lzx_jax import lzx_stream_decode
                    out = lzx_stream_decode(stream, window_bits, dsize,
                                            is_delta=True,
                                            ref_data=ref_data)
                except Exception:
                    out = None
                if out is not None:
                    if crc32_raw(out) != crc:
                        raise ChecksumError("OAB block CRC mismatch")
                    sink.write(out)
                    return
            # device path declined: re-feed the bytes to the scalar path
            src = open_source(stream)
        if self.engine == "native":
            # whole-block decode on the native engine; fall through to
            # the scalar path on any shortfall
            stream = src.read(csize)
            if len(stream) == csize:
                from .. import native
                if self._scratch is None:
                    self._scratch = native.Scratch()
                out = self._scratch.get(max(dsize, 1))[:dsize]
                if native.lzx_decode_into(stream, csize, window_bits, 0,
                                          out, dsize, is_delta=True,
                                          ref_data=ref_data):
                    if crc32_raw(out) != crc:
                        raise ChecksumError("OAB block CRC mismatch")
                    sink.write(out)
                    return
            # native path declined: re-feed the bytes to the scalar path
            src = open_source(stream)
        budget = {"left": csize}

        def read_fn(n: int) -> bytes:
            n = min(n, budget["left"])
            data = src.read(n)
            budget["left"] -= len(data)
            return data

        crc_state = {"crc": 0xFFFFFFFF}

        def write_fn(data: bytes) -> None:
            crc_state["crc"] = crc32_raw(data, crc_state["crc"])
            sink.write(data)

        lzx = LzxDecompressor(read_fn, window_bits, 0, dsize,
                              is_delta=True, input_buffer_size=self.buf_size,
                              message=self.message)
        if ref_data is not None:
            lzx.set_reference_data(ref_data)
        lzx.decompress(dsize, write_fn)

        # consume trailing padding within the block's compressed budget
        while budget["left"]:
            if not read_fn(min(self.buf_size, budget["left"])):
                raise ReadError("EOF consuming block padding")

        if crc_state["crc"] != crc:
            raise ChecksumError("OAB block CRC mismatch")

    def _decode_block_tpu(self, stream, dsize, window_bits, ref_data):
        try:
            import jax

            from ..parallel.tpu_pipeline import TpuLzxEngine
            if getattr(self, "_tpu_lzx_engine", None) is None:
                self._tpu_lzx_engine = TpuLzxEngine(
                    interpret=jax.default_backend() == "cpu")
            outs = self._tpu_lzx_engine.decode_streams(
                [stream], [dsize], window_bits, is_delta=True,
                refs=[ref_data or b""])
            if outs is None or outs[0] is None:
                return None
            return outs[0]
        except Exception as e:
            self.fallback_reasons = getattr(self, "fallback_reasons",
                                            {})
            self.fallback_reasons["oab_lzx_tpu"] = \
                f"{type(e).__name__}: {e}"
            import os
            if os.environ.get("MSPACK_TPU_STRICT"):
                raise
            return None

    def _crc_tpu(self, out: bytes) -> int:
        """Per-block CRC on the MXU (GF(2) matmul, ops/crc32) when the
        chip path decoded the block; host zlib otherwise."""
        try:
            import jax

            if jax.default_backend() != "cpu":
                from ..ops.crc32 import crc32_device
                return crc32_device(out)
        except Exception:
            pass
        return crc32_raw(out)

    def decompress_bytes(self, data: PathOrBytes) -> bytes:
        sink = BytesSink()
        self.decompress(data, sink)
        return sink.getvalue()

    def decompress_incremental_bytes(self, patch: PathOrBytes,
                                     base: PathOrBytes) -> bytes:
        sink = BytesSink()
        self.decompress_incremental(patch, base, sink)
        return sink.getvalue()
