"""MSZIP decoder (L2 codec): RFC1951 inflate inside 'CK' frames.

Semantics (reference: libmspack/mspack/mszipd.c, mszip.h):

* LSB-first bitstream; 32 KiB window == frame size.
* Each frame starts at a byte-aligned 'CK' signature which is *scanned*
  for (bad bytes before it are skipped) — mszipd.c:407-414.
* The window SURVIVES across frames: window_posn resets to 0 but match
  distances greater than the current position wrap into the previous
  frame's data (mszipd.c:264-268). This is what distinguishes MSZIP
  from independent per-block deflate.
* repair mode ("FIXMSZIP") zero-fills a failed frame and continues.
* KWAJ variant: frames are prefixed with a 16-bit block length instead
  of scanning, and end when that length is 0 (mszipd.c:462-495).

Scalar correctness implementation; the batched TPU two-phase path lives
in libmspack_tpu.ops.inflate_jax.
"""
from __future__ import annotations

from ..errors import DataFormatError, DecrunchError, MSPackError, ReadError
from .bitstream import ByteFeed, LSBBitReader
from .huffman import HuffTable

FRAME_SIZE = 32768
LITERAL_MAXSYMBOLS = 288
LITERAL_TABLEBITS = 9
DISTANCE_MAXSYMBOLS = 32
DISTANCE_TABLEBITS = 6

# match lengths for literal codes 257..285 (RFC1951 3.2.5)
LIT_LENGTHS = (3, 4, 5, 6, 7, 8, 9, 10, 11, 13, 15, 17, 19, 23, 27,
               31, 35, 43, 51, 59, 67, 83, 99, 115, 131, 163, 195, 227, 258)
LIT_EXTRABITS = (0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 2, 2,
                 2, 2, 3, 3, 3, 3, 4, 4, 4, 4, 5, 5, 5, 5, 0)
DIST_OFFSETS = (1, 2, 3, 4, 5, 7, 9, 13, 17, 25, 33, 49, 65, 97, 129, 193,
                257, 385, 513, 769, 1025, 1537, 2049, 3073, 4097, 6145, 8193,
                12289, 16385, 24577)
DIST_EXTRABITS = (0, 0, 0, 0, 1, 1, 2, 2, 3, 3, 4, 4, 5, 5, 6,
                  6, 7, 7, 8, 8, 9, 9, 10, 10, 11, 11, 12, 12, 13, 13)
BITLEN_ORDER = (16, 17, 18, 0, 8, 7, 9, 6, 10, 5, 11, 4, 12, 3, 13, 2, 14, 1, 15)

FIXED_LITERAL_LENS = bytes([8] * 144 + [9] * 112 + [7] * 24 + [8] * 8)
FIXED_DISTANCE_LENS = bytes([5] * 32)


class MszipDecompressor:
    """Streaming MSZIP decoder over a read(n)->bytes input callable."""

    def __init__(self, read_fn, input_buffer_size: int = 2048,
                 repair_mode: bool = False, message=None):
        input_buffer_size = max(2, (input_buffer_size + 1) & -2)
        self.bits = LSBBitReader(ByteFeed(read_fn, chunk=input_buffer_size))
        self.window = bytearray(FRAME_SIZE)
        self.window_posn = 0
        self.bytes_output = 0
        self.repair_mode = repair_mode
        self.message = message or (lambda s: None)
        self._pending = b""  # decoded bytes not yet handed to the caller
        self.error: MSPackError | None = None
        self.literal_lens = bytearray(LITERAL_MAXSYMBOLS)
        self.distance_lens = bytearray(DISTANCE_MAXSYMBOLS)

    # -- deflate stream parsing ------------------------------------------

    def _read_dynamic_lens(self) -> None:
        bits = self.bits
        lit_codes = bits.read(5) + 257
        dist_codes = bits.read(5) + 1
        bitlen_codes = bits.read(4) + 4
        if lit_codes > LITERAL_MAXSYMBOLS or dist_codes > DISTANCE_MAXSYMBOLS:
            raise DecrunchError("too many symbols in dynamic header")

        bl_len = bytearray(19)
        for i in range(bitlen_codes):
            bl_len[BITLEN_ORDER[i]] = bits.read(3)
        bl = HuffTable(19, 7, bl_len, lsb=True)

        total = lit_codes + dist_codes
        lens = bytearray(total)
        last_code = 0
        i = 0
        while i < total:
            # single-level lookup (max bitlen code is 7 bits)
            bits.ensure(7)
            code = bl.table[bits.peek(7)]
            bits.remove(bl_len[code])
            if code < 16:
                lens[i] = last_code = code
                i += 1
                continue
            if code == 16:
                run = bits.read(2) + 3
                fill = last_code
            elif code == 17:
                run = bits.read(3) + 3
                fill = 0
            elif code == 18:
                run = bits.read(7) + 11
                fill = 0
            else:
                raise DecrunchError(f"invalid bit-length code {code}")
            if i + run > total:
                raise DecrunchError("bitlen RLE overruns table")
            lens[i : i + run] = bytes([fill]) * run
            i += run

        self.literal_lens[:] = bytes(LITERAL_MAXSYMBOLS)
        self.literal_lens[:lit_codes] = lens[:lit_codes]
        self.distance_lens[:] = bytes(DISTANCE_MAXSYMBOLS)
        self.distance_lens[: dist_codes] = lens[lit_codes:]

    def _inflate(self) -> None:
        """Decode one complete deflate stream into the window."""
        bits = self.bits
        while True:
            last_block = bits.read(1)
            block_type = bits.read(2)

            if block_type == 0:
                # stored block: align, 16-bit length + complement
                bits.align_byte()
                lens_buf = bytearray()
                while bits.bits_left >= 8:
                    if len(lens_buf) == 4:
                        raise DecrunchError("too many bits in bit buffer")
                    lens_buf.append(bits.peek(8))
                    bits.remove(8)
                if bits.bits_left != 0:
                    raise DecrunchError("unaligned bit buffer")
                while len(lens_buf) < 4:
                    lens_buf.append(bits.feed.next_byte())
                length = lens_buf[0] | (lens_buf[1] << 8)
                comp = lens_buf[2] | (lens_buf[3] << 8)
                if length != (~comp & 0xFFFF):
                    raise DecrunchError("stored block length complement mismatch")
                while length > 0:
                    chunk = bits.feed.next_bytes(
                        min(length, FRAME_SIZE - self.window_posn))
                    if not chunk:
                        raise ReadError("EOF in stored block")
                    self.window[self.window_posn : self.window_posn + len(chunk)] = chunk
                    self.window_posn += len(chunk)
                    length -= len(chunk)
                    self._flush_if_full()
            elif block_type in (1, 2):
                if block_type == 1:
                    self.literal_lens[:] = FIXED_LITERAL_LENS
                    self.distance_lens[:] = FIXED_DISTANCE_LENS
                else:
                    self._read_dynamic_lens()
                lit = HuffTable(LITERAL_MAXSYMBOLS, LITERAL_TABLEBITS,
                                self.literal_lens, lsb=True)
                dist = HuffTable(DISTANCE_MAXSYMBOLS, DISTANCE_TABLEBITS,
                                 self.distance_lens, lsb=True)
                self._inflate_huff_block(lit, dist)
            else:
                raise DecrunchError(f"bad deflate block type {block_type}")

            if last_block:
                break

        if self.window_posn:
            self.bytes_output += self.window_posn
            if self.bytes_output > FRAME_SIZE:
                raise DecrunchError("frame overflow")
            self.window_posn = 0  # consumed into bytes_output

    def _flush_if_full(self) -> None:
        if self.window_posn == FRAME_SIZE:
            self.bytes_output += FRAME_SIZE
            if self.bytes_output > FRAME_SIZE:
                raise DecrunchError("frame overflow")
            self.window_posn = 0

    def _inflate_huff_block(self, lit: HuffTable, dist: HuffTable) -> None:
        bits = self.bits
        window = self.window
        posn = self.window_posn
        while True:
            code = lit.decode(bits)
            if code < 256:
                window[posn] = code
                posn += 1
                if posn == FRAME_SIZE:
                    self.window_posn = posn
                    self._flush_if_full()
                    posn = self.window_posn
            elif code == 256:
                break
            else:
                code -= 257
                if code >= 29:
                    raise DecrunchError("out-of-range literal code")
                length = LIT_LENGTHS[code] + bits.read(LIT_EXTRABITS[code]) \
                    if LIT_EXTRABITS[code] else LIT_LENGTHS[code]
                dcode = dist.decode(bits)
                if dcode >= 30:
                    raise DecrunchError("out-of-range distance code")
                distance = DIST_OFFSETS[dcode] + (
                    bits.read(DIST_EXTRABITS[dcode]) if DIST_EXTRABITS[dcode] else 0)
                match_posn = ((FRAME_SIZE if distance > posn else 0)
                              + posn - distance)
                for _ in range(length):
                    window[posn] = window[match_posn]
                    posn += 1
                    match_posn = (match_posn + 1) & (FRAME_SIZE - 1)
                    if posn == FRAME_SIZE:
                        self.window_posn = posn
                        self._flush_if_full()
                        posn = self.window_posn
        self.window_posn = posn

    # -- public entry points ---------------------------------------------

    def decompress(self, out_bytes: int, write_fn) -> None:
        """CAB entry point: decode out_bytes, scanning 'CK' per frame."""
        if self.error:
            raise self.error
        if out_bytes < 0:
            raise MSPackError("negative out_bytes")

        # hand out bytes left over from the previous frame first
        if self._pending:
            take = min(len(self._pending), out_bytes)
            write_fn(self._pending[:take])
            self._pending = self._pending[take:]
            out_bytes -= take
        if out_bytes == 0:
            return

        bits = self.bits
        while out_bytes > 0:
            # scan (byte-aligned) for the next 'CK' signature
            bits.align_byte()
            state = 0
            while state != 2:
                i = bits.read(8)
                if i == 0x43:        # 'C'
                    state = 1
                elif state == 1 and i == 0x4B:  # 'K'
                    state = 2
                else:
                    state = 0

            self.window_posn = 0
            self.bytes_output = 0
            try:
                self._inflate()
            except (DecrunchError, DataFormatError) as e:
                if not self.repair_mode:
                    self.error = DecrunchError(str(e))
                    raise self.error
                # salvage: keep whatever made it into the window, zero the rest
                if self.bytes_output == 0 and self.window_posn > 0:
                    self.bytes_output = self.window_posn
                self.message("MSZIP error, %u bytes of data lost."
                             % (FRAME_SIZE - self.bytes_output))
                for i in range(self.bytes_output, FRAME_SIZE):
                    self.window[i] = 0
                self.bytes_output = FRAME_SIZE

            produced = self.window[: self.bytes_output]
            take = min(out_bytes, self.bytes_output)
            write_fn(bytes(produced[:take]))
            self._pending = bytes(produced[take:])
            out_bytes -= take

    def decompress_kwaj(self, write_fn) -> None:
        """KWAJ entry point: 16-bit-length-prefixed CK frames until len==0."""
        bits = self.bits
        while True:
            bits.align_byte()
            block_len = bits.read(8)
            block_len |= bits.read(8) << 8
            if block_len == 0:
                break
            if bits.read(8) != 0x43 or bits.read(8) != 0x4B:
                raise DataFormatError("missing CK signature in KWAJ block")
            self.window_posn = 0
            self.bytes_output = 0
            self._inflate()
            write_fn(bytes(self.window[: self.bytes_output]))
