"""LZX / LZX DELTA decoder (L2 codec) — used by CAB, CHM and OAB.

Format semantics (reference: libmspack/mspack/lzxd.c, lzx.h):

* MSB-first bitstream of 16-bit little-endian units.
* 32 KiB frames; bitstream realigns to 16 bits at each frame end; an
  optional reset interval fully re-initialises entropy state every N
  frames (the random-access / parallel-shard grid).
* Block types: VERBATIM, ALIGNED (extra 8-symbol aligned-offset tree),
  UNCOMPRESSED (byte-aligned raw bytes + literal R0-R2 values).
* 4 Huffman trees (pretree 20 / maintree 256+8*slots / length 250 /
  aligned 8); main+length code lengths are delta-coded via the pretree
  with run codes 17/18/19.
* Match offsets use position slots + extra bits + 3-entry LRU (R0-R2).
* E8 call-translation post-pass on frames < 32768 when an "intel
  filesize" header was present.
* DELTA extension: window 2^17..2^25, reference data pre-loaded at the
  window tail, extra match-length escape for matches up to 33024.

Scalar correctness implementation with the same pull semantics the
drivers need (decompress(out_bytes)); the batched TPU path is in
libmspack_tpu.ops.
"""
from __future__ import annotations

from ..errors import ArgsError, DecrunchError, MSPackError
from .bitstream import ByteFeed, MSBBitReader
from .huffman import HuffTable

MIN_MATCH = 2
MAX_MATCH = 257
NUM_CHARS = 256
BLOCK_VERBATIM = 1
BLOCK_ALIGNED = 2
BLOCK_UNCOMPRESSED = 3
PRETREE_NUM_ELEMENTS = 20
ALIGNED_NUM_ELEMENTS = 8
NUM_PRIMARY_LENGTHS = 7
NUM_SECONDARY_LENGTHS = 249

PRETREE_MAXSYMBOLS = PRETREE_NUM_ELEMENTS
PRETREE_TABLEBITS = 6
MAINTREE_MAXSYMBOLS = NUM_CHARS + 290 * 8
MAINTREE_TABLEBITS = 12
LENGTH_MAXSYMBOLS = NUM_SECONDARY_LENGTHS + 1
LENGTH_TABLEBITS = 12
ALIGNED_MAXSYMBOLS = ALIGNED_NUM_ELEMENTS
ALIGNED_TABLEBITS = 7
LENTABLE_SAFETY = 64  # run-length decoding may overrun by up to this

FRAME_SIZE = 32768

# number of position slots for window_bits 15..25 (lzxd.c:209-211)
POSITION_SLOTS = (30, 32, 34, 36, 38, 42, 50, 66, 98, 162, 290)

# extra bits per position slot: 0,0,0,0,1,1,2,2,... capped at 17 (>=36)
EXTRA_BITS = tuple(0 if i < 4 else min((i // 2) - 1, 17) for i in range(290 + 1))


def _make_position_base():
    base = [0] * 290
    offset = 0
    for i in range(290):
        base[i] = offset
        offset += 1 << EXTRA_BITS[i]
    return tuple(base)


POSITION_BASE = _make_position_base()


class LzxDecompressor:
    """Streaming LZX decoder over a read(n)->bytes input callable."""

    def __init__(self, read_fn, window_bits: int, reset_interval: int,
                 output_length: int = 0, is_delta: bool = False,
                 input_buffer_size: int = 4096, message=None):
        if is_delta:
            if not (17 <= window_bits <= 25):
                raise ArgsError("LZX DELTA window must be 2^17..2^25")
        else:
            if not (15 <= window_bits <= 21):
                raise ArgsError("LZX window must be 2^15..2^21")
        if reset_interval < 0 or output_length < 0:
            raise ArgsError("reset interval / output length < 0")

        self.bits = MSBBitReader(ByteFeed(read_fn, chunk=max(2, input_buffer_size)),
                                 unit_order="le")
        self.window_size = 1 << window_bits
        self.window = bytearray(self.window_size)
        self.offset = 0          # total bytes handed to the caller
        self.length = output_length
        self.ref_data_size = 0
        self.window_posn = 0
        self.frame_posn = 0
        self.frame = 0
        self.reset_interval = reset_interval
        self.intel_filesize = 0
        self.intel_started = False
        self.num_offsets = POSITION_SLOTS[window_bits - 15] << 3
        self.is_delta = is_delta
        self.error: MSPackError | None = None
        self.message = message or (lambda s: None)
        self._warned = False
        self._pending = b""      # decoded frame bytes not yet handed out

        self.maintree_len = [0] * (MAINTREE_MAXSYMBOLS + LENTABLE_SAFETY)
        self.length_len = [0] * (LENGTH_MAXSYMBOLS + LENTABLE_SAFETY)
        self.pretree_len = [0] * (PRETREE_MAXSYMBOLS + LENTABLE_SAFETY)
        self.aligned_len = [0] * (ALIGNED_MAXSYMBOLS + LENTABLE_SAFETY)
        self._aligned_tbl: HuffTable | None = None
        self._maintree_tbl: HuffTable | None = None
        self._length_tbl: HuffTable | None = None
        self.length_empty = False
        self._reset_state()

    # ------------------------------------------------------------------

    def _reset_state(self) -> None:
        self.R0 = self.R1 = self.R2 = 1
        self.header_read = False
        self.block_remaining = 0
        self.block_type = 0
        self.block_length = 0
        for i in range(MAINTREE_MAXSYMBOLS):
            self.maintree_len[i] = 0
        for i in range(LENGTH_MAXSYMBOLS):
            self.length_len[i] = 0

    def set_reference_data(self, data: bytes | None) -> None:
        """Pre-load DELTA reference data at the top of the window
        (reference: lzxd.c:348-382)."""
        if not self.is_delta:
            raise ArgsError("only LZX DELTA streams support reference data")
        if self.offset:
            raise ArgsError("too late to set reference data")
        length = len(data) if data else 0
        if length > self.window_size:
            raise ArgsError("reference data longer than window")
        self.ref_data_size = length
        if length:
            self.window[self.window_size - length :] = data

    def set_output_length(self, out_bytes: int) -> None:
        if out_bytes > 0:
            self.length = out_bytes

    # ------------------------------------------------------------------

    def _read_lens(self, lens: list, first: int, last: int) -> None:
        """Delta-coded code lengths via the pretree
        (reference: lzxd.c:138-183)."""
        bits = self.bits
        for x in range(PRETREE_NUM_ELEMENTS):
            self.pretree_len[x] = bits.read(4)
        pretree = HuffTable(PRETREE_MAXSYMBOLS, PRETREE_TABLEBITS,
                            self.pretree_len[:PRETREE_MAXSYMBOLS], lsb=False)
        x = first
        while x < last:
            z = pretree.decode(bits)
            if z == 17:
                y = bits.read(4) + 4
                for _ in range(y):
                    lens[x] = 0
                    x += 1
            elif z == 18:
                y = bits.read(5) + 20
                for _ in range(y):
                    lens[x] = 0
                    x += 1
            elif z == 19:
                y = bits.read(1) + 4
                z = pretree.decode(bits)
                # z may be 17..19 on malformed streams: a single +17
                # wrap then an unsigned-char store, exactly like the
                # reference (lzxd.c lens[] is unsigned char; values
                # > 16 are then ignored by make_decode_table)
                z = lens[x] - z
                if z < 0:
                    z += 17
                z &= 0xFF
                for _ in range(y):
                    lens[x] = z
                    x += 1
            else:
                z = lens[x] - z
                if z < 0:
                    z += 17
                lens[x] = z & 0xFF
                x += 1

    def _build_trees(self, aligned: bool) -> None:
        bits = self.bits
        if aligned:
            for i in range(8):
                self.aligned_len[i] = bits.read(3)
            self._aligned_tbl = HuffTable(
                ALIGNED_MAXSYMBOLS, ALIGNED_TABLEBITS,
                self.aligned_len[:ALIGNED_MAXSYMBOLS], lsb=False)

        self._read_lens(self.maintree_len, 0, 256)
        self._read_lens(self.maintree_len, 256, NUM_CHARS + self.num_offsets)
        self._maintree_tbl = HuffTable(
            MAINTREE_MAXSYMBOLS, MAINTREE_TABLEBITS,
            self.maintree_len[:MAINTREE_MAXSYMBOLS], lsb=False)
        if self.maintree_len[0xE8] != 0:
            self.intel_started = True

        self._read_lens(self.length_len, 0, NUM_SECONDARY_LENGTHS)
        self._length_tbl = HuffTable(
            LENGTH_MAXSYMBOLS, LENGTH_TABLEBITS,
            self.length_len[:LENGTH_MAXSYMBOLS], lsb=False,
            allow_empty=True)
        self.length_empty = self._length_tbl.empty

    # ------------------------------------------------------------------

    def decompress(self, out_bytes: int, write_fn) -> None:
        if self.error:
            raise self.error
        if out_bytes < 0:
            raise ArgsError("negative out_bytes")
        try:
            self._decompress(out_bytes, write_fn)
        except MSPackError as e:
            self.error = e
            raise

    def _fail(self, msg: str):
        raise DecrunchError(msg)

    def _decompress(self, out_bytes: int, write_fn) -> None:
        bits = self.bits
        window = self.window
        wsize = self.window_size

        # flush stored-up bytes first
        if self._pending:
            take = min(len(self._pending), out_bytes)
            write_fn(self._pending[:take])
            self._pending = self._pending[take:]
            self.offset += take
            out_bytes -= take
        if out_bytes == 0:
            return

        window_posn = self.window_posn
        R0, R1, R2 = self.R0, self.R1, self.R2

        end_frame = (self.offset + out_bytes) // FRAME_SIZE + 1

        while self.frame < end_frame:
            # reset interval
            if self.reset_interval and (self.frame % self.reset_interval) == 0:
                if self.block_remaining:
                    # format error; best effort (reference: lzxd.c:424-431)
                    if not self._warned:
                        self.message("WARNING; invalid reset interval detected "
                                     "during LZX decompression")
                        self._warned = True
                self._reset_state()
                R0, R1, R2 = self.R0, self.R1, self.R2

            # LZX DELTA has a 16-bit chunk size before each frame
            if self.is_delta:
                bits.ensure(16)
                bits.remove(16)

            if not self.header_read:
                j = 0
                i = bits.read(1)
                if i:
                    i = bits.read(16)
                    j = bits.read(16)
                v = (i << 16) | j
                self.intel_filesize = v - 0x100000000 if v & 0x80000000 else v
                self.header_read = True

            frame_size = FRAME_SIZE
            if self.length and (self.length - self.offset) < frame_size:
                frame_size = self.length - self.offset

            bytes_todo = self.frame_posn + frame_size - window_posn
            while bytes_todo > 0:
                if self.block_remaining == 0:
                    # realign after odd-sized uncompressed block
                    if (self.block_type == BLOCK_UNCOMPRESSED
                            and (self.block_length & 1)):
                        bits.feed.next_byte()

                    self.block_type = bits.read(3)
                    i = bits.read(16)
                    j = bits.read(8)
                    self.block_remaining = self.block_length = (i << 8) | j

                    if self.block_type == BLOCK_ALIGNED:
                        self._build_trees(aligned=True)
                    elif self.block_type == BLOCK_VERBATIM:
                        self._build_trees(aligned=False)
                    elif self.block_type == BLOCK_UNCOMPRESSED:
                        self.intel_started = True
                        # align to 16-bit boundary, dropping 1-16 bits
                        if bits.bits_left == 0:
                            bits.ensure(16)
                        bits.bits_left = 0
                        bits.bit_buffer = 0
                        buf = bytes(bits.feed.next_byte() for _ in range(12))
                        R0 = int.from_bytes(buf[0:4], "little")
                        R1 = int.from_bytes(buf[4:8], "little")
                        R2 = int.from_bytes(buf[8:12], "little")
                    else:
                        self._fail("bad block type")

                this_run = min(self.block_remaining, bytes_todo)
                bytes_todo -= this_run
                self.block_remaining -= this_run

                if self.block_type in (BLOCK_VERBATIM, BLOCK_ALIGNED):
                    aligned_block = self.block_type == BLOCK_ALIGNED
                    maintree = self._maintree_tbl
                    lengthtbl = self._length_tbl
                    alignedtbl = self._aligned_tbl
                    while this_run > 0:
                        main_element = maintree.decode(bits)
                        if main_element < NUM_CHARS:
                            window[window_posn] = main_element
                            window_posn += 1
                            this_run -= 1
                            continue
                        main_element -= NUM_CHARS

                        match_length = main_element & NUM_PRIMARY_LENGTHS
                        if match_length == NUM_PRIMARY_LENGTHS:
                            if self.length_empty:
                                self._fail("LENGTH symbol needed but tree is empty")
                            match_length += lengthtbl.decode(bits)
                        match_length += MIN_MATCH

                        match_offset = main_element >> 3
                        if match_offset == 0:
                            match_offset = R0
                        elif match_offset == 1:
                            match_offset = R1
                            R1 = R0
                            R0 = match_offset
                        elif match_offset == 2:
                            match_offset = R2
                            R2 = R0
                            R0 = match_offset
                        else:
                            extra = 17 if match_offset >= 36 else EXTRA_BITS[match_offset]
                            match_offset = POSITION_BASE[match_offset] - 2
                            if extra >= 3 and aligned_block:
                                if extra > 3:
                                    match_offset += bits.read(extra - 3) << 3
                                match_offset += alignedtbl.decode(bits)
                            elif extra:
                                match_offset += bits.read(extra)
                            R2 = R1
                            R1 = R0
                            R0 = match_offset

                        # DELTA long-match escape (lzxd.c:588-611)
                        if match_length == MAX_MATCH and self.is_delta:
                            bits.ensure(3)
                            if bits.peek(1) == 0:
                                bits.remove(1)
                                extra_len = bits.read(8)
                            elif bits.peek(2) == 2:
                                bits.remove(2)
                                extra_len = bits.read(10) + 0x100
                            elif bits.peek(3) == 6:
                                bits.remove(3)
                                extra_len = bits.read(12) + 0x500
                            else:
                                bits.remove(3)
                                extra_len = bits.read(15)
                            match_length += extra_len

                        if window_posn + match_length > wsize:
                            self._fail("match ran over window wrap")

                        # copy match
                        i = match_length
                        if match_offset > window_posn:
                            if (match_offset > self.offset
                                    and (match_offset - window_posn) > self.ref_data_size):
                                self._fail("match offset beyond LZX stream")
                            j = match_offset - window_posn
                            if j > wsize:
                                self._fail("match offset beyond window boundaries")
                            runsrc = wsize - j
                            rundest = window_posn
                            if j < i:
                                i -= j
                                while j > 0:
                                    window[rundest] = window[runsrc]
                                    rundest += 1
                                    runsrc += 1
                                    j -= 1
                                runsrc = 0
                            while i > 0:
                                window[rundest] = window[runsrc]
                                rundest += 1
                                runsrc += 1
                                i -= 1
                        else:
                            runsrc = window_posn - match_offset
                            rundest = window_posn
                            while i > 0:
                                window[rundest] = window[runsrc]
                                rundest += 1
                                runsrc += 1
                                i -= 1

                        this_run -= match_length
                        window_posn += match_length
                elif self.block_type == BLOCK_UNCOMPRESSED:
                    # raw bytes straight from the byte feed
                    need = this_run
                    rundest = window_posn
                    window_posn += this_run
                    while need > 0:
                        chunk = bits.feed.next_bytes(need)
                        if not chunk:
                            self._fail("EOF in uncompressed block")
                        window[rundest : rundest + len(chunk)] = chunk
                        rundest += len(chunk)
                        need -= len(chunk)
                else:
                    self._fail("bad block type")

                # did the final match overrun this_run?
                if this_run < 0:
                    if -this_run > self.block_remaining:
                        self._fail("overrun went past end of block")
                    self.block_remaining -= -this_run

            # frame boundary checks
            if (window_posn - self.frame_posn) != frame_size:
                self._fail("decode beyond output frame limits")

            # re-align bitstream to 16 bits
            if bits.bits_left > 0:
                bits.ensure(16)
            if bits.bits_left & 15:
                bits.remove(bits.bits_left & 15)

            if self._pending:
                self._fail("previous frame not fully consumed")

            # E8 call translation (reference: lzxd.c:706-733)
            frame_data = window[self.frame_posn : self.frame_posn + frame_size]
            if (self.intel_started and self.intel_filesize
                    and self.frame < 32768 and frame_size > 10):
                frame_data = _e8_transform(frame_data, self.offset,
                                           self.intel_filesize)

            take = min(out_bytes, frame_size)
            write_fn(bytes(frame_data[:take]))
            self._pending = bytes(frame_data[take:])
            self.offset += take
            out_bytes -= take

            self.frame_posn += frame_size
            self.frame += 1

            if window_posn == wsize:
                window_posn = 0
            if self.frame_posn == wsize:
                self.frame_posn = 0

        if out_bytes:
            self._fail("bytes left to output")

        self.window_posn = window_posn
        self.R0, self.R1, self.R2 = R0, R1, R2


def _e8_transform(data: bytearray, offset: int, filesize: int) -> bytearray:
    """Undo the E8 call-instruction translation on one frame.

    Scalar reference version; the vectorized pass is ops.e8.
    """
    out = bytearray(data)
    end = len(out) - 10
    pos = 0
    curpos = offset
    while pos < end:
        if out[pos] != 0xE8:
            pos += 1
            curpos += 1
            continue
        pos += 1
        abs_off = int.from_bytes(out[pos : pos + 4], "little", signed=True)
        if -curpos <= abs_off < filesize:
            rel_off = abs_off - curpos if abs_off >= 0 else abs_off + filesize
            out[pos : pos + 4] = (rel_off & 0xFFFFFFFF).to_bytes(4, "little")
        pos += 4
        curpos += 5
    return out
