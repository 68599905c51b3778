"""Quantum decoder (L2 codec) — adaptive arithmetic-coded LZ.

Format semantics (reference: libmspack/mspack/qtmd.c, qtm.h):

* MSB-first bitstream of 16-bit *big-endian* units (qtmd.c:30-35).
* 16-bit H/L/C range coder with underflow handling; every decoded
  symbol updates its model's cumulative frequencies (+8), with a
  rescale + frequency re-sort once cumfreq[0] exceeds 3800.
* 7-symbol selector model routes to: 4 positional literal models
  (64 syms each) or 3 match shapes (len-3, len-4, variable length).
* position/length slot tables like LZX but with 19-bit extras.
* 32 KiB frames: at each frame end the stream re-aligns to a byte and
  skips forward to a 0xFF trailer byte (CAB injects one per block) and
  H/L/C are re-initialised from the stream.
* window 1 KiB..2 MiB may be *smaller* than a frame; matches never
  cross a frame boundary but output wraps the window.

The per-symbol model mutation makes this codec inherently sequential
within a folder (SURVEY.md §7 hard part 3); parallelism comes from
decoding many folders at once.
"""
from __future__ import annotations

from ..errors import ArgsError, DecrunchError, MSPackError
from .bitstream import ByteFeed, MSBBitReader

FRAME_SIZE = 32768

# position slots (qtmd.c:52-64): extra_bits[i] = max(0, i-2)>>1, bases cumulative
EXTRA_BITS = tuple((0 if i < 2 else i - 2) >> 1 for i in range(42))
_pb = []
_off = 0
for _i in range(42):
    _pb.append(_off)
    _off += 1 << EXTRA_BITS[_i]
POSITION_BASE = tuple(_pb)

LENGTH_EXTRA = tuple(((0 if i < 2 else i - 2) >> 2) for i in range(26)) + (0,)
_lb = []
_off = 0
for _i in range(27):
    _lb.append(_off)
    _off += 1 << (((0 if _i < 2 else _i - 2) >> 2))
LENGTH_BASE = tuple(_lb[:26] + [254])
del _pb, _lb, _off, _i


class _Model:
    """One adaptive arithmetic model: parallel sym/cumfreq arrays with a
    sentinel entry (cumfreq 0) at the end."""

    __slots__ = ("entries", "shiftsleft", "syms", "cumfreq")

    def __init__(self, start: int, length: int):
        self.shiftsleft = 4
        self.entries = length
        self.syms = [start + i for i in range(length + 1)]
        self.cumfreq = [length - i for i in range(length + 1)]

    def update(self) -> None:
        """Rescale / re-sort (reference: qtmd.c:125-166)."""
        self.shiftsleft -= 1
        n = self.entries
        cf = self.cumfreq
        if self.shiftsleft:
            for i in range(n - 1, -1, -1):
                cf[i] >>= 1
                if cf[i] <= cf[i + 1]:
                    cf[i] = cf[i + 1] + 1
        else:
            self.shiftsleft = 50
            for i in range(n):
                cf[i] -= cf[i + 1]
                cf[i] += 1
                cf[i] >>= 1
            # in-place selection sort by frequency, decreasing
            syms = self.syms
            for i in range(n - 1):
                for j in range(i + 1, n):
                    if cf[i] < cf[j]:
                        cf[i], cf[j] = cf[j], cf[i]
                        syms[i], syms[j] = syms[j], syms[i]
            for i in range(n - 1, -1, -1):
                cf[i] += cf[i + 1]


class QtmDecompressor:
    """Streaming Quantum decoder over a read(n)->bytes input callable."""

    def __init__(self, read_fn, window_bits: int, input_buffer_size: int = 4096):
        if not (10 <= window_bits <= 21):
            raise ArgsError("Quantum window must be 2^10..2^21")
        self.bits = MSBBitReader(ByteFeed(read_fn, chunk=max(2, input_buffer_size)),
                                 unit_order="be")
        self.window_size = 1 << window_bits
        self.window = bytearray(self.window_size)
        self.window_posn = 0
        self.frame_todo = FRAME_SIZE
        self.header_read = False
        self.error: MSPackError | None = None
        self.H = 0
        self.L = 0
        self.C = 0
        self._o_ptr = 0   # window index of first undelivered byte
        self._o_end = 0   # window index past last decoded byte

        i = window_bits * 2
        self.model0 = _Model(0, 64)
        self.model1 = _Model(64, 64)
        self.model2 = _Model(128, 64)
        self.model3 = _Model(192, 64)
        self.model4 = _Model(0, min(i, 24))
        self.model5 = _Model(0, min(i, 36))
        self.model6 = _Model(0, i)
        self.model6len = _Model(0, 27)
        self.model7 = _Model(0, 7)

    # ------------------------------------------------------------------

    def _get_symbol(self, model: _Model) -> int:
        """GET_SYMBOL (reference: qtmd.c:92-123)."""
        H, L, C = self.H, self.L, self.C
        cf = model.cumfreq
        rng = ((H - L) & 0xFFFF) + 1
        symf = ((((C - L + 1) * cf[0]) - 1) // rng) & 0xFFFF

        i = 1
        n = model.entries
        while i < n:
            if cf[i] <= symf:
                break
            i += 1
        sym = model.syms[i - 1]

        rng = (H - L) + 1
        symf = cf[0]
        H = (L + (cf[i - 1] * rng) // symf - 1) & 0xFFFF
        L = (L + (cf[i] * rng) // symf) & 0xFFFF

        for j in range(i - 1, -1, -1):
            cf[j] += 8
        if cf[0] > 3800:
            model.update()

        bits = self.bits
        while True:
            if (L & 0x8000) != (H & 0x8000):
                if (L & 0x4000) and not (H & 0x4000):
                    C ^= 0x4000
                    L &= 0x3FFF
                    H |= 0x4000
                else:
                    break
            L = (L << 1) & 0xFFFF
            H = ((H << 1) | 1) & 0xFFFF
            C = ((C << 1) | bits.read(1)) & 0xFFFF

        self.H, self.L, self.C = H, L, C
        return sym

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

        # flush stored-up bytes
        avail = self._o_end - self._o_ptr
        take = min(avail, out_bytes)
        if take:
            write_fn(bytes(window[self._o_ptr : self._o_ptr + take]))
            self._o_ptr += take
            out_bytes -= take
        if out_bytes == 0:
            return

        window_posn = self.window_posn
        frame_todo = self.frame_todo

        while (self._o_end - self._o_ptr) < out_bytes:
            if not self.header_read:
                self.H = 0xFFFF
                self.L = 0
                self.C = bits.read(16)
                self.header_read = True

            frame_end = window_posn + (out_bytes - (self._o_end - self._o_ptr))
            if (window_posn + frame_todo) < frame_end:
                frame_end = window_posn + frame_todo
            if frame_end > wsize:
                frame_end = wsize

            while window_posn < frame_end:
                selector = self._get_symbol(self.model7)
                if selector < 4:
                    mdl = (self.model0, self.model1,
                           self.model2, self.model3)[selector]
                    sym = self._get_symbol(mdl)
                    window[window_posn] = sym
                    window_posn += 1
                    frame_todo -= 1
                    continue

                if selector == 4:
                    sym = self._get_symbol(self.model4)
                    extra = bits.read_many(EXTRA_BITS[sym])
                    match_offset = POSITION_BASE[sym] + extra + 1
                    match_length = 3
                elif selector == 5:
                    sym = self._get_symbol(self.model5)
                    extra = bits.read_many(EXTRA_BITS[sym])
                    match_offset = POSITION_BASE[sym] + extra + 1
                    match_length = 4
                elif selector == 6:
                    sym = self._get_symbol(self.model6len)
                    extra = bits.read_many(LENGTH_EXTRA[sym])
                    match_length = LENGTH_BASE[sym] + extra + 5
                    sym = self._get_symbol(self.model6)
                    extra = bits.read_many(EXTRA_BITS[sym])
                    match_offset = POSITION_BASE[sym] + extra + 1
                else:
                    self._fail(f"bad selector {selector}")

                rundest = window_posn
                frame_todo -= match_length

                if window_posn + match_length > wsize:
                    # match wraps the window (window < frame size case)
                    i = wsize - window_posn
                    j = window_posn - match_offset
                    while i > 0:
                        window[rundest] = window[j & (wsize - 1)]
                        rundest += 1
                        j += 1
                        i -= 1
                    # flush everything up to the window end
                    i = wsize - self._o_ptr
                    if i > out_bytes:
                        self._fail("window-wrap flush larger than request")
                    write_fn(bytes(window[self._o_ptr : wsize]))
                    out_bytes -= i
                    self._o_ptr = 0
                    self._o_end = 0
                    rundest = 0
                    i = match_length - (wsize - window_posn)
                    while i > 0:
                        window[rundest] = window[j & (wsize - 1)]
                        rundest += 1
                        j += 1
                        i -= 1
                    window_posn = window_posn + match_length - wsize
                    break  # window_posn < frame_end now false
                else:
                    i = match_length
                    if match_offset > window_posn:
                        j = match_offset - window_posn
                        if j > wsize:
                            self._fail("match offset beyond window boundaries")
                        runsrc = wsize - j
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
                        runsrc = rundest - match_offset
                        while i > 0:
                            window[rundest] = window[runsrc]
                            rundest += 1
                            runsrc += 1
                            i -= 1
                    window_posn += match_length

            self._o_end = window_posn

            if frame_todo > FRAME_SIZE or frame_todo < 0:
                self._fail("overshot frame alignment")

            if frame_todo == 0:
                # realign to byte, scan for the 0xFF trailer
                if bits.bits_left & 7:
                    bits.remove(bits.bits_left & 7)
                while bits.read(8) != 0xFF:
                    pass
                self.header_read = False
                frame_todo = FRAME_SIZE

            if window_posn == wsize:
                avail = self._o_end - self._o_ptr
                if avail >= out_bytes:
                    break
                write_fn(bytes(window[self._o_ptr : self._o_end]))
                out_bytes -= avail
                self._o_ptr = 0
                self._o_end = 0
                window_posn = 0

        if out_bytes:
            write_fn(bytes(window[self._o_ptr : self._o_ptr + out_bytes]))
            self._o_ptr += out_bytes

        self.window_posn = window_posn
        self.frame_todo = frame_todo
