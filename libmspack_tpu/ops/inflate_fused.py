"""Fused device pipeline for MSZIP folders (v2 of ops/inflate_jax.py).

v1 builds 15-bit LUTs on host (8 MB per frame-batch uploaded) and pulls
token arrays back to the host between phases. This version keeps the
whole folder resident on device:

  host uploads per frame only the ~320-byte code-length arrays + the
  padded streams, then runs ONE jitted program per folder:
    1. canonical-code LUT construction on device (sort + cumsum +
       searchsorted, vmapped over frames);
    2. speculative phase A at every bit position (u32 windows, one
       packed-LUT gather per tree);
    3. jump-table chain linking;
    -- steps 1-3 run under lax.map over 64-frame chunks so HBM use is
       bounded regardless of folder size --
    4. folder-wide phase B pointer-doubling resolve;
  and downloads only the decoded bytes + a validity flag.

Only single-deflate-block frames take this path (the overwhelmingly
common case for CAB MSZIP); anything else falls back to v1/scalar.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..codecs.mszip import (DIST_EXTRABITS, DIST_OFFSETS, LIT_EXTRABITS,
                            LIT_LENGTHS)
from .inflate_jax import MAX_TOKENS, NeedFallback, _bitrev_arr

FRAME_SIZE = 32768
CHUNK = 64          # frames per lax.map step

_LIT_EXTRA = np.zeros(288, np.int32)
_LIT_BASE = np.zeros(288, np.int32)
for _c in range(29):
    _LIT_EXTRA[257 + _c] = LIT_EXTRABITS[_c]
    _LIT_BASE[257 + _c] = LIT_LENGTHS[_c]
_DIST_EXTRA = np.asarray(tuple(DIST_EXTRABITS) + (0, 0), np.int32)
_DIST_BASE = np.asarray(tuple(DIST_OFFSETS) + (0, 0), np.int32)


def _device_lut(lens, nsyms: int, extra_tbl, base_tbl,
                extra_shift: int, base_shift: int, rev15):
    """Packed 15-bit LSB-indexed LUT for one frame, built on device."""
    syms = jnp.arange(nsyms, dtype=jnp.int32)
    present = lens > 0
    key = jnp.where(present, lens * 512 + syms, jnp.int32(1 << 20))
    order = jnp.argsort(key)
    s_lens = jnp.take(lens, order)
    s_present = jnp.take(present, order)
    sizes = jnp.where(s_present, 1 << (15 - jnp.clip(s_lens, 1, 15)), 0)
    cum_end = jnp.cumsum(sizes)
    total = cum_end[-1]
    ok = total <= (1 << 15)

    v = jnp.arange(1 << 15, dtype=jnp.int32)
    idx = jnp.clip(jnp.searchsorted(cum_end, v, side="right"), 0, nsyms - 1)
    sym = jnp.take(order, idx)
    L = jnp.take(lens, sym)
    valid = (v < total) & (L > 0)

    entry = (L | (sym << 4)
             | (jnp.take(extra_tbl, sym) << extra_shift)
             | (jnp.take(base_tbl, sym) << base_shift))
    lut_msb = jnp.where(valid, entry, -1)
    return jnp.take(lut_msb, rev15), ok


def _chunk_phase_a(data, lit_lens, dist_lens, start_bits, S: int, R: int):
    """Steps 1-3 for one chunk of CHUNK frames. data: (CHUNK, S)."""
    B = CHUNK
    P = S * 8
    NP = B * P

    rev15 = jnp.asarray(_bitrev_arr(15).astype(np.int32))
    lit_lut, ok_l = jax.vmap(lambda l: _device_lut(
        l, 288, jnp.asarray(_LIT_EXTRA), jnp.asarray(_LIT_BASE),
        13, 16, rev15))(lit_lens)
    dist_lut, ok_d = jax.vmap(lambda l: _device_lut(
        l, 32, jnp.asarray(_DIST_EXTRA), jnp.asarray(_DIST_BASE),
        9, 13, rev15))(dist_lens)

    blk = jnp.arange(NP, dtype=jnp.int32) // P
    p = jnp.arange(NP, dtype=jnp.int32) % P

    words = jax.lax.bitcast_convert_type(data.reshape(-1, 4), jnp.uint32)
    wbase = blk * (S // 4) + (p >> 5)
    w0 = jnp.take(words, wbase)
    w1 = jnp.take(words, wbase + 1)
    w2 = jnp.take(words, wbase + 2)
    q0 = (p & 31).astype(jnp.uint32)

    def extract(rel, nbits):
        k = q0 + (jnp.uint32(rel) if isinstance(rel, int)
                  else rel.astype(jnp.uint32))
        hiword = k >= 32
        a = jnp.where(hiword, w1, w0)
        b = jnp.where(hiword, w2, w1)
        kk = k & 31
        lo = (a >> kk) | jnp.where(
            kk > 0, b << (jnp.uint32(32) - kk), jnp.uint32(0))
        return (lo & jnp.uint32((1 << nbits) - 1)).astype(jnp.int32)

    e1 = jnp.take(lit_lut.reshape(-1), blk * 32768 + extract(0, 15))
    n1 = e1 & 0xF
    sym = (e1 >> 4) & 0x1FF
    bad1 = e1 < 0
    is_lit = (sym < 256) & ~bad1
    is_match = (sym > 256) & ~bad1
    lext = (e1 >> 13) & 0x7
    lenv = ((e1 >> 16) & 0x1FF) + (extract(n1, 5) & ((1 << lext) - 1))
    p3 = p + n1 + lext

    e2 = jnp.take(dist_lut.reshape(-1), blk * 32768 + extract(n1 + lext, 15))
    n2 = e2 & 0xF
    bad2 = is_match & ((e2 < 0) | (((e2 >> 4) & 0x1F) >= 30))
    dext = (e2 >> 9) & 0xF
    dist = ((e2 >> 13) & 0x7FFF) + (extract(n1 + lext + n2, 13)
                                    & ((1 << dext) - 1))
    p4 = p3 + n2 + dext

    invalid = (bad1 | (is_match & (bad2 | (p4 > P)))
               | (is_lit & ((p + n1) > P)))
    nxt = jnp.where(is_lit, p + n1, jnp.where(is_match, p4, p))
    nxt = jnp.clip(jnp.where(invalid, p, nxt), 0, P - 1)

    outlen = jnp.where(is_lit, 1, jnp.where(is_match, lenv, 0))
    outlen = jnp.where(invalid, 0, outlen)
    kind = jnp.where(is_lit, 0, jnp.where(is_match, 1, 2))
    kind = jnp.where(invalid, 3, kind)

    nxt_flat = blk * P + nxt
    n_doublings = max(1, R - 1).bit_length()
    jumps = nxt_flat
    levels = []
    for _ in range(n_doublings):
        levels.append(jumps)
        jumps = jnp.take(jumps, jumps)

    ranks = jnp.arange(R, dtype=jnp.int32)
    pos = (jnp.arange(B, dtype=jnp.int32)[:, None] * P
           + jnp.clip(start_bits, 0, P - 1)[:, None])
    pos = jnp.broadcast_to(pos, (B, R)).reshape(-1)
    rk = jnp.broadcast_to(ranks[None, :], (B, R)).reshape(-1)
    for k, lv in enumerate(levels):
        bit = (rk >> k) & 1
        pos = jnp.where(bit == 1, jnp.take(lv, pos), pos)

    t_kind = jnp.take(kind, pos).reshape(B, R).astype(jnp.int8)
    t_outlen = jnp.take(outlen, pos).reshape(B, R)
    t_dist = jnp.take(dist, pos).reshape(B, R)
    t_lit = jnp.take(sym, pos).reshape(B, R).astype(jnp.uint8)

    chain_ok = ((~jnp.any(t_kind == 3, axis=1))
                & jnp.any(t_kind == 2, axis=1)
                & jnp.all(ok_l) & jnp.all(ok_d))
    return t_kind, t_outlen, t_dist, t_lit, chain_ok


@functools.partial(jax.jit, static_argnames=("S", "R", "N", "C"))
def folder_pipeline(data, lit_lens, dist_lens, start_bits, expected,
                    S: int, R: int, N: int, C: int):
    """Whole-folder decode. data: (C*CHUNK, S) uint8; lens/starts/
    expected sized (C*CHUNK, ...). Returns (out (N,) u8, ok, total)."""
    B = C * CHUNK

    def step(xs):
        d, ll, dl, sb = xs
        return _chunk_phase_a(d, ll, dl, sb, S, R)

    t_kind, t_outlen, t_dist, t_lit, chunk_ok = jax.lax.map(
        step, (data.reshape(C, CHUNK, S),
               lit_lens.reshape(C, CHUNK, 288),
               dist_lens.reshape(C, CHUNK, 32),
               start_bits.reshape(C, CHUNK)))
    t_kind = t_kind.reshape(B, R)
    t_outlen = t_outlen.reshape(B, R)
    t_dist = t_dist.reshape(B, R)
    t_lit = t_lit.reshape(B, R)
    ok = jnp.all(chunk_ok)

    live = (t_kind == 0) | (t_kind == 1)
    tlen = jnp.where(live, t_outlen, 0)
    frame_lens = jnp.sum(tlen, axis=1)
    ok &= jnp.all(frame_lens == expected)
    frame_base = jnp.cumsum(frame_lens) - frame_lens
    total = jnp.sum(frame_lens)

    within = jnp.cumsum(tlen, axis=1) - tlen
    out_start = (frame_base[:, None] + within).reshape(-1)
    flat_len = tlen.reshape(-1)

    T = B * R
    marks = jnp.zeros(N + 1, jnp.int32).at[
        jnp.where(flat_len > 0, jnp.clip(out_start, 0, N), N)].max(
        jnp.arange(T, dtype=jnp.int32) + 1)
    tok_id = jnp.clip(jax.lax.cummax(marks[:N]) - 1, 0, T - 1)

    bpos = jnp.arange(N, dtype=jnp.int32)
    kk = jnp.take(t_kind.reshape(-1), tok_id)
    dd = jnp.take(t_dist.reshape(-1), tok_id)
    ll = jnp.take(t_lit.reshape(-1), tok_id)
    ptr = jnp.where(kk == 0, bpos, bpos - dd)

    rounds = max(1, N - 1).bit_length()

    def round_(_, pp):
        return jnp.where(pp >= 0, jnp.take(pp, jnp.clip(pp, 0, N - 1)), pp)

    root = jax.lax.fori_loop(0, rounds, round_, ptr)
    out = jnp.take(ll, jnp.clip(root, 0, N - 1))
    ok &= ~jnp.any((root < 0) & (bpos < total))
    return out, ok, total


def _parse_header_lens(stream: bytes):
    """Host parse of one deflate block header -> code-length arrays.

    Returns (last, lit_lens(<=288), dist_lens(<=32), data_bitpos);
    raises NeedFallback for stored blocks / anomalies."""
    from .inflate_jax import _HostBits
    from ..codecs.mszip import BITLEN_ORDER, FIXED_DISTANCE_LENS, \
        FIXED_LITERAL_LENS
    bits = _HostBits(stream, 0)
    last = bits.read(1)
    btype = bits.read(2)
    if btype == 1:
        return (last, np.frombuffer(FIXED_LITERAL_LENS, np.uint8),
                np.frombuffer(FIXED_DISTANCE_LENS, np.uint8), bits.pos)
    if btype != 2:
        raise NeedFallback("stored/bad block")
    lit_codes = bits.read(5) + 257
    dist_codes = bits.read(5) + 1
    bitlen_codes = bits.read(4) + 4
    if lit_codes > 288 or dist_codes > 32:
        raise NeedFallback("too many symbols")
    bl_len = np.zeros(19, np.int64)
    for i in range(bitlen_codes):
        bl_len[BITLEN_ORDER[i]] = bits.read(3)
    # tiny scalar canonical decoder for the 19-symbol pre-tree
    from .inflate_jax import _build_lut15
    bl_lut = _build_lut15(bl_len, "lit")
    total = lit_codes + dist_codes
    lens = np.zeros(total, np.int64)
    last_code = 0
    i = 0
    while i < total:
        e = int(bl_lut[bits.read(7) & 0x7F])
        if e < 0:
            raise NeedFallback("bad bitlen symbol")
        clen, code = e & 0xF, (e >> 4) & 0x1FF
        bits.pos -= 7 - clen
        if code < 16:
            lens[i] = last_code = code
            i += 1
            continue
        if code == 16:
            run, fill = bits.read(2) + 3, last_code
        elif code == 17:
            run, fill = bits.read(3) + 3, 0
        else:
            run, fill = bits.read(7) + 11, 0
        if i + run > total:
            raise NeedFallback("bitlen RLE overrun")
        lens[i : i + run] = fill
        i += run
    return last, lens[:lit_codes], lens[lit_codes:], bits.pos


S_BUCKETS = (1024, 8192, 16384, 40960)
C_BUCKETS = (1, 4, 16, 64)   # chunks of CHUNK frames
_EMPTY_STREAM = b"\x03\x00"


def inflate_folder_device(frames: list[bytes],
                          expected_sizes: list[int]):
    """Like inflate_folder_fused but keeps the output device-resident.

    Returns (out_device (N,) uint8, total int, ok_device) or None for
    fallback-needed. The caller decides whether to download the bytes
    (slow on some links) or digest/consume them on device."""
    try:
        return _run_fused(frames, expected_sizes)
    except NeedFallback:
        return None


def inflate_folder_fused(frames: list[bytes],
                         expected_sizes: list[int]) -> bytes | None:
    """Single fused device call for a whole folder. None = fallback."""
    if not frames:
        return b""
    res = inflate_folder_device(frames, expected_sizes)
    if res is None:
        return None
    out, total, ok = res
    if not bool(ok):
        return None
    return np.asarray(out)[:total].tobytes()


def _run_fused(frames, expected_sizes):
    if True:
        nominal = len(frames)
        C = next((c for c in C_BUCKETS if nominal <= c * CHUNK), None)
        if C is None:
            raise NeedFallback("too many frames")
        B = C * CHUNK
        frames = list(frames) + [_EMPTY_STREAM] * (B - nominal)
        expected = list(expected_sizes) + [0] * (B - nominal)
        S = next((s for s in S_BUCKETS
                  if max(len(f) for f in frames) + 8 <= s), None)
        if S is None:
            raise NeedFallback("frame too large")

        data = np.zeros((B, S), np.uint8)
        lit_lens = np.zeros((B, 288), np.int32)
        dist_lens = np.zeros((B, 32), np.int32)
        starts = np.zeros(B, np.int32)
        for i, f in enumerate(frames):
            data[i, : len(f)] = np.frombuffer(f, np.uint8)
            last, ll, dl, start = _parse_header_lens(f)
            if not last:
                raise NeedFallback("multi-block frame")
            lit_lens[i, : len(ll)] = ll
            dist_lens[i, : len(dl)] = dl
            starts[i] = start

        total = sum(expected)
        if total > (1 << 27):
            raise NeedFallback("folder too large")
        N = max(256, 1 << max(0, total - 1).bit_length())
        out, ok, dev_total = folder_pipeline(
            jnp.asarray(data), jnp.asarray(lit_lens), jnp.asarray(dist_lens),
            jnp.asarray(starts), jnp.asarray(np.asarray(expected, np.int32)),
            S, MAX_TOKENS, N, C)
        return out, total, ok
