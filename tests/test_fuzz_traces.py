"""Adversarial fuzz of the kernel->resolver trace contract.

Phase A kernels emit (step, lane) int32 token/litword planes that the
native C++ resolvers (msp_resolve_traces for MSZIP frames,
msp_lzx_resolve_traces for LZX/Quantum streams) turn into bytes. A
kernel bug, a Mosaic miscompile, or host memory corruption could feed
the resolvers malformed planes; the reference's discipline
(libmspack/ChangeLog:1-14 sanitizer work) demands they fail with a
clean error code, never corrupt memory. These tests drive the
resolvers directly with adversarial planes and check clean failure —
including canary bytes around the output arena.

Token format (ops/pallas_inflate.py / ops/pallas_lzx.py docstrings):
  -1              NOP
  0x20000000 | n  n in 1..4 literal bytes, LSB-first in litw
  0x40000000 ...  match (mszip: len bits 16-24, dist bits 0-14,
                  pending-literal count bits 25-26; lzx/qtm: len in
                  bits 0-19, litw = linear distance)
"""
import random

import numpy as np
import pytest

from libmspack_tpu import native

if not native.available():
    pytest.skip("native engine unavailable", allow_module_level=True)

CANARY = 0xA5


def _arena(total):
    """uint8 arena with canary margins; returns (view, checker)."""
    buf = np.full(total + 128, CANARY, np.uint8)
    view = buf[64:64 + total]

    def check():
        assert (buf[:64] == CANARY).all(), "arena underflow"
        assert (buf[64 + total:] == CANARY).all(), "arena overflow"
    return view, check


def _mszip_resolve(tok, litw, sizes):
    total = sum(sizes)
    out, check = _arena(total)
    r = native.resolve_traces(tok, litw, [0], [len(sizes)], sizes,
                              out, [0, total], 1)
    check()
    return r


def _lzx_resolve(tok, litw, sizes, wb=15):
    total = sum(sizes)
    out, check = _arena(total)
    offs = [0]
    for s in sizes:
        offs.append(offs[-1] + s)
    n = len(sizes)
    r = native.lzx_resolve_traces(tok, litw, sizes, [0] * n, [0] * n,
                                  wb, out, offs, 1)
    check()
    return r


def _planes(rows):
    """(n_lanes=1, T) planes from a list of (tok, litw) pairs."""
    tok = np.full((1, max(len(rows), 1)), -1, np.int32)
    lit = np.zeros((1, max(len(rows), 1)), np.int32)
    for i, (t, w) in enumerate(rows):
        tok[0, i] = t
        lit[0, i] = np.int32(np.uint32(w).astype(np.int32))
    return np.ascontiguousarray(tok), np.ascontiguousarray(lit)


LIT = 0x20000000
MAT = 0x40000000


def test_valid_roundtrip_sanity():
    # 4 literals + an overlapping match fills 8 bytes
    tok, lit = _planes([(LIT | 4, 0x64636261), (MAT | (4 << 16) | 0,
                                                0)])
    assert _mszip_resolve(tok, lit, [8]) == 0
    tok2, lit2 = _planes([(LIT | 4, 0x64636261), (MAT | 4, 1)])
    assert _lzx_resolve(tok2, lit2, [8]) == 0


def test_literal_count_over_4_rejected():
    for n in (5, 6, 7):
        tok, lit = _planes([(LIT | n, 0)])
        assert _mszip_resolve(tok, lit, [n]) != 0
        assert _lzx_resolve(tok, lit, [n]) != 0


def test_match_before_any_output_rejected():
    tok, lit = _planes([(MAT | (4 << 16) | 7, 0)])
    assert _mszip_resolve(tok, lit, [4]) != 0
    # LZX: distance reaching past the zero window prefix
    tok2, lit2 = _planes([(MAT | 4, (1 << 15) + 1)])
    assert _lzx_resolve(tok2, lit2, [4], wb=15) != 0
    # distance zero
    tok3, lit3 = _planes([(MAT | 4, 0)])
    assert _lzx_resolve(tok3, lit3, [4], wb=15) != 0


def test_output_overrun_rejected():
    # literal pushing past the lane target
    tok, lit = _planes([(LIT | 4, 0), (LIT | 4, 0)])
    assert _mszip_resolve(tok, lit, [6]) != 0
    assert _lzx_resolve(tok, lit, [6]) != 0
    # giant LZX match length (bits 0-19 all set)
    tok2, lit2 = _planes([(LIT | 4, 0), (MAT | 0xFFFFF, 1)])
    assert _lzx_resolve(tok2, lit2, [64]) != 0


def test_short_trace_rejected():
    # trace ends before the lane target is met
    tok, lit = _planes([(LIT | 2, 0)])
    assert _mszip_resolve(tok, lit, [100]) != 0
    assert _lzx_resolve(tok, lit, [100]) != 0


def test_pending_literal_carry_overrun_rejected():
    # mszip match token carrying 3 pending literals right at the edge
    tok, lit = _planes([(LIT | 4, 0),
                        (MAT | (3 << 25) | (4 << 16) | 0, 0)])
    assert _mszip_resolve(tok, lit, [5]) != 0


def test_random_plane_fuzz_clean():
    """Random garbage planes: every outcome must be a clean return
    code with intact canaries (checked inside the helpers)."""
    rng = random.Random(0xE8)
    interesting = [-1, 0, 1, LIT, LIT | 4, LIT | 7, MAT, MAT | 0xFFFFF,
                   MAT | (0x1FF << 16) | 0x7FFF, MAT | (3 << 25),
                   0x7FFFFFFF, 0x60000000, -2147483648]
    for trial in range(200):
        T = rng.randrange(1, 40)
        rows = []
        for _ in range(T):
            if rng.random() < 0.5:
                t = rng.choice(interesting)
            else:
                t = rng.getrandbits(32) - (1 << 31)
            rows.append((t, rng.getrandbits(32)))
        tok, lit = _planes(rows)
        size = rng.choice([0, 1, 7, 64, 32768])
        if size:
            _mszip_resolve(tok, lit, [size])
            _lzx_resolve(tok, lit, [size],
                         wb=rng.choice([15, 16, 21]))


def test_multi_lane_folder_layout_fuzz():
    """Folder grouping metadata at the edges: resolvers must bound
    every lane they touch by the planes' actual shape."""
    rng = random.Random(7)
    for _ in range(50):
        lanes = rng.randrange(1, 5)
        T = rng.randrange(4, 32)
        tok = np.full((lanes, T), -1, np.int32)
        lit = np.zeros((lanes, T), np.int32)
        for i in range(lanes):
            tok[i, 0] = LIT | 4
            tok[i, 1] = MAT | (4 << 16) | 3 if rng.random() < 0.5 \
                else (LIT | 4)
        sizes = [rng.choice([4, 8, 100]) for _ in range(lanes)]
        total = sum(sizes)
        out, check = _arena(total)
        native.resolve_traces(np.ascontiguousarray(tok),
                              np.ascontiguousarray(lit),
                              [0], [lanes], sizes, out, [0, total], 1)
        check()
