"""Pallas TPU kernel: lane-parallel LZX entropy decode (phase A).

Decodes up to LANES independent LZX streams (CAB folders from frame 0,
CHM reset-interval chunks, OAB DELTA blocks — reference lzxd.c) in one
kernel launch; each VPU lane owns one stream and decodes up to two
literal symbols OR one full match (main symbol + length symbol +
distance, via a mid-step 64-bit buffer refill) per step, emitting
tokens into a (step, lane) trace.
Phase B resolves tokens into bytes (python replay here; native / device
resolvers downstream). Same architecture as ops/pallas_inflate.py (see
its docstring for the Mosaic layout rules this file follows: 3-D
(rows, SL, LN) tables, laneid-derived masks/carries, sublane-row
window DMA, scalar all-done carry, i32-only min/max).

LZX-specific structure (semantics pinned by codecs/lzx.py, which is
oracle-verified against the reference):

* MSB bitstream of 16-bit LE units: 32-bit refill words are rotated
  16 so the unit order is right; peek = high word of a 64-bit buffer.
* 4 canonical trees — pretree 20 / maintree 256+8*slots / length 250 /
  aligned 8 — decoded with the shared limit-compare length-find
  (codes up to 16 bits) + key-equality probes.
* Main/length code lengths are *delta-coded* against the previous
  block's lengths: the key tables double as length storage (len is
  key>>16; ranks are rebuilt at the periodic build event).
* Match offsets: position slots with arithmetic base/extra tables,
  R0-R2 LRU, aligned-offset tree for extra>=3 in ALIGNED blocks;
  LZX DELTA adds a long-match escape and window-tail reference data.
* The bitstream realigns to 16 bits at every 32 KiB output boundary;
  uncompressed blocks switch to byte reads after dropping the
  reference decoder's *exact* buffered-bit count, which we shadow in
  the `blr` carry (bits_left of readbits.h's lazy 16-bit fill).
* Ring-window aliasing (offset > window on small windows) splits a
  match into two linear-history tokens, exactly like codecs/lzx.py.
* Full entropy-state export/import (_state_layout + the carry rows of
  the counts grid) lets a reset-interval-0 CAB folder of any size
  segment across launches at 32 KiB frame boundaries.

Token format (int32) per (step, lane), litw plane in parallel:
  -1                 NOP
  0x20000000 | n     n in 1..4 literal bytes, LSB-first in litw
  0x40000000 | len   match of len (2..33024); litw = linear dist

Counts rows: 0=err(0 ok,1 bad,2 T-cap), 1=outpos, 2=end step, 3=wpos,
4=intel_started, 5=intel_filesize, 6=0, 7=0.
"""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

WINR = 256        # per-row stream window, words
RPD = 4           # steps between row-refresh DMAs
CHUNK = 128       # token staging rows per HBM flush
S_ROW, S_TOK, S_LIT, NSEM = 0, 1, 3, 5

NPRE = 20
NLEN = 250
NALN = 8
POSITION_SLOTS = (30, 32, 34, 36, 38, 42, 50, 66, 98, 162, 290)

TOK_NOP = -1
TOK_LIT = 0x20000000
TOK_MATCH = 0x40000000

(X_START, X_HDR, X_HDR2, X_BLK, X_ALN, X_PRT, X_WAITPRE, X_LENS,
 X_LENS2, X_WAITTREES, X_BODY, X_LEN, X_DIST, X_DESC, X_SPLIT,
 X_UNCA, X_UNCR, X_UNCC, X_REALN, X_DONE, X_ERR) = range(21)

BUILD_PERIOD = 32

DEBUG_LANE = None  # set to a lane id to step-trace it (interpret mode)


def _state_layout(WB):
    """Row layout of the export/import state grid (segmenting a
    reset-interval-0 CAB folder across launches, cabd.c:1249-1250):
    the length-storage key tables + built first/limit rows. The
    pretree never persists across a frame boundary (headers produce
    no output, so a segment edge cannot interrupt one)."""
    NMAIN = 256 + (POSITION_SLOTS[WB - 15] << 3)
    rows = [("mainkey", NMAIN), ("lenkey", NLEN), ("alnkey", NALN),
            ("limmain", 17), ("firstmain", 17), ("limlen", 17),
            ("firstlen", 17), ("limaln", 17), ("firstaln", 17)]
    offs = {}
    off = 0
    for name, n in rows:
        offs[name] = (off, n)
        off += n
    return offs, off


def _kernel(stream_hbm, outlen_ref, hist_ref, car_ref, st_in,
            tok_hbm, litw_hbm, cnt_ref, st_out,
            win_ref, mainkey, lenkey, prekey, alnkey,
            limmain, firstmain, limlen, firstlen,
            limpre, firstpre, limaln, firstaln,
            cntmain, cntlen,
            cnttmp, runtmp, stage_tok, stage_lit, mintmp, sems,
            *, SL, LN, W, T_PAD, WB, DELTA, RESUME):
    i32 = jnp.int32
    u32 = jnp.uint32
    WSIZE = 1 << WB
    NSLOTS = POSITION_SLOTS[WB - 15]
    NMAIN = 256 + (NSLOTS << 3)
    ST_OFFS, ST_ROWS = _state_layout(WB)
    ST_REFS = {"mainkey": mainkey, "lenkey": lenkey, "alnkey": alnkey,
               "limmain": limmain, "firstmain": firstmain,
               "limlen": limlen, "firstlen": firstlen,
               "limaln": limaln, "firstaln": firstaln}
    rowi = jax.lax.broadcasted_iota(i32, (SL, LN), 0)
    coli = jax.lax.broadcasted_iota(i32, (SL, LN), 1)
    laneid = rowi * LN + coli
    rowv = laneid // LN
    zero = jnp.zeros((SL, LN), i32)
    zero_u = jnp.zeros((SL, LN), u32)
    nz = laneid & 0
    nneg1 = nz - 1

    rio_win = jax.lax.broadcasted_iota(i32, (WINR, SL, LN), 0)
    rio_main = jax.lax.broadcasted_iota(i32, (NMAIN, SL, LN), 0)
    rio_len = jax.lax.broadcasted_iota(i32, (NLEN, SL, LN), 0)
    rio_pre = jax.lax.broadcasted_iota(i32, (NPRE, SL, LN), 0)
    rio_aln = jax.lax.broadcasted_iota(i32, (NALN, SL, LN), 0)
    rio_17 = jax.lax.broadcasted_iota(i32, (17, SL, LN), 0)

    def vfull(v, dt=i32):
        return jnp.full((SL, LN), v, dt)

    init_dma = pltpu.make_async_copy(
        stream_hbm.at[pl.ds(0, WINR)], win_ref, sems.at[S_ROW])
    init_dma.start()
    init_dma.wait()

    stage_tok[0] = jnp.full((CHUNK, SL, LN), TOK_NOP, i32)
    stage_tok[1] = jnp.full((CHUNK, SL, LN), TOK_NOP, i32)
    stage_lit[0] = jnp.zeros((CHUNK, SL, LN), i32)
    stage_lit[1] = jnp.zeros((CHUNK, SL, LN), i32)

    def consume(hi, lo, navail, k):
        """Drop k (0..32) MSB bits from the 64-bit (hi, lo) buffer."""
        ku = jnp.clip(k, 1, 31).astype(u32)
        mid = (hi << ku) | (lo >> (u32(32) - ku))
        hi2 = jnp.where(k == 0, hi, jnp.where(k == 32, lo, mid))
        lo2 = jnp.where(k == 0, lo,
                        jnp.where(k == 32, zero_u, lo << ku))
        return hi2, lo2, navail - k

    def sweep_fetch(off):
        """One whole-window pass (Mosaic lowers full-table compare +
        axis-0 reduce ~50x faster than a per-row fori sweep)."""
        w3 = win_ref[:].astype(i32)
        return jnp.sum(jnp.where(rio_win == off[None], w3, 0),
                       axis=0).astype(u32)

    def ensure_blr(blr, n):
        """readbits.h lazy fill: while bits_left < n: inject 16."""
        addv = jnp.where(n - blr > 16, 32, 16)
        return jnp.where(blr < n, blr + addv, blr)

    def step(state):
        (t, _alldone, mode, bithi, bitlo, navail, wpos, base, pend,
         outpos, blr, litword, litcnt, pendlen, pendslot, pendoff,
         blkrem, blktype, r0, r1, r2, istart, ifsz, prt_i, fillpos,
         part, runsave, runval, unc_i, split_len, split_dist,
         err, donestep) = state

        # ---------- stream window refresh (one sublane row) ----------
        is_wait = jnp.logical_and(jax.lax.rem(t, RPD) == 1, t > 0)
        @pl.when(is_wait)
        def _():
            pltpu.make_async_copy(
                stream_hbm.at[pl.ds(0, WINR), 0],
                win_ref.at[:, 0], sems.at[S_ROW]).wait()
        r_prev = jax.lax.rem((t - 1) // RPD, SL)
        pend = jnp.where(jnp.logical_and(is_wait, rowv == r_prev),
                         vfull(0), pend)
        is_issue = jax.lax.rem(t, RPD) == 0
        r_issue = jax.lax.rem(t // RPD, SL)
        m_r = rowv == r_issue
        act_rd = jnp.logical_and(mode < X_DONE, wpos < W)
        cand = jnp.where(jnp.logical_and(m_r, act_rd), wpos, W)
        mintmp[0] = cand
        wmin = jnp.minimum(jnp.min(mintmp[0]), W - WINR)
        @pl.when(is_issue)
        def _():
            pltpu.make_async_copy(
                stream_hbm.at[pl.ds(wmin, WINR), r_issue],
                win_ref.at[:, r_issue], sems.at[S_ROW]).start()
        issued = jnp.logical_and(is_issue, m_r)
        base = jnp.where(issued, wmin, base)
        pend = jnp.where(issued, vfull(1), pend)

        # ---------- fetch: one conditional 32-bit refill -------------
        off = wpos - base
        ok_win = pend == 0
        can = jnp.logical_and(ok_win, off < WINR)
        can_b = jnp.logical_and(ok_win,
                                jnp.logical_and(off + 1 < WINR,
                                                wpos + 1 < W))
        need = jnp.logical_and(navail < 32, jnp.logical_and(can, wpos < W))
        # one window pass yields TWO words: the pre-step refill and a
        # mid-step refill for the fused match path
        w3f = win_ref[:].astype(i32)
        sel_a = jnp.where(can, off, vfull(WINR))
        sel_b = jnp.where(can_b, off + 1, vfull(WINR))
        w = jnp.sum(jnp.where(rio_win == sel_a[None], w3f, 0),
                    axis=0).astype(u32)
        wbw = jnp.sum(jnp.where(rio_win == sel_b[None], w3f, 0),
                      axis=0).astype(u32)
        w = (w << u32(16)) | (w >> u32(16))  # 16-bit LE units, MSB order
        wbw = (wbw << u32(16)) | (wbw >> u32(16))
        nau = navail.astype(u32)
        bithi = jnp.where(need & (navail == 0), w, bithi)
        shr = jnp.clip(navail, 1, 31).astype(u32)
        bithi = jnp.where(need & (navail > 0) & (navail < 32),
                         bithi | (w >> shr), bithi)
        lo_in = w << (u32(32) - shr)
        bitlo = jnp.where(need & (navail > 0) & (navail < 32),
                          bitlo | lo_in, bitlo)
        bitlo = jnp.where(need & (navail == 32), w, bitlo)
        navail = navail + jnp.where(need, 32, 0)
        wpos = jnp.where(need, wpos + 1, wpos)
        used_a = need
        at_end = jnp.logical_and(navail < 32, wpos >= W)
        navail = jnp.where(at_end, 64, navail)

        go = navail >= 32
        peek32 = bithi

        def peekk(k):
            return (bithi >> (u32(32) - k.astype(u32))).astype(i32)

        is_body = jnp.logical_and(go, mode == X_BODY)
        is_len = jnp.logical_and(go, mode == X_LEN)
        is_lens = jnp.logical_and(go, mode == X_LENS)
        is_lens2 = jnp.logical_and(go, mode == X_LENS2)
        is_dist = jnp.logical_and(go, mode == X_DIST)

        # which slot needs the aligned-offset tree this step?
        eslot = jnp.where(is_dist, pendslot, 0)
        e_bits = jnp.where(eslot < 4, 0,
                           jnp.minimum((eslot >> 1) - 1, 17))
        dist_aln = jnp.logical_and(
            is_dist, jnp.logical_and(blktype == 2, e_bits >= 3))

        # ---------- shared canonical length-find (codes <= 16) -------
        # tree select: 0 main, 1 length, 2 pretree, 3 aligned
        lim0 = jnp.where(is_body, 0,
                         jnp.where(is_len, 1,
                                   jnp.where(is_lens | is_lens2, 2, 3)))
        vb = jnp.where(dist_aln, e_bits - 3, 0)
        blosrc = jnp.where(dist_aln,
                           bithi << jnp.clip(vb, 0, 14).astype(u32),
                           bithi)
        length = vfull(17)
        code = zero
        rank = zero
        def lf(l, st):
            length, acc, code, rank = st
            bit = ((blosrc >> (u32(32) - u32(l))) & u32(1)).astype(i32)
            c = (acc << 1) | bit
            lim = jnp.where(
                lim0 == 0, limmain[l],
                jnp.where(lim0 == 1, limlen[l],
                          jnp.where(lim0 == 2, limpre[l], limaln[l])))
            fst = jnp.where(
                lim0 == 0, firstmain[l],
                jnp.where(lim0 == 1, firstlen[l],
                          jnp.where(lim0 == 2, firstpre[l],
                                    firstaln[l])))
            hit = jnp.logical_and(c < lim, length == 17)
            return (jnp.where(hit, l, length), c,
                    jnp.where(hit, c, code),
                    jnp.where(hit, c - fst, rank))
        length, _, code, rank = jax.lax.fori_loop(
            1, 17, lf, (length, zero, code, rank))
        key = (length << 16) | rank
        codelen_ok = length < 17
        length = jnp.where(length == 17, 0, length)

        # ---------- symbol probes (whole-table passes, ungated) ------
        # a lax.cond(jnp.any(...)) gate costs ~100 us on this chip;
        # the unconditional masked pass is row-bounded and cheap
        def probe(tab, rio):
            return jnp.max(jnp.where(tab[:] == key[None], rio, -1),
                           axis=0)
        # speculative SECOND literal: when the main symbol is a
        # literal, a second canonical find on the shifted bits decodes
        # the next symbol in the same step (lit1+lit2 <= 32 bits of
        # the guaranteed window); both keys share one table read
        blo2s = bithi << jnp.clip(length, 0, 31).astype(u32)
        len2s = vfull(17)
        rank2s = zero
        acc2s = zero
        for l in range(1, 17):
            bit = ((blo2s >> (u32(32) - u32(l))) & u32(1)).astype(i32)
            acc2s = (acc2s << 1) | bit
            hit = jnp.logical_and(acc2s < limmain[l], len2s == 17)
            len2s = jnp.where(hit, l, len2s)
            rank2s = jnp.where(hit, acc2s - firstmain[l], rank2s)
        ok2s = len2s < 17
        len2s = jnp.where(ok2s, len2s, 0)
        key2s = (len2s << 16) | rank2s

        mk3 = mainkey[:]
        mainsym = jnp.max(jnp.where(mk3 == key[None], rio_main, -1),
                          axis=0)
        mainsym2 = jnp.max(jnp.where(mk3 == key2s[None], rio_main, -1),
                           axis=0)
        lensym = probe(lenkey, rio_len)
        presym = probe(prekey, rio_pre)
        # (the aligned-offset probe happens in the X_DIST section with
        # a per-lane key: fused lanes probe with the fused-buffer find)

        tok = vfull(TOK_NOP)
        litw_out = zero
        new_mode = mode
        new_err = err
        k = zero

        def seterr(cond, m, e):
            return (jnp.where(cond, X_ERR, m), jnp.where(cond, 1, e))

        frame_end = jnp.minimum(((outpos >> 15) + 1) << 15,
                                outlen_ref[:])

        # ---------- X_START / X_HDR / X_HDR2 -------------------------
        is_st = jnp.logical_and(go, mode == X_START)
        if DELTA:
            k = k + jnp.where(is_st, 16, 0)
            blr = jnp.where(is_st, ensure_blr(blr, 16) - 16, blr)
        new_mode = jnp.where(is_st, X_HDR, new_mode)

        is_h = jnp.logical_and(go, mode == X_HDR)
        hbit = jnp.where(is_h, peekk(vfull(1)), 0)
        k = k + jnp.where(is_h, 1, 0)
        blr = jnp.where(is_h, ensure_blr(blr, 1) - 1, blr)
        new_mode = jnp.where(is_h & (hbit > 0), X_HDR2, new_mode)
        new_mode = jnp.where(is_h & (hbit == 0), X_BLK, new_mode)

        is_h2 = jnp.logical_and(go, mode == X_HDR2)
        fsz = jnp.where(is_h2, peekk(vfull(32)), 0)
        ifsz = jnp.where(is_h2, fsz, ifsz)
        k = k + jnp.where(is_h2, 32, 0)
        blr = jnp.where(is_h2,
                        ensure_blr(ensure_blr(blr, 16) - 16, 16) - 16,
                        blr)
        new_mode = jnp.where(is_h2, X_BLK, new_mode)

        # ---------- X_BLK: 3-bit type + 24-bit size ------------------
        is_bk = jnp.logical_and(go, mode == X_BLK)
        p27 = peekk(vfull(27))
        btype = jnp.where(is_bk, p27 >> 24, 0)
        bsize = p27 & 0xFFFFFF
        k = k + jnp.where(is_bk, 27, 0)
        blr = jnp.where(
            is_bk,
            ensure_blr(ensure_blr(ensure_blr(blr, 3) - 3, 16) - 16,
                       8) - 8, blr)
        blktype = jnp.where(is_bk, btype, blktype)
        blkrem = jnp.where(is_bk, bsize, blkrem)
        # fresh incremental tree counts for the block's RLE streams
        mbk3 = is_bk[None] & (rio_17 >= 0)
        cntmain[:] = jnp.where(mbk3, zero[None], cntmain[:])
        cntlen[:] = jnp.where(mbk3, zero[None], cntlen[:])
        bk_bad = jnp.logical_and(is_bk, (btype == 0) | (btype > 3))
        new_mode = jnp.where(is_bk & (btype == 1), X_PRT, new_mode)
        new_mode = jnp.where(is_bk & (btype == 2), X_ALN, new_mode)
        new_mode = jnp.where(is_bk & (btype == 3), X_UNCA, new_mode)
        istart = jnp.where(is_bk & (btype == 3), vfull(1), istart)
        prt_i = jnp.where(is_bk, 0, prt_i)
        part = jnp.where(is_bk, 0, part)
        new_mode, new_err = seterr(bk_bad, new_mode, new_err)

        # ---------- X_ALN: 8 x 3-bit aligned lengths -----------------
        is_al = jnp.logical_and(go, mode == X_ALN)
        k = k + jnp.where(is_al, 24, 0)
        def blr8(b):
            def bb(i, b):
                return ensure_blr(b, 3) - 3
            return jax.lax.fori_loop(0, 8, bb, b)
        blr = jnp.where(is_al, blr8(blr), blr)
        # unconditional masked pass (vector-predicate gates are ~100us)
        sh_al = (u32(29) - u32(3) * rio_aln.astype(u32))
        v_al = (peek32[None] >> sh_al).astype(i32) & 7
        alnkey[:] = jnp.where(is_al[None] & (rio_aln >= 0), v_al << 16,
                              alnkey[:])
        new_mode = jnp.where(is_al, X_PRT, new_mode)

        # ---------- X_PRT: up to 8 pretree nibbles per step ----------
        is_pr = jnp.logical_and(go, mode == X_PRT)
        nnib = jnp.clip(20 - prt_i * 8, 0, 8)
        k = k + jnp.where(is_pr, nnib * 4, 0)
        def blrn(b, m):
            def bb(i, b):
                return jnp.where(i < m, ensure_blr(b, 4) - 4, b)
            return jax.lax.fori_loop(0, 8, bb, b)
        blr = jnp.where(is_pr, blrn(blr, nnib), blr)
        j_pr = rio_pre - (prt_i * 8)[None]
        inw_pr = is_pr[None] & (j_pr >= 0) & (j_pr < nnib[None])
        sh_pr = (u32(28) - u32(4) * jnp.clip(j_pr, 0, 7).astype(u32))
        v_pr = (peek32[None] >> sh_pr).astype(i32) & 15
        prekey[:] = jnp.where(inw_pr, v_pr << 16, prekey[:])
        prt_i = prt_i + jnp.where(is_pr, 1, 0)
        new_mode = jnp.where(is_pr & (prt_i >= 3), X_WAITPRE, new_mode)
        # RLE fill window per part
        fillpos = jnp.where(is_pr & (prt_i >= 3),
                            jnp.where(part == 1, 256, 0), fillpos)

        # ---------- X_LENS: one pretree RLE op per step --------------
        # length tree delta-codes NUM_SECONDARY_LENGTHS = 249 entries
        # (row 249 is the never-coded padding symbol, lzx.h:54)
        last = jnp.where(part == 0, 256,
                         jnp.where(part == 1, NMAIN, NLEN - 1))
        l_bad = jnp.logical_and(is_lens,
                                jnp.logical_or(~codelen_ok, presym < 0))
        pz = jnp.maximum(presym, 0)
        pl_lit = jnp.logical_and(is_lens, jnp.logical_and(presym >= 0,
                                                          presym < 17))
        pl17 = jnp.logical_and(is_lens, presym == 17)
        pl18 = jnp.logical_and(is_lens, presym == 18)
        pl19 = jnp.logical_and(is_lens, presym == 19)
        rext = jnp.where(pl17, 4, jnp.where(pl18, 5,
                                            jnp.where(pl19, 1, 0)))
        rvraw = ((bithi >> (u32(32) - jnp.clip(length + rext, 1, 31)
                            .astype(u32))).astype(i32)
                 & ((1 << rext) - 1))
        k = k + jnp.where(is_lens & ~l_bad, length + rext, 0)
        blr = jnp.where(is_lens & ~l_bad,
                        ensure_blr(blr, 16) - length, blr)
        blr = jnp.where((pl17 | pl18 | pl19) & ~l_bad,
                        ensure_blr(blr, rext) - rext, blr)
        run = jnp.where(pl_lit, 1,
                        jnp.where(pl17, 4 + rvraw,
                                  jnp.where(pl18, 20 + rvraw, 0)))
        runsave = jnp.where(pl19, 4 + rvraw, runsave)
        wr_rle = jnp.logical_and(is_lens & ~l_bad, pl_lit | pl17 | pl18)
        # is_lens2: second pretree sym for code 19
        l2_bad = jnp.logical_and(is_lens2,
                                 jnp.logical_or(~codelen_ok, presym < 0))
        k = k + jnp.where(is_lens2 & ~l2_bad, length, 0)
        blr = jnp.where(is_lens2 & ~l2_bad,
                        ensure_blr(blr, 16) - length, blr)
        wr2 = jnp.logical_and(is_lens2, ~l2_bad)
        runw = jnp.where(wr2, runsave, run)
        # every RLE op writes ONE value to its whole run: pl17/18 write
        # zeros; pl_lit (run=1) and sym-19 runs write the delta-decoded
        # value of the run-start row (lens[pos] - sym, mod 17)
        m_any = wr_rle | wr2
        tomain = part < 2
        oldf_main = jnp.sum(jnp.where(rio_main == fillpos[None],
                                      mainkey[:] >> 16, 0), axis=0)
        oldf_len = jnp.sum(jnp.where(rio_len == fillpos[None],
                                     lenkey[:] >> 16, 0), axis=0)
        oldfill = jnp.where(tomain, oldf_main, oldf_len)
        vw = oldfill - pz
        vw = jnp.where(vw < 0, vw + 17, vw) & 0xFF
        vw = jnp.where(pl_lit | wr2, vw, 0)
        runval = jnp.where(wr2, vw, runval)
        # ranks assigned AT WRITE TIME (RLE ops sweep rows in symbol
        # order), so the build event never rank-scans the big tables;
        # rank base = running count of codes at this length
        rb_main = jnp.sum(jnp.where(rio_17 == vw[None], cntmain[:], 0),
                          axis=0)
        rb_len = jnp.sum(jnp.where(rio_17 == vw[None], cntlen[:], 0),
                         axis=0)
        def rle_write(tab, rio, msel, rb):
            inr = (m_any & msel)[None] & (rio >= fillpos[None]) \
                & (rio < (fillpos + runw)[None])
            kv = jnp.where((vw > 0)[None],
                           (vw << 16)[None]
                           | (rb[None] + rio - fillpos[None]), 0)
            tab[:] = jnp.where(inr, kv, tab[:])
        rle_write(mainkey, rio_main, tomain, rb_main)
        rle_write(lenkey, rio_len, ~tomain, rb_len)
        # count only rows inside the table (part-2 overshoot past the
        # 250-row length table lands in the reference's LENTABLE_SAFETY
        # padding and is not counted by its table build)
        bound = jnp.where(tomain, NMAIN, NLEN)
        run_in = jnp.clip(bound - fillpos, 0, runw)
        addn = jnp.where(m_any & (vw > 0), run_in, 0)
        selv = rio_17 == vw[None]
        cntmain[:] = cntmain[:] + jnp.where(
            selv & tomain[None], addn[None], zero[None])
        cntlen[:] = cntlen[:] + jnp.where(
            selv & (~tomain)[None], addn[None], zero[None])
        # a run crossing a part boundary (reference lens-array spill,
        # overwritten by the next part) would corrupt the incremental
        # counts — legit encoders never emit it; err -> host fallback
        sp_bad = m_any & (part < 2) & (fillpos + runw > last)
        new_mode, new_err = seterr(sp_bad, new_mode, new_err)
        fillpos = fillpos + jnp.where(wr_rle | wr2, runw, 0)
        new_mode = jnp.where(pl19 & ~l_bad, X_LENS2, new_mode)
        new_mode = jnp.where(wr2, X_LENS, new_mode)
        done_part = jnp.logical_and(wr_rle | wr2, fillpos >= last)
        part2 = part + jnp.where(done_part, 1, 0)
        new_mode = jnp.where(done_part & (part2 <= 2), X_PRT, new_mode)
        new_mode = jnp.where(done_part & (part2 > 2), X_WAITTREES,
                             new_mode)
        prt_i = jnp.where(done_part, 0, prt_i)
        part = part2
        new_mode, new_err = seterr(l_bad | l2_bad, new_mode, new_err)

        # ---------- X_BODY: main tree symbol -------------------------
        b_bad = jnp.logical_and(is_body,
                                jnp.logical_or(~codelen_ok, mainsym < 0))
        k = k + jnp.where(is_body & ~b_bad, length, 0)
        blr = jnp.where(is_body & ~b_bad,
                        ensure_blr(blr, 16) - length, blr)
        # (the committed second literal's bits are consumed below,
        # after lit2_ok is known)
        is_lit = jnp.logical_and(is_body & ~b_bad, mainsym < 256)
        is_mt = jnp.logical_and(is_body & ~b_bad, mainsym >= 256)
        sym = jnp.maximum(mainsym, 0)
        v = sym - 256
        mslot = v >> 3
        mlhdr = v & 7
        pendslot = jnp.where(is_mt, mslot, pendslot)
        pendlen = jnp.where(is_mt, mlhdr + 2, pendlen)
        # literal packing (4 per token) with PAIR commit; `outpos`
        # counts FLUSHED bytes, so edges use the effective position
        # incl. the packed-but-unflushed tail (eff), else a lane whose
        # output ends mid-word would decode past its end.
        # the second literal only commits when the first one doesn't
        # end a frame/block/stream, and it is itself a literal.
        eff1 = outpos + litcnt + 1
        edge1 = jnp.logical_and(
            is_lit, (eff1 == frame_end) | (blkrem - 1 == 0)
            | (eff1 >= outlen_ref[:]))
        lit2_ok = (is_lit & ~edge1 & ok2s
                   & (mainsym2 >= 0) & (mainsym2 < 256))
        # 5 packed bytes + an edge would need an unrepresentable
        # 5-byte flush token: keep the pair out of that corner
        edge2 = ((eff1 + 1 == frame_end) | (blkrem - 2 == 0)
                 | (eff1 + 1 >= outlen_ref[:]))
        lit2_ok = lit2_ok & ~((litcnt == 3) & edge2)
        sym2 = jnp.maximum(mainsym2, 0)
        n_add = jnp.where(is_lit, 1, 0) + jnp.where(lit2_ok, 1, 0)
        litword2 = jnp.where(is_lit & (litcnt == 0), sym, litword)
        litword2 = jnp.where(is_lit & (litcnt > 0),
                             litword | (sym << (8 * jnp.clip(
                                 litcnt, 0, 3))), litword2)
        b2pos = litcnt + 1
        litword2 = jnp.where(lit2_ok & (b2pos <= 3),
                             litword2 | (sym2 << (8 * jnp.clip(
                                 b2pos, 0, 3))), litword2)
        litcnt2 = jnp.where(is_lit, litcnt + n_add, litcnt)
        blkrem = blkrem - jnp.where(is_lit, n_add, 0)
        eff = outpos + jnp.where(is_lit, litcnt2, 0)
        lit_edge = jnp.logical_and(
            is_lit, (eff == frame_end) | (blkrem == 0)
            | (eff >= outlen_ref[:]))
        flush4 = jnp.logical_and(is_lit, litcnt2 >= 4)
        flushn = jnp.logical_and(is_mt, litcnt > 0)
        do_flush = flush4 | flushn | lit_edge
        # a 5th packed byte (pair landing on litcnt==3) carries over
        carry5 = flush4 & (litcnt2 == 5) & ~lit_edge
        nflush = jnp.where(flushn, litcnt,
                           jnp.where(carry5, 4, litcnt2))
        tok = jnp.where(do_flush, TOK_LIT | nflush, tok)
        litw_out = jnp.where(do_flush,
                             jnp.where(flushn, litword, litword2),
                             litw_out)
        outpos = outpos + jnp.where(do_flush, nflush, 0)
        litcnt = jnp.where(do_flush, jnp.where(carry5, 1, 0), litcnt2)
        litword = jnp.where(do_flush, jnp.where(carry5, sym2, 0),
                            litword2)
        b_bad2 = jnp.logical_and(is_lit, blkrem < 0)
        k = k + jnp.where(lit2_ok, len2s, 0)
        blr = jnp.where(lit2_ok, ensure_blr(blr, 16) - len2s, blr)
        lempty = limlen[16] == 0
        b_bad4 = jnp.logical_and(is_mt & (mlhdr == 7), lempty)
        new_mode = jnp.where(is_mt & (mlhdr == 7) & ~b_bad4, X_LEN,
                             new_mode)
        new_mode = jnp.where(is_mt & (mlhdr < 7), X_DIST, new_mode)
        new_mode, new_err = seterr(b_bad | b_bad2 | b_bad4,
                                   new_mode, new_err)
        new_mode = jnp.where(
            lit_edge & (eff >= outlen_ref[:]), X_DONE,
            jnp.where(lit_edge & (eff == frame_end), X_REALN,
                      jnp.where(lit_edge, X_BLK, new_mode)))

        # ---------- X_LEN: length-tree symbol ------------------------
        ln_bad = jnp.logical_and(is_len,
                                 jnp.logical_or(~codelen_ok, lensym < 0))
        k = k + jnp.where(is_len & ~ln_bad, length, 0)
        blr = jnp.where(is_len & ~ln_bad,
                        ensure_blr(blr, 16) - length, blr)
        pendlen = pendlen + jnp.where(is_len & ~ln_bad,
                                      jnp.maximum(lensym, 0), 0)
        new_mode = jnp.where(is_len & ~ln_bad, X_DIST, new_mode)
        new_mode, new_err = seterr(ln_bad, new_mode, new_err)

        # ---------- fused distance decode (round 4) -------------------
        # lanes whose match LENGTH completed this step (X_BODY with a
        # short length header, or X_LEN) decode the distance from the
        # post-consume, mid-refilled buffer in the SAME step — one
        # step per match instead of two. A lane that cannot see the
        # <= 21 distance bits falls back to X_DIST exactly as before.
        # a match with pending packed literals must emit the flush
        # token this step (LZX match tokens carry the 32-bit distance
        # in litw, so there is no nl-carry like DEFLATE's) — those
        # lanes take the classic 2-step path
        len_done = ((is_mt & (mlhdr < 7) & ~b_bad4 & ~flushn)
                    | (is_len & ~ln_bad))
        k1f = jnp.where(len_done, length, 0)
        hi1, lo1, nav1 = consume(bithi, bitlo, navail, k1f)
        w_m = jnp.where(used_a, wbw, w)
        can_m = (used_a & can_b) | (~used_a & can)
        need_m = len_done & (nav1 < 32) & can_m
        shrm = jnp.clip(nav1, 1, 31).astype(u32)
        hi1 = jnp.where(need_m & (nav1 == 0), w_m, hi1)
        hi1 = jnp.where(need_m & (nav1 > 0) & (nav1 < 32),
                        hi1 | (w_m >> shrm), hi1)
        lo1 = jnp.where(need_m & (nav1 > 0) & (nav1 < 32),
                        lo1 | (w_m << (u32(32) - shrm)), lo1)
        lo1 = jnp.where(need_m & (nav1 == 32), w_m, lo1)
        nav1 = nav1 + jnp.where(need_m, 32, 0)
        at_end_m = len_done & (nav1 < 32) & \
            ((wpos + jnp.where(need_m, 1, 0)) >= W)
        nav1 = jnp.where(at_end_m, 64, nav1)
        fuse = len_done & (nav1 >= 24)
        # aligned-offset code find on the fused buffer
        slot_pf = pendslot
        eb_pf = jnp.where(slot_pf < 4, 0,
                          jnp.minimum((slot_pf >> 1) - 1, 17))
        d_aln_f = fuse & (blktype == 2) & (eb_pf >= 3)
        vb_f = jnp.where(d_aln_f, eb_pf - 3, 0)
        blo_f = hi1 << jnp.clip(vb_f, 0, 14).astype(u32)
        len3 = vfull(17)
        rank3 = zero
        acc3 = zero
        for l in range(1, 17):
            bit = ((blo_f >> (u32(32) - u32(l))) & u32(1)).astype(i32)
            acc3 = (acc3 << 1) | bit
            hit = jnp.logical_and(acc3 < limaln[l], len3 == 17)
            len3 = jnp.where(hit, l, len3)
            rank3 = jnp.where(hit, acc3 - firstaln[l], rank3)
        ok3 = len3 < 17
        len3 = jnp.where(ok3, len3, 0)
        key3 = (len3 << 16) | rank3

        # ---------- X_DIST: offset resolution (also the fused path) --
        d_act = is_dist | fuse
        slot = pendslot
        src_hi = jnp.where(fuse, hi1, bithi)
        # arithmetic position base (slots < 38 closed form, then linear)
        eb = jnp.where(slot < 4, 0, jnp.minimum((slot >> 1) - 1, 17))
        pbase = jnp.where(
            slot < 2, slot,
            jnp.where(slot < 38,
                      ((2 + (slot & 1)) << jnp.maximum(eb, 0)),
                      524288 + (slot - 38) * 131072))
        d_aln = dist_aln | d_aln_f
        d_verb = jnp.logical_and(d_act, jnp.logical_and(slot >= 3,
                                                        ~d_aln)
                                 & (eb > 0))
        verb_n = jnp.where(d_aln, jnp.maximum(eb - 3, 0),
                           jnp.where(d_verb, eb, 0))
        verb = jnp.where(
            verb_n > 0,
            (src_hi >> (u32(32) - jnp.clip(verb_n, 1, 31).astype(u32))
             ).astype(i32), 0)
        # per-lane aligned probe key: X_DIST lanes use the shared
        # find, fused lanes the fused-buffer find
        keya = jnp.where(fuse, key3, key)
        alnsym = jnp.max(jnp.where(alnkey[:] == keya[None], rio_aln,
                                   -1), axis=0)
        # select on i1 vectors doesn't lower — boolean algebra
        aok = (fuse & ok3) | (~fuse & codelen_ok)
        alen = jnp.where(fuse, len3, length)
        aln_bad = jnp.logical_and(d_aln,
                                  jnp.logical_or(~aok, alnsym < 0))
        offs = pbase - 2 + jnp.where(d_aln, (verb << 3)
                                     + jnp.maximum(alnsym, 0),
                                     jnp.where(d_verb, verb, 0))
        offs = jnp.where(slot == 0, r0,
                         jnp.where(slot == 1, r1,
                                   jnp.where(slot == 2, r2, offs)))
        # LRU update
        nr0 = jnp.where(d_act, offs, r0)
        nr1 = jnp.where(d_act & (slot == 1), r0,
                        jnp.where(d_act & (slot >= 3), r0, r1))
        nr2 = jnp.where(d_act & (slot == 2), r0,
                        jnp.where(d_act & (slot >= 3), r1, r2))
        r0 = jnp.where(d_act & ~aln_bad, nr0, r0)
        r1 = jnp.where(d_act & ~aln_bad, nr1, r1)
        r2 = jnp.where(d_act & ~aln_bad, nr2, r2)
        kd = verb_n + jnp.where(d_aln, alen, 0)
        k = k + jnp.where(is_dist & ~aln_bad, kd, 0)
        hi2, lo2, nav2 = consume(hi1, lo1, nav1,
                                 jnp.where(fuse & ~aln_bad, kd, 0))
        def blrd(b):
            b = jnp.where(verb_n > 0, ensure_blr(b, verb_n) - verb_n, b)
            b = jnp.where(d_aln, ensure_blr(b, 16) - alen, b)
            return b
        blr = jnp.where(d_act & ~aln_bad, blrd(blr), blr)
        pendoff = jnp.where(d_act, offs, pendoff)
        need_esc = jnp.logical_and(d_act, vfull(1 if DELTA else 0) > 0) \
            & (pendlen == 257)
        new_mode = jnp.where(need_esc & ~aln_bad, X_DESC, new_mode)
        new_mode, new_err = seterr(aln_bad, new_mode, new_err)

        # ---------- X_DESC: DELTA long-match escape ------------------
        is_dc = jnp.logical_and(go, mode == X_DESC)
        if DELTA:
            e3 = peekk(vfull(3))
            esc0 = (e3 >> 2) == 0
            esc10 = (e3 >> 1) == 2
            esc110 = e3 == 6
            ehdr = jnp.where(esc0, 1, jnp.where(esc10, 2, 3))
            eb2 = jnp.where(esc0, 8,
                            jnp.where(esc10, 10,
                                      jnp.where(esc110, 12, 15)))
            eadd = jnp.where(esc10, 0x100, jnp.where(esc110, 0x500, 0))
            eval_ = ((bithi >> (u32(32) - (ehdr + eb2).astype(u32)))
                     .astype(i32) & ((1 << eb2) - 1))
            pendlen = pendlen + jnp.where(is_dc, eval_ + eadd, 0)
            k = k + jnp.where(is_dc, ehdr + eb2, 0)
            def blre(b):
                b = ensure_blr(b, 3) - ehdr
                return ensure_blr(b, eb2) - eb2
            blr = jnp.where(is_dc, blre(blr), blr)

        # ---------- match emission (X_DIST w/o escape, X_DESC) -------
        emit = jnp.logical_and(d_act & ~aln_bad, ~need_esc) | is_dc
        lap = outpos & (WSIZE - 1)
        moff = pendoff
        m_bad = jnp.logical_and(emit, lap + pendlen > WSIZE)
        tail = moff - lap
        wrapd = jnp.logical_and(emit, moff > lap)
        m_bad = m_bad | jnp.logical_and(
            wrapd, jnp.logical_and(moff > outpos, tail > hist_ref[:]))
        m_bad = m_bad | jnp.logical_and(wrapd, tail > WSIZE)
        do_split = jnp.logical_and(wrapd & ~m_bad,
                                   jnp.logical_and(moff > WSIZE,
                                                   pendlen > tail))
        alias = jnp.logical_and(wrapd & ~m_bad, moff > WSIZE)
        len1 = jnp.where(alias, jnp.minimum(pendlen, tail), pendlen)
        dist1 = jnp.where(alias, moff - WSIZE, moff)
        emit_ok = emit & ~m_bad
        tok = jnp.where(emit_ok, TOK_MATCH | len1, tok)
        litw_out = jnp.where(emit_ok, dist1, litw_out)
        outpos = outpos + jnp.where(emit_ok, len1, 0)
        blkrem = blkrem - jnp.where(emit_ok, pendlen, 0)
        m_bad = m_bad | jnp.logical_and(emit, blkrem < 0)
        m_bad = m_bad | jnp.logical_and(
            emit_ok, outpos + jnp.where(do_split, pendlen - len1, 0)
            > frame_end)
        split_len = jnp.where(do_split, pendlen - len1, split_len)
        split_dist = jnp.where(do_split, moff, split_dist)
        new_mode = jnp.where(emit_ok & do_split, X_SPLIT, new_mode)
        m_edge = jnp.logical_and(emit_ok & ~do_split,
                                 (outpos == frame_end) | (blkrem == 0)
                                 | (outpos >= outlen_ref[:]))
        new_mode = jnp.where(emit_ok & ~do_split & ~m_edge, X_BODY,
                             new_mode)
        new_mode = jnp.where(
            m_edge & (outpos >= outlen_ref[:]), X_DONE,
            jnp.where(m_edge & (outpos == frame_end), X_REALN,
                      jnp.where(m_edge, X_BLK, new_mode)))
        new_mode, new_err = seterr(m_bad, new_mode, new_err)

        # ---------- X_SPLIT: second half of an aliased match ---------
        is_sp = mode == X_SPLIT   # no bits consumed; always runs
        tok = jnp.where(is_sp, TOK_MATCH | split_len, tok)
        litw_out = jnp.where(is_sp, split_dist, litw_out)
        outpos = outpos + jnp.where(is_sp, split_len, 0)
        s_edge = jnp.logical_and(is_sp,
                                 (outpos == frame_end) | (blkrem == 0)
                                 | (outpos >= outlen_ref[:]))
        new_mode = jnp.where(is_sp & ~s_edge, X_BODY, new_mode)
        new_mode = jnp.where(
            s_edge & (outpos >= outlen_ref[:]), X_DONE,
            jnp.where(s_edge & (outpos == frame_end), X_REALN,
                      jnp.where(s_edge, X_BLK, new_mode)))

        # ---------- X_UNCA: drop to reference byte position ----------
        is_ua = jnp.logical_and(go, mode == X_UNCA)
        dk = jnp.where(blr == 0, 16, blr)
        k = k + jnp.where(is_ua, dk, 0)
        blr = jnp.where(is_ua, 0, blr)
        unc_i = jnp.where(is_ua, 0, unc_i)
        new_mode = jnp.where(is_ua, X_UNCR, new_mode)

        # ---------- X_UNCR: R0/R1/R2 as raw LE dwords ----------------
        is_ur = jnp.logical_and(go, mode == X_UNCR)
        rv = ((peek32 << 16) | ((peek32 >> 16) & 0xFFFF))
        r0 = jnp.where(is_ur & (unc_i == 0), rv, r0)
        r1 = jnp.where(is_ur & (unc_i == 1), rv, r1)
        r2 = jnp.where(is_ur & (unc_i == 2), rv, r2)
        k = k + jnp.where(is_ur, 32, 0)
        unc_i = unc_i + jnp.where(is_ur, 1, 0)
        new_mode = jnp.where(is_ur & (unc_i >= 3), X_UNCC, new_mode)
        ub_bad = jnp.logical_and(is_ur & (unc_i >= 3), blkrem == 0)
        # zero-length uncompressed block: straight to next block
        new_mode = jnp.where(
            ub_bad, jnp.where(outpos == frame_end, X_REALN, X_BLK),
            new_mode)

        # ---------- X_UNCC: 4 raw bytes per step ---------------------
        is_uc = jnp.logical_and(go, mode == X_UNCC)
        ntk = jnp.minimum(jnp.minimum(blkrem, 4), frame_end - outpos)
        ntk = jnp.where(ntk >= 4, 4, jnp.where(ntk >= 2, 2, ntk))
        lw4 = ((peek32 << 16) | ((peek32 >> 16) & 0xFFFF))
        lw2 = peekk(vfull(16))
        lw1 = lw2 & 0xFF
        tok = jnp.where(is_uc, TOK_LIT | ntk, tok)
        litw_out = jnp.where(is_uc,
                             jnp.where(ntk == 4, lw4,
                                       jnp.where(ntk == 2, lw2, lw1)),
                             litw_out)
        # odd final byte consumes its pad unit too
        k = k + jnp.where(is_uc, jnp.where(ntk == 4, 32, 16), 0)
        outpos = outpos + jnp.where(is_uc, ntk, 0)
        blkrem = blkrem - jnp.where(is_uc, ntk, 0)
        u_edge = jnp.logical_and(is_uc,
                                 (outpos == frame_end) | (blkrem == 0)
                                 | (outpos >= outlen_ref[:]))
        new_mode = jnp.where(
            u_edge & (outpos >= outlen_ref[:]), X_DONE,
            jnp.where(u_edge & (outpos == frame_end), X_REALN,
                      jnp.where(u_edge & (blkrem == 0), X_BLK,
                                new_mode)))

        # ---------- X_REALN: 16-bit realign at frame boundary --------
        is_rl = jnp.logical_and(go, mode == X_REALN)
        ralk = navail & 15
        k = k + jnp.where(is_rl, ralk + (16 if DELTA else 0), 0)
        def blrr(b):
            b = jnp.where((b > 0) & (b < 16), b + 16, b)
            b = b - (b & 15)
            if DELTA:
                b = ensure_blr(b, 16) - 16
            return b
        blr = jnp.where(is_rl, blrr(blr), blr)
        new_mode = jnp.where(
            is_rl, jnp.where(blkrem == 0, X_BLK,
                             jnp.where(blktype == 3, X_UNCC, X_BODY)),
            new_mode)

        # ---------- consume ------------------------------------------
        # fused-match lanes already consumed through the mid-refilled
        # buffer; everyone else applies the accumulated k
        bithi_n, bitlo_n, navail_n = consume(bithi, bitlo, navail, k)
        bithi = jnp.where(fuse, hi2, bithi_n)
        bitlo = jnp.where(fuse, lo2, bitlo_n)
        navail = jnp.where(fuse, nav2, navail_n)
        wpos = wpos + jnp.where(need_m & fuse, 1, 0)

        # ---------- periodic build event -----------------------------
        # gated on the SCALAR step counter only (jnp.any() vector
        # predicates cost a ~100us cross-lane reduce). main/len counts
        # and ranks are maintained incrementally at RLE-write time, so
        # the build only derives first/limit rows and rank-scans the
        # two SMALL trees (pretree 20 rows, aligned 8).
        wait_pre = new_mode == X_WAITPRE
        wait_tr = new_mode == X_WAITTREES
        do_build = jax.lax.rem(t, BUILD_PERIOD) == BUILD_PERIOD - 1

        def small_tree(keytab, rows, rio, m, first, lim):
            """Count + rank + first/limit for a small tree."""
            lens3 = keytab[:] >> 16
            cnttmp[:] = jnp.where(m[None] & (rio_17 >= 0), zero[None],
                                  cnttmp[:])
            for v in range(1, 16):
                cv = jnp.sum(jnp.where(lens3 == v, 1, 0), axis=0)
                cnttmp[v] = jnp.where(m, cv, cnttmp[v])
            runtmp[:] = jnp.where(m[None] & (rio_17 >= 0), zero[None],
                                  runtmp[:])
            for n in range(rows):
                lv = keytab[n] >> 16
                ok = m & (lv >= 1)
                rk = jnp.sum(jnp.where(rio_17 == lv[None], runtmp[:],
                                       0), axis=0)
                runtmp[:] = runtmp[:] + jnp.where(
                    (rio_17 == lv[None]) & ok[None], vfull(1)[None],
                    zero[None])
                keytab[n] = jnp.where(ok, (lv << 16) | rk, keytab[n])
            first[0] = jnp.where(m, zero, first[0])
            lim[0] = jnp.where(m, zero, lim[0])
            for l in range(1, 17):
                fv = (first[l - 1] + cnttmp[l - 1]) << 1
                first[l] = jnp.where(m, fv, first[l])
                lim[l] = jnp.where(m, fv + cnttmp[l], lim[l])

        def big_lims(cnt, m, first, lim):
            """first/limit from incrementally-maintained counts."""
            first[0] = jnp.where(m, zero, first[0])
            lim[0] = jnp.where(m, zero, lim[0])
            for l in range(1, 17):
                fv = (first[l - 1] + cnt[l - 1]) << 1
                first[l] = jnp.where(m, fv, first[l])
                lim[l] = jnp.where(m, fv + cnt[l], lim[l])

        @pl.when(do_build)
        def _():
            small_tree(prekey, NPRE, rio_pre, wait_pre, firstpre,
                       limpre)
            small_tree(alnkey, NALN, rio_aln,
                       wait_tr & (blktype == 2), firstaln, limaln)
            big_lims(cntmain, wait_tr, firstmain, limmain)
            big_lims(cntlen, wait_tr, firstlen, limlen)

        built = jnp.logical_and(do_build,
                                jnp.logical_or(wait_pre, wait_tr))
        # post-build checks: static row reads, cheap enough to run
        # unconditionally; applied only where `built`
        bad_pre = wait_pre & (limpre[16] != 65536)
        bad_main = wait_tr & (limmain[16] != 65536)
        lemp = limlen[16] == 0
        bad_len = wait_tr & ~lemp & (limlen[16] != 65536)
        bad_aln = wait_tr & (blktype == 2) & (limaln[16] != 65536)
        bad_tbl = jnp.where(bad_pre | bad_main | bad_len | bad_aln,
                            1, 0)
        e8flag = jnp.where(wait_tr & ((mainkey[0xE8] >> 16) > 0), 1, 0)
        istart = jnp.where(jnp.logical_and(built, e8flag > 0),
                           vfull(1), istart)
        new_mode = jnp.where(jnp.logical_and(built, wait_pre), X_LENS,
                             new_mode)
        new_mode = jnp.where(jnp.logical_and(built, wait_tr), X_BODY,
                             new_mode)
        new_mode, new_err = seterr(
            jnp.logical_and(built, bad_tbl > 0), new_mode, new_err)

        # ---------- emit token row -----------------------------------
        row = jax.lax.rem(t, CHUNK)
        slotc = jax.lax.rem(t // CHUNK, 2)
        stage_tok[slotc, row] = tok
        stage_lit[slotc, row] = litw_out
        @pl.when(row == CHUNK - 1)
        def _():
            c = t // CHUNK
            @pl.when(c >= 2)
            def _():
                pltpu.make_async_copy(stage_tok.at[0],
                                      tok_hbm.at[pl.ds(0, CHUNK)],
                                      sems.at[S_TOK + slotc]).wait()
                pltpu.make_async_copy(stage_lit.at[0],
                                      litw_hbm.at[pl.ds(0, CHUNK)],
                                      sems.at[S_LIT + slotc]).wait()
            pltpu.make_async_copy(
                stage_tok.at[slotc],
                tok_hbm.at[pl.ds(c * CHUNK, CHUNK)],
                sems.at[S_TOK + slotc]).start()
            pltpu.make_async_copy(
                stage_lit.at[slotc],
                litw_hbm.at[pl.ds(c * CHUNK, CHUNK)],
                sems.at[S_LIT + slotc]).start()

        if DEBUG_LANE is not None:
            gl = DEBUG_LANE
            def ext(v):
                return jnp.sum(jnp.where(laneid == gl, v.astype(i32), 0))
            pl.debug_print(
                "t={} mode={} nm={} na={} k={} len={} key={} sym={} "
                "out={} blkrem={} fp={} part={} blr={} hi={} err={}",
                t, ext(mode), ext(new_mode), ext(navail), ext(k),
                ext(length), ext(key),
                ext(jnp.where(is_body, mainsym,
                              jnp.where(is_lens | is_lens2, presym,
                                        lensym))),
                ext(outpos), ext(blkrem), ext(fillpos), ext(part),
                ext(blr), ext((bithi >> u32(17)).astype(i32)), ext(new_err))

        donestep = jnp.where(
            jnp.logical_and(donestep < 0, new_mode >= X_DONE), t,
            donestep)
        # cross-lane all() is expensive — poll every 16 steps
        def poll_done(_):
            return jnp.where(jnp.all(new_mode >= X_DONE),
                             jnp.int32(1), jnp.int32(0))
        alldone = jax.lax.cond(jax.lax.rem(t, 16) == 15, poll_done,
                               lambda _: jnp.int32(0), 0)
        return (t + 1, alldone, new_mode, bithi, bitlo, navail, wpos,
                base, pend, outpos, blr, litword, litcnt, pendlen,
                pendslot, pendoff, blkrem, blktype, r0, r1, r2, istart,
                ifsz, prt_i, fillpos, part, runsave, runval, unc_i,
                split_len, split_dist, new_err, donestep)

    def cond(state):
        t, alldone = state[0], state[1]
        return jnp.logical_and(t < T_PAD, alldone == 0)

    nz_u = nz.astype(u32)
    if not RESUME:
        init = (jnp.int32(0), jnp.int32(0), nz + X_START, nz_u, nz_u,
                nz, nz, nz, nz, nz, nz, nz, nz, nz, nz, nz,
                nz, nz, nz + 1, nz + 1, nz + 1, nz, nz, nz, nz, nz,
                nz, nz, nz, nz, nz, nz, nneg1)
        # zero the length-storage key tables (fresh entropy state)
        def zmain(n, _):
            mainkey[n] = nz
            return 0
        jax.lax.fori_loop(0, NMAIN, zmain, 0)
        def zlen(n, _):
            lenkey[n] = nz
            return 0
        jax.lax.fori_loop(0, NLEN, zlen, 0)
        def zsmall(n, _):
            prekey[n] = nz
            alnkey[jax.lax.rem(n, NALN)] = nz
            limlen[jax.lax.rem(n, 17)] = nz
            return 0
        jax.lax.fori_loop(0, NPRE, zsmall, 0)
    else:
        # import: tables DMA'd from the exported state grid; carries
        # from car_ref rows (_CAR layout). A lane stopped at a frame
        # boundary with the realign pending (X_DONE won over X_REALN
        # at the segment edge), so unfinished lanes resume in X_REALN.
        for name, (off, rows) in ST_OFFS.items():
            cp = pltpu.make_async_copy(st_in.at[pl.ds(off, rows)],
                                       ST_REFS[name], sems.at[S_ROW])
            cp.start()
            cp.wait()
        # a lane's exported mode is X_DONE whenever it reached its
        # previous SEGMENT target — whether it resumes is decided by
        # comparing its carried outpos to the NEW target
        cerr = car_ref[26]
        mode0 = jnp.where(
            cerr > 0, vfull(X_ERR),
            jnp.where(car_ref[5] >= outlen_ref[:], vfull(X_DONE),
                      vfull(X_REALN))) + nz
        init = (jnp.int32(0), jnp.int32(0), mode0,
                car_ref[1].astype(u32), car_ref[2].astype(u32),
                car_ref[3] + nz, nz, nz, nz, car_ref[5] + nz,
                car_ref[4] + nz, car_ref[6] + nz, car_ref[7] + nz,
                car_ref[8] + nz, car_ref[9] + nz, car_ref[10] + nz,
                car_ref[11] + nz, car_ref[12] + nz, car_ref[13] + nz,
                car_ref[14] + nz, car_ref[15] + nz, car_ref[16] + nz,
                car_ref[17] + nz, car_ref[18] + nz, car_ref[19] + nz,
                car_ref[20] + nz, car_ref[21] + nz, car_ref[22] + nz,
                car_ref[23] + nz, car_ref[24] + nz, car_ref[25] + nz,
                car_ref[26] + nz, nneg1)

    final = jax.lax.while_loop(cond, step, init)
    t_end = final[0]
    mode = final[2]
    wpos = final[6]
    outpos = final[9]
    istart = final[21]
    ifsz = final[22]
    err = final[31]
    donestep = final[32]

    # ---- state export: tables back to HBM, carries into cnt rows 8+
    for name, (off, rows) in ST_OFFS.items():
        cp = pltpu.make_async_copy(ST_REFS[name],
                                   st_out.at[pl.ds(off, rows)],
                                   sems.at[S_ROW])
        cp.start()
        cp.wait()
    _car_idx = (2, 3, 4, 5, 10, 9, 11, 12, 13, 14, 15, 16, 17, 18,
                19, 20, 21, 22, 23, 24, 25, 26, 27, 28, 29, 30, 31)
    for k, fi in enumerate(_car_idx):
        v = final[fi]
        cnt_ref[8 + k] = v.astype(i32) if v.dtype == u32 else v

    @pl.when(jnp.logical_and(t_end >= 1,
                             jax.lax.rem(t_end - 1, RPD) == 0))
    def _():
        pltpu.make_async_copy(stream_hbm.at[pl.ds(0, WINR), 0],
                              win_ref.at[:, 0], sems.at[S_ROW]).wait()

    nflushed = (t_end // CHUNK) * CHUNK
    c = t_end // CHUNK
    @pl.when(c >= 2)
    def _():
        for s in range(2):
            pltpu.make_async_copy(stage_tok.at[0],
                                  tok_hbm.at[pl.ds(0, CHUNK)],
                                  sems.at[S_TOK + s]).wait()
            pltpu.make_async_copy(stage_lit.at[0],
                                  litw_hbm.at[pl.ds(0, CHUNK)],
                                  sems.at[S_LIT + s]).wait()
    # c == 1 must drain even when t_end lands exactly on a chunk
    # boundary: chunk 0's flush started at t_end-1 and is still
    # in flight (an outstanding DMA at kernel end aborts the
    # program)
    @pl.when(c == 1)
    def _():
        slotp = jax.lax.rem(c, 2) ^ 1
        pltpu.make_async_copy(stage_tok.at[0],
                              tok_hbm.at[pl.ds(0, CHUNK)],
                              sems.at[S_TOK + slotp]).wait()
        pltpu.make_async_copy(stage_lit.at[0],
                              litw_hbm.at[pl.ds(0, CHUNK)],
                              sems.at[S_LIT + slotp]).wait()
    @pl.when(jax.lax.rem(t_end, CHUNK) > 0)
    def _():
        slotc = jax.lax.rem(c, 2)
        pltpu.make_async_copy(
            stage_tok.at[slotc],
            tok_hbm.at[pl.ds(nflushed, CHUNK)],
            sems.at[S_TOK + slotc]).start()
        pltpu.make_async_copy(
            stage_lit.at[slotc],
            litw_hbm.at[pl.ds(nflushed, CHUNK)],
            sems.at[S_LIT + slotc]).start()
        pltpu.make_async_copy(
            stage_tok.at[slotc],
            tok_hbm.at[pl.ds(nflushed, CHUNK)],
            sems.at[S_TOK + slotc]).wait()
        pltpu.make_async_copy(
            stage_lit.at[slotc],
            litw_hbm.at[pl.ds(nflushed, CHUNK)],
            sems.at[S_LIT + slotc]).wait()

    errv = jnp.where(mode == X_ERR, 1, 0)
    errv = jnp.where(mode < X_DONE, 2, errv)
    cnt_ref[0] = errv
    cnt_ref[1] = outpos
    cnt_ref[2] = jnp.where(donestep < 0, t_end, donestep)
    cnt_ref[3] = wpos
    cnt_ref[4] = istart
    cnt_ref[5] = ifsz
    cnt_ref[6] = mode
    cnt_ref[7] = final[16]  # blkrem


@functools.partial(jax.jit, static_argnames=(
    "SL", "LN", "W", "T_PAD", "WB", "DELTA", "RESUME", "interpret"))
def _run(stream, outlen, hist, car, st_in, SL, LN, W, T_PAD, WB,
         DELTA, RESUME=False, interpret=False):
    NMAIN = 256 + (POSITION_SLOTS[WB - 15] << 3)
    _, ST_ROWS = _state_layout(WB)
    kern = functools.partial(_kernel, SL=SL, LN=LN, W=W, T_PAD=T_PAD,
                             WB=WB, DELTA=DELTA, RESUME=RESUME)
    return pl.pallas_call(
        kern,
        interpret=interpret,
        out_shape=(jax.ShapeDtypeStruct((T_PAD, SL, LN), jnp.int32),
                   jax.ShapeDtypeStruct((T_PAD, SL, LN), jnp.int32),
                   jax.ShapeDtypeStruct((40, SL, LN), jnp.int32),
                   jax.ShapeDtypeStruct((ST_ROWS, SL, LN), jnp.int32)),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=(pl.BlockSpec(memory_space=pl.ANY),
                   pl.BlockSpec(memory_space=pl.ANY),
                   pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pl.ANY)),
        scratch_shapes=[
            pltpu.VMEM((WINR, SL, LN), jnp.uint32),    # win
            pltpu.VMEM((NMAIN, SL, LN), jnp.int32),    # mainkey
            pltpu.VMEM((NLEN, SL, LN), jnp.int32),     # lenkey
            pltpu.VMEM((NPRE, SL, LN), jnp.int32),     # prekey
            pltpu.VMEM((NALN, SL, LN), jnp.int32),     # alnkey
            pltpu.VMEM((17, SL, LN), jnp.int32),       # limmain
            pltpu.VMEM((17, SL, LN), jnp.int32),       # firstmain
            pltpu.VMEM((17, SL, LN), jnp.int32),       # limlen
            pltpu.VMEM((17, SL, LN), jnp.int32),       # firstlen
            pltpu.VMEM((17, SL, LN), jnp.int32),       # limpre
            pltpu.VMEM((17, SL, LN), jnp.int32),       # firstpre
            pltpu.VMEM((17, SL, LN), jnp.int32),       # limaln
            pltpu.VMEM((17, SL, LN), jnp.int32),       # firstaln
            pltpu.VMEM((17, SL, LN), jnp.int32),       # cntmain
            pltpu.VMEM((17, SL, LN), jnp.int32),       # cntlen
            pltpu.VMEM((17, SL, LN), jnp.int32),       # cnttmp
            pltpu.VMEM((17, SL, LN), jnp.int32),       # runtmp
            pltpu.VMEM((2, CHUNK, SL, LN), jnp.int32),  # stage_tok
            pltpu.VMEM((2, CHUNK, SL, LN), jnp.int32),  # stage_lit
            pltpu.VMEM((1, SL, LN), jnp.int32),        # mintmp
            pltpu.SemaphoreType.DMA((NSEM,)),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(stream, outlen, hist, car, st_in)


def pack_streams(streams, SL=8, LN=128):
    L = SL * LN
    assert len(streams) <= L
    maxb = max((len(f) for f in streams), default=1)
    W = max((maxb + 3) // 4 + WINR + 2, WINR + 2)
    arr = np.zeros((L, W), np.uint32)
    for i, f in enumerate(streams):
        b = np.frombuffer(bytes(f) + b"\0" * (-len(f) % 4), np.uint32)
        arr[i, :len(b)] = b
    return np.ascontiguousarray(arr.T).reshape(W, SL, LN), W


def lzx_phase_a(streams, out_lens, window_bits, hists=None,
                is_delta=False, SL=8, LN=128, T_PAD=None,
                interpret=False, resume=None, return_state=False):
    """Run LZX phase A on a batch of independent streams.

    streams: list of bytes (each a fresh-entropy-state LZX stream: a
    CAB folder prefix, a CHM reset chunk, or an OAB block).
    out_lens: expected decompressed byte count per stream — with
    `resume`, the ABSOLUTE stop target (segment boundaries must be
    32 KiB frame multiples).
    hists: per-lane prefix budget for back-references beyond the
    stream start (DELTA reference bytes); 0 default.
    resume: (car (40, L) i32, st (ST_ROWS, L) i32) from a previous
    segment's return_state=True call; streams must then be each
    lane's REMAINDER from its exported word cursor (counts row 3 * 4
    bytes in).
    Returns (tok (T,L), litw (T,L), counts (40,L)[, state]) — counts
    rows 8+ hold the exportable carries.
    """
    L = SL * LN
    stream, W = pack_streams(streams, SL, LN)
    # bucket W to powers of two so multi-launch (segmented) decodes
    # reuse one compiled kernel per bucket instead of recompiling for
    # every remainder length
    Wb = max(256, 1 << (W - 1).bit_length())
    if Wb != W:
        stream = np.pad(stream, ((0, Wb - W), (0, 0), (0, 0)))
        W = Wb
    outlen = np.zeros((SL, LN), np.int32)
    for i, n in enumerate(out_lens):
        outlen[i // LN, i % LN] = n
    hist = np.zeros((SL, LN), np.int32)
    for i, h in enumerate(hists or []):
        hist[i // LN, i % LN] = h
    if T_PAD is None:
        T_PAD = max(out_lens, default=1) + 4096
    T_PAD = ((T_PAD + CHUNK - 1) // CHUNK) * CHUNK
    _, ST_ROWS = _state_layout(window_bits)
    if resume is None:
        car = np.zeros((32, SL, LN), np.int32)
        st_in = np.zeros((ST_ROWS, SL, LN), np.int32)
    else:
        car40, st = resume
        car = np.ascontiguousarray(
            np.asarray(car40)[8:40].reshape(32, SL, LN))
        st_in = np.asarray(st).reshape(ST_ROWS, SL, LN)
    tok, litw, cnt, st_out = _run(
        jnp.asarray(stream), jnp.asarray(outlen), jnp.asarray(hist),
        jnp.asarray(car), jnp.asarray(st_in), SL, LN, W, T_PAD,
        window_bits, bool(is_delta), resume is not None, interpret)
    out = (tok.reshape(T_PAD, L), litw.reshape(T_PAD, L),
           cnt.reshape(40, L))
    if return_state:
        return out + (st_out.reshape(ST_ROWS, L),)
    return out


def replay_trace(tok_col, litw_col, out_len, window_bits,
                 ref_data=b""):
    """Reference phase B in python: resolve one lane's LZX trace.

    The history prefix is a full window of zeros with DELTA reference
    data at its tail (codecs/lzx.py history layout), so token
    distances may exceed the produced byte count.
    """
    wsize = 1 << window_bits
    prefix = bytearray(wsize)
    if ref_data:
        prefix[wsize - len(ref_data):] = ref_data
    out = bytearray(prefix)
    base = len(out)
    for t in range(len(tok_col)):
        v = int(tok_col[t])
        if v < 0:
            continue
        if v & TOK_LIT:
            n = v & 7
            w = int(litw_col[t]) & 0xFFFFFFFF
            for i in range(n):
                out.append((w >> (8 * i)) & 0xFF)
        elif v & TOK_MATCH:
            ln = v & 0xFFFFF
            dist = int(litw_col[t])
            for _ in range(ln):
                out.append(out[-dist])
        if len(out) - base >= out_len:
            break
    return bytes(out[base:base + out_len])


def e8_decode(data, intel_filesize, frame0_offset=0):
    """Apply the E8 untransform per 32 KiB frame (lzxd.c:706-733)."""
    from ..codecs.lzx import _e8_transform
    out = bytearray()
    pos = 0
    frame = frame0_offset >> 15
    while pos < len(data):
        fs = min(32768, len(data) - pos)
        fd = bytearray(data[pos:pos + fs])
        if intel_filesize and frame < 32768 and fs > 10:
            fd = _e8_transform(fd, frame0_offset + pos,
                               intel_filesize)
        out.extend(fd)
        pos += fs
        frame += 1
    return bytes(out)


def _encode_for_bench(data, window_bits):
    """Native encoder when available (the pure-python encoder would
    dominate bench prep at 1024 lanes)."""
    try:
        from .. import native
        r = native.lzx_encode(data, window_bits, 0)
        if r is not None:
            return r[0]
    except Exception:
        pass
    from ..compress.lzx_e import LzxEncoder
    return LzxEncoder(window_bits).compress(data)[0]


def bench_entry(n_lanes=1024, chunk_kb=64, window_bits=16):
    """Chip benchmark: n_lanes independent LZX chunks (CHM-style
    reset-interval grids) decoded in one launch. Returns a
    BENCH_KERNELS.json entry dict.

    The kernel always computes (8, 128)-wide vectors, so throughput is
    proportional to lane occupancy: benchmark at the full 1024 lanes
    the product engines batch to (tpu_pipeline LANES)."""
    import time
    from ..utils import bench_corpus
    base = bench_corpus(1 << 20)
    base = base * (1 + (chunk_kb * 1024 * n_lanes) // len(base))
    datas, streams = [], []
    for i in range(n_lanes):
        d = base[i * chunk_kb * 1024:(i + 1) * chunk_kb * 1024]
        datas.append(d)
        streams.append(_encode_for_bench(d, window_bits))
    out_lens = [len(d) for d in datas]
    t_pad = chunk_kb * 1024 + 4096
    tok, litw, cnt = lzx_phase_a(streams, out_lens, window_bits,
                                 T_PAD=t_pad)
    cnth = np.asarray(cnt)
    errs = int((cnth[0, :n_lanes] != 0).sum())
    ok = int((cnth[1, :n_lanes] == np.array(out_lens)).sum())
    tokh, litwh = np.asarray(tok), np.asarray(litw)
    exact = all(
        replay_trace(tokh[:, i], litwh[:, i], out_lens[i], window_bits)
        == datas[i] for i in (0, n_lanes // 2, n_lanes - 1))
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        _, _, c2 = lzx_phase_a(streams, out_lens, window_bits,
                               T_PAD=t_pad)
        np.asarray(c2)
    dt_up = (time.perf_counter() - t0) / reps
    # device-resident: inputs pre-staged, compute only
    import jax.numpy as jnp
    t_padr = ((t_pad + CHUNK - 1) // CHUNK) * CHUNK
    stream, W = pack_streams(streams)
    outlen = np.zeros((8, 128), np.int32)
    for i, n in enumerate(out_lens):
        outlen[i // 128, i % 128] = n
    hist = np.zeros((8, 128), np.int32)
    _, st_rows = _state_layout(window_bits)
    args = (jnp.asarray(stream), jnp.asarray(outlen),
            jnp.asarray(hist),
            jnp.asarray(np.zeros((32, 8, 128), np.int32)),
            jnp.asarray(np.zeros((st_rows, 8, 128), np.int32)))
    np.asarray(_run(*args, 8, 128, W, t_padr, window_bits, False)[2])
    t0 = time.perf_counter()
    for _ in range(reps):
        np.asarray(_run(*args, 8, 128, W, t_padr, window_bits,
                        False)[2])
    dt = (time.perf_counter() - t0) / reps
    total = sum(out_lens)
    return {
        "kernel": "pallas_lzx.phase_a",
        "config": (f"{n_lanes} lanes x {chunk_kb} KiB chunks, "
                   f"window 2^{window_bits}, mixed C source"),
        "bytes_out": total,
        "ms": round(dt * 1e3, 1),
        "mb_per_s": round(total / dt / 1e6, 1),
        "mb_per_s_with_upload": round(total / dt_up / 1e6, 1),
        "errors": errs, "out_ok": ok, "sampled_bit_exact": bool(exact),
        "max_steps": int(cnth[2].max()),
    }
