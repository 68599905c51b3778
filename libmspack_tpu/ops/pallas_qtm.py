"""Pallas TPU kernel: lane-parallel Quantum entropy decode (phase A).

Decodes up to LANES independent Quantum streams (CAB folders with the
0xFF per-block realign trailers already injected — cabd.c:1327-1332)
in one launch; each VPU lane owns one stream. Quantum is an adaptive
arithmetic coder (reference qtmd.c:92-166): every decoded symbol
mutates its model, so there is NO intra-stream parallelism — lanes are
the parallel axis (SURVEY §7 step 7), one GET_SYMBOL / raw-bit read
per lane per step.

Semantics pinned by codecs/qtm.py (oracle-verified):

* MSB-first bitstream of 16-bit big-endian units: refill words are
  byte-swapped so byte 0 is the MSB of the 64-bit (hi, lo) buffer.
* 16-bit range coder H/L/C with underflow renormalisation; the
  divisions ((code-lo+1)*total-1)//span and (cum*span)//total have
  numerators < 2^28 so they fit i32, computed by restoring binary
  long division (vector integer division does not lower, and an f32
  estimate of a 28-bit numerator can be ~60 off).
* 9 adaptive model tables per lane — selector(7), 4 literal(64),
  match3/match4/matchv (window-sized), matchv-len(27) — stored as
  (65, SL, LN) rows of (sym<<16)|cumfreq. GET_SYMBOL = one
  whole-table count of cumfreq>target + masked row extractions; the
  +8 update is a masked whole-table add.
* Model rescales CANNOT be deferred past the model's next use
  (the range math depends on exact cumfreqs), so a lane that trips
  cumfreq>3800 parks in a rescale-wait mode; scalar-period blocks
  apply them masked: the halve (cf[i]=max(cf[i]>>1, cf[i+1]+1), a
  sequential row recurrence) every HALVE_PERIOD steps, and the
  every-5th frequency re-sort every SORT_PERIOD steps. The re-sort
  replays the reference's EXCHANGE sort pair-for-pair from an SMEM
  schedule — its permutation of equal counts is path-dependent and
  no key-based (stable or otherwise) sort reproduces it.
* 32 KiB frames: realign to a byte, scan 8-bit units for the 0xFF
  trailer, re-init the coder from 16 raw bits (qtmd.c:430-442).
* Ring-window aliasing (offset > window lap) splits a match into two
  linear-history tokens exactly like codecs/qtm.py _match_copy.

Token format = ops/pallas_lzx.py's (TOK_LIT|n packed literals,
TOK_MATCH|len with litw = linear dist), so the native LZX trace
resolver (msp_lzx_resolve_traces, iflags=0) is phase B for Quantum
too. Counts rows: 0=err, 1=outpos, 2=end step, 3=wpos.
"""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

WINR = 128        # per-row stream window, words
RPD = 4
CHUNK = 128
S_ROW, S_TOK, S_LIT, NSEM = 0, 1, 3, 5

TOK_NOP = -1
TOK_LIT = 0x20000000
TOK_MATCH = 0x40000000

NT = 9            # model tables
TROWS = 65        # uniform padded table height
FRAME = 32768

(QF, QSEL, QLIT, QM3, QM4, QMVLEN, QLEXTRA, QMVSLOT, QEXTRA, QSPLIT,
 QALIGN, QTRAILER, QRS, QDONE, QERR) = range(15)

HALVE_PERIOD = 4
SORT_PERIOD = 64

EXTRA_BITS = tuple((0 if i < 2 else i - 2) >> 1 for i in range(42))


def _cum_bases(extras):
    bases, off = [], 0
    for eb in extras:
        bases.append(off)
        off += 1 << eb
    return tuple(bases)


POSITION_BASE = _cum_bases(EXTRA_BITS)
LENGTH_EXTRA = tuple(((0 if i < 2 else i - 2) >> 2)
                     for i in range(26)) + (0,)
LENGTH_BASE = _cum_bases(LENGTH_EXTRA[:26]) + (254,)


def _exchange_pairs(n):
    """The reference's frequency re-sort is an EXCHANGE sort
    (qtmd.c:150-158 / codecs/qtm.py update): for i<j in lexicographic
    order, swap iff cf[i] < cf[j]. Its permutation of EQUAL counts is
    path-dependent — no key-based sort reproduces it — so the kernel
    replays the exact pair schedule, one per table size."""
    pairs = []
    for i in range(n - 1):
        for j in range(i + 1, n):
            pairs.append((i, j))
    return pairs


def _pair_arrays(wb):
    """Concatenated per-table exchange schedules + offsets."""
    ns = _model_sizes(wb)
    pi, pj, offs = [], [], [0]
    for n in ns:
        ps = _exchange_pairs(n)
        pi.extend(p[0] for p in ps)
        pj.extend(p[1] for p in ps)
        offs.append(len(pi))
    return (np.asarray(pi, np.int32), np.asarray(pj, np.int32),
            tuple(offs))


def _model_sizes(wb):
    span = wb * 2
    return (7, 64, 64, 64, 64, min(span, 24), min(span, 36), span, 27)


_MODEL_STARTS = (0, 0, 64, 128, 192, 0, 0, 0, 0)


def _kernel(stream_hbm, outlen_ref, pairs_i, pairs_j, car_ref, st_in,
            tok_hbm, litw_hbm, cnt_ref, st_out,
            win_ref, tabs,
            stage_tok, stage_lit, mintmp, sems,
            *, SL, LN, W, T_PAD, WB, RESUME):
    i32 = jnp.int32
    u32 = jnp.uint32
    f32 = jnp.float32
    WSIZE = 1 << WB
    NS = _model_sizes(WB)
    _POFFS = [0]
    for _n in NS:
        _POFFS.append(_POFFS[-1] + _n * (_n - 1) // 2)
    rowi = jax.lax.broadcasted_iota(i32, (SL, LN), 0)
    coli = jax.lax.broadcasted_iota(i32, (SL, LN), 1)
    laneid = rowi * LN + coli
    rowv = laneid // LN
    zero = jnp.zeros((SL, LN), i32)
    zero_u = jnp.zeros((SL, LN), u32)
    nz = laneid & 0

    rio_win = jax.lax.broadcasted_iota(i32, (WINR, SL, LN), 0)
    rio_t = jax.lax.broadcasted_iota(i32, (TROWS, SL, LN), 0)

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

    # rescnt (per-model rescales-until-sort countdown) lives in the
    # spare tabs block NT so the whole adaptive-model state exports /
    # imports as ONE (NT+1, TROWS, SL, LN) grid (segmented decode)
    rescnt = tabs.at[NT, pl.ds(0, NT)]
    if not RESUME:
        # model init: rows i of model m hold ((start+i)<<16) | (n-i),
        # padding rows hold 0
        for m in range(NT):
            n = NS[m]
            st = _MODEL_STARTS[m]
            val = jnp.where(rio_t <= n,
                            ((rio_t + st) << 16)
                            | jnp.maximum(n - rio_t, 0),
                            0)
            tabs[m] = jnp.broadcast_to(val, (TROWS, SL, LN)) + nz[None]
        rescnt[...] = jnp.full((NT, SL, LN), 4, i32) + nz[None]
    else:
        # import the previous segment's model state
        for m in range(NT + 1):
            cp = pltpu.make_async_copy(st_in.at[m], tabs.at[m],
                                       sems.at[S_ROW])
            cp.start()
            cp.wait()

    def consume(hi, lo, navail, k):
        ku = jnp.clip(k, 1, 31).astype(u32)
        mid = (hi << ku) | (lo >> (u32(32) - ku))
        hi2 = jnp.where(k == 0, hi, jnp.where(k == 32, lo, mid))
        lo2 = jnp.where(k == 0, lo,
                        jnp.where(k == 32, zero_u, lo << ku))
        return hi2, lo2, navail - k

    def idiv(num, den):
        """Exact floor(num/den), 0 <= num < 2^28, 1 <= den < 2^17.

        Vector integer division does not lower and an f32 estimate of
        a 28-bit numerator can be ~60 off — restoring binary long
        division is exact and ~200 vector ops."""
        q = zero
        r = zero
        for i in range(27, -1, -1):
            r = (r << 1) | ((num >> i) & 1)
            ge = r >= den
            r = jnp.where(ge, r - den, r)
            q = (q << 1) | jnp.where(ge, 1, 0)
        return q

    def step(state):
        (t, _alldone, mode, bithi, bitlo, navail, wpos, base, pend,
         outpos, litword, litcnt, lo16, hi16, code, sel, slot,
         pendlen, split_len, split_dist, frame_todo, resume, pk,
         ptyp, rs_pend, err, donestep) = state

        # ---------- stream window refresh ---------------------------
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
        act_rd = jnp.logical_and(mode < QDONE, wpos < W)
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

        # ---------- fetch + refill (MSB buffer, byte-swapped units) -
        off = wpos - base
        can = jnp.logical_and(pend == 0, off < WINR)
        need = jnp.logical_and(navail < 32,
                               jnp.logical_and(can, wpos < W))
        sel_a = jnp.where(need, off, vfull(WINR))
        w3 = win_ref[:].astype(i32)
        w = jnp.sum(jnp.where(rio_win == sel_a[None], w3, 0),
                    axis=0).astype(u32)
        w = (((w & u32(0xFF)) << 24) | ((w & u32(0xFF00)) << 8)
             | ((w >> 8) & u32(0xFF00)) | (w >> 24))
        shr = jnp.clip(navail, 1, 31).astype(u32)
        bithi = jnp.where(need & (navail == 0), w, bithi)
        bithi = jnp.where(need & (navail > 0) & (navail < 32),
                          bithi | (w >> shr), bithi)
        bitlo = jnp.where(need & (navail > 0) & (navail < 32),
                          bitlo | (w << (u32(32) - shr)), bitlo)
        bitlo = jnp.where(need & (navail == 32), w, bitlo)
        navail = navail + jnp.where(need, 32, 0)
        wpos = jnp.where(need, wpos + 1, wpos)
        at_end = jnp.logical_and(navail < 32, wpos >= W)
        navail = jnp.where(at_end, 64, navail)
        go = navail >= 32
        peek32 = bithi

        def peekk(kv):
            return (bithi >> (u32(32) - kv.astype(u32))).astype(i32)

        tok = vfull(TOK_NOP)
        litw_out = zero
        new_mode = mode
        new_err = err
        k = zero

        def seterr(cond, m, e):
            return (jnp.where(cond, QERR, m), jnp.where(cond, 1, e))

        # ---------- GET_SYMBOL (any model-probing mode) -------------
        is_get = go & ((mode == QSEL) | (mode == QLIT) | (mode == QM3)
                       | (mode == QM4) | (mode == QMVLEN)
                       | (mode == QMVSLOT))
        # table kind per lane
        kind = jnp.where(mode == QSEL, 0,
                jnp.where(mode == QLIT, 1 + jnp.clip(sel, 0, 3),
                 jnp.where(mode == QM3, 5,
                  jnp.where(mode == QM4, 6,
                   jnp.where(mode == QMVSLOT, 7, 8)))))
        span = ((hi16 - lo16) & 0xFFFF) + 1
        # active table's total first, then ONE target division
        g_total = zero
        for m in range(NT):
            act = is_get & (kind == m)
            g_total = jnp.where(act, tabs[m, 0] & 0xFFFF, g_total)
        target = (idiv((code - lo16 + 1) * jnp.maximum(g_total, 1) - 1,
                       span) & 0xFFFF)
        # per-table GETs, selected by kind
        g_sym = zero
        g_cumhi = zero
        g_cumlo = zero
        for m in range(NT):
            act = is_get & (kind == m)
            t3 = tabs[m]
            cf3 = t3 & 0xFFFF
            n = NS[m]
            # cumfreq is non-increasing; pick = first row with
            # cf <= target
            cnt_gt = jnp.sum(
                jnp.where((rio_t >= 1) & (rio_t < n)
                          & (cf3 > target[None]), 1, 0), axis=0)
            pick = 1 + cnt_gt
            symv = jnp.sum(jnp.where(rio_t == (pick - 1)[None],
                                     t3 >> 16, 0), axis=0)
            cumhi = jnp.sum(jnp.where(rio_t == (pick - 1)[None],
                                      cf3, 0), axis=0)
            cumlo = jnp.sum(jnp.where(rio_t == pick[None], cf3, 0),
                            axis=0)
            g_sym = jnp.where(act, symv, g_sym)
            g_cumhi = jnp.where(act, cumhi, g_cumhi)
            g_cumlo = jnp.where(act, cumlo, g_cumlo)
            # +8 update for rows < pick
            upd = act[None] & (rio_t < pick[None]) & (rio_t < n)
            tabs[m] = t3 + jnp.where(upd, 8, 0)

        # narrow + renormalise
        tot_s = jnp.maximum(g_total, 1)
        nhi = (lo16 + idiv(g_cumhi * span, tot_s) - 1) & 0xFFFF
        nlo = (lo16 + idiv(g_cumlo * span, tot_s)) & 0xFFFF
        rlo, rhi, rcode = nlo, nhi, code
        rk = zero
        done_rn = ~is_get
        for _i in range(16):
            topdiff = ((rlo ^ rhi) & 0x8000) != 0
            undf = (topdiff & ((rlo & 0x4000) != 0)
                    & ((rhi & 0x4000) == 0))
            done_rn = done_rn | (topdiff & ~undf)
            act = ~done_rn
            rcode = jnp.where(act & undf, rcode ^ 0x4000, rcode)
            rlo = jnp.where(act & undf, rlo & 0x3FFF, rlo)
            rhi = jnp.where(act & undf, rhi | 0x4000, rhi)
            bit = ((peek32 >> (u32(31) - rk.astype(u32))) & u32(1)) \
                .astype(i32)
            rlo = jnp.where(act, (rlo << 1) & 0xFFFF, rlo)
            rhi = jnp.where(act, ((rhi << 1) | 1) & 0xFFFF, rhi)
            rcode = jnp.where(act, ((rcode << 1) | bit) & 0xFFFF,
                              rcode)
            rk = rk + jnp.where(act, 1, 0)
        lo16 = jnp.where(is_get, rlo, lo16)
        hi16 = jnp.where(is_get, rhi, hi16)
        code = jnp.where(is_get, rcode, code)
        k = k + jnp.where(is_get, rk, 0)
        g_bad = is_get & ((g_total <= 0) | (g_cumhi <= g_cumlo))

        # rescale request: total+8 > 3800 after this decode
        needs_rs = is_get & ~g_bad & (g_total + 8 > 3800)

        # ---------- mode actions ------------------------------------
        # QF: coder init from 16 raw bits
        is_qf = go & (mode == QF)
        code = jnp.where(is_qf, peekk(vfull(16)), code)
        lo16 = jnp.where(is_qf, 0, lo16)
        hi16 = jnp.where(is_qf, 0xFFFF, hi16)
        k = k + jnp.where(is_qf, 16, 0)
        new_mode = jnp.where(is_qf, QSEL, new_mode)

        # QSEL
        is_sel = is_get & (mode == QSEL)
        s_bad = is_sel & (g_sym > 6)
        sel = jnp.where(is_sel, g_sym, sel)
        new_mode = jnp.where(is_sel & (g_sym < 4), QLIT, new_mode)
        new_mode = jnp.where(is_sel & (g_sym == 4), QM3, new_mode)
        new_mode = jnp.where(is_sel & (g_sym == 5), QM4, new_mode)
        new_mode = jnp.where(is_sel & (g_sym == 6), QMVLEN, new_mode)
        new_mode, new_err = seterr(s_bad | (is_sel & g_bad),
                                   new_mode, new_err)

        # QLIT: emit one literal (packed 4 per litword)
        is_lt = is_get & (mode == QLIT) & ~g_bad
        litword2 = jnp.where(is_lt & (litcnt == 0), g_sym, litword)
        litword2 = jnp.where(is_lt & (litcnt > 0),
                             litword | (g_sym << (8 * jnp.clip(
                                 litcnt, 0, 3))), litword2)
        litcnt2 = jnp.where(is_lt, litcnt + 1, litcnt)
        outpos = outpos + jnp.where(is_lt, 1, 0)
        frame_todo = frame_todo - jnp.where(is_lt, 1, 0)
        lit_edge = is_lt & ((frame_todo == 0)
                            | (outpos >= outlen_ref[:]))
        flush4 = is_lt & (litcnt2 == 4)
        do_flush = flush4 | lit_edge
        tok = jnp.where(do_flush, TOK_LIT | litcnt2, tok)
        litw_out = jnp.where(do_flush, litword2, litw_out)
        litcnt = jnp.where(is_lt, jnp.where(do_flush, 0, litcnt2),
                           litcnt)
        litword = jnp.where(is_lt, jnp.where(do_flush, 0, litword2),
                            litword)
        new_mode = jnp.where(is_lt, QSEL, new_mode)
        new_mode = jnp.where(lit_edge & (outpos >= outlen_ref[:]),
                             QDONE,
                             jnp.where(lit_edge, QALIGN, new_mode))
        new_mode, new_err = seterr(is_get & (mode == QLIT) & g_bad,
                                   new_mode, new_err)

        # QM3 / QM4 / QMVSLOT: position slot
        is_m3 = is_get & (mode == QM3) & ~g_bad
        is_m4 = is_get & (mode == QM4) & ~g_bad
        is_mvs = is_get & (mode == QMVSLOT) & ~g_bad
        slot = jnp.where(is_m3 | is_m4 | is_mvs, g_sym, slot)
        pendlen = jnp.where(is_m3, 3, jnp.where(is_m4, 4, pendlen))
        new_mode = jnp.where(is_m3 | is_m4 | is_mvs, QEXTRA, new_mode)
        new_mode, new_err = seterr(
            is_get & ((mode == QM3) | (mode == QM4)
                      | (mode == QMVSLOT)) & g_bad, new_mode, new_err)

        # QMVLEN: length slot -> QLEXTRA
        is_mvl = is_get & (mode == QMVLEN) & ~g_bad
        slot = jnp.where(is_mvl, g_sym, slot)
        new_mode = jnp.where(is_mvl, QLEXTRA, new_mode)
        new_mode, new_err = seterr(is_get & (mode == QMVLEN) & g_bad,
                                   new_mode, new_err)

        # rescale parking: lanes that tripped 3800 wait for the
        # periodic masked rescale block before their next decode
        pk = jnp.where(needs_rs, kind, pk)
        rs_pend = jnp.where(needs_rs, vfull(1), rs_pend)
        resume = jnp.where(needs_rs, new_mode, resume)
        new_mode = jnp.where(needs_rs & (new_mode < QDONE), QRS,
                             new_mode)

        # QLEXTRA: raw length-extra bits
        is_lx = go & (mode == QLEXTRA)
        leb = zero
        lbase = zero
        for i, (e, b) in enumerate(zip(LENGTH_EXTRA, LENGTH_BASE)):
            leb = jnp.where(slot == i, e, leb)
            lbase = jnp.where(slot == i, b, lbase)
        lext = jnp.where(
            leb > 0,
            (bithi >> (u32(32) - jnp.clip(leb, 1, 31).astype(u32)))
            .astype(i32), 0)
        pendlen = jnp.where(is_lx, lbase + lext + 5, pendlen)
        k = k + jnp.where(is_lx, leb, 0)
        new_mode = jnp.where(is_lx, QMVSLOT, new_mode)

        # QEXTRA: raw position-extra bits + match emission
        is_ex = go & (mode == QEXTRA)
        peb = zero
        pbase = zero
        for i, (e, b) in enumerate(zip(EXTRA_BITS, POSITION_BASE)):
            peb = jnp.where(slot == i, e, peb)
            pbase = jnp.where(slot == i, b, pbase)
        pext = jnp.where(
            peb > 0,
            (bithi >> (u32(32) - jnp.clip(peb, 1, 31).astype(u32)))
            .astype(i32), 0)
        offs = pbase + pext + 1
        k = k + jnp.where(is_ex, peb, 0)
        lap = outpos & (WSIZE - 1)
        wrapd = is_ex & (offs > lap)
        m_bad = wrapd & ((offs - lap) > WSIZE)
        alias = wrapd & ~m_bad & (offs > WSIZE)
        len1 = jnp.where(alias, jnp.minimum(pendlen, offs - lap),
                         pendlen)
        dist1 = jnp.where(alias, offs - WSIZE, offs)
        do_split = alias & (pendlen > len1)
        frame_todo = frame_todo - jnp.where(is_ex & ~m_bad, pendlen, 0)
        m_bad = m_bad | (is_ex & (frame_todo < 0))
        emit_ok = is_ex & ~m_bad
        # pending literals flush first (no nl-carry in this format)
        pre_flush = emit_ok & (litcnt > 0)
        tok = jnp.where(pre_flush, TOK_LIT | litcnt, tok)
        litw_out = jnp.where(pre_flush, litword, litw_out)
        litcnt = jnp.where(pre_flush, 0, litcnt)
        litword = jnp.where(pre_flush, 0, litword)
        # the match token goes out next step if we flushed literals
        hold = pre_flush
        tok = jnp.where(emit_ok & ~hold, TOK_MATCH | len1, tok)
        litw_out = jnp.where(emit_ok & ~hold, dist1, litw_out)
        outpos = outpos + jnp.where(emit_ok & ~hold, len1, 0)
        split_len = jnp.where(emit_ok & ~hold & do_split,
                              pendlen - len1, split_len)
        split_dist = jnp.where(emit_ok & ~hold & do_split, offs,
                               split_dist)
        # held lanes re-enter QEXTRA-emit via QSPLIT with the full
        # match as its payload (no bits are consumed there)
        split_len = jnp.where(hold, len1, split_len)
        split_dist = jnp.where(hold, dist1, split_dist)
        sl2 = jnp.where(hold & do_split, pendlen - len1, 0)
        m_edge = (emit_ok & ~hold & ~do_split
                  & ((frame_todo == 0) | (outpos >= outlen_ref[:])))
        new_mode = jnp.where(emit_ok & ~hold & ~do_split, QSEL,
                             new_mode)
        new_mode = jnp.where(emit_ok & (hold | do_split), QSPLIT,
                             new_mode)
        new_mode = jnp.where(
            m_edge & (outpos >= outlen_ref[:]), QDONE,
            jnp.where(m_edge & (frame_todo == 0), QALIGN, new_mode))
        new_mode, new_err = seterr(m_bad, new_mode, new_err)
        # pendlen in QSPLIT means "another segment follows": the held
        # path stores its (possibly zero) second half; the non-held
        # alias path already emitted part 1 here, so QSPLIT emits only
        # part 2 and must see pendlen == 0
        pendlen = jnp.where(hold, sl2,
                            jnp.where(emit_ok, 0, pendlen))

        # QSPLIT: emit held match (and then its second half if any)
        is_sp = mode == QSPLIT
        tok = jnp.where(is_sp, TOK_MATCH | split_len, tok)
        litw_out = jnp.where(is_sp, split_dist, litw_out)
        outpos = outpos + jnp.where(is_sp, split_len, 0)
        more = is_sp & (pendlen > 0)
        # second half of an aliased match follows at full offset
        split_len = jnp.where(more, pendlen, split_len)
        split_dist = jnp.where(more, split_dist + WSIZE, split_dist)
        pendlen = jnp.where(is_sp, 0, pendlen)
        sp_edge = (is_sp & ~more
                   & ((frame_todo == 0) | (outpos >= outlen_ref[:])))
        new_mode = jnp.where(is_sp & ~more, QSEL, new_mode)
        new_mode = jnp.where(more, QSPLIT, new_mode)
        new_mode = jnp.where(
            sp_edge & (outpos >= outlen_ref[:]), QDONE,
            jnp.where(sp_edge & (frame_todo == 0), QALIGN, new_mode))

        # QALIGN: byte-realign, then trailer scan
        is_al = go & (mode == QALIGN)
        alk = navail & 7
        k = k + jnp.where(is_al, alk, 0)
        new_mode = jnp.where(is_al, QTRAILER, new_mode)

        # QTRAILER: one byte per step until 0xFF
        is_tr = go & (mode == QTRAILER)
        byte = peekk(vfull(8))
        k = k + jnp.where(is_tr, 8, 0)
        hit = is_tr & (byte == 0xFF)
        frame_todo = jnp.where(hit, FRAME, frame_todo)
        new_mode = jnp.where(hit, QF, new_mode)

        # ---------- consume -----------------------------------------
        bithi, bitlo, navail = consume(bithi, bitlo, navail, k)

        # ---------- periodic rescale blocks -------------------------
        # classify a NEW request BEFORE the blocks run: a lane parking
        # on a block step is rescaled (and released) that same step,
        # so its halve-vs-sort type must already be current
        rcur = jnp.sum(jnp.where(jax.lax.broadcasted_iota(
            i32, (NT, SL, LN), 0) == pk[None], rescnt[...], 0), axis=0)
        ptyp = jnp.where(needs_rs, jnp.where(rcur - 1 == 0, 1, 0),
                         ptyp)
        in_rs = new_mode == QRS
        do_halve = jax.lax.rem(t, HALVE_PERIOD) == HALVE_PERIOD - 1
        do_sort = jax.lax.rem(t, SORT_PERIOD) == SORT_PERIOD - 1

        @pl.when(do_halve)
        def _():
            # cf[i] = max(cf[i]>>1, cf[i+1]+1) from the bottom up
            # (qtmd.c's halving rescale), as a sequential row loop
            # with a per-lane carry — runs every HALVE_PERIOD steps
            for m in range(NT):
                n = NS[m]
                mm = in_rs & (pk == m) & (ptyp == 0)
                prev = zero  # sentinel cf[n] = 0
                for i in range(n - 1, -1, -1):
                    r = tabs[m, i]
                    cf = r & 0xFFFF
                    ncf = jnp.maximum(cf >> 1, prev + 1)
                    tabs[m, i] = jnp.where(
                        mm, (r & ~0xFFFF) | ncf, r)
                    prev = jnp.where(mm, ncf, prev)

        @pl.when(do_sort)
        def _():
            # every-5th rescale (qtmd.c:144-155): counts =
            # ((cf[i]-cf[i+1])+1)>>1, the reference's EXCHANGE sort
            # replayed pair-for-pair (its equal-count permutation is
            # path-dependent), then cumfreqs rebuilt by suffix sum.
            # Records ((count<<16)|sym) ride in the table rows during
            # the sort; the pair schedule comes from SMEM so the loop
            # stays small in the compiled program.
            for m in range(NT):
                n = NS[m]
                mm = in_rs & (pk == m) & (ptyp == 1)
                # rows -> sort records (counts via next-row carry)
                nxt = zero  # cf[n] sentinel = 0
                for i in range(n - 1, -1, -1):
                    r = tabs[m, i]
                    cf = r & 0xFFFF
                    cnts = ((cf - nxt) + 1) >> 1
                    rec = (cnts << 16) | (r >> 16)
                    tabs[m, i] = jnp.where(mm, rec, r)
                    nxt = jnp.where(mm, cf, nxt)
                def ce(p, _):
                    a = pairs_i[p]
                    b = pairs_j[p]
                    ra = tabs[m, a]
                    rb = tabs[m, b]
                    swap = mm & ((ra >> 16) < (rb >> 16))
                    tabs[m, a] = jnp.where(swap, rb, ra)
                    tabs[m, b] = jnp.where(swap, ra, rb)
                    return 0
                jax.lax.fori_loop(_POFFS[m], _POFFS[m + 1], ce, 0)

                # records -> (sym<<16)|cumfreq by suffix sum
                suf = zero
                for i in range(n - 1, -1, -1):
                    r = tabs[m, i]
                    cnts = (r >> 16) & 0x7FF
                    ssym = r & 0xFFFF
                    nsuf = suf + cnts
                    tabs[m, i] = jnp.where(mm, (ssym << 16) | nsuf, r)
                    suf = jnp.where(mm, nsuf, suf)

        # release waiting lanes whose rescale just ran; update the
        # per-kind rescale countdown
        released_h = in_rs & (ptyp == 0) & do_halve
        released_s = in_rs & (ptyp == 1) & do_sort
        released = released_h | released_s
        rs_pend = jnp.where(released, nz, rs_pend)
        new_mode = jnp.where(released, resume, new_mode)
        # decrement / reset rescales_left for the kind that rescaled
        rdec = released_h[None] & (jax.lax.broadcasted_iota(
            i32, (NT, SL, LN), 0) == pk[None])
        rset = released_s[None] & (jax.lax.broadcasted_iota(
            i32, (NT, SL, LN), 0) == pk[None])
        rescnt[...] = jnp.where(rdec, rescnt[...] - 1,
                                jnp.where(rset, vfull(50)[None],
                                          rescnt[...]))

        # ---------- emit token row ----------------------------------
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

        donestep = jnp.where(
            jnp.logical_and(donestep < 0, new_mode >= QDONE), t,
            donestep)
        def poll_done(_):
            return jnp.where(jnp.all(new_mode >= QDONE),
                             jnp.int32(1), jnp.int32(0))
        alldone = jax.lax.cond(jax.lax.rem(t, 16) == 15, poll_done,
                               lambda _: jnp.int32(0), 0)
        return (t + 1, alldone, new_mode, bithi, bitlo, navail, wpos,
                base, pend, outpos, litword, litcnt, lo16, hi16, code,
                sel, slot, pendlen, split_len, split_dist, frame_todo,
                resume, pk, ptyp, rs_pend, new_err, donestep)

    def cond(state):
        t, alldone = state[0], state[1]
        return jnp.logical_and(t < T_PAD, alldone == 0)

    nz_u = nz.astype(u32)
    if not RESUME:
        init = (jnp.int32(0), jnp.int32(0), nz + QF, nz_u, nz_u,
                nz, nz, nz, nz, nz, nz, nz, nz, nz + 0xFFFF, nz,
                nz, nz, nz, nz, nz, nz + FRAME, nz, nz, nz, nz, nz,
                nz - 1)
    else:
        # carries from car_ref (_CAR layout below). A lane stopped at
        # a 32 KiB frame boundary (QDONE won over QALIGN at the
        # segment edge; the coder re-inits at frame starts,
        # qtmd.c:430-442), so unfinished lanes resume in QALIGN —
        # except lanes whose final symbol tripped a model rescale,
        # which park in QRS until the periodic block runs.
        cerr = car_ref[7]
        crs = car_ref[4]
        mode0 = jnp.where(
            cerr > 0, vfull(QERR),
            jnp.where(car_ref[3] >= outlen_ref[:], vfull(QDONE),
                      jnp.where(crs > 0, vfull(QRS),
                                vfull(QALIGN)))) + nz
        init = (jnp.int32(0), jnp.int32(0), mode0,
                car_ref[0].astype(u32), car_ref[1].astype(u32),
                car_ref[2] + nz, nz, nz, nz, car_ref[3] + nz,
                nz, nz, nz, nz + 0xFFFF, nz,
                nz, nz, nz, nz, nz, nz, nz + QALIGN,
                car_ref[5] + nz, car_ref[6] + nz, crs + nz,
                car_ref[7] + nz, nz - 1)
    final = jax.lax.while_loop(cond, step, init)
    t_end = final[0]
    mode = final[2]
    wpos = final[6]
    outpos = final[9]
    err = final[25]
    donestep = final[26]

    # ---- state export: model grid back to HBM, carries to cnt 8+
    for m in range(NT + 1):
        cp = pltpu.make_async_copy(tabs.at[m], st_out.at[m],
                                   sems.at[S_ROW])
        cp.start()
        cp.wait()
    # _CAR layout: 0=bithi 1=bitlo 2=navail 3=outpos 4=rs_pend 5=pk
    # 6=ptyp 7=err
    for kk, fi in enumerate((3, 4, 5, 9, 24, 22, 23, 25)):
        v = final[fi]
        cnt_ref[8 + kk] = v.astype(i32) if v.dtype == u32 else v

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

    errv = jnp.where(mode == QERR, 1, 0)
    errv = jnp.where(mode < QDONE, 2, errv)
    cnt_ref[0] = errv
    cnt_ref[1] = outpos
    cnt_ref[2] = jnp.where(donestep < 0, t_end, donestep)
    cnt_ref[3] = wpos
    cnt_ref[4] = zero
    cnt_ref[5] = zero
    cnt_ref[6] = zero
    cnt_ref[7] = zero


@functools.partial(jax.jit, static_argnames=(
    "SL", "LN", "W", "T_PAD", "WB", "RESUME", "interpret"))
def _run(stream, outlen, pairs_i, pairs_j, car, st_in, SL, LN, W,
         T_PAD, WB, RESUME=False, interpret=False):
    kern = functools.partial(_kernel, SL=SL, LN=LN, W=W, T_PAD=T_PAD,
                             WB=WB, RESUME=RESUME)
    return pl.pallas_call(
        kern,
        interpret=interpret,
        out_shape=(jax.ShapeDtypeStruct((T_PAD, SL, LN), jnp.int32),
                   jax.ShapeDtypeStruct((T_PAD, SL, LN), jnp.int32),
                   jax.ShapeDtypeStruct((16, SL, LN), jnp.int32),
                   jax.ShapeDtypeStruct((NT + 1, TROWS, SL, LN),
                                        jnp.int32)),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=(pl.BlockSpec(memory_space=pl.ANY),
                   pl.BlockSpec(memory_space=pl.ANY),
                   pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pl.ANY)),
        scratch_shapes=[
            pltpu.VMEM((WINR, SL, LN), jnp.uint32),          # win
            pltpu.VMEM((NT + 1, TROWS, SL, LN), jnp.int32),  # tabs
            pltpu.VMEM((2, CHUNK, SL, LN), jnp.int32),   # stage_tok
            pltpu.VMEM((2, CHUNK, SL, LN), jnp.int32),   # stage_lit
            pltpu.VMEM((1, SL, LN), jnp.int32),          # mintmp
            pltpu.SemaphoreType.DMA((NSEM,)),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(stream, outlen, pairs_i, pairs_j, car, st_in)


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


def qtm_phase_a(streams, out_lens, window_bits, SL=8, LN=128,
                T_PAD=None, interpret=False, resume=None,
                return_state=False):
    """Run Quantum phase A on a batch of independent streams.

    streams: CAB folder streams WITH the 0xFF block trailers injected
    (one after every CFDATA block, cabd.c:1327-1332). Returns
    (tok (T,L), litw (T,L), counts (16,L)[, state]); resolve with the
    LZX trace machinery (litw = linear distance, wsize zero prefix).

    resume: (cnt (16, L), st ((NT+1)*TROWS, L)) from a previous
    segment's return_state=True call; out_lens are then ABSOLUTE stop
    targets (32 KiB frame multiples except the final one) and streams
    must be each lane's REMAINDER from its exported word cursor
    (counts row 3 * 4 bytes in). The coder re-inits at frame starts
    (qtmd.c:430-442) so only the bit buffer, the adaptive model grid
    and a pending-rescale flag carry across segments."""
    L = SL * LN
    stream, W = pack_streams(streams, SL, LN)
    # bucket W to powers of two so multi-launch (segmented) decodes
    # reuse one compiled kernel per bucket
    Wb = max(WINR + 2, 1 << (W - 1).bit_length())
    if Wb != W:
        stream = np.pad(stream, ((0, Wb - W), (0, 0), (0, 0)))
        W = Wb
    outlen = np.zeros((SL, LN), np.int32)
    for i, n in enumerate(out_lens):
        outlen[i // LN, i % LN] = n
    if T_PAD is None:
        # ~2 steps/byte for literal-heavy content + headers
        T_PAD = max(out_lens, default=1) * 2 + 4096
    T_PAD = ((T_PAD + CHUNK - 1) // CHUNK) * CHUNK
    pi, pj, _ = _pair_arrays(window_bits)
    if resume is None:
        car = np.zeros((8, SL, LN), np.int32)
        st_in = np.zeros((NT + 1, TROWS, SL, LN), np.int32)
    else:
        cnt16, st = resume
        car = np.ascontiguousarray(
            np.asarray(cnt16)[8:16].reshape(8, SL, LN))
        st_in = np.asarray(st).reshape(NT + 1, TROWS, SL, LN)
    tok, litw, cnt, st_out = _run(
        jnp.asarray(stream), jnp.asarray(outlen), jnp.asarray(pi),
        jnp.asarray(pj), jnp.asarray(car), jnp.asarray(st_in),
        SL, LN, W, T_PAD, window_bits, resume is not None, interpret)
    out = (tok.reshape(T_PAD, L), litw.reshape(T_PAD, L),
           cnt.reshape(16, L))
    if return_state:
        return out + (st_out.reshape((NT + 1) * TROWS, L),)
    return out


def replay_trace(tok_col, litw_col, out_len, window_bits):
    """Reference phase B in python (zero-window-prefix semantics)."""
    wsize = 1 << window_bits
    out = bytearray(wsize)
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


def _encode_for_bench(data, window_bits):
    """Native Quantum encoder when available (python fallback)."""
    try:
        from .. import native
        frames = native.qtm_encode(data, window_bits)
        if frames is not None:
            return b"".join(p + b"\xff" for p in frames)
    except Exception:
        pass
    from ..compress import qtm_e
    return b"".join(p + b"\xff" for p in qtm_e.compress(data, window_bits))


def bench_entry(n_lanes=1024, chunk_kb=24, window_bits=15):
    """Chip benchmark: n_lanes independent Quantum folder streams
    decoded in one launch. Returns a BENCH_KERNELS.json entry.

    The kernel always computes (8, 128)-wide vectors, so throughput is
    proportional to lane occupancy: benchmark at the full 1024 lanes
    the product engines batch to (tpu_pipeline LANES)."""
    import time

    import jax.numpy as jnp

    from ..utils import bench_corpus
    base = bench_corpus(1 << 20)
    base = base * (1 + (chunk_kb * 1024 * n_lanes) // len(base))
    datas, streams = [], []
    for i in range(n_lanes):
        d = base[i * chunk_kb * 1024:(i + 1) * chunk_kb * 1024]
        datas.append(d)
        streams.append(_encode_for_bench(d, window_bits))
    out_lens = [len(d) for d in datas]
    t_pad = ((max(out_lens) * 2 + 2048 + CHUNK - 1) // CHUNK) * CHUNK
    tok, litw, cnt = qtm_phase_a(streams, out_lens, window_bits,
                                 T_PAD=t_pad)
    cnth = np.asarray(cnt)
    errs = int((cnth[0, :n_lanes] != 0).sum())
    ok = int((cnth[1, :n_lanes] == np.array(out_lens)).sum())
    exact = all(
        replay_trace(np.asarray(tok)[:, i], np.asarray(litw)[:, i],
                     out_lens[i], window_bits) == datas[i]
        for i in (0, n_lanes // 2, n_lanes - 1))
    # device-resident timing
    stream, W = pack_streams(streams)
    outlen = np.zeros((8, 128), np.int32)
    for i, n in enumerate(out_lens):
        outlen[i // 128, i % 128] = n
    pi, pj, _ = _pair_arrays(window_bits)
    args = (jnp.asarray(stream), jnp.asarray(outlen),
            jnp.asarray(pi), jnp.asarray(pj),
            jnp.asarray(np.zeros((8, 8, 128), np.int32)),
            jnp.asarray(np.zeros((NT + 1, TROWS, 8, 128), np.int32)))
    np.asarray(_run(*args, 8, 128, W, t_pad, window_bits, False,
                    False)[2])
    reps = 2
    t0 = time.perf_counter()
    for _ in range(reps):
        np.asarray(_run(*args, 8, 128, W, t_pad, window_bits, False,
                        False)[2])
    dt = (time.perf_counter() - t0) / reps
    total = sum(out_lens)
    return {
        "kernel": "pallas_qtm.phase_a",
        "config": (f"{n_lanes} lanes x {chunk_kb} KiB folders, "
                   f"window 2^{window_bits}, mixed C source"),
        "bytes_out": total,
        "ms": round(dt * 1e3, 1),
        "mb_per_s": round(total / dt / 1e6, 1),
        "errors": errs, "out_ok": ok, "sampled_bit_exact": bool(exact),
        "max_steps": int(cnth[2].max()),
    }
