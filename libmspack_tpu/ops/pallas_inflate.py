"""Pallas TPU kernel: lane-parallel DEFLATE entropy decode (phase A).

Decodes up to LANES independent deflate streams (MSZIP 'CK' frames,
reference mszipd.c:91-219, with history handled downstream) in one
kernel launch. Each VPU lane owns one stream; every kernel step decodes
up to two literal symbols OR one full match (length+distance) per lane
and emits at most one *token* per lane into a (step, lane) trace.
Tokens are later resolved into bytes by phase B (host C++ resolver or
the device copy machine) — the framework's two-phase idiom.

TPU-native design notes (vs the reference's pull-byte loop):

* No gathers, no row sweeps. Per-lane Huffman decode uses the
  canonical-code property: walk code lengths l=1..15 comparing the
  accumulated code against per-length limits (``first[l]+count[l]``),
  which yields (len, rank). The symbol is recovered by ONE whole-table
  pass: compare the (len<<16)|rank key against the full (rows, SL, LN)
  key table and max-reduce the row iota over axis 0 — a single big VPU
  op instead of a per-row loop (measured 4.7x faster on the v5e;
  round-3's per-row fori sweeps were scalar-issue bound at ~110
  cycles/row).
* One step decodes a full match: after the main-tree probe finds a
  length code, the distance code is decoded IN THE SAME STEP from the
  64-bit bit buffer (length code+extra <= 20 bits from the guaranteed
  32, then a mid-step refill tops the buffer back up for the <= 28
  distance bits). Round 3 spent two steps per match.
* Literal pairs: when the first symbol is a literal, a second length-
  find runs speculatively on the shifted bits and the probe pass
  matches both keys against one table read; two literals commit per
  step (lit1+lit2 <= 30 bits of the guaranteed 32).
* Matches carry pending literals: a match token has 2 spare bits for
  the <= 3 not-yet-flushed packed literals riding in its litword, so a
  literal run followed by a match costs no flush step.
* Table *construction* is O(1) per code length: ranks are assigned
  incrementally while the code-length RLE stream is decoded (whole-
  table masked writes), so the periodic "build" event only derives the
  15 first/limit rows.
* Bitstream refill: streams live in HBM as a (W, SL, LN) word grid;
  each *sublane row* of 128 lanes shares a WINR-word VMEM window,
  re-aligned every RPD*SL steps to the row's minimum active read
  cursor by one rectangular (WINR, 1, 128) DMA (single-lane column
  DMAs don't lower on Mosaic — the lane dim must stay whole).
  In-window fetch is one whole-window masked-sum pass yielding TWO
  words (pre-step + mid-step refill). Consumption is <= 48 bits/step
  and <= 2 words/step; WINR=128 leaves >= 80 words of row slack per
  refresh rotation, so no sorting is *required* for progress (sorting
  streams by compressed size still helps rate-homogeneity).
* All lane state and every table row is natively (SL, LN)-tiled —
  (8, 128) is the VPU register shape — so the Mosaic compiler never
  needs a vector shape cast (1-D <-> 2-D reshapes of masks don't
  lower on TPU).
* One token row per step (row index = step, uniform across lanes) —
  so the trace write is a plain vector store, no scatters.

Token format (int32), one per (step, lane), plus a parallel litword
plane:
  -1                      NOP (header step, stall, done)
  0x20000000 | n          n in 1..4 literal bytes, LSB-first in litword
  0x40000000 | nl<<25 | len<<16 | (dist-1)
                          match, len<=258, dist<=32768, preceded by
                          nl in 0..3 literal bytes from litword

Counts output rows: 0=err (0 ok; 1 bad data; 2 unfinished at T cap),
1=output bytes, 2=end step, 3=words consumed.
"""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

WINR = 128        # per-row stream window, words (512 B/lane)
RPD = 4           # steps between row-refresh DMAs (row period RPD*SL)
CHUNK = 128       # token staging rows per HBM flush
S_ROW = 0         # semaphore indices
S_TOK = 1         # .. and 2
S_LIT = 3         # .. and 4
NSEM = 5
NLIT = 288
NDIST = 30
NCL = 19

TOK_NOP = -1
TOK_LIT = 0x20000000
TOK_MATCH = 0x40000000

# modes (M_DIST retired round 4: distance decode fused into M_BODY)
M_BLKHDR, M_STORED0, M_STORED1, M_STOREDCP = 0, 1, 2, 3
M_CLHDR, M_CLRAW, M_WAITCL, M_CLLENS = 4, 5, 6, 7
M_WAITMAIN, M_BODY = 8, 9
M_DONE, M_ERR = 11, 12

BITLEN_ORDER = (16, 17, 18, 0, 8, 7, 9, 6, 10, 5,
                11, 4, 12, 3, 13, 2, 14, 1, 15)

BUILD_PERIOD = 8

DEBUG_LANE = None  # set to a lane id to step-trace it (interpret mode)



def _canonical_keys(lens, nsyms):
    """Host-side: (len<<16)|rank key per symbol, plus first/limit rows."""
    lens = np.asarray(lens, np.int32)
    cnt = np.zeros(16, np.int64)
    for l in lens:
        if l:
            cnt[l] += 1
    first = np.zeros(16, np.int64)
    limit = np.zeros(16, np.int64)
    for l in range(1, 16):
        first[l] = (first[l - 1] + cnt[l - 1]) << 1
        limit[l] = first[l] + cnt[l]
    keys = np.full(nsyms, -1, np.int32)
    nxt = first.copy()
    for s, l in enumerate(lens):
        if l:
            keys[s] = (l << 16) | int(nxt[l] - first[l])
            nxt[l] += 1
    return keys, first.astype(np.int32), limit.astype(np.int32)


FIXED_LIT_LENS = [8] * 144 + [9] * 112 + [7] * 24 + [8] * 8
FIXED_DIST_LENS = [5] * 32  # 32 per mszip.h; codes 30/31 invalid on use
_FIXK_L, _FIXF_L, _FIXL_L = _canonical_keys(FIXED_LIT_LENS, NLIT)
_FIXK_D, _FIXF_D, _FIXL_D = _canonical_keys(FIXED_DIST_LENS[:30], NDIST)


def _kernel(stream_hbm, hist_ref, fixk_ref, fixd_ref, fixf_ref,
            tok_hbm, litw_hbm, cnt_ref,
            win_ref, symkey, distkey, clkey,
            limlit, firstlit, cntlit,
            limdist, firstdist, cntdist,
            limcl, firstcl, cntcl, runcl,
            stage_tok, stage_lit, mintmp, sems,
            *, SL, LN, W, T_PAD):
    i32 = jnp.int32
    u32 = jnp.uint32
    rowi = jax.lax.broadcasted_iota(i32, (SL, LN), 0)
    coli = jax.lax.broadcasted_iota(i32, (SL, LN), 1)
    laneid = rowi * LN + coli
    # lane-varying row index: masks built from the sublane iota alone
    # get a lane-replicated Mosaic layout ({0,*}) that loop carries
    # can't be relayout'd to — derive the row from laneid instead
    rowv = laneid // LN
    zero = jnp.zeros((SL, LN), i32)
    zero_u = jnp.zeros((SL, LN), u32)

    rio_win = jax.lax.broadcasted_iota(i32, (WINR, SL, LN), 0)
    rio_lit = jax.lax.broadcasted_iota(i32, (NLIT, SL, LN), 0)
    rio_dst = jax.lax.broadcasted_iota(i32, (NDIST, SL, LN), 0)
    rio_cl = jax.lax.broadcasted_iota(i32, (NCL, SL, LN), 0)
    rio_16 = jax.lax.broadcasted_iota(i32, (16, SL, LN), 0)

    def vfull(v, dt=i32):
        return jnp.full((SL, LN), v, dt)

    # laneid-derived constants: both lax.cond branches must produce the
    # same (non-replicated) Mosaic layout, so constant branches can't
    # use broadcasted literals.
    nz = laneid & 0
    nneg1 = nz - 1

    # ---- initial window load: all lanes at word 0, rectangular DMA
    init_dma = pltpu.make_async_copy(
        stream_hbm.at[pl.ds(0, WINR)], win_ref, sems.at[S_ROW])
    init_dma.start()
    init_dma.wait()

    # invalidate staging token planes
    stage_tok[0] = jnp.full((CHUNK, SL, LN), TOK_NOP, i32)
    stage_tok[1] = jnp.full((CHUNK, SL, LN), TOK_NOP, i32)
    stage_lit[0] = jnp.zeros((CHUNK, SL, LN), i32)
    stage_lit[1] = jnp.zeros((CHUNK, SL, LN), i32)

    def consume(lo, hi, navail, k):
        """Drop k (0..32) low bits from the 64-bit (lo, hi) buffer."""
        ku = jnp.clip(k, 1, 31).astype(u32)
        mid = (lo >> ku) | (hi << (u32(32) - ku))
        lo2 = jnp.where(k == 0, lo, jnp.where(k == 32, hi, mid))
        hi2 = jnp.where(k == 0, hi,
                        jnp.where(k == 32, zero_u, hi >> ku))
        return lo2, hi2, navail - k

    def insert(lo, hi, navail, w, need):
        """Append word w at bit navail where need (navail < 32)."""
        nau = navail.astype(u32)
        lo2 = jnp.where(need & (navail == 0), w, lo)
        lo2 = jnp.where(need & (navail > 0), lo | (w << nau), lo2)
        hi_in = w >> (u32(32) - jnp.clip(navail, 1, 31).astype(u32))
        hi2 = jnp.where(need & (navail > 0), hi | hi_in, hi)
        return lo2, hi2, navail + jnp.where(need, 32, 0)

    def lenfind(blo, lim_rows):
        """Canonical length-find: (length, rank); length==16 = miss.

        lim_rows[l] -> (limit (SL,LN), first (SL,LN)) per code length;
        called with a python list of 16 (limit, first) pairs so all
        table reads are static row indices."""
        length = vfull(16)
        acc = zero
        rank = zero
        for l in range(1, 16):
            bit = ((blo >> u32(l - 1)) & u32(1)).astype(i32)
            acc = (acc << 1) | bit
            lim, fst = lim_rows[l]
            hit = jnp.logical_and(acc < lim, length == 16)
            length = jnp.where(hit, l, length)
            rank = jnp.where(hit, acc - fst, rank)
        ok = length < 16
        length = jnp.where(ok, length, 0)
        return length, rank, ok

    def step(state):
        (t, _alldone, mode, bitlo, bithi, navail, wpos, base, pend,
         outpos, litword, litcnt, finalf, prevlen,
         fillpos, nlit, ndist, npre, clraw_i, stored_rem,
         err, donestep) = state

        # ---------- stream window refresh: one sublane row, round robin
        is_wait = jnp.logical_and(jax.lax.rem(t, RPD) == 1, t > 0)
        @pl.when(is_wait)
        def _():
            # completes the row DMA issued at t-1
            pltpu.make_async_copy(
                stream_hbm.at[pl.ds(0, WINR), 0],
                win_ref.at[:, 0], sems.at[S_ROW]).wait()
        r_prev = jax.lax.rem((t - 1) // RPD, SL)
        pend = jnp.where(jnp.logical_and(is_wait, rowv == r_prev),
                         vfull(0), pend)

        is_issue = jax.lax.rem(t, RPD) == 0
        r_issue = jax.lax.rem(t // RPD, SL)
        m_r = rowv == r_issue
        act_rd = jnp.logical_and(mode < M_DONE, wpos < W)
        cand = jnp.where(jnp.logical_and(m_r, act_rd), wpos, W)
        # roundtrip through VMEM: decouples the reduce's layout demand
        # from the wpos carry (direct min() made Mosaic demand a lane-
        # replicated carry layout -> invalid relayout)
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

        # ---------- fetch pass: TWO words per lane, one window read ---
        off = wpos - base
        ok_win = pend == 0
        can_a = ok_win & (off < WINR) & (wpos < W)
        can_b = ok_win & (off + 1 < WINR) & (wpos + 1 < W)
        sel_a = jnp.where(can_a, off, vfull(WINR))
        sel_b = jnp.where(can_b, off + 1, vfull(WINR))
        win3 = win_ref[:].astype(i32)
        wa = jnp.sum(jnp.where(rio_win == sel_a[None], win3, 0),
                     axis=0).astype(u32)
        wb = jnp.sum(jnp.where(rio_win == sel_b[None], win3, 0),
                     axis=0).astype(u32)

        # ---------- pre-step refill ----------------------------------
        need = jnp.logical_and(navail < 32, can_a)
        bitlo, bithi, navail = insert(bitlo, bithi, navail, wa, need)
        wpos = jnp.where(need, wpos + 1, wpos)
        used_a = need
        # past end of stream: fake zero refill (reference readbits.h:198)
        at_end = jnp.logical_and(navail < 32, wpos >= W)
        navail = jnp.where(at_end, 64, navail)

        go = navail >= 32   # lanes below stall this step

        is_body = jnp.logical_and(go, mode == M_BODY)
        is_cll = jnp.logical_and(go, mode == M_CLLENS)

        # ---------- find1 (+ speculative find2) ----------------------
        lim_rows1 = []
        lim_rows2 = []
        for l in range(16):
            ll, fl = limlit[l], firstlit[l]
            lc, fc = limcl[l], firstcl[l]
            lim_rows1.append((jnp.where(is_cll, lc, ll),
                              jnp.where(is_cll, fc, fl)))
            lim_rows2.append((ll, fl))
        len1, rank1, ok1 = lenfind(bitlo, lim_rows1)
        key1 = (len1 << 16) | rank1
        blo2 = bitlo >> jnp.clip(len1, 0, 31).astype(u32)
        len2, rank2, ok2 = lenfind(blo2, lim_rows2)
        key2 = (len2 << 16) | rank2

        # ---------- symbol probes (whole-table passes, ungated) ------
        # the vectorized pass is cheap enough to run every step; a
        # lax.cond gate costs a cross-lane any() reduction + branch
        t3 = symkey[:]
        litsym = jnp.max(jnp.where(t3 == key1[None], rio_lit, -1),
                         axis=0)
        litsym2 = jnp.max(jnp.where(t3 == key2[None], rio_lit, -1),
                          axis=0)
        c3 = clkey[:]
        clsym = jnp.max(jnp.where(c3 == key1[None], rio_cl, -1),
                        axis=0)

        tok = vfull(TOK_NOP)
        litw_out = zero
        new_mode = mode
        new_err = err

        def seterr(cond, m, e):
            return (jnp.where(cond, M_ERR, m), jnp.where(cond, 1, e))

        # ---------- M_BODY -------------------------------------------
        b_bad = jnp.logical_and(is_body,
                                jnp.logical_or(~ok1, litsym < 0))
        sym = litsym
        is_lit = jnp.logical_and(is_body, jnp.logical_and(sym >= 0,
                                                          sym < 256))
        is_eob = jnp.logical_and(is_body, sym == 256)
        is_len = jnp.logical_and(is_body, sym >= 257)
        slot = sym - 257
        b_bad = jnp.logical_or(b_bad, jnp.logical_and(is_len, slot >= 29))
        is_len = jnp.logical_and(is_len, ~b_bad)
        e_len = jnp.where(slot < 8, 0, (slot - 4) >> 2)
        e_len = jnp.where(slot >= 28, 0, e_len)
        base_len = jnp.where(slot < 8, slot + 3,
                             ((4 + (slot & 3)) << jnp.maximum(e_len, 0)) + 3)
        base_len = jnp.where(slot >= 28, 258, base_len)
        extrav = ((bitlo >> jnp.clip(len1, 0, 31).astype(u32))
                  & ((u32(1) << e_len.astype(u32)) - u32(1))).astype(i32)
        mlen = base_len + extrav

        # --- match path: consume len code, mid-refill, decode dist ---
        k1 = jnp.where(is_len, len1 + e_len, 0)
        lo_m, hi_m, nav_m = consume(bitlo, bithi, navail, k1)
        w_m = jnp.where(used_a, wb, wa)
        # NB: select on i1 vectors doesn't lower ("unsupported target
        # bitwidth for truncation") — use boolean algebra
        can_m = (used_a & can_b) | (~used_a & can_a)
        need_m = is_len & (nav_m < 32) & can_m
        lo_m, hi_m, nav_m = insert(lo_m, hi_m, nav_m, w_m, need_m)
        at_end_m = is_len & (nav_m < 32) & (wpos + jnp.where(need_m, 1, 0)
                                            >= W)
        nav_m = jnp.where(at_end_m, 64, nav_m)
        # a match lane that cannot see 28 distance bits stalls whole
        m_stall = is_len & (nav_m < 28)
        m_go = is_len & ~m_stall

        lim_rows_d = [(limdist[l], firstdist[l]) for l in range(16)]
        dlen, drank, okd = lenfind(lo_m, lim_rows_d)
        keyd = (dlen << 16) | drank
        d3 = distkey[:]
        dsym = jnp.max(jnp.where(d3 == keyd[None], rio_dst, -1),
                       axis=0)

        d_bad = jnp.logical_and(m_go,
                                jnp.logical_or(~okd, dsym < 0))
        e_d = jnp.maximum((dsym >> 1) - 1, 0)
        base_d = jnp.where(dsym < 2, dsym + 1,
                           ((2 + (dsym & 1)) << e_d) + 1)
        dext = ((lo_m >> jnp.clip(dlen, 0, 31).astype(u32))
                & ((u32(1) << jnp.where(m_go, e_d, 0).astype(u32))
                   - u32(1))).astype(i32)
        dist = base_d + dext
        # outpos already includes pending (unflushed) literals — they
        # are counted at pack time
        d_bad = jnp.logical_or(
            d_bad, jnp.logical_and(m_go, dist > outpos + hist_ref[:]))
        okm = jnp.logical_and(m_go, ~d_bad)
        k2 = jnp.where(okm, dlen + e_d, 0)
        lo_m, hi_m, nav_m = consume(lo_m, hi_m, nav_m, k2)
        # match token carries the <= 3 pending literals
        tok = jnp.where(okm, TOK_MATCH | (litcnt << 25) | (mlen << 16)
                        | (dist - 1), tok)
        litw_out = jnp.where(okm, litword, litw_out)
        outpos = outpos + jnp.where(okm, mlen, 0)
        litcnt_m = jnp.where(okm, 0, litcnt)
        litword_m = jnp.where(okm, 0, litword)
        new_mode, new_err = seterr(d_bad, new_mode, new_err)

        # --- literal path: 1-2 literals per step ----------------------
        lit2_ok = (is_lit & ok2 & (litsym2 >= 0) & (litsym2 < 256))
        n_add = jnp.where(is_lit, 1, 0) + jnp.where(lit2_ok, 1, 0)
        sym2 = jnp.maximum(litsym2, 0)
        b1 = jnp.maximum(sym, 0) << (8 * jnp.clip(litcnt, 0, 3))
        litword_a = jnp.where(is_lit, litword | b1, litword)
        b2pos = litcnt + 1
        litword_a = jnp.where(lit2_ok & (b2pos <= 3),
                              litword_a | (sym2 << (8 * jnp.clip(
                                  b2pos, 0, 3))), litword_a)
        total = litcnt + n_add  # <= 5
        flush4 = jnp.logical_and(is_lit, total >= 4)
        flushn = jnp.logical_and(is_eob, litcnt > 0)
        do_flush = jnp.logical_or(flush4, flushn)
        nflush = jnp.where(flush4, 4, litcnt)
        tok = jnp.where(do_flush, TOK_LIT | nflush, tok)
        litw_out = jnp.where(do_flush, litword_a, litw_out)
        outpos = outpos + jnp.where(is_lit, n_add, 0)
        carry = jnp.where(total == 5, sym2, 0)
        litcnt_l = jnp.where(flush4, total - 4, total)
        litword_l = jnp.where(flush4, carry, litword_a)
        litcnt = jnp.where(is_lit, litcnt_l,
                           jnp.where(do_flush, 0, litcnt_m))
        litword = jnp.where(is_lit, litword_l,
                            jnp.where(do_flush, 0, litword_m))
        klit = jnp.where(is_lit, len1 + jnp.where(lit2_ok, len2, 0), 0)
        keob = jnp.where(is_eob, len1, 0)

        new_mode = jnp.where(is_eob & (finalf > 0), M_DONE, new_mode)
        new_mode = jnp.where(is_eob & (finalf == 0), M_BLKHDR, new_mode)
        new_mode, new_err = seterr(b_bad, new_mode, new_err)

        # ---------- M_BLKHDR -----------------------------------------
        is_hdr = jnp.logical_and(go, mode == M_BLKHDR)
        hfinal = (bitlo & u32(1)).astype(i32)
        htype = ((bitlo >> u32(1)) & u32(3)).astype(i32)
        khdr = jnp.where(is_hdr, 3, 0)
        finalf = jnp.where(is_hdr, hfinal, finalf)
        new_mode = jnp.where(is_hdr & (htype == 0), M_STORED0, new_mode)
        new_mode = jnp.where(is_hdr & (htype == 1), M_WAITMAIN, new_mode)
        # fixed trees: npre<0 marks the fixed request for the build event
        npre = jnp.where(is_hdr & (htype == 1), -1, npre)
        new_mode = jnp.where(is_hdr & (htype == 2), M_CLHDR, new_mode)
        new_mode, new_err = seterr(is_hdr & (htype == 3), new_mode, new_err)

        # ---------- M_CLHDR ------------------------------------------
        is_clh = jnp.logical_and(go, mode == M_CLHDR)
        v_nlit = 257 + (bitlo & u32(31)).astype(i32)
        v_ndist = 1 + ((bitlo >> u32(5)) & u32(31)).astype(i32)
        v_npre = 4 + ((bitlo >> u32(10)) & u32(15)).astype(i32)
        kclh = jnp.where(is_clh, 14, 0)
        nlit = jnp.where(is_clh, v_nlit, nlit)
        ndist = jnp.where(is_clh, v_ndist, ndist)
        npre = jnp.where(is_clh, v_npre, npre)
        clh_bad = jnp.logical_and(is_clh, jnp.logical_or(v_nlit > NLIT,
                                                         v_ndist > 32))
        clraw_i = jnp.where(is_clh, 0, clraw_i)
        fillpos = jnp.where(is_clh, 0, fillpos)
        prevlen = jnp.where(is_clh, 0, prevlen)
        new_mode = jnp.where(is_clh & ~clh_bad, M_CLRAW, new_mode)
        new_mode, new_err = seterr(clh_bad, new_mode, new_err)
        # table invalidation for lanes entering a dynamic block is
        # FUSED into the CLRAW/CLLENS write passes below (one
        # read-modify-write per table per step instead of two;
        # unconditional masked passes — a vector-predicate gate costs
        # ~100 us on this chip). CLHDR and CLRAW/CLLENS are disjoint
        # per lane, so ordering within the pass is irrelevant.
        m3l = is_clh[None]
        z16 = zero[None]

        # ---------- M_CLRAW: one 3-bit pre-tree length per step -------
        is_clr = jnp.logical_and(go, mode == M_CLRAW)
        clv = (bitlo & u32(7)).astype(i32)
        kclr = jnp.where(is_clr, 3, 0)
        # symbol this step: BITLEN_ORDER[clraw_i]
        ordv = zero
        for ii, o in enumerate(BITLEN_ORDER):
            ordv = jnp.where(clraw_i == ii, o, ordv)
        # ranks are fixed up at the build event (writes here are in
        # BITLEN_ORDER, not symbol order, so incremental ranks would
        # come out permuted)
        wr_cl = jnp.logical_and(is_clr, clv > 0)
        mw = wr_cl[None] & (rio_cl == ordv[None])
        clkey[:] = jnp.where(m3l, vfull(-1)[None],
                             jnp.where(mw, (clv << 16)[None],
                                       clkey[:]))
        mc0 = wr_cl[None] & (rio_16 == clv[None])
        cntcl[:] = jnp.where(m3l, z16,
                             cntcl[:] + jnp.where(mc0, vfull(1)[None],
                                                  zero[None]))
        clraw_i = clraw_i + jnp.where(is_clr, 1, 0)
        new_mode = jnp.where(is_clr & (clraw_i >= npre), M_WAITCL,
                             new_mode)

        # ---------- M_CLLENS: one RLE op per step ---------------------
        c_bad = jnp.logical_and(is_cll,
                                jnp.logical_or(~ok1, clsym < 0))
        cl_lit = jnp.logical_and(is_cll, jnp.logical_and(clsym >= 0,
                                                         clsym < 16))
        cl_16 = jnp.logical_and(is_cll, clsym == 16)
        cl_17 = jnp.logical_and(is_cll, clsym == 17)
        cl_18 = jnp.logical_and(is_cll, clsym == 18)
        rext = jnp.where(cl_16, 2, jnp.where(cl_17, 3,
                                             jnp.where(cl_18, 7, 0)))
        rval = ((bitlo >> jnp.clip(len1, 0, 31).astype(u32))
                & ((u32(1) << rext.astype(u32)) - u32(1))).astype(i32)
        kcll = jnp.where(is_cll & ~c_bad, len1 + rext, 0)
        run = jnp.where(cl_lit, 1,
                        jnp.where(cl_16, 3 + rval,
                                  jnp.where(cl_17, 3 + rval,
                                            jnp.where(cl_18, 11 + rval,
                                                      0))))
        val = jnp.where(cl_lit, jnp.maximum(clsym, 0),
                        jnp.where(cl_16, prevlen, 0))
        c_bad = jnp.logical_or(c_bad, jnp.logical_and(
            is_cll, fillpos + run > nlit + ndist))
        act = jnp.logical_and(is_cll, ~c_bad)
        wr_any = jnp.logical_and(act, val > 0)
        nlit_in_run = jnp.clip(nlit - fillpos, 0, run)
        # rank bases: current count of codes at this length
        rb_lit = jnp.sum(jnp.where(rio_16 == val[None], cntlit[:],
                                   0), axis=0)
        rb_dst = jnp.sum(jnp.where(rio_16 == val[None], cntdist[:],
                                   0), axis=0)
        inr = (wr_any[None] & (rio_lit >= fillpos[None])
               & (rio_lit < (fillpos + run)[None])
               & (rio_lit < nlit[None]))
        kv = ((val << 16)[None]
              | (rb_lit[None] + (rio_lit - fillpos[None])))
        symkey[:] = jnp.where(m3l, vfull(-1)[None],
                              jnp.where(inr, kv, symkey[:]))
        a3 = rio_dst + nlit[None]
        inrd = (wr_any[None] & (a3 >= fillpos[None])
                & (a3 < (fillpos + run)[None]))
        kvd = ((val << 16)[None]
               | (rb_dst[None]
                  + (a3 - jnp.maximum(fillpos, nlit)[None])))
        distkey[:] = jnp.where(m3l, vfull(-1)[None],
                               jnp.where(inrd, kvd, distkey[:]))
        mc = wr_any[None] & (rio_16 == val[None])
        cntlit[:] = jnp.where(
            m3l, z16, cntlit[:] + jnp.where(mc, nlit_in_run[None],
                                            zero[None]))
        cntdist[:] = jnp.where(
            m3l, z16, cntdist[:] + jnp.where(
                mc, (run - nlit_in_run)[None], zero[None]))
        prevlen = jnp.where(cl_lit, jnp.maximum(clsym, 0), prevlen)
        fillpos = fillpos + jnp.where(act, run, 0)
        new_mode = jnp.where(act & (fillpos >= nlit + ndist),
                             M_WAITMAIN, new_mode)
        new_mode, new_err = seterr(c_bad, new_mode, new_err)

        # ---------- stored blocks -------------------------------------
        is_s0 = jnp.logical_and(go, mode == M_STORED0)
        alignk = navail & 7
        slen = ((bitlo >> alignk.astype(u32)) & u32(0xFFFF)).astype(i32)
        ks0 = jnp.where(is_s0, alignk + 16, 0)
        stored_rem = jnp.where(is_s0, slen, stored_rem)
        new_mode = jnp.where(is_s0, M_STORED1, new_mode)

        is_s1 = jnp.logical_and(go, mode == M_STORED1)
        snlen = (bitlo & u32(0xFFFF)).astype(i32)
        ks1 = jnp.where(is_s1, 16, 0)
        s1_bad = jnp.logical_and(is_s1,
                                 (stored_rem ^ 0xFFFF) != snlen)
        new_mode = jnp.where(is_s1 & ~s1_bad,
                             jnp.where(stored_rem > 0, M_STOREDCP,
                                       jnp.where(finalf > 0, M_DONE,
                                                 M_BLKHDR)),
                             new_mode)
        new_mode, new_err = seterr(s1_bad, new_mode, new_err)

        is_sc = jnp.logical_and(go, mode == M_STOREDCP)
        ntake = jnp.minimum(stored_rem, 4)
        ksc = jnp.where(is_sc, 8 * ntake, 0)
        mask_sc = jnp.where(
            ntake >= 4, u32(0xFFFFFFFF),
            (u32(1) << (8 * jnp.clip(ntake, 0, 3)).astype(u32)) - u32(1))
        tok = jnp.where(is_sc, TOK_LIT | ntake, tok)
        litw_out = jnp.where(is_sc, (bitlo & mask_sc).astype(i32),
                             litw_out)
        outpos = outpos + jnp.where(is_sc, ntake, 0)
        stored_rem = stored_rem - jnp.where(is_sc, ntake, 0)
        new_mode = jnp.where(is_sc & (stored_rem == 0),
                             jnp.where(finalf > 0, M_DONE, M_BLKHDR),
                             new_mode)

        # ---------- merge bit-buffer state ----------------------------
        k_nm = (klit + keob + khdr + kclh + kclr + kcll + ks0 + ks1
                + ksc)
        lo_n, hi_n, nav_n = consume(bitlo, bithi, navail, k_nm)
        mtaken = okm  # match committed this step
        bitlo = jnp.where(mtaken, lo_m, lo_n)
        bithi = jnp.where(mtaken, hi_m, hi_n)
        navail = jnp.where(mtaken, nav_m, nav_n)
        wpos = wpos + jnp.where(need_m & mtaken, 1, 0)
        # stalled match lanes keep their pre-consume state (the pre-
        # refill already committed, which is fine)
        bitlo = jnp.where(m_stall, lo_n, bitlo)  # k_nm==0 for them
        bithi = jnp.where(m_stall, hi_n, bithi)
        navail = jnp.where(m_stall, nav_n, navail)

        # ---------- build event --------------------------------------
        # gated on the SCALAR step counter only (a jnp.any() vector
        # predicate would cost a cross-lane reduce per step); lanes not
        # waiting are masked inside.
        wait_cl = new_mode == M_WAITCL
        wait_main = new_mode == M_WAITMAIN
        do_build = jax.lax.rem(t, BUILD_PERIOD) == BUILD_PERIOD - 1
        fixreq = jnp.logical_and(wait_main, npre < 0)
        @pl.when(do_build)
        def _():
            mcl = wait_cl
            mmain = wait_main
            mfix = fixreq
            # canonical CL ranks, assigned in symbol order
            runcl[:] = jnp.where(mcl[None] & (rio_16 >= 0), zero[None],
                                 runcl[:])
            for s in range(NCL):
                lenv = clkey[s] >> 16  # -1 rows stay negative
                r3 = runcl[:]
                sel = rio_16 == lenv[None]
                rk = jnp.sum(jnp.where(sel, r3, 0), axis=0)
                upd = (mcl & (lenv > 0))
                runcl[:] = r3 + jnp.where(sel & upd[None],
                                          vfull(1)[None], zero[None])
                clkey[s] = jnp.where(upd, (lenv << 16) | rk, clkey[s])
            firstcl[0] = jnp.where(mcl, zero, firstcl[0])
            limcl[0] = jnp.where(mcl, zero, limcl[0])
            firstlit[0] = jnp.where(mmain, zero, firstlit[0])
            limlit[0] = jnp.where(mmain, zero, limlit[0])
            firstdist[0] = jnp.where(mmain, zero, firstdist[0])
            limdist[0] = jnp.where(mmain, zero, limdist[0])
            for l in range(1, 16):
                fc = (firstcl[l - 1] + cntcl[l - 1]) << 1
                firstcl[l] = jnp.where(mcl, fc, firstcl[l])
                limcl[l] = jnp.where(mcl, fc + cntcl[l], limcl[l])
                fl = (firstlit[l - 1] + cntlit[l - 1]) << 1
                firstlit[l] = jnp.where(mmain & ~mfix, fl, firstlit[l])
                limlit[l] = jnp.where(mmain & ~mfix,
                                      fl + cntlit[l], limlit[l])
                fd = (firstdist[l - 1] + cntdist[l - 1]) << 1
                firstdist[l] = jnp.where(mmain & ~mfix, fd, firstdist[l])
                limdist[l] = jnp.where(mmain & ~mfix,
                                       fd + cntdist[l], limdist[l])
            # fixed-tree lanes: constant tables (prebuilt 3-D inputs)
            @pl.when(jnp.any(mfix))
            def _():
                mf3 = mfix[None]
                symkey[:] = jnp.where(mf3 & (rio_lit >= 0), fixk_ref[:],
                                      symkey[:])
                distkey[:] = jnp.where(mf3 & (rio_dst >= 0), fixd_ref[:],
                                       distkey[:])
                for l in range(16):
                    firstlit[l] = jnp.where(mfix, zero + fixf_ref[l, 0],
                                            firstlit[l])
                    limlit[l] = jnp.where(mfix, zero + fixf_ref[l, 1],
                                          limlit[l])
                    firstdist[l] = jnp.where(mfix, zero + fixf_ref[l, 2],
                                             firstdist[l])
                    limdist[l] = jnp.where(mfix, zero + fixf_ref[l, 3],
                                           limdist[l])
        built = jnp.logical_and(do_build, jnp.logical_or(wait_cl,
                                                         wait_main))
        # over-subscription check (reference make_decode_table rejects
        # with INF_ERR_LITERALTBL/DISTANCETBL, mszipd.c:120-143): a
        # built table with limit[l] > 2^l would decode ambiguously.
        # computed unconditionally (45 row reads of vector compares —
        # cheaper than any scalar-gate machinery), applied via `built`.
        def oversub(lim):
            bad = zero
            for l in range(1, 16):
                bad = bad | jnp.where(lim[l] > (1 << l), 1, 0)
            return bad
        bad_cl = oversub(limcl)
        bad_main = oversub(limlit) | oversub(limdist)
        bad_tbl = jnp.where(wait_cl, bad_cl,
                            jnp.where(wait_main & ~fixreq, bad_main,
                                      zero)) > 0
        new_mode = jnp.where(jnp.logical_and(built, wait_cl), M_CLLENS,
                             new_mode)
        new_mode = jnp.where(jnp.logical_and(built, wait_main), M_BODY,
                             new_mode)
        new_mode, new_err = seterr(jnp.logical_and(built, bad_tbl),
                                   new_mode, new_err)
        npre = jnp.where(jnp.logical_and(built, fixreq), 0, npre)

        # ---------- emit token row ------------------------------------
        row = jax.lax.rem(t, CHUNK)
        slotc = jax.lax.rem(t // CHUNK, 2)
        stage_tok[slotc, row] = tok
        stage_lit[slotc, row] = litw_out
        @pl.when(row == CHUNK - 1)
        def _():
            c = t // CHUNK
            # wait the flush issued 2 chunks ago on this slot
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
                "t={} mode={} nm={} na={} wpos={} lo={} tok={} "
                "sym={} s2={} len1={} dsym={} dist={} mlen={} lc={} out={}",
                t, ext(mode), ext(new_mode), ext(navail), ext(wpos),
                ext(bitlo & u32(0x7FFFFFFF)), ext(tok),
                ext(jnp.where(is_cll, clsym, litsym)), ext(litsym2),
                ext(len1), ext(dsym), ext(dist), ext(mlen),
                ext(litcnt), ext(outpos))

        donestep = jnp.where(
            jnp.logical_and(donestep < 0, new_mode >= M_DONE), t,
            donestep)
        # scalar all-done flag: the while cond must not reduce a vector
        # carry (Mosaic would demand a lane-replicated carry layout,
        # which {0,0} vectors can't relayout to). The cross-lane all()
        # reduce is expensive — poll it only every 16 steps (costs at
        # most 15 no-op trailing steps).
        def poll_done(_):
            return jnp.where(jnp.all(new_mode >= M_DONE),
                             jnp.int32(1), jnp.int32(0))
        alldone = jax.lax.cond(jax.lax.rem(t, 16) == 15, poll_done,
                               lambda _: jnp.int32(0), 0)
        return (t + 1, alldone, new_mode, bitlo, bithi, navail, wpos,
                base, pend, outpos, litword, litcnt, finalf,
                prevlen, fillpos, nlit, ndist, npre, clraw_i,
                stored_rem, new_err, donestep)

    def cond(state):
        t, alldone = state[0], state[1]
        return jnp.logical_and(t < T_PAD, alldone == 0)

    # init via laneid so every carry already has the body's layout
    nz_u = nz.astype(u32)
    init = (jnp.int32(0), jnp.int32(0), nz + M_BLKHDR, nz_u, nz_u,
            nz, nz, nz, nz, nz, nz, nz, nz, nz, nz,
            nz, nz, nz, nz, nz, nz, nneg1)
    final = jax.lax.while_loop(cond, step, init)
    (t_end, _, mode, _, _, _, wpos, _, _, outpos, _, _, _, _, _, _,
     _, _, _, _, err, donestep) = final

    # drain stream-refresh DMA: un-waited iff last issue was at t_end-1
    @pl.when(jnp.logical_and(t_end >= 1,
                             jax.lax.rem(t_end - 1, RPD) == 0))
    def _():
        pltpu.make_async_copy(stream_hbm.at[pl.ds(0, WINR), 0],
                              win_ref.at[:, 0], sems.at[S_ROW]).wait()

    # final staging flush: both slots, fully (simplest correct drain)
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

    errv = jnp.where(mode == M_ERR, 1, 0)
    errv = jnp.where(mode < M_DONE, 2, errv)  # hit T cap
    cnt_ref[0] = errv
    cnt_ref[1] = outpos
    cnt_ref[2] = jnp.where(donestep < 0, t_end, donestep)
    cnt_ref[3] = wpos
    cnt_ref[4] = zero
    cnt_ref[5] = zero
    cnt_ref[6] = zero
    cnt_ref[7] = zero


@functools.partial(jax.jit, static_argnames=("SL", "LN", "W", "T_PAD",
                                             "interpret"))
def _run(stream, hist, fixk3, fixd3, fixf, SL, LN, W, T_PAD,
         interpret=False):
    kern = functools.partial(_kernel, SL=SL, LN=LN, W=W, T_PAD=T_PAD)
    return pl.pallas_call(
        kern,
        interpret=interpret,
        out_shape=(jax.ShapeDtypeStruct((T_PAD, SL, LN), jnp.int32),
                   jax.ShapeDtypeStruct((T_PAD, SL, LN), jnp.int32),
                   jax.ShapeDtypeStruct((8, SL, LN), jnp.int32)),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=(pl.BlockSpec(memory_space=pl.ANY),
                   pl.BlockSpec(memory_space=pl.ANY),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
        scratch_shapes=[
            pltpu.VMEM((WINR, SL, LN), jnp.uint32),    # win
            pltpu.VMEM((NLIT, SL, LN), jnp.int32),     # symkey
            pltpu.VMEM((NDIST, SL, LN), jnp.int32),    # distkey
            pltpu.VMEM((NCL, SL, LN), jnp.int32),      # clkey
            pltpu.VMEM((16, SL, LN), jnp.int32),       # limlit
            pltpu.VMEM((16, SL, LN), jnp.int32),       # firstlit
            pltpu.VMEM((16, SL, LN), jnp.int32),       # cntlit
            pltpu.VMEM((16, SL, LN), jnp.int32),       # limdist
            pltpu.VMEM((16, SL, LN), jnp.int32),       # firstdist
            pltpu.VMEM((16, SL, LN), jnp.int32),       # cntdist
            pltpu.VMEM((16, SL, LN), jnp.int32),       # limcl
            pltpu.VMEM((16, SL, LN), jnp.int32),       # firstcl
            pltpu.VMEM((16, SL, LN), jnp.int32),       # cntcl
            pltpu.VMEM((16, SL, LN), jnp.int32),       # runcl
            pltpu.VMEM((2, CHUNK, SL, LN), jnp.int32),  # stage_tok
            pltpu.VMEM((2, CHUNK, SL, LN), jnp.int32),  # stage_lit
            pltpu.VMEM((1, SL, LN), jnp.int32),        # mintmp
            pltpu.SemaphoreType.DMA((NSEM,)),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(stream, hist, fixk3, fixd3, fixf)


def pack_streams(frames, SL=8, LN=128):
    """Pack per-frame deflate byte streams into the (W, SL, LN) word grid.

    Returns (stream u32 (W, SL, LN), W); frames shorter than L pad with
    empty lanes. Lanes hold words little-endian (LSB-first bit order),
    padded with zeros + WINR guard words.
    """
    L = SL * LN
    assert len(frames) <= L
    maxb = max((len(f) for f in frames), default=1)
    W = max((maxb + 3) // 4 + WINR + 2, WINR + 2)
    arr = np.zeros((L, W), np.uint32)
    for i, f in enumerate(frames):
        b = np.frombuffer(bytes(f) + b"\0" * (-len(f) % 4), np.uint32)
        arr[i, :len(b)] = b
    return np.ascontiguousarray(arr.T).reshape(W, SL, LN), W


def fixed_tables(SL=8, LN=128):
    """Prebuilt fixed-tree tables, broadcast to (rows, SL, LN)."""
    fixk3 = np.ascontiguousarray(np.broadcast_to(
        _FIXK_L[:, None, None], (NLIT, SL, LN)).astype(np.int32))
    fixd3 = np.ascontiguousarray(np.broadcast_to(
        _FIXK_D[:, None, None], (NDIST, SL, LN)).astype(np.int32))
    fixf = np.zeros((16, 4), np.int32)
    fixf[:, 0] = _FIXF_L
    fixf[:, 1] = _FIXL_L
    fixf[:, 2] = _FIXF_D
    fixf[:, 3] = _FIXL_D
    return fixk3, fixd3, fixf


def inflate_phase_a(frames, hists=None, SL=8, LN=128, T_PAD=None,
                    interpret=False):
    """Run phase A on a batch of deflate streams.

    frames: list of bytes (each one complete deflate stream).
    hists: per-frame history bytes available (0 for folder-first
    frames, 32768 otherwise). Returns (tok (T,L), litw (T,L),
    counts (8, L)) as jax arrays (reshaped views of the device
    result).
    """
    L = SL * LN
    stream, W = pack_streams(frames, SL, LN)
    if hists is None:
        hists = [32768] * len(frames)
    hist = np.zeros((SL, LN), np.int32)
    for i, h in enumerate(hists):
        hist[i // LN, i % LN] = h
    if T_PAD is None:
        T_PAD = 18432  # worst case: 16385 literal-pair steps + headers
    T_PAD = ((T_PAD + CHUNK - 1) // CHUNK) * CHUNK
    fixk3, fixd3, fixf = fixed_tables(SL, LN)
    tok, litw, cnt = _run(jnp.asarray(stream), jnp.asarray(hist),
                          jnp.asarray(fixk3), jnp.asarray(fixd3),
                          jnp.asarray(fixf),
                          SL, LN, W, T_PAD, interpret)
    return (tok.reshape(T_PAD, L), litw.reshape(T_PAD, L),
            cnt.reshape(8, L))


def replay_trace(tok_col, litw_col, out_len, hist=b""):
    """Reference phase B in python: resolve one lane's token trace."""
    out = bytearray(hist)
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
            nl = (v >> 25) & 3
            w = int(litw_col[t]) & 0xFFFFFFFF
            for i in range(nl):
                out.append((w >> (8 * i)) & 0xFF)
            ln = (v >> 16) & 0x1FF
            dist = (v & 0x7FFF) + 1
            for _ in range(ln):
                out.append(out[-dist])
        if len(out) - base >= out_len:
            break
    return bytes(out[base:])
