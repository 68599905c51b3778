"""Pallas TPU kernel: device phase B — the token copy machine.

Resolves the (step, lane) token traces emitted by the phase-A entropy
kernels (ops/pallas_inflate.py format) into bytes ON DEVICE, so folder
decode can be device-resident end-to-end (no device->host token pull;
SURVEY §7's pipeline split, productionizing tools/micro_copy.py which
measured 5.8 M tok/s on this core).

Design:
* grid = one program per lane, executed sequentially on the core (TPU
  grid semantics), so lane k may read lane k-1's finished output as
  its 32 KiB history — exactly the MSZIP cross-frame window chain.
* Each lane's working window lives in VMEM as (rows, 128) int32 with
  one BYTE per element (the VPU has no byte lanes; 4x memory, simple
  roll/mask addressing): 256 history rows + 256 output rows.
* The lane's token/litword rows (lane-major (L, T), i.e. the phase-A
  output transposed on device by XLA) DMA into SMEM in chunks; token
  decode is scalar control flow, byte movement is vector roll+mask
  row updates (unaligned 128-byte read/write), with overlap-safe
  available-span doubling for matches.
* Output: each lane writes its 32 KiB slot of (L, 256, 128) int32;
  XLA converts to uint8 and the host (or a device consumer) slices
  folder bytes. Counts: per-lane resolved byte total for validation.

Token format (phase A): -1 NOP; 0x20000000|n = n<=4 literal bytes
LSB-first in litw; 0x40000000|len<<16|(dist-1) = match.
"""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

V = 128           # byte lanes per row
HROWS = 256       # history rows (32 KiB)
OROWS = 256       # output rows (32 KiB)
C8 = 256          # token columns per SMEM chunk row (128-aligned)
CHT = 8 * C8      # tokens per SMEM chunk: DMA'd as an (8, C8) tile —
                  # a (1, CHT) single-row slice violates the (8, 128)
                  # HBM tiling, so the trace is reshaped (L, NB, 8, C8)

TOK_LIT = 0x20000000
TOK_MATCH = 0x40000000


def _kernel(outlen_ref, histf_ref, tok_hbm, litw_hbm,
            out_hbm, cnt_ref,
            win_ref, toksm, litsm, sems, *, L, T):
    i32 = jnp.int32
    idx = jax.lax.broadcasted_iota(i32, (1, V), 1)

    def read2(pos):
        """(1, V) bytes starting at byte offset pos (unaligned)."""
        row = pos // V
        col = pos % V
        a = win_ref[0, pl.ds(row, 1), :]
        b = win_ref[0, pl.ds(row + 1, 1), :]
        back = (V - col) % V
        ar = pltpu.roll(a, back, 1)
        br = pltpu.roll(b, back, 1)
        return jnp.where(idx < V - col, ar, br)

    def write2(pos, val, n):
        row = pos // V
        col = pos % V
        vr = pltpu.roll(val, col % V, 1)
        mask0 = (idx >= col) & (idx < col + n)
        a = win_ref[0, pl.ds(row, 1), :]
        win_ref[0, pl.ds(row, 1), :] = jnp.where(mask0, vr, a)
        mask1 = (idx + V >= col) & (idx + V < col + n)
        b = win_ref[0, pl.ds(row + 1, 1), :]
        win_ref[0, pl.ds(row + 1, 1), :] = jnp.where(mask1, vr, b)

    def lane_body(k, _):
        end = HROWS * V + outlen_ref[k]

        # ---- history: previous lane's output slot, or zeros ---------
        @pl.when(histf_ref[k] > 0)
        def _():
            cp = pltpu.make_async_copy(out_hbm.at[k - 1],
                                       win_ref.at[0, :HROWS],
                                       sems.at[0])
            cp.start()
            cp.wait()

        @pl.when(histf_ref[k] == 0)
        def _():
            win_ref[0, :HROWS] = jnp.zeros((HROWS, V), i32)

        dst = run_lane(k, end)

        cnt_ref[k] = dst - HROWS * V
        cp = pltpu.make_async_copy(win_ref.at[0, pl.ds(HROWS, OROWS)],
                                   out_hbm.at[k], sems.at[0])
        cp.start()
        cp.wait()
        return 0

    def run_lane(k, end):
        def chunk_body(c, dst):
            cp_t = pltpu.make_async_copy(
                tok_hbm.at[k, c], toksm, sems.at[0])
            cp_l = pltpu.make_async_copy(
                litw_hbm.at[k, c], litsm, sems.at[1])
            cp_t.start()
            cp_l.start()
            cp_t.wait()
            cp_l.wait()

            def tok_body(t, dst):
                v = toksm[t // C8, t % C8]
                active = jnp.logical_and(v >= 0, dst < end)

                @pl.when(active & (v < TOK_MATCH))
                def _():
                    # 1..4 literal bytes, LSB-first in the litword
                    w = litsm[t // C8, t % C8]
                    n = v & 7
                    b0 = w & 0xFF
                    b1 = (w >> 8) & 0xFF
                    b2 = (w >> 16) & 0xFF
                    b3 = (w >> 24) & 0xFF
                    val = jnp.where(idx == 0, b0,
                                    jnp.where(idx == 1, b1,
                                              jnp.where(idx == 2, b2,
                                                        jnp.where(
                                                            idx == 3,
                                                            b3, 0))))
                    write2(dst, val, n)

                @pl.when(active & (v >= TOK_MATCH))
                def _():
                    # carried literals first (round-4 kernels stash
                    # <= 3 pending packed literals on match tokens,
                    # bits 25-26)
                    nl = (v >> 25) & 3
                    w = litsm[t // C8, t % C8]
                    @pl.when(nl > 0)
                    def _():
                        b0 = w & 0xFF
                        b1 = (w >> 8) & 0xFF
                        b2 = (w >> 16) & 0xFF
                        val = jnp.where(idx == 0, b0,
                                        jnp.where(idx == 1, b1,
                                                  jnp.where(idx == 2,
                                                            b2, 0)))
                        write2(dst, val, nl)
                    ln = (v >> 16) & 0x1FF
                    dist = (v & 0x7FFF) + 1

                    # fast path: match fits one V-chunk, no overlap —
                    # the common case, skipping the while machinery
                    one = jnp.logical_and(ln <= V, dist >= ln)
                    @pl.when(one)
                    def _():
                        write2(dst + nl, read2(dst + nl - dist), ln)

                    # chunk <= dist keeps [cur-dist, +c) clear of the
                    # destination, so overlapped (repeating) matches
                    # are exact
                    @pl.when(jnp.logical_not(one))
                    def _():
                        def m_chunk(state):
                            cur, rem = state
                            c2 = jnp.minimum(jnp.minimum(rem, V), dist)
                            write2(cur, read2(cur - dist), c2)
                            return cur + c2, rem - c2

                        jax.lax.while_loop(lambda s: s[1] > 0, m_chunk,
                                           (dst + nl, ln))

                dlen = jnp.where(v < 0, 0,
                                 jnp.where(v < TOK_MATCH, v & 7,
                                           ((v >> 16) & 0x1FF)
                                           + ((v >> 25) & 3)))
                return dst + jnp.where(dst < end, dlen, 0)

            return jax.lax.fori_loop(0, CHT, tok_body, dst)

        nchunks = (T + CHT - 1) // CHT
        return jax.lax.fori_loop(0, nchunks, chunk_body,
                                 jnp.int32(HROWS * V))

    # one program, all lanes: per-grid-program entry costs ~ms on this
    # chip, so the lane walk is an in-kernel loop
    jax.lax.fori_loop(0, L, lane_body, 0)


@functools.partial(jax.jit, static_argnames=("L", "T", "interpret"))
def _run(outlens, histfs, tok4, lit4, L, T, interpret=False):
    kern = functools.partial(_kernel, L=L, T=T)
    return pl.pallas_call(
        kern,
        interpret=interpret,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=(pl.BlockSpec(memory_space=pl.ANY),
                   pl.BlockSpec(memory_space=pltpu.SMEM)),
        out_shape=(jax.ShapeDtypeStruct((L, OROWS, V), jnp.int32),
                   jax.ShapeDtypeStruct((L,), jnp.int32)),
        scratch_shapes=[
            pltpu.VMEM((1, HROWS + OROWS + 2, V), jnp.int32),
            pltpu.SMEM((8, C8), jnp.int32),
            pltpu.SMEM((8, C8), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(outlens, histfs, tok4, lit4)


@functools.partial(jax.jit, static_argnames=("Tpad",))
def _to_chunks(tok, litw, Tpad):
    """(T, L) trace -> (L, NB, 8, C8) chunk grid, on device."""
    T, L = tok.shape
    tokT = jnp.transpose(tok)
    litT = jnp.transpose(litw)
    if Tpad != T:
        tokT = jnp.pad(tokT, ((0, 0), (0, Tpad - T)),
                       constant_values=-1)
        litT = jnp.pad(litT, ((0, 0), (0, Tpad - T)))
    nb = Tpad // CHT
    return (tokT.reshape(L, nb, 8, C8), litT.reshape(L, nb, 8, C8))


def resolve_frames_device(tok, litw, out_lens, hist_flags=None,
                          interpret=False, n_steps=None):
    """Resolve phase-A traces on device.

    tok/litw: (T, L) arrays from inflate_phase_a (device or host).
    out_lens: per-lane byte counts (<= 32768). hist_flags[i] nonzero
    means lane i chains on lane i-1's output window (frames of one
    folder on consecutive lanes). n_steps (from phase A's counts row
    2) truncates the token walk to the batch's live rows — T_PAD is
    usually ~3x the actual step count.
    Returns (bytes_u8 (L, 32768) uint8 jax array, counts (L,)).
    """
    T, L = tok.shape
    if n_steps is not None:
        T = min(T, int(n_steps) + 1)
        tok = tok[:T]
        litw = litw[:T]
    Tpad = ((T + CHT - 1) // CHT) * CHT
    tok4, lit4 = _to_chunks(jnp.asarray(tok), jnp.asarray(litw), Tpad)
    outl = np.zeros(L, np.int32)
    outl[:len(out_lens)] = out_lens
    hf = np.zeros(L, np.int32)
    if hist_flags is not None:
        hf[:len(hist_flags)] = hist_flags
    out_i32, cnt = _run(jnp.asarray(outl), jnp.asarray(hf),
                        tok4, lit4, L, Tpad, interpret)
    return (out_i32.reshape(L, OROWS * V).astype(jnp.uint8),
            cnt)


def bench_entry(n_frames=256):
    """Chip benchmark: phase A + device phase B, device-resident."""
    import time
    import zlib

    import jax.numpy as jnp

    from . import pallas_inflate as pa

    from ..utils import bench_corpus
    base = bench_corpus(1 << 20)
    base = base * (1 + (32768 * n_frames) // len(base))
    frames, raws = [], []
    for i in range(n_frames):
        raw = base[i * 32768:(i + 1) * 32768]
        co = zlib.compressobj(6, zlib.DEFLATED, -15)
        frames.append(co.compress(raw) + co.flush())
        raws.append(raw)
    total = sum(len(r) for r in raws)
    t_pad = ((32768 // 2 + 2048 + 127) // 128) * 128
    tok, litw, cnt = pa.inflate_phase_a(frames, hists=[0] * n_frames,
                                        T_PAD=t_pad)
    c = np.asarray(cnt)
    errs = int((c[0, :n_frames] != 0).sum())
    sizes = [len(r) for r in raws]
    n_steps = int(c[2].max())
    out, cnts = resolve_frames_device(tok, litw, sizes,
                                      hist_flags=[0] * n_frames,
                                      n_steps=n_steps)
    outh = np.asarray(out)
    exact = all(outh[i, :len(raws[i])].tobytes() == raws[i]
                for i in (0, n_frames // 2, n_frames - 1))
    cnt_ok = int((np.asarray(cnts)[:n_frames]
                  == np.asarray(sizes)).sum())
    # timing: phase B alone, device-resident token grids
    T, L = tok.shape
    T = min(T, n_steps + 1)
    Tpad = ((T + CHT - 1) // CHT) * CHT
    tok4, lit4 = _to_chunks(jnp.asarray(tok[:T]), jnp.asarray(litw[:T]),
                            Tpad)
    outl = np.zeros(L, np.int32)
    outl[:len(sizes)] = sizes
    hf = jnp.asarray(np.zeros(L, np.int32))
    outl = jnp.asarray(outl)
    tok4.block_until_ready()
    reps = 2
    t0 = time.perf_counter()
    for _ in range(reps):
        o, ct = _run(outl, hf, tok4, lit4, L, Tpad)
        np.asarray(ct[:1])
    dt = (time.perf_counter() - t0) / reps
    return {
        "kernel": "pallas_resolve.phase_b",
        "config": f"{n_frames} lanes x 32 KiB frames, sequential "
                  "per-lane copy machine",
        "bytes_out": total,
        "ms": round(dt * 1e3, 1),
        "mb_per_s": round(total / dt / 1e6, 1),
        "errors": errs, "cnt_ok": cnt_ok,
        "sampled_bit_exact": bool(exact),
    }
