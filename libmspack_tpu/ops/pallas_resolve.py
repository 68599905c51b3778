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
CHT = 2048        # tokens per SMEM chunk

TOK_LIT = 0x20000000
TOK_MATCH = 0x40000000


def _kernel(outlen_ref, histf_ref, tok_hbm, litw_hbm,
            out_hbm, cnt_ref,
            win_ref, toksm, litsm, sems, *, L, T):
    k = pl.program_id(0)
    i32 = jnp.int32
    idx = jax.lax.broadcasted_iota(i32, (1, V), 1)

    # ---- history: previous lane's output slot, or zeros -------------
    @pl.when(histf_ref[k] > 0)
    def _():
        cp = pltpu.make_async_copy(out_hbm.at[k - 1], win_ref.at[0, :HROWS],
                                   sems.at[0])
        cp.start()
        cp.wait()

    @pl.when(histf_ref[k] == 0)
    def _():
        win_ref[0, :HROWS] = jnp.zeros((HROWS, V), i32)

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

    end = HROWS * V + outlen_ref[k]

    def chunk_body(c, dst):
        cp_t = pltpu.make_async_copy(
            tok_hbm.at[k, pl.ds(c * CHT, CHT)], toksm, sems.at[0])
        cp_l = pltpu.make_async_copy(
            litw_hbm.at[k, pl.ds(c * CHT, CHT)], litsm, sems.at[1])
        cp_t.start()
        cp_l.start()
        cp_t.wait()
        cp_l.wait()

        def tok_body(t, dst):
            v = toksm[t]
            active = jnp.logical_and(v >= 0, dst < end)

            @pl.when(active & (v < TOK_MATCH))
            def _():
                # 1..4 literal bytes, LSB-first in the litword
                w = litsm[t]
                n = v & 7
                b0 = w & 0xFF
                b1 = (w >> 8) & 0xFF
                b2 = (w >> 16) & 0xFF
                b3 = (w >> 24) & 0xFF
                val = jnp.where(idx == 0, b0,
                                jnp.where(idx == 1, b1,
                                          jnp.where(idx == 2, b2,
                                                    jnp.where(idx == 3,
                                                              b3, 0))))
                write2(dst, val, n)

            @pl.when(active & (v >= TOK_MATCH))
            def _():
                ln = (v >> 16) & 0x1FF
                dist = (v & 0x7FFF) + 1

                # chunk <= dist keeps [cur-dist, +c) clear of the
                # destination, so overlapped (repeating) matches are
                # exact; the prototype's span-doubling broke once
                # chunks were V-capped (len up to 258 > V)
                def m_chunk(state):
                    cur, rem = state
                    c2 = jnp.minimum(jnp.minimum(rem, V), dist)
                    write2(cur, read2(cur - dist), c2)
                    return cur + c2, rem - c2

                jax.lax.while_loop(lambda s: s[1] > 0, m_chunk,
                                   (dst, ln))

            dlen = jnp.where(v < 0, 0,
                             jnp.where(v < TOK_MATCH, v & 7,
                                       (v >> 16) & 0x1FF))
            return dst + jnp.where(dst < end, dlen, 0)

        return jax.lax.fori_loop(0, CHT, tok_body, dst)

    nchunks = (T + CHT - 1) // CHT
    dst = jax.lax.fori_loop(0, nchunks, chunk_body,
                            jnp.int32(HROWS * V))

    cnt_ref[:] = jnp.zeros((1, 8, V), jnp.int32)
    cnt_ref[0, 0, 0] = dst - HROWS * V

    cp = pltpu.make_async_copy(win_ref.at[0, pl.ds(HROWS, OROWS)],
                               out_hbm.at[k], sems.at[0])
    cp.start()
    cp.wait()


@functools.partial(jax.jit, static_argnames=("L", "T", "interpret"))
def _run(outlens, histfs, tokT, litT, L, T, interpret=False):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(L,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=(pl.BlockSpec(memory_space=pl.ANY),
                   pl.BlockSpec((1, 8, V), lambda k, *_: (k, 0, 0),
                                memory_space=pltpu.VMEM)),
        scratch_shapes=[
            pltpu.VMEM((1, HROWS + OROWS + 2, V), jnp.int32),
            pltpu.SMEM((CHT,), jnp.int32),
            pltpu.SMEM((CHT,), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kern = functools.partial(_kernel, L=L, T=T)
    return pl.pallas_call(
        kern,
        interpret=interpret,
        grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct((L, OROWS, V), jnp.int32),
                   jax.ShapeDtypeStruct((L, 8, V), jnp.int32)),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(outlens, histfs, tokT, litT)


def resolve_frames_device(tok, litw, out_lens, hist_flags=None,
                          interpret=False):
    """Resolve phase-A traces on device.

    tok/litw: (T, L) arrays from inflate_phase_a (device or host).
    out_lens: per-lane byte counts (<= 32768). hist_flags[i] nonzero
    means lane i chains on lane i-1's output window (frames of one
    folder on consecutive lanes).
    Returns (bytes_u8 (L, 32768) uint8 jax array, counts (L,)).
    """
    T, L = tok.shape
    Tpad = ((T + CHT - 1) // CHT) * CHT
    tokT = jnp.transpose(jnp.asarray(tok))
    litT = jnp.transpose(jnp.asarray(litw))
    if Tpad != T:
        tokT = jnp.pad(tokT, ((0, 0), (0, Tpad - T)),
                       constant_values=-1)
        litT = jnp.pad(litT, ((0, 0), (0, Tpad - T)))
    outl = np.zeros(L, np.int32)
    outl[:len(out_lens)] = out_lens
    hf = np.zeros(L, np.int32)
    if hist_flags is not None:
        hf[:len(hist_flags)] = hist_flags
    out_i32, cnt = _run(jnp.asarray(outl), jnp.asarray(hf),
                        tokT, litT, L, Tpad, interpret)
    return (out_i32.reshape(L, OROWS * V).astype(jnp.uint8),
            cnt[:, 0, 0])
