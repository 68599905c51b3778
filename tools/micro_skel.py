"""Skeleton benchmark for the Pallas lane-parallel entropy kernel.

Validates + times the three cost centers before the real kernel is
built on them:
  1. per-lane stream refill: HBM (L, W) streams -> per-lane-aligned
     64-word VMEM windows via round-robin column DMA, probe by
     mask-sum sweep over the window rows,
  2. the canonical-Huffman step (limit compare + key-equality sweep),
  3. token emission row-per-step.

Run: python tools/micro_skel.py [L] [steps]
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import devtime
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

WIN = 64          # words per per-lane VMEM window
G = 16            # lanes refreshed per step


def make_kernel(SL, LN, T, interpret=False):
    L = SL * LN

    def kernel(stream_hbm, seed_ref, out_ref, cnt_ref,
               win_ref, base_ref, sems):
        rowi = jax.lax.broadcasted_iota(jnp.int32, (SL, LN), 0)
        coli = jax.lax.broadcasted_iota(jnp.int32, (SL, LN), 1)
        laneid = rowi * LN + coli

        def extract(vec, g):
            return jnp.sum(jnp.where(laneid == g, vec, 0))

        def step(t, carry):
            bitlo, bithi, navail, wpos, acc = carry

            # ---- refresh schedule: G lanes, realigned to their wpos
            def refresh(i, _):
                g = (t * G + i) % L
                # wait previous DMA on this sem slot (skip t==0)
                @pl.when(t > 0)
                def _():
                    pltpu.make_async_copy(
                        stream_hbm.at[0, pl.ds(0, WIN)],
                        win_ref.at[:, 0], sems.at[i]).wait()
                w = extract(wpos, g)
                dma = pltpu.make_async_copy(
                    stream_hbm.at[g, pl.ds(w, WIN)],
                    win_ref.at[:, g], sems.at[i])
                dma.start()
                # publish new base for lane g (visible AFTER completion;
                # one-visit lag handled by base2)
                base_ref[0, g] = w
                return 0

            jax.lax.fori_loop(0, G, refresh, 0, unroll=True)

            # ---- fetch: conditional one-word refill from window
            need = navail <= 31
            off = wpos - base_ref[0, :].reshape(SL, LN)
            w = jnp.zeros((SL, LN), jnp.uint32)
            def sweep(n, w):
                return jnp.where(off == n, win_ref[n].reshape(SL, LN), w)
            w = jax.lax.fori_loop(0, WIN, sweep, w)
            bitlo = jnp.where(need & (navail == 0), w, bitlo)
            shift = jnp.where(navail > 0, navail, 1).astype(jnp.uint32)
            bithi = jnp.where(need & (navail > 0),
                              bithi | (w >> (32 - shift) << 0), bithi)
            navail = jnp.where(need, navail + 32, navail)
            wpos = wpos + need.astype(jnp.int32)

            # ---- mock canonical decode: lenfind (15) + key sweep (288)
            peek = (bitlo & 0x7FFF).astype(jnp.int32)
            length = jnp.full((SL, LN), 15, jnp.int32)
            code = jnp.zeros((SL, LN), jnp.int32)
            def lbody(bl, lc):
                ln_, c_ = lc
                c = peek >> (15 - bl)
                hit = (c < (bl * 37) % 97) & (ln_ == 15)
                return jnp.where(hit, bl, ln_), jnp.where(hit, c, c_)
            length, code = jax.lax.fori_loop(1, 15, lbody, (length, code))
            key = (length << 16) | code
            sym = jnp.zeros((SL, LN), jnp.int32)
            def kbody(n, sym):
                return jnp.where(key == (n * 1315423911) % (1 << 20),
                                 jnp.full((SL, LN), n, jnp.int32), sym)
            sym = jax.lax.fori_loop(0, 288, kbody, sym)

            consume = (sym % 15 + 1).astype(jnp.uint32)
            bitlo = (bitlo >> consume) | (bithi << (32 - consume))
            bithi = bithi >> consume
            navail = navail - consume.astype(jnp.int32)

            # ---- token emit, row-per-step
            out_ref[t % 256] = sym + acc
            return bitlo, bithi, navail, wpos, acc + sym

        init = (seed_ref[:].astype(jnp.uint32),
                jnp.zeros((SL, LN), jnp.uint32),
                jnp.zeros((SL, LN), jnp.int32),
                jnp.zeros((SL, LN), jnp.int32),
                seed_ref[:])
        carry = jax.lax.fori_loop(0, T, step, init)
        # drain sems
        def drain(i, _):
            pltpu.make_async_copy(stream_hbm.at[0, pl.ds(0, WIN)],
                                  win_ref.at[:, 0], sems.at[i]).wait()
            return 0
        jax.lax.fori_loop(0, G, drain, 0, unroll=True)
        cnt_ref[:] = carry[4] + carry[3]

    @jax.jit
    def run(stream, seed):
        out, cnt = pl.pallas_call(
            kernel,
            interpret=interpret,
            out_shape=(jax.ShapeDtypeStruct((256, SL, LN), jnp.int32),
                       jax.ShapeDtypeStruct((SL, LN), jnp.int32)),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                       pl.BlockSpec(memory_space=pltpu.VMEM)),
            scratch_shapes=[
                pltpu.VMEM((WIN, L), jnp.uint32),
                pltpu.SMEM((1, L), jnp.int32),
                pltpu.SemaphoreType.DMA((G,)),
            ],
        )(stream, seed)
        return cnt

    return run


def main():
    L = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    T = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    SL, LN = 8, L // 8
    W = 4096
    devtime.warmup()
    print("warm", flush=True)
    key = jax.random.PRNGKey(0)
    stream = jax.random.randint(key, (L, W), 0, 1 << 30, dtype=jnp.uint32)
    run = make_kernel(SL, LN, T)
    seed = jnp.zeros((SL, LN), jnp.int32)
    try:
        dt = devtime.time_chained(lambda s: run(stream, s), seed, n=4)
    except Exception as e:
        print("FAIL", type(e).__name__, str(e)[:400], flush=True)
        return
    per_step = dt / T
    print(f"L={L}: {per_step*1e6:.2f} us/step  "
          f"{L/per_step/1e6:.1f} M lane-steps/s  "
          f"(~{L*2.2/per_step/1e6:.0f} MB/s at 2.2 B/step)", flush=True)


if __name__ == "__main__":
    main()
