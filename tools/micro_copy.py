"""Prototype: Pallas scalar token-copy machine for LZ match resolve.

Per frame: walk tokens sequentially; literal runs come from a staged
literal byte array (vector copy); matches copy from the in-progress
window at dynamic offsets. Measures tokens/s and bytes/s on one core.
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import devtime
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

FRAME = 32768
V = 128


def make_resolver(NT):
    ROWS = FRAME // V

    def kernel(seed_ref, tok_ref, lit_ref, out_ref, sc_ref):
        idx = jax.lax.broadcasted_iota(jnp.int32, (1, V), 1)

        def read2(ref, pos):
            """(1,V) bytes starting at byte offset pos (unaligned)."""
            row = pos // V
            col = pos % V
            a = ref[pl.ds(row, 1), :]
            b = ref[pl.ds(row + 1, 1), :]
            ar = pltpu.roll(a, -col, 1)
            br = pltpu.roll(b, -col, 1)
            return jnp.where(idx < V - col, ar, br)

        def write2(ref, pos, val, n):
            row = pos // V
            col = pos % V
            vr = pltpu.roll(val, col, 1)
            mask0 = (idx >= col) & (idx < col + n)
            a = ref[pl.ds(row, 1), :]
            ref[pl.ds(row, 1), :] = jnp.where(mask0, vr, a)
            mask1 = (idx + V >= col) & (idx + V < col + n)
            b = ref[pl.ds(row + 1, 1), :]
            ref[pl.ds(row + 1, 1), :] = jnp.where(mask1, vr, b)

        def body(t, carry):
            dst, lsrc = carry
            kind = tok_ref[t, 0]
            ln = tok_ref[t, 1]
            dist = tok_ref[t, 2]
            src = jnp.where(kind == 0, lsrc, dst - dist)

            def lit_case():
                write2(out_ref, dst, read2(lit_ref, lsrc), ln)

            def match_case():
                write2(out_ref, dst, read2(out_ref, src), ln)

            jax.lax.cond(kind == 0, lit_case, match_case)
            return (dst + ln, jnp.where(kind == 0, lsrc + ln, lsrc))

        dst, lsrc = jax.lax.fori_loop(
            0, NT, body, (seed_ref[0], jnp.int32(0)))
        sc_ref[0] = dst

    @jax.jit
    def run(seed, tok, lit):
        out, sc = pl.pallas_call(
            kernel,
            out_shape=(jax.ShapeDtypeStruct((ROWS + 2, V), jnp.int32),
                       jax.ShapeDtypeStruct((1,), jnp.int32)),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                       pl.BlockSpec(memory_space=pltpu.SMEM)),
        )(seed, tok, lit)
        return out, sc
    return run


def main():
    devtime.warmup()
    print("warm", flush=True)
    rng = np.random.RandomState(0)
    toks = []
    dst = 0
    while True:
        if dst < 64 or rng.rand() < 0.55:
            ln = int(rng.randint(4, 60))
            toks.append((0, ln, 0))
        else:
            ln = int(rng.randint(3, min(60, V)))
            d = int(rng.randint(1, min(dst, 2000)))
            toks.append((1, ln, d))
        dst += ln
        if dst > FRAME - 200:
            break
    NT = len(toks)
    out_bytes = dst
    tok = jnp.asarray(np.asarray(toks, np.int32))
    lit = jnp.asarray(rng.randint(0, 255, (FRAME // V + 2, V))
                      .astype(np.int32))
    run = make_resolver(NT)
    dt = devtime.time_chained(
        lambda s: run(s, tok, lit)[1], jnp.zeros((1,), jnp.int32), n=16)
    print(f"resolve: {NT} tokens ({out_bytes} B) per call: "
          f"{dt*1e3:.3f} ms -> {NT/dt/1e6:.2f} M tok/s, "
          f"{out_bytes/dt/1e6:.1f} MB/s/core", flush=True)


if __name__ == "__main__":
    main()
