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
            back = (V - col) % V
            ar = pltpu.roll(a, back, 1)
            br = pltpu.roll(b, back, 1)
            return jnp.where(idx < V - col, ar, br)

        def write2(ref, pos, val, n):
            row = pos // V
            col = pos % V
            vr = pltpu.roll(val, col % V, 1)
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

            @pl.when(kind == 0)
            def _():
                # literal runs: linear source, chunk by V
                def lit_chunk(state):
                    cur, rem = state
                    c = jnp.minimum(rem, V)
                    write2(out_ref, cur, read2(lit_ref, lsrc + cur - dst), c)
                    return cur + c, rem - c
                jax.lax.while_loop(lambda s: s[1] > 0, lit_chunk, (dst, ln))

            @pl.when(kind != 0)
            def _():
                # match: overlap-safe doubling (chunk <= available span)
                def m_chunk(state):
                    cur, rem, avail = state
                    c = jnp.minimum(jnp.minimum(rem, V), avail)
                    write2(out_ref, cur, read2(out_ref, cur - avail), c)
                    return cur + c, rem - c, avail + c
                jax.lax.while_loop(lambda s: s[1] > 0, m_chunk,
                                   (dst, ln, dist))

            return (dst + ln, jnp.where(kind == 0, lsrc + ln, lsrc))

        dst, lsrc = jax.lax.fori_loop(
            0, NT, body, (seed_ref[0], jnp.int32(0)))
        sc_ref[0] = dst

    interp = bool(int(os.environ.get("MC_INTERP", "0")))

    @jax.jit
    def run(seed, tok, lit):
        out, sc = pl.pallas_call(
            kernel,
            interpret=interp,
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
    # correctness: replay on host
    win = np.zeros(FRAME + 512, np.int32)
    lit_flat = np.asarray(lit).reshape(-1)
    dstp = 0
    lsrc = 0
    for k, ln, d in toks:
        if k == 0:
            win[dstp : dstp + ln] = lit_flat[lsrc : lsrc + ln]
            lsrc += ln
        else:
            for i in range(ln):
                win[dstp + i] = win[dstp + i - d]
        dstp += ln
    out, sc = run(jnp.zeros((1,), jnp.int32), tok, lit)
    got = np.asarray(out).reshape(-1)[:dstp]
    print("correct:", np.array_equal(got, win[:dstp]),
          "sc:", int(np.asarray(sc)[0]), dstp, flush=True)
    dt = devtime.time_chained(
        lambda s: run(s, tok, lit)[1], jnp.zeros((1,), jnp.int32), n=16)
    print(f"resolve: {NT} tokens ({out_bytes} B) per call: "
          f"{dt*1e3:.3f} ms -> {NT/dt/1e6:.2f} M tok/s, "
          f"{out_bytes/dt/1e6:.1f} MB/s/core", flush=True)


if __name__ == "__main__":
    main()
