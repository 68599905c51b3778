"""Microbenchmark: per-lane gather strategies on TPU for entropy decode.

Decides the architecture of the Pallas inflate kernel: which primitive
serves (a) per-lane Huffman table probes, (b) per-lane stream refill,
(c) phase-B pointer doubling. Run on the real chip:

    python tools/micro_gather.py
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timeit(fn, *args, n=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


# ---------------------------------------------------------------- XLA paths
def xla_taa_axis0(table, idx):
    return jnp.take_along_axis(table, idx, axis=0)


def xla_flat_take(table_flat, idx_flat):
    return jnp.take(table_flat, idx_flat)


def bench_xla():
    print("== XLA gathers ==")
    for H, L in [(32768, 128), (32768, 1024), (288, 1024), (1024, 1024)]:
        key = jax.random.PRNGKey(0)
        table = jax.random.randint(key, (H, L), 0, H, dtype=jnp.int32)
        idx = jax.random.randint(key, (H, L), 0, H, dtype=jnp.int32)
        f = jax.jit(xla_taa_axis0)
        dt = timeit(f, table, idx)
        el = H * L
        print(f"  taa axis0 ({H},{L}): {dt*1e3:.3f} ms  "
              f"{el/dt/1e9:.2f} G elem/s")
    # flat take: 1024 lanes probing a shared flat table
    table = jnp.arange(32768, dtype=jnp.int32)
    idx = jax.random.randint(jax.random.PRNGKey(1), (1024,), 0, 32768,
                             dtype=jnp.int32)
    f = jax.jit(xla_flat_take)
    dt = timeit(f, table, idx)
    print(f"  flat take (1024 from 32768): {dt*1e3:.3f} ms "
          f"{1024/dt/1e6:.2f} M probe/s")


# ------------------------------------------------------------- Pallas paths
def pallas_dyngather_axis0(H, L, dtype=jnp.int32):
    def kernel(t_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(t_ref[:], i_ref[:], axis=0)

    @jax.jit
    def run(t, i):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((H, L), dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(t, i)
    return run


def pallas_dyngather_axis1(H, L, dtype=jnp.int32):
    def kernel(t_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(t_ref[:], i_ref[:], axis=1)

    @jax.jit
    def run(t, i):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((H, L), dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(t, i)
    return run


def bench_pallas_gather():
    print("== Pallas dynamic_gather ==")
    for axis, H, L in [(0, 8, 128), (0, 16, 128), (0, 32, 128),
                       (0, 288, 128), (0, 1024, 128), (0, 4096, 128),
                       (0, 32768, 128),
                       (0, 288, 1024), (0, 1024, 1024),
                       (1, 8, 128), (1, 8, 1024), (1, 64, 128)]:
        key = jax.random.PRNGKey(0)
        t = jax.random.randint(key, (H, L), 0, 100, dtype=jnp.int32)
        lim = H if axis == 0 else L
        i = jax.random.randint(key, (H, L), 0, lim, dtype=jnp.int32)
        try:
            run = (pallas_dyngather_axis0 if axis == 0
                   else pallas_dyngather_axis1)(H, L)
            dt = timeit(run, t, i)
            el = H * L
            print(f"  dg axis{axis} ({H},{L}): {dt*1e3:.3f} ms  "
                  f"{el/dt/1e9:.2f} G elem/s")
        except Exception as e:
            print(f"  dg axis{axis} ({H},{L}): FAIL {type(e).__name__} "
                  f"{str(e)[:90]}")


def bench_pallas_masksum():
    """288-entry per-lane table probe via compare/select loop; L lanes."""
    print("== Pallas mask-sum probe (288-entry per-lane tables) ==")
    for SL, LN in [(8, 128), (8, 1024)]:   # lanes shaped (SL, LN)
        L = SL * LN
        N = 288

        def kernel(tab_ref, idx_ref, out_ref):
            idx = idx_ref[:]
            acc = jnp.zeros((SL, LN), jnp.int32)
            def body(n, acc):
                row = tab_ref[n].reshape(SL, LN)
                return jnp.where(idx == n, row, acc)
            acc = jax.lax.fori_loop(0, N, body, acc)
            out_ref[:] = acc

        @jax.jit
        def run(tab, idx):
            return pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((SL, LN), jnp.int32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(tab, idx)

        key = jax.random.PRNGKey(0)
        tab = jax.random.randint(key, (N, L), 0, 288, dtype=jnp.int32)
        idx = jax.random.randint(key, (SL, LN), 0, N, dtype=jnp.int32)
        try:
            dt = timeit(run, tab, idx)
            print(f"  mask-sum 288 x {L} lanes: {dt*1e3:.3f} ms  "
                  f"{L/dt/1e6:.1f} M probe/s")
        except Exception as e:
            print(f"  mask-sum {L}: FAIL {type(e).__name__} {str(e)[:90]}")


def bench_symbol_step():
    """Mock deflate symbol step: canonical len-find (15 iters) +
    per-lane meta probe (288 mask-sum) + refill probe (32 mask-sum),
    iterated T times. Measures achievable symbols/s."""
    print("== Pallas mock symbol step ==")
    SL, LN = 8, 1024
    L = SL * LN
    T = 256  # symbols per kernel call

    def kernel(meta_ref, limit_ref, stream_ref, out_ref):
        bitbuf = jnp.zeros((SL, LN), jnp.uint32)
        navail = jnp.zeros((SL, LN), jnp.int32)
        widx = jnp.zeros((SL, LN), jnp.int32)
        acc = jnp.zeros((SL, LN), jnp.int32)

        def step(t, carry):
            bitbuf, navail, widx, acc = carry
            # refill: fetch word widx per lane from 32-deep window
            w = jnp.zeros((SL, LN), jnp.uint32)
            def rbody(n, w):
                row = stream_ref[n].reshape(SL, LN)
                return jnp.where((widx & 31) == n, row, w)
            w = jax.lax.fori_loop(0, 32, rbody, w)
            bitbuf = bitbuf | (w << navail.astype(jnp.uint32))
            navail = jnp.minimum(navail + 32, 32)
            # canonical length find: 15 compares against per-len limits
            peek = (bitbuf & 0x7FFF).astype(jnp.int32)
            length = jnp.full((SL, LN), 15, jnp.int32)
            code = jnp.zeros((SL, LN), jnp.int32)
            def lbody(bl, lc):
                length, code = lc
                c = peek >> (15 - bl)
                lim = limit_ref[bl].reshape(SL, LN)
                hit = (c < lim) & (length == 15)
                return (jnp.where(hit, bl, length),
                        jnp.where(hit, c, code))
            length, code = jax.lax.fori_loop(1, 15, lbody, (length, code))
            # meta probe: 288-entry mask-sum
            sidx = (code + length * 7) % 288
            meta = jnp.zeros((SL, LN), jnp.int32)
            def mbody(n, meta):
                row = meta_ref[n].reshape(SL, LN)
                return jnp.where(sidx == n, row, meta)
            meta = jax.lax.fori_loop(0, 288, mbody, meta)
            consume = (length + (meta & 7)).astype(jnp.uint32)
            bitbuf = bitbuf >> consume
            navail = navail - consume.astype(jnp.int32)
            widx = widx + 1
            return bitbuf, navail, widx, acc + meta

        bitbuf, navail, widx, acc = jax.lax.fori_loop(
            0, T, step, (bitbuf, navail, widx, acc))
        out_ref[:] = acc

    @jax.jit
    def run(meta, limit, stream):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((SL, LN), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(meta, limit, stream)

    key = jax.random.PRNGKey(0)
    meta = jax.random.randint(key, (288, L), 0, 8, dtype=jnp.int32)
    limit = jax.random.randint(key, (16, L), 1, 1 << 15, dtype=jnp.int32)
    stream = jax.random.randint(key, (32, L), 0, 1 << 30,
                                dtype=jnp.uint32)
    try:
        dt = timeit(run, meta, limit, stream, n=10)
        sym = T * L
        print(f"  {sym} symbols in {dt*1e3:.3f} ms = "
              f"{sym/dt/1e6:.1f} M sym/s "
              f"(~{sym*4/dt/1e6:.0f} MB/s at 4 B/sym)")
    except Exception as e:
        print(f"  FAIL {type(e).__name__} {str(e)[:200]}")


if __name__ == "__main__":
    print("devices:", jax.devices())
    bench_xla()
    bench_pallas_gather()
    bench_pallas_masksum()
    bench_symbol_step()
