"""Micro-probe: vectorized whole-table ops vs fori-loop row sweeps.

Decides the round-4 phase-A kernel mechanics: today's per-lane table
lookups loop over rows (one dynamic VMEM row load per iteration,
measured ~scalar-bound); the candidate replaces each sweep with one
whole-array compare + axis-0 reduce on the (R, SL, LN) table.

Also measures XLA gather (jnp.take / take_along_axis) throughput on
the device, which bounds a pointer-doubling phase B.

Run on the real TPU: python tools/micro_vec.py
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import devtime

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SL, LN = 8, 128
R_TAB = 288
R_WIN = 256
STEPS = 64


def make_kernel(variant):
    def kernel(seed_ref, out_ref, tab, win):
        i32 = jnp.int32
        rowi = jax.lax.broadcasted_iota(i32, (SL, LN), 0)
        coli = jax.lax.broadcasted_iota(i32, (SL, LN), 1)
        laneid = rowi * LN + coli

        # fill tables so lookups hit varying rows
        def fill(n, _):
            tab[n] = (laneid * 7 + n * 13) & 0xFFFF
            return 0
        jax.lax.fori_loop(0, R_TAB, fill, 0)
        def fillw(n, _):
            win[n] = laneid + n
            return 0
        jax.lax.fori_loop(0, R_WIN, fillw, 0)

        rtab3 = jax.lax.broadcasted_iota(i32, (R_TAB, SL, LN), 0)
        rwin3 = jax.lax.broadcasted_iota(i32, (R_WIN, SL, LN), 0)

        def step(t, acc):
            key = ((acc * 5 + t) & 0xFFFF)
            off = (acc + t) & (R_WIN - 1)
            if variant == "sweep":
                s = laneid & 0
                def body(n, s):
                    return jnp.where(key == tab[n], n, s)
                sym = jax.lax.fori_loop(0, R_TAB, body, s)
                w = laneid & 0
                def bw(n, w):
                    return jnp.where(off == n, win[n], w)
                wv = jax.lax.fori_loop(0, R_WIN, bw, w)
            else:
                t3 = tab[:]
                sym = jnp.max(jnp.where(t3 == key[None], rtab3, -1),
                              axis=0)
                w3 = win[:]
                wv = jnp.sum(jnp.where(rwin3 == off[None], w3, 0),
                             axis=0)
            return (acc + sym + wv) & 0x7FFF

        acc = jax.lax.fori_loop(0, STEPS, step, laneid)
        out_ref[0] = acc

    return kernel


def run_variant(variant):
    @jax.jit
    def go(seed):
        return pl.pallas_call(
            make_kernel(variant),
            out_shape=jax.ShapeDtypeStruct((1, SL, LN), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((R_TAB, SL, LN), jnp.int32),
                pltpu.VMEM((R_WIN, SL, LN), jnp.int32),
            ],
        )(seed)

    seed = jnp.zeros((1, SL, LN), jnp.int32)
    dt = devtime.time_chained(lambda x: go(x[:1] + x[:1] * 0), seed, n=8)
    per_step = dt / STEPS
    print(f"{variant}: {dt*1e3:.3f} ms/call, {per_step*1e6:.2f} us/step "
          f"({R_TAB}-row probe + {R_WIN}-row fetch per step)", flush=True)
    return per_step


def gather_bench():
    n = 1 << 25
    rng = np.random.RandomState(0)
    src = jnp.asarray(rng.randint(0, 1 << 20, n, dtype=np.int32))

    @jax.jit
    def hop(x):
        return jnp.take(x, jnp.clip(x, 0, n - 1))

    dt = devtime.time_chained(hop, src, n=4)
    print(f"take flat: {n} elems in {dt*1e3:.1f} ms -> "
          f"{n/dt/1e6:.0f} M elem/s", flush=True)

    B, S = 1024, 65536
    src2 = jnp.asarray(rng.randint(0, S, (B, S), dtype=np.int32))

    @jax.jit
    def hop2(x):
        return jnp.take_along_axis(x, jnp.clip(x, 0, S - 1), axis=1)

    dt2 = devtime.time_chained(hop2, src2, n=4)
    print(f"take_along_axis (1024,65536): {B*S} elems in {dt2*1e3:.1f} ms"
          f" -> {B*S/dt2/1e6:.0f} M elem/s", flush=True)


def main():
    devtime.warmup()
    print("device:", jax.devices()[0], flush=True)
    run_variant("sweep")
    run_variant("vec")
    gather_bench()


if __name__ == "__main__":
    main()
