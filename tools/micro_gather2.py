"""Honest microbenchmarks for the Pallas inflate design (see devtime)."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import devtime
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def bench_masksum(SL, LN, N=288):
    """Per-lane table probe via compare/select loop, lanes (SL, LN)."""
    L = SL * LN

    def kernel(tab_ref, x_ref, out_ref):
        idx = x_ref[:]
        acc = jnp.zeros((SL, LN), jnp.int32)
        def body(n, acc):
            row = tab_ref[n].reshape(SL, LN)
            return jnp.where(idx == n, row, acc)
        acc = jax.lax.fori_loop(0, N, body, acc)
        out_ref[:] = (acc + idx) % N

    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((SL, LN), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    key = jax.random.PRNGKey(0)
    tab = jax.random.randint(key, (N, L), 0, N, dtype=jnp.int32)
    idx = jax.random.randint(key, (SL, LN), 0, N, dtype=jnp.int32)
    dt = devtime.time_chained(lambda x: call(tab, x), idx, n=32)
    print(f"mask-sum {N} x {L} lanes: {dt*1e6:.1f} us/probe-step  "
          f"{L/dt/1e6:.1f} M probe/s", flush=True)


def bench_symbol_step(SL, LN, T=64):
    """Mock deflate symbol step iterated T times inside the kernel."""
    L = SL * LN

    def kernel(meta_ref, limit_ref, stream_ref, x_ref, out_ref):
        seed = x_ref[:]

        def step(t, carry):
            bitbuf, acc = carry
            # refill: per-lane word from 32-deep window (mask-sum)
            w = jnp.zeros((SL, LN), jnp.uint32)
            widx = acc & 31
            def rbody(n, w):
                row = stream_ref[n].reshape(SL, LN)
                return jnp.where(widx == n, row, w)
            w = jax.lax.fori_loop(0, 32, rbody, w)
            bitbuf = bitbuf ^ w
            # canonical length find: 14 compares vs per-lane limits
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
            length, code = jax.lax.fori_loop(1, 15, lbody, (length, code),
                                            )
            # meta probe: 288-entry mask-sum
            sidx = (code + length * 7) % 288
            meta = jnp.zeros((SL, LN), jnp.int32)
            def mbody(n, meta):
                row = meta_ref[n].reshape(SL, LN)
                return jnp.where(sidx == n, row, meta)
            meta = jax.lax.fori_loop(0, 288, mbody, meta)
            consume = (length + (meta & 7)).astype(jnp.uint32) & 31
            bitbuf = (bitbuf >> consume) | (bitbuf << (32 - consume))
            return bitbuf, acc + meta

        bitbuf = seed.astype(jnp.uint32)
        acc = seed
        bitbuf, acc = jax.lax.fori_loop(0, T, step, (bitbuf, acc))
        out_ref[:] = acc + bitbuf.astype(jnp.int32)

    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((SL, LN), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    key = jax.random.PRNGKey(0)
    meta = jax.random.randint(key, (288, L), 0, 8, dtype=jnp.int32)
    limit = jax.random.randint(key, (16, L), 1, 1 << 15, dtype=jnp.int32)
    stream = jax.random.randint(key, (32, L), 0, 1 << 30, dtype=jnp.uint32)
    x = jax.random.randint(key, (SL, LN), 0, 100, dtype=jnp.int32)
    dt = devtime.time_chained(lambda v: call(meta, limit, stream, v),
                              x, n=4)
    per_sym = dt / T
    print(f"symbol-step lanes={L}: {per_sym*1e9:.0f} ns/step  "
          f"{L/per_sym/1e6:.1f} M sym/s  (~{L*4/per_sym/1e6:.0f} MB/s "
          f"at 4B/sym)", flush=True)


def bench_xla_ptr_double(H, LN):
    """Phase B pointer doubling: take_along_axis rounds."""
    key = jax.random.PRNGKey(0)
    p0 = jax.random.randint(key, (H, LN), 0, H, dtype=jnp.int32)

    def step(p):
        return jnp.take_along_axis(p, p, axis=0)

    dt = devtime.time_chained(step, p0, n=8)
    el = H * LN
    print(f"XLA taa axis0 ({H},{LN}): {dt*1e3:.3f} ms/round  "
          f"{el/dt/1e9:.2f} G elem/s", flush=True)


def bench_xla_flat_take(T, H):
    key = jax.random.PRNGKey(0)
    tab = jax.random.randint(key, (H,), 0, T, dtype=jnp.int32)
    i0 = jax.random.randint(key, (T,), 0, H, dtype=jnp.int32)
    def step(i):
        return jnp.take(tab, i) % H
    dt = devtime.time_chained(step, i0, n=8)
    print(f"XLA flat take {T} from {H}: {dt*1e3:.3f} ms  "
          f"{T/dt/1e6:.1f} M probe/s", flush=True)


if __name__ == "__main__":
    devtime.warmup()
    print("warm", flush=True)
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "mask"):
        bench_masksum(8, 128)
        bench_masksum(8, 1024)
        pass
    if which in ("all", "sym"):
        bench_symbol_step(8, 1024)
        bench_symbol_step(8, 2048)
    if which in ("all", "xla"):
        bench_xla_ptr_double(32768, 128)
        bench_xla_ptr_double(32768, 1024)
        bench_xla_flat_take(1 << 20, 1 << 15)
