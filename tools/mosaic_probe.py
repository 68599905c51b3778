"""Bisect Mosaic layout errors: compile mini-kernels per construct.

Each probe exercises one construct used by ops/pallas_inflate.py; run
on the chip to find which one triggers the 'Invalid relayout ... {0,*}'
failure. Usage: python tools/mosaic_probe.py [name ...]
"""
import sys
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SL, LN = 8, 128


def run(name, kernel, scratch=(), n_in=1):
    xs = [jnp.ones((SL, LN), jnp.int32) for _ in range(n_in)]
    try:
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((SL, LN), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * n_in,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=list(scratch),
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(*xs)
        np.asarray(out)
        print(f"{name}: OK")
    except Exception as e:
        msg = str(e).split("\n")[0][:160]
        print(f"{name}: FAIL {msg}")


def probe_reduce_pred(x_ref, o_ref):
    v = x_ref[:]
    @pl.when(jnp.any(v > 0))
    def _():
        o_ref[:] = v + 1


def probe_cond_vec(x_ref, o_ref):
    laneid = jax.lax.broadcasted_iota(jnp.int32, (SL, LN), 1)
    nneg1 = (laneid & 0) - 1
    def t(_):
        def body(n, s):
            return jnp.where(x_ref[:] == n, n, s)
        return jax.lax.fori_loop(0, 8, body, nneg1)
    v = jax.lax.cond(jnp.any(x_ref[:] > 0), t, lambda _: nneg1, 0)
    o_ref[:] = v


def probe_while22(x_ref, o_ref):
    laneid = jax.lax.broadcasted_iota(jnp.int32, (SL, LN), 1)
    nz = laneid & 0
    def body(st):
        t = st[0]
        rest = [r + t for r in st[1:]]
        return (t + 1, *rest)
    def cond(st):
        return st[0] < 3
    init = (jnp.int32(0),) + tuple(nz for _ in range(21))
    fin = jax.lax.while_loop(cond, body, init)
    o_ref[:] = fin[1]


def probe_table_rw(x_ref, o_ref, tab):
    def wr(n, _):
        tab[n] = jnp.where(x_ref[:] == n, n, tab[n])
        return 0
    jax.lax.fori_loop(0, 16, wr, 0)
    v = jnp.zeros((SL, LN), jnp.int32)
    def rd(n, v):
        return jnp.where(x_ref[:] == n, tab[n], v)
    o_ref[:] = jax.lax.fori_loop(0, 16, rd, v)


def probe_stage_store(x_ref, o_ref, stage):
    t = jnp.sum(x_ref[0, 0])
    row = jax.lax.rem(t, 4)
    slot = jax.lax.rem(t // 4, 2)
    stage[slot, row] = x_ref[:]
    o_ref[:] = stage[0, 0]


def probe_minscalar(x_ref, o_ref):
    m = jnp.min(jnp.where(x_ref[:] > 0, x_ref[:], 99))
    o_ref[:] = x_ref[:] + m


def probe_smem_scalar(x_ref, o_ref, sm):
    def body(n, v):
        return v + sm[n, 0]
    v = jax.lax.fori_loop(0, 4, body, x_ref[:])
    o_ref[:] = v


def probe_u64shift(x_ref, o_ref):
    u32 = jnp.uint32
    lo = x_ref[:].astype(u32)
    hi = lo * u32(3)
    k = x_ref[:] & 31
    ku = jnp.clip(k, 1, 31).astype(u32)
    mid = (lo >> ku) | (hi << (u32(32) - ku))
    lo2 = jnp.where(k == 0, lo, jnp.where(k == 32, hi, mid))
    o_ref[:] = lo2.astype(jnp.int32)


def probe_dma_row(x_ref, o_ref, hbm, win, sem):
    t = jnp.sum(x_ref[0, 0])
    r = jax.lax.rem(t, SL)
    w = jax.lax.rem(t, 4)
    cp = pltpu.make_async_copy(hbm.at[pl.ds(w, 16), r],
                               win.at[:, r], sem)
    cp.start()
    cp.wait()
    o_ref[:] = win[0]


PROBES = {
    "reduce_pred": (probe_reduce_pred, ()),
    "cond_vec": (probe_cond_vec, ()),
    "while22": (probe_while22, ()),
    "table_rw": (probe_table_rw,
                 (pltpu.VMEM((16, SL, LN), jnp.int32),)),
    "stage_store": (probe_stage_store,
                    (pltpu.VMEM((2, 4, SL, LN), jnp.int32),)),
    "minscalar": (probe_minscalar, ()),
    "u64shift": (probe_u64shift, ()),
}


def main():
    names = sys.argv[1:] or list(PROBES)
    for n in names:
        if n == "dma_row":
            hbm = jnp.zeros((64, SL, LN), jnp.int32)
            try:
                out = pl.pallas_call(
                    probe_dma_row,
                    out_shape=jax.ShapeDtypeStruct((SL, LN), jnp.int32),
                    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                              ],
                    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                    scratch_shapes=[
                        pltpu.VMEM((16, SL, LN), jnp.int32),
                        pltpu.SemaphoreType.DMA(()),
                    ],
                    compiler_params=pltpu.CompilerParams(
                        has_side_effects=True),
                )(jnp.ones((SL, LN), jnp.int32))
                np.asarray(out)
                print("dma_row: OK")
            except Exception as e:
                print("dma_row: FAIL", str(e).split("\n")[0][:160])
            continue
        k, sc = PROBES[n]
        run(n, k, sc)


if __name__ == "__main__":
    # dma_row needs an hbm input; run others generically
    names = sys.argv[1:] or (list(PROBES) + ["dma_row_skip"])
    main()
