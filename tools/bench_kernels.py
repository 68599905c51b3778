"""Regenerate BENCH_KERNELS.json: chip-measured per-kernel numbers.

Run on the real TPU (no JAX_PLATFORMS override), one TPU job at a time:
    python tools/bench_kernels.py

Each entry records what one device kernel pass measures, so design
numbers live in a regenerable artifact instead of commit messages.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def bench_inflate_phase_a(n=1024, kb=32):
    import zlib

    import jax.numpy as jnp

    from libmspack_tpu.ops import pallas_inflate as pa
    from libmspack_tpu.utils import bench_corpus
    base = bench_corpus(1 << 20)
    base = base * (1 + (kb * 1024 * n) // len(base))
    frames, raws = [], []
    for i in range(n):
        raw = base[i * kb * 1024:(i + 1) * kb * 1024]
        co = zlib.compressobj(6, zlib.DEFLATED, -15)
        frames.append(co.compress(raw) + co.flush())
        raws.append(raw)
    total_out = sum(len(r) for r in raws)
    t_pad = ((kb * 1024 // 2 + 2048 + 127) // 128) * 128
    tok, litw, cnt = pa.inflate_phase_a(frames, hists=[0] * n, T_PAD=t_pad)
    cnth = np.asarray(cnt)
    errs = int((cnth[0, :n] != 0).sum())
    ok = int((cnth[1, :n] == np.array([len(r) for r in raws])).sum())
    # lane-validate a sample end-to-end
    tokh, litwh = np.asarray(tok), np.asarray(litw)
    exact = all(pa.replay_trace(tokh[:, i], litwh[:, i], len(raws[i]))
                == raws[i] for i in (0, n // 2, n - 1))
    # with pack + host->device upload in the loop (tunnel-sensitive)
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        _, _, c2 = pa.inflate_phase_a(frames, hists=[0] * n, T_PAD=t_pad)
        np.asarray(c2)
    dt_up = (time.perf_counter() - t0) / reps
    # device-resident: inputs pre-staged, compute only
    stream, W = pa.pack_streams(frames)
    hist = np.zeros((8, 128), np.int32)
    fixk3, fixd3, fixf = pa.fixed_tables()
    args = tuple(jnp.asarray(a) for a in
                 (stream, hist, fixk3, fixd3, fixf))
    np.asarray(pa._run(*args, 8, 128, W, t_pad)[2])
    t0 = time.perf_counter()
    for _ in range(reps):
        np.asarray(pa._run(*args, 8, 128, W, t_pad)[2])
    dt = (time.perf_counter() - t0) / reps
    return {
        "kernel": "pallas_inflate.phase_a",
        "config": f"{n} lanes x {kb} KiB frames, mixed C source",
        "bytes_out": total_out,
        "ms": round(dt * 1e3, 1),
        "mb_per_s": round(total_out / dt / 1e6, 1),
        "mb_per_s_with_upload": round(total_out / dt_up / 1e6, 1),
        "errors": errs, "out_ok": ok, "sampled_bit_exact": bool(exact),
        "max_steps": int(cnth[2].max()),
    }


def bench_resolve_device(n_frames=64):
    """Device phase B (copy machine) if present."""
    try:
        from libmspack_tpu.ops import pallas_resolve as pr
    except ImportError:
        return None
    return pr.bench_entry(n_frames)


def bench_lzx_phase_a():
    try:
        from libmspack_tpu.ops import pallas_lzx as plx
    except ImportError:
        return None
    return plx.bench_entry()


def bench_qtm_phase_a():
    try:
        from libmspack_tpu.ops import pallas_qtm as pq
    except ImportError:
        return None
    return pq.bench_entry()


def main():
    import jax
    dev = str(jax.devices()[0])
    entries = []
    for fn in (bench_inflate_phase_a, bench_resolve_device,
               bench_lzx_phase_a, bench_qtm_phase_a):
        try:
            e = fn()
        except Exception as exc:
            e = {"kernel": fn.__name__, "error": str(exc)[:200]}
        if e is not None:
            entries.append(e)
            print(json.dumps(e), flush=True)
    out = {"device": dev, "generated_by": "tools/bench_kernels.py",
           "entries": entries}
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH_KERNELS.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
