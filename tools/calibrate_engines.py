"""Measure per-engine end-to-end decode rates on THIS host and write
libmspack_tpu/calibration.json for workload-aware auto routing
(utils.choose_engine).

The TPU kernels win device-resident on every codec, but end-to-end
the host<->device link decides: a tunnel-attached chip (~40 MB/s up)
never beats the native engine, a PCIe-attached one does at batch
scale. This tool measures, rather than assumes: it times the native
pool and the TPU pipeline on a synthetic MSZIP corpus at two batch
sizes and records the crossover workload (null = TPU never wins
here).

Usage: python tools/calibrate_engines.py [--dry]
"""
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def _time_engine(paths, engine, reps=3):
    from libmspack_tpu.parallel import planner
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        outs = planner.extract_corpus(paths, engine=engine)
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    total = sum(len(b) for files in outs for b in files.values())
    return total / best / 1e6, total


def main():
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    from bench import build_corpus, build_cab

    import jax
    have_tpu = jax.default_backend() == "tpu"

    sizes_mb = (4, 24)
    cal = {"host": os.uname().nodename,
           "backend": jax.default_backend()}
    rows = []
    with tempfile.TemporaryDirectory() as td:
        for mb in sizes_mb:
            corpus = build_corpus(mb << 20)
            path = os.path.join(td, f"cal_{mb}.cab")
            with open(path, "wb") as fh:
                fh.write(build_cab(corpus, "mszip"))
            nat, total = _time_engine([path], "native")
            tpu = None
            if have_tpu:
                tpu, _ = _time_engine([path], "tpu")
            rows.append({"bytes": total, "native_mb_s": round(nat, 1),
                         "tpu_mb_s": (round(tpu, 1)
                                      if tpu is not None else None)})
            print(f"# {mb} MiB: native {nat:.0f} MB/s, "
                  f"tpu {tpu if tpu else float('nan'):.0f} MB/s",
                  file=sys.stderr)
    cal["rows"] = rows
    cal["native_mb_s"] = rows[-1]["native_mb_s"]
    cal["tpu_mb_s_large"] = rows[-1]["tpu_mb_s"]
    # crossover: smallest measured workload where the TPU path wins;
    # null when it never does (the honest answer on tunnel hosts)
    cross = None
    for r in rows:
        if r["tpu_mb_s"] and r["tpu_mb_s"] > r["native_mb_s"]:
            cross = r["bytes"]
            break
    cal["tpu_crossover_bytes"] = cross
    out = os.path.join(repo, "libmspack_tpu", "calibration.json")
    with open(out, "w") as fh:
        json.dump(cal, fh, indent=1)
    print(json.dumps(cal))
    print(f"wrote {out}", file=sys.stderr)


if __name__ == "__main__":
    main()
