"""Shared helpers for the drivers."""
from __future__ import annotations


def resolve_engine(engine: str) -> str:
    """Map "auto" to the best available decode engine.

    "auto" prefers the native C++ engine (threaded, ~100x the scalar
    path) and falls back to "scalar" when it cannot be built; explicit
    names pass through. Fast paths always bail back to the scalar
    reference implementation when exact reference semantics demand it
    (salvage modes, corrupt streams), so "native" is always safe.
    """
    if engine != "auto":
        return engine
    from .. import native
    return "native" if native.available() else "scalar"


_CAL = None


def engine_calibration() -> dict:
    """Measured per-engine throughput table for auto routing.

    Produced by tools/calibrate_engines.py on the target host;
    override with MSPACK_CALIBRATION=/path.json. Schema:
      {"native_mb_s": float,          # end-to-end CAB decode, host
       "tpu_mb_s_large": float|null,  # end-to-end at large batch
       "tpu_crossover_bytes": int|null}  # workload size where the
                                      # TPU path starts winning; null
                                      # = it never does on this host
                                      # (e.g. tunnel-attached chips)
    """
    global _CAL
    if _CAL is None:
        import json
        import os
        path = os.environ.get("MSPACK_CALIBRATION") or os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "..",
            "calibration.json")
        try:
            with open(path) as fh:
                _CAL = json.load(fh)
        except Exception:
            _CAL = {}
    return _CAL


def choose_engine(workload_bytes: int) -> str:
    """Workload-aware auto routing (planner scale).

    Picks "tpu" only when a TPU backend is live AND the host's
    calibration says the end-to-end TPU path wins at this workload
    size (tpu_crossover_bytes). With no calibration, or below the
    crossover, the native engine is the measured winner."""
    from .. import native
    base = "native" if native.available() else "scalar"
    cal = engine_calibration()
    cross = cal.get("tpu_crossover_bytes")
    if cross is None or workload_bytes < cross or base == "scalar":
        return base
    try:
        import jax
        if jax.default_backend() != "tpu":
            return base
    except Exception:
        return base
    return "tpu"


def bench_corpus(n_bytes: int) -> bytes:
    """Compressible corpus for the library-shipped kernel bench
    entries. Prefers real C source (MSPACK_BENCH_CORPUS env var, then
    the development reference checkout) so numbers line up across
    machines, else synthesizes a mixed text/structured/noise blob like
    bench.py's build_corpus — the entries must not crash on hosts
    without the reference tree."""
    import os
    candidates = []
    env = os.environ.get("MSPACK_BENCH_CORPUS")
    if env:
        candidates.append(env)
    candidates.append("/root/reference/libmspack/mspack/lzxd.c")
    for p in candidates:
        try:
            with open(p, "rb") as fh:
                base = fh.read()
            if base:
                return (base * (1 + n_bytes // len(base)))[:n_bytes]
        except OSError:
            continue
    import numpy as np
    rng = np.random.RandomState(7)
    parts = []
    text = (b"The quick brown fox jumps over the lazy dog. "
            b"Pack my box with five dozen liquor jugs. ") * 40
    while sum(map(len, parts)) < n_bytes:
        parts.append(text)
        parts.append(rng.randint(0, 64, 2048, dtype=np.uint8).tobytes() * 4)
        parts.append(bytes(np.arange(256, dtype=np.uint8)) * 32)
    return b"".join(parts)[:n_bytes]
