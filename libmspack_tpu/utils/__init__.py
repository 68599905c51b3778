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
