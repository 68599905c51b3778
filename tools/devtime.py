"""Honest device timing over the axon tunnel.

block_until_ready() on this platform acknowledges without completing,
and every D2H fetch costs ~50-400 ms with high variance. Recipe: run
the op N times as a DEPENDENT chain inside one jit (N passed as a
device scalar so one compile serves all N), fetch one scalar, and
grow N until the N-vs-0 delta dominates fetch noise.
"""
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def warmup():
    """First D2H after a worker crash reports UNAVAILABLE once; retry."""
    import numpy as np
    for attempt in range(4):
        try:
            np.asarray(jnp.arange(128) + 1)
            return
        except Exception:
            if attempt == 3:
                raise
            time.sleep(20)


def fetch(x) -> float:
    """Force completion of everything x depends on; return scalar."""
    return float(jnp.sum(x.ravel()[:1].astype(jnp.float32)))


def time_chained(make_step, init, n=64, min_delta=1.0, max_n=1 << 22,
                 verbose=False):
    """Seconds per step of `make_step` (x -> x-like), measured via a
    dependent chain of dynamic length inside one jit."""

    @jax.jit
    def chain(x, n):
        return jax.lax.fori_loop(0, n, lambda i, v: make_step(v), x,
                                 unroll=False)

    def run(n):
        t0 = time.perf_counter()
        fetch(chain(init, jnp.int32(n)))
        return time.perf_counter() - t0

    run(1)  # compile + warm
    while True:
        t0 = min(run(0) for _ in range(2))
        tn = min(run(n) for _ in range(2))
        delta = tn - t0
        if verbose:
            print(f"    n={n}: t0={t0:.3f}s tn={tn:.3f}s", flush=True)
        if delta > min_delta or n >= max_n:
            return max(delta, 1e-9) / n
        n *= max(2, min(16, int(min_delta / max(delta, 1e-3))))
        n = min(n, max_n)
