"""Device-side output digests.

When decompressed data stays in HBM for downstream TPU consumption
(the production pattern — and mandatory here, where device->host
bandwidth may be orders of magnitude below decode speed), correctness
is asserted by comparing a device-computed digest against a host-
computed one. Two independent 32-bit folds of the u32 word stream make
silent corruption vanishingly unlikely; the full bit-exactness burden
rests on the (CPU-backend) test suite.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_MULT = np.uint32(2654435761)


@jax.jit
def device_digest(out: jnp.ndarray, total: jnp.ndarray) -> jnp.ndarray:
    """Digest of out[:total] (out: (N,) uint8, N % 4 == 0).

    Returns (2,) uint32: [xor-fold, weighted-sum]."""
    n = out.shape[0]
    idx = jnp.arange(n, dtype=jnp.uint32)
    masked = jnp.where(idx < total.astype(jnp.uint32), out, 0)
    words = jax.lax.bitcast_convert_type(masked.reshape(-1, 4), jnp.uint32)
    widx = jnp.arange(words.shape[0], dtype=jnp.uint32)
    d1 = jax.lax.reduce(words, jnp.uint32(0), jax.lax.bitwise_xor, (0,))
    d2 = jnp.sum(words * (widx * _MULT + jnp.uint32(1)), dtype=jnp.uint32)
    return jnp.stack([d1, d2])


def host_digest(data: bytes) -> np.ndarray:
    """Identical digest computed with numpy on host."""
    n = (len(data) + 3) & ~3
    buf = np.zeros(n, np.uint8)
    buf[: len(data)] = np.frombuffer(data, np.uint8)
    words = buf.view(np.uint32)
    widx = np.arange(words.shape[0], dtype=np.uint32)
    d1 = np.bitwise_xor.reduce(words) if len(words) else np.uint32(0)
    with np.errstate(over="ignore"):
        d2 = np.uint32(np.sum(words * (widx * _MULT + np.uint32(1)),
                              dtype=np.uint32))
    return np.asarray([d1, d2], np.uint32)
