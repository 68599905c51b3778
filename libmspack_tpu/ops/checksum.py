"""CAB per-block checksum, vectorized (device pass).

The CAB CFDATA checksum XORs the block as little-endian u32 words, with
a tail rule for the last 1-3 bytes (reference: cabd.c:1462-1479). As an
XOR reduction it is embarrassingly parallel; batched over blocks it
runs at HBM bandwidth.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=())
def cab_checksum_padded(data: jnp.ndarray, length: jnp.ndarray,
                        init: jnp.ndarray) -> jnp.ndarray:
    """Checksum of data[:length] (data zero-padded to a multiple of 4).

    Tail rule: 3 remaining bytes pack as b0<<16|b1<<8|b2, 2 as
    b0<<8|b1, 1 as b0 — i.e. big-endian-ish, unlike the u32 body.
    """
    n = data.shape[0]
    words = (data.reshape(-1, 4).astype(jnp.uint32)
             * jnp.uint32(1) << jnp.asarray([0, 8, 16, 24], jnp.uint32))
    word_vals = words.sum(axis=1, dtype=jnp.uint32)  # LE u32 of each group
    widx = jnp.arange(n // 4, dtype=jnp.int32)
    full = length // 4
    body = jax.lax.reduce(jnp.where(widx < full, word_vals, 0),
                          jnp.uint32(0), jax.lax.bitwise_xor, (0,))
    rem = length & 3
    base = full * 4
    b = lambda o: jnp.take(data, jnp.minimum(base + o, n - 1)).astype(jnp.uint32)
    tail = jnp.where(
        rem == 3, (b(0) << 16) | (b(1) << 8) | b(2),
        jnp.where(rem == 2, (b(0) << 8) | b(1),
                  jnp.where(rem == 1, b(0), jnp.uint32(0))))
    return init ^ body ^ tail


def cab_checksum(data: bytes, init: int = 0) -> int:
    """Host wrapper, bit-exact vs formats.cab._checksum."""
    n = len(data)
    pad = (-n) % 4
    arr = jnp.asarray(np.frombuffer(data + b"\x00" * (pad or 4), np.uint8))
    arr = arr[: (n + pad) if pad else n + 4]
    # ensure multiple of 4
    arr = arr[: (arr.shape[0] // 4) * 4]
    return int(cab_checksum_padded(arr, jnp.int32(n), jnp.uint32(init)))
