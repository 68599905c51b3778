"""Vectorized 'MSCF' signature scan (device pass).

The reference scans byte-by-byte with a 20-byte state machine
(reference: cabd.c:750-846, hot loop :756). On device the candidate
scan is a single vectorized 4-byte compare over the whole buffer at
HBM bandwidth; candidate plausibility (header fields) is then checked
host-side exactly as the driver does.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def find_signatures(data: jnp.ndarray) -> jnp.ndarray:
    """Return a mask of positions where b'MSCF' begins."""
    n = data.shape[0]
    d0 = data
    d1 = jnp.roll(data, -1)
    d2 = jnp.roll(data, -2)
    d3 = jnp.roll(data, -3)
    mask = (d0 == 0x4D) & (d1 == 0x53) & (d2 == 0x43) & (d3 == 0x46)
    # positions within 3 bytes of the end can't hold a full signature
    return mask & (jnp.arange(n) < n - 3)


def signature_positions(data: bytes) -> list[int]:
    """Host wrapper: all byte offsets of 'MSCF' in `data`."""
    if len(data) < 4:
        return []
    arr = jnp.asarray(np.frombuffer(data, np.uint8))
    mask = np.asarray(find_signatures(arr))
    return [int(i) for i in np.nonzero(mask)[0]]
