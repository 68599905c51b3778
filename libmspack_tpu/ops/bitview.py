"""Vectorized bitstream views (device L1 primitive).

Computes, for EVERY bit position of a byte buffer at once, the value of
the next N bits — the device-side equivalent of the scalar bit register
(codecs/bitstream.py). This is the foundation of speculative
bit-parallel entropy decoding: instead of advancing one cursor, we
evaluate the decode step at all positions and link the true chain with
pointer doubling (ops/huffman_jax.py).

Bit orders match the reference formats:
* LSB ("deflate order", mszipd.c:23-26): bit k of the stream is bit
  (k&7) of byte k>>3; an n-bit read yields bits [p, p+n) with the
  earliest bit in the LSB.
* MSB over 16-bit little-endian units (lzxd.c:86-91): the stream is a
  sequence of u16 units (b1<<8|b0); bits are consumed from the MSB of
  each unit.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def pad_to(data: jnp.ndarray, extra: int = 8) -> jnp.ndarray:
    """Append zero bytes so peeks beyond the end read zeros (the
    reference's soft-EOF fakes trailing zero bytes, readbits.h:198-208)."""
    return jnp.concatenate([data, jnp.zeros(extra, jnp.uint8)])


def peek_lsb(data: jnp.ndarray, positions: jnp.ndarray, nbits: int) -> jnp.ndarray:
    """LSB-first n-bit peek (n <= 24) at each bit position.

    data: uint8 array padded with >=4 trailing bytes.
    positions: int32 bit offsets. Returns uint32 values.
    """
    byte = positions >> 3
    sh = (positions & 7).astype(jnp.uint32)
    b0 = jnp.take(data, byte).astype(jnp.uint32)
    b1 = jnp.take(data, byte + 1).astype(jnp.uint32)
    b2 = jnp.take(data, byte + 2).astype(jnp.uint32)
    b3 = jnp.take(data, byte + 3).astype(jnp.uint32)
    word = b0 | (b1 << 8) | (b2 << 16) | (b3 << 24)
    return (word >> sh) & jnp.uint32((1 << nbits) - 1)


def peek_msb16(data: jnp.ndarray, positions: jnp.ndarray, nbits: int) -> jnp.ndarray:
    """MSB-first n-bit peek (n <= 17) over 16-bit LE units (LZX order).

    Bit position p means: p bits have been consumed from the MSB side
    of the unit stream. Unit u = data[2u+1]<<8 | data[2u].
    """
    unit = positions >> 4
    used = (positions & 15).astype(jnp.uint32)
    u0 = (jnp.take(data, unit * 2).astype(jnp.uint32)
          | (jnp.take(data, unit * 2 + 1).astype(jnp.uint32) << 8))
    u1 = (jnp.take(data, unit * 2 + 2).astype(jnp.uint32)
          | (jnp.take(data, unit * 2 + 3).astype(jnp.uint32) << 8))
    u2 = (jnp.take(data, unit * 2 + 4).astype(jnp.uint32)
          | (jnp.take(data, unit * 2 + 5).astype(jnp.uint32) << 8))
    # build a 48-bit window starting at the unit boundary, MSB first
    win_hi = (u0 << 16) | u1          # 32 bits
    # shift out consumed bits; take nbits from the top of the 32-bit window,
    # pulling in bits from u2 as needed
    win = (win_hi << used) | jax.lax.select(
        used > 0, u2 >> (16 - used), jnp.zeros_like(u2))
    return (win >> (32 - nbits)) & jnp.uint32((1 << nbits) - 1)


def bitrev_table(nbits: int):
    """numpy bit-reversal LUT for nbits-wide values (host-built once)."""
    import numpy as np
    n = 1 << nbits
    v = np.arange(n, dtype=np.uint32)
    r = np.zeros(n, dtype=np.uint32)
    for _ in range(nbits):
        r = (r << 1) | (v & 1)
        v >>= 1
    return r
