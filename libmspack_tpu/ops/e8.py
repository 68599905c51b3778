"""Vectorized E8 call-translation (device pass).

LZX preprocesses x86 code: E8 (call) instructions' absolute targets are
converted to/from relative. The scalar decoder walks each frame
byte-serially because a translated E8's 4 operand bytes must not
themselves be treated as E8 leaders (reference: lzxd.c:706-733).

Device formulation: E8 leaders claim 5 bytes; a byte is a *real* leader
iff it is 0xE8 and not within the 4-byte shadow of a previous real
leader. The shadow relation is resolved with a small scan: leader(i)
depends only on leaders in [i-4, i-1], so a prefix pass over 4-byte
dependencies suffices — we compute it with a jump-chain over candidate
E8 positions (each candidate's successor is the next candidate >= +5),
which is exact, like the scalar loop, in log2 rounds.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("decode",))
def e8_transform(frame: jnp.ndarray, curpos0: jnp.ndarray,
                 filesize: jnp.ndarray, decode: bool = True) -> jnp.ndarray:
    """Apply the E8 transform to one frame (uint8, length >= 11).

    curpos0: int32 stream offset of frame[0]; filesize: int32 intel
    filesize. decode=True undoes the translation (decompressor side);
    False applies it (compressor side).
    """
    n = frame.shape[0]
    cand = (frame == 0xE8) & (jnp.arange(n) < n - 10)

    # next candidate at distance >= 5 from each position
    idx = jnp.arange(n, dtype=jnp.int32)
    # next_cand[i] = smallest j >= i with cand[j]; computed by reverse cummin
    INF = jnp.int32(n)
    cand_pos = jnp.where(cand, idx, INF)
    next_cand = jax.lax.associative_scan(jnp.minimum, cand_pos, reverse=True)

    # chain: from a real leader at i, the next real leader is the first
    # candidate >= i+5. Orbit of the first candidate under this jump.
    first = next_cand[0]
    jump = jnp.take(next_cand, jnp.minimum(idx + 5, n - 1))  # for i<=n-6
    max_leaders = n // 5 + 1
    n_doublings = max(1, max_leaders - 1).bit_length()
    jumps = [jump]
    for _ in range(n_doublings - 1):
        jumps.append(jnp.take(jumps[-1], jnp.minimum(jumps[-1], n - 1)))
    ranks = jnp.arange(max_leaders, dtype=jnp.int32)
    lead = jnp.full(max_leaders, first, jnp.int32)
    for k in range(n_doublings):
        bit = (ranks >> k) & 1
        lead = jnp.where(bit == 1,
                         jnp.take(jumps[k], jnp.minimum(lead, n - 1)), lead)
    valid = lead < n

    # gather operands at leader positions
    def b(o):
        return jnp.take(frame, jnp.minimum(lead + o, n - 1)).astype(jnp.int32)

    word = b(1) | (b(2) << 8) | (b(3) << 16) | (b(4) << 24)
    curpos = curpos0 + lead
    if decode:
        abs_off = word
        ok = (abs_off >= -curpos) & (abs_off < filesize)
        rel = jnp.where(abs_off >= 0, abs_off - curpos, abs_off + filesize)
        new = jnp.where(ok, rel, abs_off)
    else:
        rel_off = word
        ok = (rel_off >= -curpos) & (rel_off < filesize)
        absv = jnp.where(rel_off >= 0, rel_off + curpos, rel_off - filesize)
        # encoder direction mirrors the MS tool: translate when in range
        new = jnp.where(ok, absv, rel_off)
    new = new.astype(jnp.uint32)

    out = frame
    for o in range(4):
        byte = ((new >> (8 * o)) & 0xFF).astype(jnp.uint8)
        tgt = jnp.where(valid, lead + 1 + o, n)
        out = jnp.concatenate([out, jnp.zeros(1, jnp.uint8)]).at[tgt].set(
            byte, mode="drop")[:n]
    return out


def e8_decode_frame(frame_bytes: bytes, offset: int, filesize: int) -> bytes:
    """Host convenience wrapper used by the drivers' accelerated path."""
    arr = jnp.asarray(np.frombuffer(frame_bytes, np.uint8))
    out = e8_transform(arr, jnp.int32(offset), jnp.int32(filesize), True)
    return np.asarray(out).tobytes()
