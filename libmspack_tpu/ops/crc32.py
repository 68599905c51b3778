"""CRC-32 on the MXU (device pass).

CRC is GF(2)-linear in (initial register, message bits):

    crc(init, chunk) = M_C @ init  XOR  P_C @ bits(chunk)

so a whole chunk's contribution is one (B, 8C) x (8C, 32) matmul of
0/1 values — MXU work instead of the reference's byte-serial table
loop (reference: crc32.h:9-15). Chunks combine with a cheap 32-bit
linear step. The matrices are derived once per chunk size on the host
(empirically, via the scalar CRC — columns of a linear map).

Used for OAB block CRCs (formats/oab.py) and available for any batched
integrity sweep.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..formats.oab import crc32_raw

_CACHE: dict[int, tuple[np.ndarray, np.ndarray]] = {}


def _matrices(chunk_bytes: int) -> tuple[np.ndarray, np.ndarray]:
    """Returns (M columns as uint32[32], P as float32[8C, 32]).

    M[k] = crc(e_k, zeros) — the advance-by-C map, column per register bit.
    P[j] = crc(0, bit j set) — message-bit contributions.
    Bit j = byte (j >> 3), bit (j & 7) (LSB-first within the byte).
    """
    if chunk_bytes in _CACHE:
        return _CACHE[chunk_bytes]
    zeros = bytes(chunk_bytes)
    m_cols = np.zeros(32, np.uint32)
    for k in range(32):
        m_cols[k] = crc32_raw(zeros, 1 << k)
    p = np.zeros((8 * chunk_bytes, 32), np.float32)
    buf = bytearray(chunk_bytes)
    for j in range(8 * chunk_bytes):
        buf[j >> 3] = 1 << (j & 7)
        v = crc32_raw(bytes(buf), 0)
        buf[j >> 3] = 0
        p[j] = [(v >> b) & 1 for b in range(32)]
    _CACHE[chunk_bytes] = (m_cols, p)
    return m_cols, p


@functools.partial(jax.jit, static_argnames=())
def _chunk_contrib(chunks: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """chunks: (B, C) uint8 -> (B,) uint32 contribution of each chunk."""
    bits = ((chunks[:, :, None] >> jnp.arange(8, dtype=jnp.uint8)) & 1)
    bits = bits.reshape(chunks.shape[0], -1).astype(jnp.float32)
    counts = jnp.dot(bits, p, preferred_element_type=jnp.float32)
    bitvals = counts.astype(jnp.int32) & 1
    return (bitvals.astype(jnp.uint32)
            * (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32))).sum(
        axis=1, dtype=jnp.uint32)


def _advance(reg: int, m_cols: np.ndarray) -> int:
    out = 0
    for k in range(32):
        if (reg >> k) & 1:
            out ^= int(m_cols[k])
    return out


def crc32_device(data: bytes, init: int = 0xFFFFFFFF,
                 chunk_bytes: int = 4096) -> int:
    """Bit-exact CRC-32 (raw register convention) computed on device."""
    n = len(data)
    if n == 0:
        return init
    pad = (-n) % chunk_bytes
    padded = data + bytes(pad)
    m_cols, p = _matrices(chunk_bytes)
    arr = jnp.asarray(np.frombuffer(padded, np.uint8)).reshape(-1, chunk_bytes)
    contribs = np.asarray(_chunk_contrib(arr, jnp.asarray(p)))
    # combine: full chunks advance by C; the padded tail needs the real
    # tail length — run the final partial chunk through the scalar path
    nfull = n // chunk_bytes
    reg = init
    for i in range(nfull):
        reg = _advance(reg, m_cols) ^ int(contribs[i])
    if n % chunk_bytes:
        reg = crc32_raw(data[nfull * chunk_bytes :], reg)
    return reg


def crc32_device_batch(blocks: jnp.ndarray, lengths=None,
                       chunk_bytes: int = 4096):
    """Batched CRC of equal-shaped blocks (B, C) in one matmul; the
    common case for OAB block sweeps. Returns (B,) uint32 raw-register
    CRCs with init 0xFFFFFFFF, for blocks exactly C bytes long."""
    m_cols, p = _matrices(blocks.shape[1])
    contribs = _chunk_contrib(blocks, jnp.asarray(p))
    init_adv = _advance(0xFFFFFFFF, m_cols)
    return contribs ^ jnp.uint32(init_adv)
