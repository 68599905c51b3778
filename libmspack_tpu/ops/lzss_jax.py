"""Two-phase TPU LZSS decoder (device L2 codec).

The scalar reference walks the stream byte-serially
(codecs/lzss.py <- reference lzssd.c). Device plan, fully vectorized:

Phase A (structure discovery): LZSS streams are control-byte groups —
1 control byte then 8 items of 1 (literal) or 2 (match) bytes. The
byte length of a whole group is a pure function of its control byte:

    group_size(p) = 9 + popcount(~data[p] & 0xFF)    (+ truncation clamp)

so the positions of ALL control bytes are the orbit of 0 under a
vectorized step function, linked with pointer doubling (log2 rounds of
1D gathers). Item offsets/lengths inside each group are then prefix
sums — no sequential scan anywhere.

Phase B: matches become (distance, length) tokens relative to the
output stream (window position arithmetic folds into a constant
distance per match, with negative sources hitting the 0x20 pre-fill)
and resolve with ops.match_resolve.

MSHELP mode = invert control bytes; QBASIC = different initial window
position (affects only the distance constant).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..codecs.lzss import MODE_EXPAND, MODE_MSHELP, MODE_QBASIC, WINDOW_SIZE
from .match_resolve import resolve

_POPCNT8 = jnp.asarray(np.unpackbits(
    np.arange(256, dtype=np.uint8)[:, None], axis=1).sum(1).astype(np.int32))


@functools.partial(jax.jit, static_argnames=("n", "mode", "max_groups"))
def _decode_padded(data: jnp.ndarray, n: int, mode: int, max_groups: int):
    """data: uint8, padded well beyond n. Returns (out_bytes, out_len)
    with out_bytes sized for the worst case (n * 18 per 2 stream bytes)."""
    invert = jnp.uint8(0xFF if mode == MODE_MSHELP else 0x00)
    init_pos = WINDOW_SIZE - (18 if mode == MODE_QBASIC else 16)

    cb = (data ^ invert).astype(jnp.int32)

    # step function over *potential* group-start positions
    step_all = 9 + jnp.take(_POPCNT8, 255 - (cb & 0xFF))

    # orbit of 0 under step: group_pos[k] = k'th control byte position.
    # jump-composition: J0 = one step; double log2(max_groups) times,
    # then evaluate position-at-rank for every k via binary decomposition.
    size = data.shape[0]
    pos_idx = jnp.arange(size, dtype=jnp.int32)
    nxt = jnp.minimum(pos_idx + step_all, size - 1)

    n_doublings = max(1, (max_groups - 1)).bit_length()
    jumps = [nxt]
    for _ in range(n_doublings - 1):
        jumps.append(jnp.take(jumps[-1], jumps[-1]))

    ranks = jnp.arange(max_groups, dtype=jnp.int32)
    gpos = jnp.zeros(max_groups, jnp.int32)
    for k in range(n_doublings):
        bit = (ranks >> k) & 1
        gpos = jnp.where(bit == 1, jnp.take(jumps[k], gpos), gpos)

    # groups starting at/after n are past the end
    valid_group = gpos < n

    # per-group decode: control byte + 8 items
    gcb = jnp.take(cb, gpos)
    flags = (gcb[:, None] >> jnp.arange(8, dtype=jnp.int32)[None, :]) & 1
    item_size = jnp.where(flags == 1, 1, 2)
    # byte offset of each item within its group
    item_off = jnp.cumsum(item_size, axis=1) - item_size + 1
    item_pos = gpos[:, None] + item_off                     # stream position
    b0 = jnp.take(data, jnp.minimum(item_pos, size - 1)).astype(jnp.int32)
    b1 = jnp.take(data, jnp.minimum(item_pos + 1, size - 1)).astype(jnp.int32)

    is_lit = flags == 1
    mlen = (b1 & 0x0F) + 3
    mpos = b0 | ((b1 & 0xF0) << 4)
    out_len_item = jnp.where(is_lit, 1, mlen)

    # truncation semantics (lzssd.c ENSURE_BYTES): an item only produces
    # output if ALL its bytes are inside the stream
    item_ok = valid_group[:, None] & (item_pos + item_size - 1 <= n - 1)
    out_len_item = jnp.where(item_ok, out_len_item, 0)

    # output offsets: flatten groups x items in order
    flat_len = out_len_item.reshape(-1)
    out_start = jnp.cumsum(flat_len) - flat_len
    total_out = out_start[-1] + flat_len[-1]

    # window position at the start of each item = init_pos + output offset
    # match distance: d = ((winpos - mpos - 1) mod 4096) + 1
    winpos = (init_pos + out_start) % WINDOW_SIZE
    flat_mpos = mpos.reshape(-1)
    dist = ((winpos - flat_mpos - 1) % WINDOW_SIZE) + 1

    flat_is_lit = is_lit.reshape(-1)
    flat_b0 = b0.reshape(-1)

    out_cap = flat_len.shape[0] and int(flat_len.shape[0])  # static T
    T = flat_len.shape[0]
    # expand tokens to per-byte ptr/lit over the (dynamic) total output;
    # we build over the static worst case N_OUT and mask by total_out
    N_OUT = T * 18 // 1  # each item emits <= 18 bytes
    marks = jnp.zeros(N_OUT + 1, jnp.int32).at[
        jnp.where(flat_len > 0, out_start, N_OUT)].max(
        jnp.arange(T, dtype=jnp.int32) + 1)
    tok_id = jnp.clip(jax.lax.cummax(marks[:N_OUT]) - 1, 0, T - 1)

    bpos = jnp.arange(N_OUT, dtype=jnp.int32)
    t_islit = jnp.take(flat_is_lit, tok_id)
    t_dist = jnp.take(dist, tok_id)
    t_lit = jnp.take(flat_b0, tok_id).astype(jnp.uint8)
    ptr = jnp.where(t_islit, bpos, bpos - t_dist)
    out = resolve(ptr, t_lit, fill=0x20)
    return out, total_out


def decompress(data: bytes, mode: int = MODE_EXPAND) -> bytes:
    """Bit-exact TPU LZSS decode of a full stream."""
    n = len(data)
    if n == 0:
        return b""
    # worst case: all groups are 9 bytes (1 cb + 8 literals)
    max_groups = n // 9 + 2
    arr = jnp.asarray(np.frombuffer(data, np.uint8))
    arr = jnp.concatenate([arr, jnp.zeros(32, jnp.uint8)])
    out, total = _decode_padded(arr, n, mode, max_groups)
    total = int(total)
    return bytes(np.asarray(out[:total]).tobytes())
