"""LZ match resolution by pointer doubling (device phase B).

After entropy decode (phase A), every output byte is either a literal
or a copy of an earlier output byte. Scalar decoders resolve copies
byte-serially (reference: lzxd.c:618-649, mszipd.c:270-296,
lzssd.c:80-86); on TPU we resolve ALL bytes at once:

    ptr[i] = i            if byte i is a literal
    ptr[i] = i - dist(i)  if byte i is inside a match (j'th byte of a
                          match copies from src_start + j)
    ptr[i] < 0            reads pre-history (window fill / reference data)

Iterating ptr <- ptr[ptr] (pointer doubling) converges every chain to
its root literal in ceil(log2(longest_chain)) rounds; each round is one
1D gather (~200 GB/s on v5e). Overlapping matches (dist < len) work
because resolution is per-byte. Final output = lit[ptr] with negative
roots mapped into `history` (window pre-fill or LZX DELTA reference
data).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def resolve(ptr: jnp.ndarray, lit: jnp.ndarray,
            history: jnp.ndarray | None = None,
            fill: int = 0x20, rounds: int | None = None) -> jnp.ndarray:
    """Resolve copy chains and materialise output bytes.

    ptr: (N,) int32 as described above.
    lit: (N,) uint8, the literal byte at literal positions (junk elsewhere).
    history: optional (H,) uint8; index -k reads history[H-k]. Without
        it, negative roots produce `fill` (LZSS window pre-fill 0x20).
    """
    n = ptr.shape[0]
    if rounds is None:
        rounds = max(1, n - 1).bit_length()

    def round_(_, p):
        chased = jnp.take(p, jnp.clip(p, 0, n - 1))
        return jnp.where(p >= 0, chased, p)

    root = jax.lax.fori_loop(0, rounds, round_, ptr)
    out = jnp.take(lit, jnp.clip(root, 0, n - 1))
    if history is not None:
        h = history.shape[0]
        hist_val = jnp.take(history, jnp.clip(root + h, 0, max(h - 1, 0)))
        out = jnp.where(root < 0, hist_val, out)
    else:
        out = jnp.where(root < 0, jnp.uint8(fill), out)
    return out


def tokens_to_ptr(out_len: int,
                  tok_out_start: jnp.ndarray,
                  tok_kind: jnp.ndarray,
                  tok_lit: jnp.ndarray,
                  tok_dist: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Expand a token stream into per-byte (ptr, lit) arrays.

    tok_out_start: (T,) int32 output offset of each token (prefix sum of
        lengths), with a sentinel at T (== out_len).
    tok_kind: (T,) int32, 0 = literal, 1 = match.
    tok_lit: (T,) uint8 literal bytes.
    tok_dist: (T,) int32 match distances.

    Each output byte finds its covering token with a scatter-max trick:
    mark token starts, then a running maximum gives token ids per byte.
    """
    t = tok_out_start.shape[0]
    # token id covering each output byte
    marks = jnp.zeros(out_len + 1, jnp.int32).at[
        jnp.clip(tok_out_start, 0, out_len)].max(
        jnp.arange(t, dtype=jnp.int32) + 1)
    tok_id = jax.lax.cummax(marks[:out_len]) - 1
    tok_id = jnp.clip(tok_id, 0, t - 1)

    pos = jnp.arange(out_len, dtype=jnp.int32)
    kind = jnp.take(tok_kind, tok_id)
    dist = jnp.take(tok_dist, tok_id)
    ptr = jnp.where(kind == 0, pos, pos - dist)
    lit = jnp.take(tok_lit, tok_id)
    return ptr, lit
