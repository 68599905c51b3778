"""Device-resident output digests.

When decode output stays on the chip (TpuMszipEngine
phase_b="device", mesh consumers holding sharded results),
correctness checks should not pull megabytes over the host link:
digest each lane's output ON the device — CRC-32 as a GF(2) matmul
on the MXU (ops/crc32) — and pull 4 bytes per lane instead
(round-4 VERDICT item 2).

Convention: the device digests the lane's FULL padded row with bytes
past the lane's length zeroed (one uniform batched matmul — no ragged
shapes on device); the host advances its expectation over the same
zero padding (digest_expect), which is a few table lookups. Register
convention is raw CRC-32 (init 0xFFFFFFFF, no final inversion), the
same as the OAB block CRCs (oabd.c:197 / crc32.h:9-15).
"""
from __future__ import annotations

import numpy as np

import jax.numpy as jnp


def frame_digests(out_u8, lengths) -> np.ndarray:
    """(L, S) uint8 device array of per-lane outputs -> (L,) uint32
    raw CRCs over each lane's row with bytes >= lengths[i] zeroed.
    Only L x 4 bytes cross the device->host link."""
    from .crc32 import crc32_device_batch

    out_u8 = jnp.asarray(out_u8)
    _, S = out_u8.shape
    col = jnp.arange(S, dtype=jnp.int32)[None, :]
    lens_d = jnp.asarray(np.asarray(lengths, np.int32))[:, None]
    masked = jnp.where(col < lens_d, out_u8, 0)
    return np.asarray(crc32_device_batch(masked))


def digest_expect(data: bytes, padded_to: int) -> int:
    """Host-side expectation matching frame_digests for a lane padded
    to `padded_to` bytes: CRC the real bytes, then the zero padding."""
    from ..formats.oab import crc32_raw
    d = crc32_raw(data)
    pad = padded_to - len(data)
    if pad > 0:
        d = crc32_raw(bytes(pad), d)
    return d


def verify_frames(out_u8, lengths, expected: list[bytes]) -> bool:
    """True iff every lane's device output matches its expected bytes
    — without pulling the outputs to host."""
    S = int(out_u8.shape[1])
    got = frame_digests(out_u8, lengths)
    return all(int(got[i]) == digest_expect(exp, S)
               for i, exp in enumerate(expected))
