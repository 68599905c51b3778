"""MSZIP compressor (compress path).

The reference ships no MSZIP compressor (reference: mszipc.c is a
stub). Each 32 KiB frame becomes a 'CK'-prefixed raw deflate stream.
History is carried across frames by priming the deflater with the
previous frame's bytes as a preset dictionary — the MSZIP window
survives frame boundaries (see codecs/mszip.py), so matches may reach
into the previous frame exactly as the format allows.

Deflate entropy coding is delegated to zlib (stdlib) on host; a
TPU-resident encoder is part of the ops roadmap.
"""
from __future__ import annotations

import zlib

FRAME_SIZE = 32768


def compress_frames(data: bytes, level: int = 9,
                    cross_frame_history: bool = True) -> list[bytes]:
    """Split `data` into 32 KiB frames, each deflated independently and
    prefixed with 'CK'. Returns the list of compressed frame payloads
    (one CAB CFDATA block each)."""
    frames = []
    n = len(data)
    if n == 0:
        return []
    for i in range(0, n, FRAME_SIZE):
        chunk = data[i : i + FRAME_SIZE]
        if cross_frame_history and i > 0:
            dict_ = data[max(0, i - FRAME_SIZE) : i]
            co = zlib.compressobj(level, zlib.DEFLATED, -15, 9,
                                  zlib.Z_DEFAULT_STRATEGY, dict_)
        else:
            co = zlib.compressobj(level, zlib.DEFLATED, -15, 9)
        payload = co.compress(chunk) + co.flush(zlib.Z_FINISH)
        frames.append(b"CK" + payload)
    return frames


def compress_kwaj(data: bytes, level: int = 9) -> bytes:
    """KWAJ method-4 body: 16-bit-length-prefixed CK frames, 0 ends
    (reference: mszipd.c:462-495)."""
    out = bytearray()
    for frame in compress_frames(data, level, cross_frame_history=False):
        out += len(frame).to_bytes(2, "little")
        out += frame
    out += b"\x00\x00"
    return bytes(out)
