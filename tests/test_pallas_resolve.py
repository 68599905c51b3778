"""Device phase B (Pallas copy machine) tests, interpreter mode.

Bit-exactness of the on-device token resolve, including the cross-
frame history chain and the nl-carrying match tokens emitted by the
round-4 phase A. Slot sizes shrink to 2 KiB so interpreted runs stay
fast; the real-chip 32 KiB path is exercised by
tools/bench_kernels.py (pallas_resolve.bench_entry).
"""
import zlib

import numpy as np
import pytest

from libmspack_tpu.ops import pallas_inflate as pa
from libmspack_tpu.ops import pallas_resolve as pr


@pytest.fixture
def small_slots(monkeypatch):
    monkeypatch.setattr(pr, "HROWS", 16)
    monkeypatch.setattr(pr, "OROWS", 16)


def deflate(raw, level=9, dict_=None):
    if dict_ is not None:
        co = zlib.compressobj(level, zlib.DEFLATED, -15, 9,
                              zlib.Z_DEFAULT_STRATEGY, dict_)
    else:
        co = zlib.compressobj(level, zlib.DEFLATED, -15)
    return co.compress(raw) + co.flush()


def test_resolve_history_chain(small_slots):
    text = open("/root/reference/libmspack/mspack/lzxd.c", "rb").read()
    F = 16 * 128
    d0, d1 = text[:F], text[F:2 * F]
    frames = [deflate(d0), deflate(d1, dict_=d0)]
    tok, litw, cnt = pa.inflate_phase_a(frames, hists=[0, 32768],
                                        T_PAD=1536, interpret=True)
    c = np.asarray(cnt)
    assert (c[0, :2] == 0).all()
    out, cnts = pr.resolve_frames_device(
        tok, litw, [F, F], hist_flags=[0, 1], interpret=True,
        n_steps=int(c[2].max()))
    outh = np.asarray(out)
    assert outh[0, :F].tobytes() == d0
    assert outh[1, :F].tobytes() == d1
    assert list(np.asarray(cnts)[:2]) == [F, F]


def test_resolve_mixed_block_types(small_slots):
    rng = np.random.RandomState(5)
    F = 16 * 128
    raws = [
        (b"repeat me! " * 300)[:F],                      # matches
        rng.randint(0, 256, 1000).astype(np.uint8).tobytes(),  # stored
        bytes([7]) * 600,                                 # RLE dist=1
    ]
    frames = [deflate(r, lv) for r, lv in zip(raws, (9, 6, 1))]
    tok, litw, cnt = pa.inflate_phase_a(frames, hists=[0] * 3,
                                        T_PAD=1536, interpret=True)
    c = np.asarray(cnt)
    assert (c[0, :3] == 0).all()
    out, cnts = pr.resolve_frames_device(
        tok, litw, [len(r) for r in raws], hist_flags=[0, 0, 0],
        interpret=True, n_steps=int(c[2].max()))
    outh = np.asarray(out)
    for i, r in enumerate(raws):
        assert outh[i, :len(r)].tobytes() == r, f"lane {i}"


def test_engine_device_phase_b(small_slots):
    """CabDecompressor-style folder decode with phase_b='device'."""
    from libmspack_tpu.parallel.tpu_pipeline import TpuMszipEngine

    text = open("/root/reference/libmspack/mspack/cabd.c", "rb").read()
    sizes = [900, 1400]
    folders = []
    pos = 0
    for s in sizes:
        raw = text[pos:pos + s]
        folders.append(([deflate(raw)], [s]))
        pos += s
    eng = TpuMszipEngine(interpret=True, phase_b="device")
    outs = eng.decode_folders(folders)
    assert outs is not None
    pos = 0
    for (frames, fsz), blob in zip(folders, outs):
        assert blob == text[pos:pos + fsz[0]]
        pos += fsz[0]
