"""Quantum Pallas kernel (phase A) tests, interpreter mode.

Cases pin the adaptive-model machinery against the scalar codec:
window wrap + ring-alias splits (wb=10 window smaller than the data),
model halve-rescales and the every-5th exchange re-sort (>2400
selector decodes), literal-only content, and the engine wiring.
Interpret runs use a 1x128 lane grid — per-step cost scales with the
grid, and Mosaic tiling doesn't apply in interpreter mode. Full
32 KiB frames + 1024-lane compiled runs are chip territory
(tools/bench_kernels.py: pallas_qtm.bench_entry, 256 lanes bit-exact).
"""
import numpy as np
import pytest

from libmspack_tpu.compress import qtm_e
from libmspack_tpu.ops import pallas_qtm as pq


def _stream(data, wb):
    frames = qtm_e.compress(data, wb)
    return b"".join(p + b"\xff" for p in frames)


def _roundtrip(data, wb):
    s = _stream(data, wb)
    tok, litw, cnt = pq.qtm_phase_a([s], [len(data)], wb, SL=1,
                                    LN=128, T_PAD=len(data) * 3 + 512,
                                    interpret=True)
    c = np.asarray(cnt)
    assert c[0, 0] == 0, f"kernel err {c[0, 0]}"
    assert c[1, 0] == len(data)
    got = pq.replay_trace(np.asarray(tok)[:, 0], np.asarray(litw)[:, 0],
                          len(data), wb)
    assert got == data


def test_qtm_window_wrap_and_rescales():
    text = open("/root/reference/libmspack/mspack/qtmd.c", "rb").read()
    _roundtrip(text[:3000], 10)   # wraps the 1 KiB window; sorts fire


def test_qtm_literal_heavy():
    rng = np.random.RandomState(6)
    _roundtrip(rng.randint(0, 256, 1200).astype(np.uint8).tobytes(),
               12)


def test_qtm_rle_matches():
    _roundtrip((bytes([5]) * 700 + b"abcdef" * 150
                + bytes([9]) * 400)[:2000], 10)


def test_qtm_engine_batch():
    """TpuQtmEngine end-to-end with the native trace resolver."""
    from libmspack_tpu import native
    from libmspack_tpu.parallel.tpu_pipeline import TpuQtmEngine
    if not native.available():
        pytest.skip("native engine unavailable")
    text = open("/root/reference/libmspack/mspack/cabd.c", "rb").read()
    datas = [text[:900], text[900:2100]]
    wb = 11
    streams = [_stream(d, wb) for d in datas]
    eng = TpuQtmEngine(interpret=True)
    outs = eng.decode_streams(streams, [len(d) for d in datas], wb)
    assert outs is not None
    for got, want in zip(outs, datas):
        assert got == want
    assert eng.n_decoded == 2
