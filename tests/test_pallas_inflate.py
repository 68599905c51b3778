"""Pallas entropy-kernel (phase A) + trace-resolve (phase B) tests.

Runs the kernel in interpreter mode on CPU (bit-exactness of the
lane-parallel deflate decode); the real-chip path is exercised by
tools/tpu_inflate_bench.py and bench.py. Interpreted steps are slow,
so frames here are small.
"""
import os
import zlib

import numpy as np
import pytest

from libmspack_tpu.ops import pallas_inflate as pa


def deflate(raw, level=6):
    co = zlib.compressobj(level, zlib.DEFLATED, -15)
    return co.compress(raw) + co.flush()


def test_phase_a_mixed_blocks_bit_exact():
    rng = np.random.RandomState(7)
    raws = [
        (b"the quick brown fox " * 20)[:333],     # dynamic
        bytes(rng.randint(0, 256, 200).astype(np.uint8).tobytes()),  # stored
        b"A" * 60,                                 # fixed
    ]
    frames = [deflate(r, lv) for r, lv in zip(raws, (9, 6, 1))]
    tok, litw, cnt = pa.inflate_phase_a(frames, hists=[0] * 3,
                                        T_PAD=1024, interpret=True)
    tok = np.asarray(tok)
    litw = np.asarray(litw)
    cnt = np.asarray(cnt)
    for i, raw in enumerate(raws):
        assert cnt[0, i] == 0, f"lane {i} err {cnt[0, i]}"
        assert cnt[1, i] == len(raw)
        assert pa.replay_trace(tok[:, i], litw[:, i], len(raw)) == raw


def test_phase_a_history_chain_and_native_resolve():
    # two frames of one folder: frame 1 matches reach into frame 0
    base = (b"abcdefgh" * 40)[:300]
    raw0 = base
    raw1 = base  # compressor with dict would back-reference; emulate by
    # compressing the concatenation and splitting at a frame boundary is
    # not possible with zlib alone, so use an explicit dictionary.
    co = zlib.compressobj(9, zlib.DEFLATED, -15)
    f0 = co.compress(raw0) + co.flush()
    co = zlib.compressobj(9, zlib.DEFLATED, -15, 9,
                          zlib.Z_DEFAULT_STRATEGY, raw0)
    f1 = co.compress(raw1) + co.flush()
    tok, litw, cnt = pa.inflate_phase_a([f0, f1], hists=[0, 32768],
                                        T_PAD=768, interpret=True)
    cnt = np.asarray(cnt)
    assert list(cnt[0, :2]) == [0, 0]
    tokT = np.ascontiguousarray(np.asarray(tok).T)
    litT = np.ascontiguousarray(np.asarray(litw).T)
    from libmspack_tpu import native
    if not native.available():
        pytest.skip("native engine unavailable")
    out = np.zeros(600, np.uint8)
    r = native.resolve_traces(tokT, litT, [0], [2], [300, 300], out,
                              [0, 600], 2)
    assert r == 0
    assert out.tobytes() == raw0 + raw1


def test_trace_resolver_rejects_bad_dist():
    # match before any output -> resolver error, not a crash
    tok = np.full((1, 8), -1, np.int32)
    tok[0, 0] = pa.TOK_MATCH | (4 << 16) | 3
    litw = np.zeros((1, 8), np.int32)
    from libmspack_tpu import native
    if not native.available():
        pytest.skip("native engine unavailable")
    out = np.zeros(8, np.uint8)
    r = native.resolve_traces(tok, litw, [0], [1], [4], out, [0, 4], 1)
    assert r != 0


@pytest.mark.skipif(not os.environ.get("MSPACK_TPU_TESTS"),
                    reason="real-chip compiled-mode test; set "
                           "MSPACK_TPU_TESTS=1 (one TPU job at a time)")
def test_phase_a_compiled_full_frames_on_chip():
    """Compiled (non-interpret) bit-exactness on the real device:
    full 32 KiB frames with cross-frame history, both kernels.

    Runs in a subprocess because conftest pins this process to the
    virtual CPU mesh."""
    import subprocess
    import sys
    env = {k: v for k, v in os.environ.items() if k != "JAX_PLATFORMS"}
    code = r'''
import numpy as np, zlib
from libmspack_tpu.ops import pallas_inflate as pa
from libmspack_tpu.ops import pallas_lzx as plx
from libmspack_tpu.compress.lzx_e import LzxEncoder
base = open("/root/reference/libmspack/mspack/lzxd.c", "rb").read() * 3
data = base[:65536]
f0 = zlib.compressobj(9, zlib.DEFLATED, -15)
s0 = f0.compress(data[:32768]) + f0.flush()
f1 = zlib.compressobj(9, zlib.DEFLATED, -15, 9,
                      zlib.Z_DEFAULT_STRATEGY, data[:32768])
s1 = f1.compress(data[32768:]) + f1.flush()
tok, litw, cnt = pa.inflate_phase_a([s0, s1], hists=[0, 32768])
c = np.asarray(cnt)
assert (c[0, :2] == 0).all(), c[0, :2]
t, l = np.asarray(tok), np.asarray(litw)
got0 = pa.replay_trace(t[:, 0], l[:, 0], 32768)
assert got0 == data[:32768]
got1 = pa.replay_trace(t[:, 1], l[:, 1], 32768, hist=got0)
assert got1 == data[32768:]
lz = LzxEncoder(16).compress(data)[0]
tok, litw, cnt = plx.lzx_phase_a([lz], [len(data)], 16,
                                 T_PAD=len(data) + 4096)
c = np.asarray(cnt)
assert c[0, 0] == 0 and c[1, 0] == len(data)
got = plx.replay_trace(np.asarray(tok)[:, 0], np.asarray(litw)[:, 0],
                       len(data), 16)
assert got == data
print("COMPILED-CHIP-OK")
'''
    r = subprocess.run([sys.executable, "-c", code], env=env,
                       capture_output=True, text=True, timeout=1500)
    assert "COMPILED-CHIP-OK" in r.stdout, r.stderr[-2000:]
