"""Pallas LZX entropy-kernel (phase A) bit-exactness tests.

Interpreter mode on CPU (chip runs via tools/bench_kernels.py).
Streams come from the project's own LZX encoder and from the
reference's golden cab, both pinned against the scalar decoder
(codecs/lzx.py), which is itself oracle-verified.
"""
import hashlib
import os
import random

import numpy as np
import pytest

from libmspack_tpu.ops import pallas_lzx as plx


def encode_lzx(data, window_bits=15):
    from libmspack_tpu.compress.lzx_e import LzxEncoder
    enc = LzxEncoder(window_bits)
    return enc.compress(data)[0]


def scalar_decode(stream, out_len, window_bits, reset_interval=0):
    from libmspack_tpu.codecs.lzx import LzxDecompressor
    pos = [0]
    def rd(n):
        b = stream[pos[0]:pos[0] + n]
        pos[0] += len(b)
        return b
    out = bytearray()
    d = LzxDecompressor(rd, window_bits, reset_interval, out_len)
    d.decompress(out_len, out.extend)
    return bytes(out)


def run_lanes(streams, out_lens, wb, t_pad=None):
    tok, litw, cnt = plx.lzx_phase_a(
        streams, out_lens, wb, T_PAD=t_pad, interpret=True)
    return np.asarray(tok), np.asarray(litw), np.asarray(cnt)


def test_phase_a_verbatim_small():
    rng = random.Random(3)
    datas = [
        (b"lzx lane parallel kernel " * 40)[:987],
        bytes(rng.randrange(256) for _ in range(700)),
        (b"A" * 500 + b"B" * 300 + b"the quick brown fox " * 30),
    ]
    streams = [encode_lzx(d, 15) for d in datas]
    # scalar pin first (encoder round-trip)
    for st, d in zip(streams, datas):
        assert scalar_decode(st, len(d), 15) == d
    tok, litw, cnt = run_lanes(streams, [len(d) for d in datas], 15,
                               t_pad=4096)
    for i, d in enumerate(datas):
        assert cnt[0, i] == 0, f"lane {i} err={cnt[0, i]}"
        assert cnt[1, i] == len(d)
        got = plx.replay_trace(tok[:, i], litw[:, i], len(d), 15)
        assert got == d, f"lane {i} mismatch"


def test_phase_a_reference_golden_cab_folder():
    """The reference's own lzx.txt member, full folder on one lane."""
    import oracle
    from libmspack_tpu.formats.cab import CabDecompressor
    path = os.path.join(oracle.REF_TEST_FILES, "cabd",
                        "mszip_lzx_qtm.cab")
    d = CabDecompressor()
    cab = d.open(path)
    fol = next(f.folder for f in cab.files if f.filename == "lzx.txt")
    blocks, sizes = d.collect_raw_blocks(fol)
    stream = b"".join(blocks)
    out_len = sum(sizes)
    wb = (fol.comp_type >> 8) & 0x1F
    tok, litw, cnt = run_lanes([stream], [out_len], wb,
                               t_pad=out_len + 2048)
    assert cnt[0, 0] == 0
    assert cnt[1, 0] == out_len
    got = plx.replay_trace(tok[:, 0], litw[:, 0], out_len, wb)
    if cnt[4, 0] and cnt[5, 0]:
        got = plx.e8_decode(got, int(cnt[5, 0]))
    lzx_member = next(f for f in cab.files if f.filename == "lzx.txt")
    assert hashlib.md5(
        got[lzx_member.offset:lzx_member.offset + lzx_member.length]
    ).hexdigest() == "703474293b614e7110b3eb8ac2762b53"


def test_phase_a_multiframe_and_uncompressed():
    """>1 frame (realign path) plus an incompressible segment."""
    rng = random.Random(9)
    data = ((b"seq " * 4000)
            + bytes(rng.randrange(256) for _ in range(9000))
            + (b"tail block " * 3000))[:70000]
    stream = encode_lzx(data, 16)
    assert scalar_decode(stream, len(data), 16) == data
    tok, litw, cnt = run_lanes([stream], [len(data)], 16,
                               t_pad=len(data) + 2048)
    assert cnt[0, 0] == 0, f"err={cnt[0, 0]} out={cnt[1, 0]}"
    assert cnt[1, 0] == len(data)
    got = plx.replay_trace(tok[:, 0], litw[:, 0], len(data), 16)
    assert got == data


def test_phase_a_delta_with_reference_data():
    """LZX DELTA: window-tail reference data + long-match escape.
    Stream pinned by the scalar decoder first, then the kernel."""
    import random
    rng = random.Random(77)
    base = (b"delta reference base content " * 300
            + bytes(rng.randrange(256) for _ in range(500)))
    # new version: mostly the base with edits -> long matches into ref
    data = bytearray(base)
    for _ in range(12):
        p = rng.randrange(len(data) - 30)
        data[p:p + 8] = bytes(rng.randrange(256) for _ in range(8))
    data = bytes(data + b"tail addition " * 40)
    from libmspack_tpu.compress.lzx_e import LzxEncoder
    wb = 17
    enc = LzxEncoder(wb, is_delta=True)
    stream = enc.compress(data, ref_data=base)[0]

    # scalar pin
    from libmspack_tpu.codecs.lzx import LzxDecompressor
    pos = [0]
    def rd(n):
        b = stream[pos[0]:pos[0] + n]
        pos[0] += len(b)
        return b
    out = bytearray()
    d = LzxDecompressor(rd, wb, 0, len(data), is_delta=True)
    d.set_reference_data(base)
    d.decompress(len(data), out.extend)
    assert bytes(out) == data

    tok, litw, cnt = plx.lzx_phase_a(
        [stream], [len(data)], wb, hists=[len(base)], is_delta=True,
        T_PAD=len(data) + 4096, interpret=True)
    cnt = np.asarray(cnt)
    assert cnt[0, 0] == 0, f"err={cnt[0, 0]}"
    assert cnt[1, 0] == len(data)
    got = plx.replay_trace(np.asarray(tok)[:, 0], np.asarray(litw)[:, 0],
                           len(data), wb, ref_data=base)
    assert got == data


@pytest.mark.skipif(not os.environ.get("MSPACK_TPU_TESTS"),
                    reason="real-chip compiled-mode test; set "
                           "MSPACK_TPU_TESTS=1 (one TPU job at a time)")
def test_segmented_folder_state_export_on_chip():
    """A 300 KB reset-interval-0 CAB-style LZX folder decodes through
    5 kernel launches, exporting/importing the full entropy state
    (trees, bit cursor, LRU, block position) at each 64 KiB frame
    boundary — bit-exact vs the source (cabd.c:1249-1250 never
    resets, so segmenting is the only way a folder of unbounded size
    rides the lane kernel)."""
    import subprocess
    import sys
    env = {k: v for k, v in os.environ.items() if k != "JAX_PLATFORMS"}
    code = r'''
from libmspack_tpu.compress.lzx_e import LzxEncoder
from libmspack_tpu.parallel.tpu_pipeline import TpuLzxEngine
text = open("/root/reference/libmspack/mspack/cabd.c", "rb").read()
data = (text * 10)[:300 * 1024]
s = LzxEncoder(16).compress(data)[0]
eng = TpuLzxEngine()
outs = eng.decode_streams([s], [len(data)], 16)
assert outs is not None and outs[0] == data
print("SEGMENTED-OK")
'''
    r = subprocess.run([sys.executable, "-c", code], env=env,
                       capture_output=True, text=True, timeout=900)
    assert "SEGMENTED-OK" in r.stdout, r.stderr[-2000:]
