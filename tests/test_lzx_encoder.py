"""Entropy-coded LZX encoder (compress/lzx_e) tests.

The reference has no LZX compressor (reference: lzxc.c:18 stub), so the
oracle discipline inverts: our encoder's streams must decode bit-exact
through BOTH our decoder (codecs/lzx.py) and the compiled reference
decoder (via the CAB/CHM/OAB drivers, tests/oracle.py).
"""
import os
import random
import tempfile

import pytest

import oracle
from libmspack_tpu.codecs.lzx import LzxDecompressor
from libmspack_tpu.compress import cab_c, chm_c, lzx_e, oab_c


def _decode(stream, wb, ri, out_len, is_delta=False, ref=None):
    pos = [0]

    def rd(n):
        c = stream[pos[0]:pos[0] + n]
        pos[0] += len(c)
        return c

    d = LzxDecompressor(rd, wb, ri, output_length=out_len, is_delta=is_delta)
    if ref:
        d.set_reference_data(ref)
    out = bytearray()
    d.decompress(out_len, out.extend)
    return bytes(out)


def _text(n, seed=1):
    rng = random.Random(seed)
    words = [bytes(rng.choices(b'abcdefgh <html></body> the and of ',
                               k=rng.randint(3, 12))) for _ in range(80)]
    return b''.join(rng.choice(words) for _ in range(n * 3))[:n]


CASES = [
    b"",
    b"x",
    b"hello hello hello",
    bytes(100000),
    _text(200000),
    os.urandom(70000),
    os.urandom(40000) + _text(90000) + bytes(5000),
]


@pytest.mark.parametrize("engine", ["python", "auto"])
@pytest.mark.parametrize("wb,ri", [(15, 0), (16, 2), (21, 0)])
def test_roundtrip(wb, ri, engine):
    for data in CASES:
        stream, offs = lzx_e.compress(data, wb, reset_interval=ri,
                                      engine=engine)
        assert _decode(stream, wb, ri, len(data)) == data
        nframes = max(1, (len(data) + 32767) // 32768)
        assert len(offs) == nframes
        assert offs[0] == 0
        assert all(o % 2 == 0 for o in offs)  # 16-bit unit boundaries


def test_compresses_text():
    data = _text(200000)
    stream, _ = lzx_e.compress(data, 16)
    assert len(stream) < len(data) // 3


def test_random_data_stays_stored():
    data = os.urandom(70000)
    stream, _ = lzx_e.compress(data, 15)
    assert len(stream) < len(data) + 200  # uncompressed blocks chosen


def test_reset_interval_random_access():
    """Every reset point must decode standalone (the CHM ResetTable /
    shard grid contract)."""
    data = _text(32768 * 6 + 1000, seed=9)
    ri = 2
    stream, offs = lzx_e.compress(data, 16, reset_interval=ri)
    for k in (2, 4):  # reset frames
        sub = stream[offs[k]:]
        out = _decode(sub, 16, ri, min(32768 * ri, len(data) - 32768 * k))
        assert out == data[32768 * k: 32768 * (k + ri)]


def test_delta_reference_matching():
    rng = random.Random(3)
    base = _text(120000, seed=4)
    t = bytearray(base)
    for _ in range(25):
        p = rng.randrange(len(t) - 60)
        t[p:p + 30] = os.urandom(30)
    target = bytes(t)
    wsz = ((len(base) + 32767) & ~32767) + len(target)
    wb = max(17, (wsz - 1).bit_length())
    stream, _ = lzx_e.compress(target, wb, is_delta=True, ref_data=base)
    assert _decode(stream, wb, 0, len(target), is_delta=True,
                   ref=base) == target
    assert len(stream) < len(target) // 10  # real delta savings


def test_delta_long_match_escape():
    data = (b'ABCDEFGH' * 64) * 100
    stream, _ = lzx_e.compress(data, 17, is_delta=True)
    assert len(stream) < 200
    assert _decode(stream, 17, 0, len(data), is_delta=True) == data


def test_tiny_pull_granularity_with_window_wrap():
    """Wrapped-window matches must survive any pull pattern: the
    decoder's handed-out counter (lzxd.c:622-628 check) can lag."""
    data = _text(250000, seed=5)
    stream, _ = lzx_e.compress(data, 15)
    pos = [0]

    def rd(n):
        c = stream[pos[0]:pos[0] + n]
        pos[0] += len(c)
        return c

    d = LzxDecompressor(rd, 15, 0, output_length=len(data))
    out = bytearray()
    rng = random.Random(6)
    while len(out) < len(data):
        d.decompress(min(rng.randint(1, 999), len(data) - len(out)),
                     out.extend)
    assert bytes(out) == data


# ----------------------------------------------------------------------
# reference-decoder oracle


FILES = [("docs/readme.txt", _text(90000, seed=7)),
         ("bin/app.exe", os.urandom(20000) + _text(45000, seed=8)),
         ("small.txt", b"hello world\n")]


@pytest.mark.parametrize("wb", [15, 17, 21])
def test_oracle_cab_lzx(wb):
    cab = cab_c.write_cab(files=FILES, compression="lzx", window_bits=wb)
    path = tempfile.mktemp(suffix=".cab")
    try:
        with open(path, "wb") as fh:
            fh.write(cab)
        err, outs = oracle.cab_extract_all(path)
        assert err == 0
        assert outs == [d for _, d in FILES]
    finally:
        os.unlink(path)


def test_oracle_chm_lzx():
    chm = chm_c.write_chm(FILES, window_bits=16, reset_frames=2)
    path = tempfile.mktemp(suffix=".chm")
    try:
        with open(path, "wb") as fh:
            fh.write(chm)
        err, names = oracle.chm_list(path)
        err2, outs = oracle.chm_extract_all(path)
        assert err == 0 and err2 == 0
        exp = dict(FILES)
        assert all(exp[m[3]] == o for m, o in zip(names, outs))
    finally:
        os.unlink(path)


def test_oracle_oab_entropy():
    data = _text(150000, seed=10)
    oab = oab_c.write_oab(data)
    err, out = oracle.oab_decompress(oab)
    assert err == 0 and out == data
    assert len(oab) < len(data) // 2

    rng = random.Random(11)
    base = _text(120000, seed=12)
    t = bytearray(base)
    for _ in range(20):
        p = rng.randrange(len(t) - 60)
        t[p:p + 30] = os.urandom(30)
    target = bytes(t) + _text(10000, seed=13)
    patch = oab_c.write_oab_patch(target, base)
    err, out = oracle.oab_decompress_incremental(patch, base)
    assert err == 0 and out == target
    assert len(patch) < len(target) // 10


def test_native_python_equivalence():
    """The native encoder follows the same algorithm; outputs must
    decode identically and be within a whisker in size (Huffman
    tie-breaking may differ)."""
    from libmspack_tpu import native
    if not native.available():
        pytest.skip("native engine unavailable")
    for data in CASES:
        ns, noffs = lzx_e.compress(data, 16, reset_interval=2,
                                   engine="auto")
        ps, poffs = lzx_e.compress(data, 16, reset_interval=2,
                                   engine="python")
        assert _decode(ns, 16, 2, len(data)) == data
        assert len(noffs) == len(poffs)
        assert abs(len(ns) - len(ps)) <= max(64, len(ps) // 100)


def test_native_delta_ref():
    from libmspack_tpu import native
    if not native.available():
        pytest.skip("native engine unavailable")
    base = _text(120000, seed=4)
    rng = random.Random(3)
    t = bytearray(base)
    for _ in range(25):
        p = rng.randrange(len(t) - 60)
        t[p:p + 30] = os.urandom(30)
    target = bytes(t)
    r = native.lzx_encode(target, 18, is_delta=True, ref_data=base)
    assert r is not None
    stream, _ = r
    assert _decode(stream, 18, 0, len(target), is_delta=True,
                   ref=base) == target
    assert len(stream) < len(target) // 10
