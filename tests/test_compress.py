"""Compress path: our writers' output must decode identically by the
reference decoder (oracle) and by our decoders.

The reference has NO compressors (all stubs: cabc.c, chmc.c, mszipc.c,
lzxc.c, szddc.c, kwajc.c); these tests pin our compress capability as a
superset of the reference while remaining format-compatible.
"""
import hashlib
import os
import random
import tempfile

import pytest

import oracle
from libmspack_tpu.compress import cab_c, chm_c, lzss_c
from libmspack_tpu.formats.cab import CabDecompressor
from libmspack_tpu.formats.chm import ChmDecompressor
from libmspack_tpu.formats.kwaj import KwajDecompressor
from libmspack_tpu.system import BytesSink


def corpora():
    rng = random.Random(99)
    return [
        ("empty", b""),
        ("tiny", b"Hi!"),
        ("text", b"The quick brown fox jumps over the lazy dog. " * 800),
        ("binary", bytes(rng.randrange(256) for _ in range(70000))),
        ("zeros", b"\x00" * 100000),
        ("repeat", b"abcdefgh" * 12000),
    ]


def _write_tmp(data: bytes) -> str:
    fd, path = tempfile.mkstemp(suffix=".bin")
    os.write(fd, data)
    os.close(fd)
    return path


@pytest.mark.parametrize("compression", ["none", "mszip", "quantum", "lzx"])
def test_cab_writer_roundtrip(compression):
    files = [(name, data) for name, data in corpora() if data]
    cab_bytes = cab_c.write_cab(files=files, compression=compression)
    path = _write_tmp(cab_bytes)
    try:
        # reference decodes our cab
        ref_err, ref_outs = oracle.cab_extract_all(path)
        assert ref_err == 0, f"oracle rejected our {compression} cab: {ref_err}"
        assert ref_outs == [d for _, d in files]
        # we decode our cab
        d = CabDecompressor()
        cab = d.open(cab_bytes)
        assert [f.filename for f in cab.files] == [n for n, _ in files]
        for f, (_, data) in zip(cab.files, files):
            s = BytesSink()
            d.extract(f, s)
            assert s.getvalue() == data, f.filename
    finally:
        os.unlink(path)


def test_qtm_native_encoder_matches_python():
    """The native msp_qtm_encode port must produce streams both our
    decoders and the reference accept; on these corpora it also matches
    the python reference encoder byte-for-byte (same algorithm)."""
    from libmspack_tpu import native
    from libmspack_tpu.compress import qtm_e
    if not native.available():
        pytest.skip("native engine unavailable")
    rng = random.Random(41)
    for data, wb in [(b"native encoder parity " * 2000, 15),
                     (bytes(rng.randrange(256) for _ in range(40000)), 16)]:
        nat = native.qtm_encode(data, wb)
        py = qtm_e.QtmEncoder(wb).compress(data)
        assert nat == py
        stream = b"".join(p + b"\xff" for p in nat)
        assert native.qtm_decode(stream, wb, len(data)) == data


def test_qtm_encoder_stress():
    """Quantum encoder edge grid: window smaller than a frame (decoder
    wrap-copy path), exact frame boundaries, adaptive-model rescale on
    high-entropy data, long matches capped at 259."""
    rng = random.Random(7)
    cases = [
        (b"The quick brown fox. " * 4000, 10),     # 1 KiB window << frame
        (b"x" * 32768, 15),                        # exactly one frame
        (bytes(rng.randrange(256) for _ in range(65536)), 15),
        (b"ab" * 40000, 12),                       # max-length matches
    ]
    folders = [cab_c.FolderSpec([(f"f{i}", data)], "quantum", wb)
               for i, (data, wb) in enumerate(cases)]
    cab_bytes = cab_c.write_cab(folders=folders)
    path = _write_tmp(cab_bytes)
    try:
        ref_err, ref_outs = oracle.cab_extract_all(path)
        assert ref_err == 0
        assert ref_outs == [d for d, _ in cases]
        d = CabDecompressor()
        cab = d.open(cab_bytes)
        for f, (data, _) in zip(cab.files, cases):
            s = BytesSink()
            d.extract(f, s)
            assert s.getvalue() == data, f.filename
    finally:
        os.unlink(path)


def test_cab_writer_multi_folder():
    folders = [
        cab_c.FolderSpec([("a.txt", b"folder one data " * 100)], "mszip"),
        cab_c.FolderSpec([("b.bin", bytes(range(256)) * 300)], "lzx", 15),
        cab_c.FolderSpec([("c.raw", b"\xFF" * 5000)], "none"),
    ]
    cab_bytes = cab_c.write_cab(folders=folders)
    path = _write_tmp(cab_bytes)
    try:
        ref_err, ref_outs = oracle.cab_extract_all(path)
        assert ref_err == 0
        assert ref_outs == [b"folder one data " * 100,
                            bytes(range(256)) * 300, b"\xFF" * 5000]
    finally:
        os.unlink(path)


@pytest.mark.parametrize("window_bits,reset_frames", [(16, 2), (15, 1), (17, 4)])
def test_chm_writer_roundtrip(window_bits, reset_frames):
    files = [(f"/{name}.txt", data) for name, data in corpora()]
    chm_bytes = chm_c.write_chm(files, window_bits=window_bits,
                                reset_frames=reset_frames)
    path = _write_tmp(chm_bytes)
    try:
        ref_err, ref_list = oracle.chm_list(path)
        assert ref_err == 0
        ref_err, ref_outs = oracle.chm_extract_all(path)
        assert ref_err == 0, f"oracle rejected our chm: {ref_err}"
        # order: oracle lists files in directory order; map by name
        ref_names = [name for (_, _, _, name) in ref_list]
        expect = dict((n, d) for n, d in files)
        for name, out in zip(ref_names, ref_outs):
            assert out == expect[name], name

        d = ChmDecompressor()
        chm = d.open(chm_bytes)
        assert sorted(f.filename for f in chm.files) == \
            sorted(n for n, _ in files)
        for f in chm.files:
            s = BytesSink()
            d.extract(f, s)
            assert s.getvalue() == expect[f.filename], f.filename
    finally:
        os.unlink(path)


def test_chm_fast_find_matches_listing():
    """fast_find (PMGL quickref search) must agree with the full listing
    (reference: chmd_test.c:98-126)."""
    files = [(f"/file{i:03d}.txt", f"contents {i} ".encode() * (i + 1))
             for i in range(60)]
    chm_bytes = chm_c.write_chm(files)
    d = ChmDecompressor()
    chm = d.open(chm_bytes)
    for f in chm.files:
        found = d.fast_find(chm, f.filename)
        assert found is not None, f.filename
        assert found.offset == f.offset and found.length == f.length
        assert found.section.id == f.section.id
    assert d.fast_find(chm, "/no-such-file") is None
    # case-insensitive lookup
    found = d.fast_find(chm, "/FILE007.TXT")
    assert found is not None and found.length == chm.files[7].length


def test_chm_sequential_and_backtrack_extract():
    """Extract in reverse order to force LZX rewinds (reset-table seeks)."""
    files = [(f"/f{i}.bin", bytes((i * 37 + j) & 0xFF for j in range(40000)))
             for i in range(4)]
    chm_bytes = chm_c.write_chm(files, reset_frames=1)
    d = ChmDecompressor()
    chm = d.open(chm_bytes)
    expect = dict(files)
    for f in reversed(list(chm.files)):
        s = BytesSink()
        d.extract(f, s)
        assert s.getvalue() == expect[f.filename], f.filename


def test_kwaj_mszip_roundtrip():
    data = b"MSZIP inside KWAJ! " * 500
    kwj = lzss_c.kwaj_compress(data, method=4, filename="mz.bin")
    err, ref_out = oracle.kwaj_decompress(kwj)
    assert err == 0 and ref_out == data
    assert KwajDecompressor().decompress_bytes(kwj) == data
