"""SZDD + KWAJ drivers and LZSS/LZH codecs vs the reference oracle."""
import glob
import hashlib
import os
import random

import pytest

import oracle
from libmspack_tpu import errors
from libmspack_tpu.compress import lzss_c
from libmspack_tpu.formats.kwaj import KwajDecompressor
from libmspack_tpu.formats.szdd import SzddDecompressor


def _random_corpus():
    rng = random.Random(1234)
    samples = [
        b"",
        b"a",
        b"hello world " * 100,
        bytes(rng.randrange(256) for _ in range(3000)),
        bytes(rng.choice(b"abcd") for _ in range(5000)),
        (b"\x20" * 500) + b"The quick brown fox" * 30,
        bytes(range(256)) * 8,
    ]
    return samples


@pytest.mark.parametrize("idx", range(7))
def test_szdd_roundtrip_vs_oracle(idx):
    """Our SZDD compressor's output must decode identically by both the
    reference decoder and ours."""
    data = _random_corpus()[idx]
    szdd = lzss_c.szdd_compress(data, missing_char=ord("x"))
    err, ref_out = oracle.szdd_decompress(szdd)
    assert err == 0
    assert ref_out == data
    ours = SzddDecompressor().decompress_bytes(szdd)
    assert ours == data


def test_szdd_header_fields():
    szdd = lzss_c.szdd_compress(b"payload data here", missing_char=ord("p"))
    f = SzddDecompressor().open(szdd)
    assert f.length == 17
    assert f.missing_char == ord("p")


def test_szdd_bad_signature():
    with pytest.raises(errors.SignatureError):
        SzddDecompressor().open(b"NOTSZDD!" + b"\x00" * 20)


def test_szdd_truncated():
    with pytest.raises(errors.ReadError):
        SzddDecompressor().open(b"SZDD\x88\xf0\x27\x33")


@pytest.mark.parametrize("method", [0, 1, 2])
def test_kwaj_roundtrip_vs_oracle(method):
    for data in _random_corpus():
        kwj = lzss_c.kwaj_compress(data, method=method, filename="test.txt")
        err, ref_out = oracle.kwaj_decompress(kwj)
        assert err == 0, f"oracle rejected our kwaj (method {method}): {err}"
        assert ref_out == data
        ours = KwajDecompressor().decompress_bytes(kwj)
        assert ours == data


def test_kwaj_filename_matrix_vs_oracle():
    """All f00..f94 header-matrix files must parse (or fail) exactly as
    the reference does (reference: libmspack/test/kwajd_test.c:40-113)."""
    files = sorted(glob.glob(os.path.join(oracle.REF_TEST_FILES,
                                          "kwajd", "f*.kwj")))
    assert len(files) == 50
    d = KwajDecompressor()
    checked = 0
    for path in files:
        import ctypes
        namebuf = ctypes.create_string_buffer(64)
        length = ctypes.c_uint(0)
        ref_err = oracle.lib().oracle_kwaj_header(
            path.encode(), namebuf, 64, ctypes.byref(length))
        try:
            f = d.open(path)
            our_err = 0
            our_name = f.filename if f.filename is not None else "<none>"
        except errors.MSPackError as e:
            our_err = int(e.code)
            our_name = None
        assert our_err == ref_err, f"{path}: our={our_err} ref={ref_err}"
        if ref_err == 0:
            assert our_name == namebuf.value.decode("latin-1"), path
        checked += 1
    assert checked == len(files)


def test_kwaj_corpus_files_decode_like_oracle():
    """Every decodable reference KWAJ sample must produce identical bytes."""
    files = sorted(glob.glob(os.path.join(oracle.REF_TEST_FILES,
                                          "kwajd", "*.kwj")))
    d = KwajDecompressor()
    for path in files:
        with open(path, "rb") as fh:
            data = fh.read()
        ref_err, ref_out = oracle.kwaj_decompress(data)
        try:
            ours = d.decompress_bytes(data)
            our_err = 0
        except errors.MSPackError as e:
            our_err = int(e.code)
            ours = None
        assert our_err == ref_err, f"{path}: our={our_err} ref={ref_err}"
        if ref_err == 0:
            assert ours == ref_out, path
