"""OAB driver + writer vs the reference oracle."""
import random

import pytest

import oracle
from libmspack_tpu import errors
from libmspack_tpu.compress import oab_c
from libmspack_tpu.formats.oab import OabDecompressor, crc32_raw


def _data(n, seed=7):
    rng = random.Random(seed)
    return bytes(rng.randrange(256) for _ in range(n // 2)) + \
        b"pattern " * (n // 16) + b"\x00" * (n - n // 2 - (n // 16) * 8)


@pytest.mark.parametrize("size,compress", [
    (100, True), (100, False), (70000, True), (70000, False),
    (200001, True),
])
def test_oab_full_roundtrip(size, compress):
    data = _data(size)
    oab = oab_c.write_oab(data, compress=compress)
    err, ref_out = oracle.oab_decompress(oab)
    assert err == 0, f"oracle rejected our OAB: {err}"
    assert ref_out == data
    assert OabDecompressor().decompress_bytes(oab) == data


def test_oab_incremental_roundtrip():
    base = _data(90000, seed=1)
    target = _data(120000, seed=2)
    patch = oab_c.write_oab_patch(target, base)
    err, ref_out = oracle.oab_decompress_incremental(patch, base)
    assert err == 0, f"oracle rejected our patch: {err}"
    assert ref_out == target
    ours = OabDecompressor().decompress_incremental_bytes(patch, base)
    assert ours == target


def test_oab_bad_crc_rejected():
    data = b"payload " * 1000
    oab = bytearray(oab_c.write_oab(data))
    # corrupt the stored CRC of the first block (offset 16+12)
    oab[16 + 12] ^= 0xFF
    err, _ = oracle.oab_decompress(bytes(oab))
    assert err == 9  # MSPACK_ERR_CHECKSUM
    with pytest.raises(errors.ChecksumError):
        OabDecompressor().decompress_bytes(bytes(oab))


def test_oab_bad_version():
    bad = (4).to_bytes(4, "little") + (1).to_bytes(4, "little") + b"\x00" * 8
    err, _ = oracle.oab_decompress(bad)
    assert err == 7  # MSPACK_ERR_SIGNATURE
    with pytest.raises(errors.SignatureError):
        OabDecompressor().decompress_bytes(bad)


def test_crc32_raw_matches_reference_table():
    import ctypes
    lib = oracle.lib()
    # the reference exposes crc32_table; drive it via a tiny known vector
    data = b"123456789"
    # reference crc starts 0xFFFFFFFF, no final xor
    # standard check value 0xCBF43926 is the *inverted* CRC; the raw
    # register value the OAB format stores is its complement
    assert crc32_raw(data) == 0xCBF43926 ^ 0xFFFFFFFF == 0x340BC6D9


def test_oab_engine_tpu_parity():
    """engine='tpu' routes blocks through the Pallas LZX lane kernel
    with DELTA reference data preloaded at the window tail
    (lzxd.c:348-382); bit-exact vs the oracle for both full (v3.1)
    and incremental (v3.2) downloads (VERDICT r4 item 5)."""
    from libmspack_tpu import native
    if not native.available():
        pytest.skip("native engine unavailable")

    data = _data(70000, seed=3)
    oab = oab_c.write_oab(data, compress=True)
    err, ref_out = oracle.oab_decompress(oab)
    assert err == 0 and ref_out == data
    d = OabDecompressor(engine="tpu")
    assert d.decompress_bytes(oab) == data
    # the kernel path actually decoded (not a silent fallback)
    assert getattr(d, "_tpu_lzx_engine", None) is not None
    assert d._tpu_lzx_engine.n_decoded >= 1, \
        getattr(d, "fallback_reasons", {})

    base = _data(60000, seed=4)
    target = _data(90000, seed=5)
    patch = oab_c.write_oab_patch(target, base)
    err, ref_out = oracle.oab_decompress_incremental(patch, base)
    assert err == 0 and ref_out == target
    d2 = OabDecompressor(engine="tpu")
    before = 0
    ours = d2.decompress_incremental_bytes(patch, base)
    assert ours == target
    assert d2._tpu_lzx_engine.n_decoded > before, \
        getattr(d2, "fallback_reasons", {})
