"""Device ops vs scalar reference implementations (CPU-emulated TPU)."""
import random

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
import jax

from libmspack_tpu.codecs import lzss as lzss_scalar
from libmspack_tpu.codecs.lzx import _e8_transform
from libmspack_tpu.compress import lzss_c
from libmspack_tpu.formats.cab import _checksum
from libmspack_tpu.formats.oab import crc32_raw
from libmspack_tpu.ops import bitview, checksum, crc32, e8, lzss_jax, search
from libmspack_tpu.ops.match_resolve import resolve


def test_peek_lsb_matches_scalar():
    rng = random.Random(5)
    data = bytes(rng.randrange(256) for _ in range(256))
    arr = bitview.pad_to(jnp.asarray(np.frombuffer(data, np.uint8)))
    for nbits in (1, 3, 8, 15, 16):
        pos = np.array([0, 1, 7, 8, 100, 2040 - nbits], dtype=np.int32)
        got = np.asarray(bitview.peek_lsb(arr, jnp.asarray(pos), nbits))
        for p, g in zip(pos, got):
            total = int.from_bytes(data, "little")
            want = (total >> int(p)) & ((1 << nbits) - 1)
            assert g == want, (p, nbits)


def test_peek_msb16_matches_scalar():
    rng = random.Random(6)
    data = bytes(rng.randrange(256) for _ in range(64))
    arr = bitview.pad_to(jnp.asarray(np.frombuffer(data, np.uint8)))
    # scalar model: bit k of the MSB-u16le stream
    units = [data[i + 1] << 8 | data[i] for i in range(0, len(data), 2)]
    bitstr = "".join(f"{u:016b}" for u in units)
    for nbits in (1, 5, 16, 17):
        for p in (0, 1, 15, 16, 17, 100, len(bitstr) - nbits):
            got = int(bitview.peek_msb16(arr, jnp.asarray([p], np.int32),
                                         nbits)[0])
            want = int(bitstr[p : p + nbits], 2)
            assert got == want, (p, nbits)


def test_match_resolve_overlapping():
    # "abc" + match(dist=2, len=5) -> abcbcbcb
    ptr = np.array([0, 1, 2, 1, 2, 3, 4, 5], np.int32)
    lit = np.array([97, 98, 99, 0, 0, 0, 0, 0], np.uint8)
    out = np.asarray(resolve(jnp.asarray(ptr), jnp.asarray(lit)))
    assert bytes(out) == b"abcbcbcb"


def test_match_resolve_prehistory_fill():
    ptr = np.array([-3, -2, 0, 1], np.int32)
    lit = np.array([0, 0, 0, 0], np.uint8)
    out = np.asarray(resolve(jnp.asarray(ptr), jnp.asarray(lit), fill=0x20))
    assert bytes(out) == b"\x20\x20\x20\x20"


def test_match_resolve_history_buffer():
    hist = jnp.asarray(np.frombuffer(b"XYZ", np.uint8))
    ptr = np.array([-2, -1, 0], np.int32)
    lit = np.array([0, 0, 0], np.uint8)
    out = np.asarray(resolve(jnp.asarray(ptr), jnp.asarray(lit), history=hist))
    assert bytes(out) == b"YZY"


@pytest.mark.parametrize("mode", [lzss_scalar.MODE_EXPAND,
                                  lzss_scalar.MODE_MSHELP,
                                  lzss_scalar.MODE_QBASIC])
def test_lzss_jax_bit_exact(mode):
    rng = random.Random(42)
    for data in [b"", b"A", b"hello world " * 200,
                 bytes(rng.randrange(256) for _ in range(5000)),
                 bytes(rng.choice(b"ab") for _ in range(4000)),
                 b"\x20" * 300 + b"xyz" * 500]:
        stream = lzss_c.compress(data, mode)
        want = lzss_scalar.decompress(stream, mode)
        got = lzss_jax.decompress(stream, mode)
        assert got == want, (mode, len(data))


def test_lzss_jax_truncated_stream():
    data = b"some repeated data " * 50
    stream = lzss_c.compress(data, lzss_scalar.MODE_EXPAND)
    for cut in (1, 7, 13, len(stream) - 1):
        t = stream[:cut]
        assert lzss_jax.decompress(t) == lzss_scalar.decompress(t)


def test_e8_matches_scalar():
    rng = random.Random(9)
    for trial in range(6):
        n = rng.choice([64, 500, 32768])
        frame = bytearray(rng.randrange(256) for _ in range(n))
        # salt with extra E8s
        for _ in range(n // 20):
            frame[rng.randrange(n)] = 0xE8
        offset = rng.randrange(0, 1 << 20)
        filesize = rng.randrange(1, 1 << 24)
        want = bytes(_e8_transform(bytearray(frame), offset, filesize))
        got = bytes(np.asarray(e8.e8_transform(
            jnp.asarray(np.frombuffer(bytes(frame), np.uint8)),
            jnp.int32(offset), jnp.int32(filesize), True)))
        assert got == want, trial


def test_cab_checksum_matches_scalar():
    rng = random.Random(10)
    for n in (0, 1, 2, 3, 4, 5, 1000, 4093):
        data = bytes(rng.randrange(256) for _ in range(n))
        assert checksum.cab_checksum(data, 0) == _checksum(data, 0), n
        assert checksum.cab_checksum(data, 0xDEADBEEF) == \
            _checksum(data, 0xDEADBEEF), n


def test_search_positions():
    data = b"xxMSCFyyMSCzMSCF" + b"q" * 100 + b"MSCF"
    assert search.signature_positions(data) == [2, 12, 116]
    assert search.signature_positions(b"MSC") == []


def test_crc32_device_matches_scalar():
    rng = random.Random(11)
    for n in (0, 1, 63, 64, 65, 300):
        data = bytes(rng.randrange(256) for _ in range(n))
        assert crc32.crc32_device(data, chunk_bytes=64) == crc32_raw(data), n


def test_crc32_device_batch():
    rng = random.Random(12)
    blocks = np.array([[rng.randrange(256) for _ in range(64)]
                       for _ in range(8)], np.uint8)
    got = np.asarray(crc32.crc32_device_batch(jnp.asarray(blocks),
                                              chunk_bytes=64))
    for i in range(8):
        assert int(got[i]) == crc32_raw(blocks[i].tobytes()), i


def test_device_digest_verify():
    """ops/digest: device-resident verification pulls 4 bytes per
    lane instead of the outputs (MXU CRC batch, raw register
    convention shared with the OAB block CRCs)."""
    import numpy as np

    from libmspack_tpu.formats.oab import crc32_raw
    from libmspack_tpu.ops import digest

    rng = np.random.RandomState(3)
    S = 4096
    lanes = [rng.randint(0, 256, n).astype(np.uint8).tobytes()
             for n in (S, 1000, 1, 0)]
    out = np.zeros((len(lanes), S), np.uint8)
    for i, b in enumerate(lanes):
        out[i, :len(b)] = np.frombuffer(b, np.uint8)
    lens = [len(b) for b in lanes]
    assert digest.verify_frames(out, lens, lanes)
    # a single flipped byte must be caught
    out[1, 500] ^= 0x40
    assert not digest.verify_frames(out, lens, lanes)
    # expectation convention matches plain raw CRC for full lanes
    d = digest.frame_digests(out, lens)
    assert int(d[0]) == crc32_raw(lanes[0])
