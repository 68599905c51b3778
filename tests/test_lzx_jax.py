"""Device LZX pipeline (ops/lzx_jax): bit-exactness against the scalar
decoder / reference goldens, over the block-type and boundary grid the
reference pins down (lzxd.c): verbatim + aligned + uncompressed blocks,
multi-frame blocks with 16-bit realign, rep-offset LRU chains, CHM
reset-chunk sharding, and clean fallback on unsupported shapes."""
import hashlib
import random

import pytest

from libmspack_tpu.compress import chm_c, lzx_c, lzx_e
from libmspack_tpu.formats.chm import ChmDecompressor
from libmspack_tpu.formats.cab import CabDecompressor
from libmspack_tpu.ops.lzx_jax import lzx_stream_decode
from libmspack_tpu.system import BytesSink

REF_CAB = "/root/reference/libmspack/test/test_files/cabd/mszip_lzx_qtm.cab"


def _stream_cases():
    rng = random.Random(5)
    return [
        ("tiny", b"Hello LZX device world!", 15),
        ("one-frame", b"The quick brown fox jumps over the dog. " * 500, 15),
        ("frames", b"abcdefgh miscellaneous words " * 2500, 16),
        ("random", bytes(rng.randrange(256) for _ in range(50000)), 16),
        ("exact-frame", b"x" * 32768, 15),
        ("wb21", b"window twentyone " * 3000, 21),
    ]


@pytest.mark.parametrize("name,data,wb", _stream_cases())
def test_device_stream_roundtrip(name, data, wb):
    stream, _ = lzx_e.compress(data, wb)
    out = lzx_stream_decode(stream, wb, len(data))
    assert out is not None, f"{name}: unexpected fallback"
    assert out == data, name


def test_device_multi_block_and_rep_offsets():
    """block_frames=2 gives several tree blocks in ~200 KiB; mixed
    content stresses the rep-offset scan carrying across blocks and the
    host pretree-delta state between device calls."""
    rng = random.Random(11)
    data = (b"The quick brown fox jumps over the lazy dog. " * 1500
            + bytes(rng.randrange(256) for _ in range(80000))
            + b"repetitive tail " * 4000)
    stream, _ = lzx_e.compress(data, 16, block_frames=2)
    out = lzx_stream_decode(stream, 16, len(data))
    assert out == data


def test_device_uncompressed_blocks():
    """Stored blocks: host-side extent walk + R0-R2 literal reset
    (lzxd.c:303-320)."""
    rng = random.Random(7)
    data = bytes(rng.randrange(256) for _ in range(100000))
    stream, _ = lzx_c.compress_stored(data)
    out = lzx_stream_decode(stream, 16, len(data))
    assert out == data


def test_device_cab_engine_reference_golden():
    """The jax engine must reproduce the reference's own all-codec
    golden (cabd_test.c:471-478) through the device LZX path."""
    d = CabDecompressor(engine="jax")
    cab = d.open(REF_CAB)
    golden = {"mszip.txt": "940cba86658fbceb582faecd2b5975d1",
              "lzx.txt": "703474293b614e7110b3eb8ac2762b53",
              "qtm.txt": "98fcfa4962a0f169a3c7fdbcb445cf17"}
    for f in cab.files:
        s = BytesSink()
        d.extract(f, s)
        assert hashlib.md5(s.getvalue()).hexdigest() == golden[f.filename]


def test_device_path_actually_taken():
    """Guard against silent scalar fallback: the device decode of the
    reference LZX folder must succeed stand-alone."""
    from libmspack_tpu.formats.cab import COMPTYPE_LZX, COMPTYPE_MASK
    d = CabDecompressor(engine="jax")
    cab = d.open(REF_CAB)
    fol = next(f for f in cab.folders
               if (f.comp_type & COMPTYPE_MASK) == COMPTYPE_LZX)
    blocks, sizes = d.collect_raw_blocks(fol)
    out = lzx_stream_decode(b"".join(blocks),
                            (fol.comp_type >> 8) & 0x1F, sum(sizes))
    assert out is not None
    assert hashlib.md5(out).hexdigest() == "703474293b614e7110b3eb8ac2762b53"


def test_device_chm_reset_chunks():
    """CHM ResetTable offsets shard the section into independent device
    chunks; outputs must match the scalar engine byte-exactly."""
    rng = random.Random(3)
    files = [("/doc1.html", b"<html>" + b"hello chm device " * 9000 + b"</html>"),
             ("/data.bin", bytes(rng.randrange(256) for _ in range(120000))),
             ("/small.txt", b"tiny")]
    want = dict(files)
    blob = chm_c.write_chm(files, window_bits=16, reset_frames=2)
    d = ChmDecompressor(engine="jax")
    chm = d.open(blob)
    for f in chm.files:
        s = BytesSink()
        d.extract(f, s)
        assert s.getvalue() == want[f.filename], f.filename
    assert d._sec1_cache is not None, "device section path not taken"


def test_device_fallback_on_garbage():
    assert lzx_stream_decode(b"\xff" * 4096, 16, 8192) is None
    assert lzx_stream_decode(b"", 16, 100) is None
    # unsupported window bits -> immediate None (DELTA range)
    assert lzx_stream_decode(b"\x00" * 64, 25, 100) is None
