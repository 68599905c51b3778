"""Native C++ engine vs scalar codecs and the oracle."""
import hashlib
import os
import random

import pytest

import oracle
from libmspack_tpu import native
from libmspack_tpu.codecs import lzss as lzss_scalar
from libmspack_tpu.compress import cab_c, lzss_c, mszip_c
from libmspack_tpu.formats.cab import CabDecompressor
from libmspack_tpu.system import BytesSink

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native engine build failed")


def test_native_mszip_folder_bit_exact():
    rng = random.Random(31)
    for data in [b"", b"native! " * 9000,
                 bytes(rng.randrange(256) for _ in range(80000)),
                 bytes(rng.choice(b"abc") for _ in range(100000))]:
        frames = [f[2:] for f in mszip_c.compress_frames(data)]
        sizes = [min(32768, len(data) - i * 32768)
                 for i in range(len(frames))]
        out = native.mszip_folder(frames, sizes)
        assert out == data


def test_native_mszip_cross_frame_history():
    base = bytes(random.Random(5).randrange(256) for _ in range(1000))
    data = base * 80
    frames = [f[2:] for f in mszip_c.compress_frames(data)]
    sizes = [min(32768, len(data) - i * 32768) for i in range(len(frames))]
    assert native.mszip_folder(frames, sizes) == data


def test_native_mszip_many_folders():
    rng = random.Random(33)
    folders = []
    expect = []
    for k in range(5):
        data = bytes(rng.choice(b"qwerty") for _ in range(40000 + k * 7000))
        frames = [f[2:] for f in mszip_c.compress_frames(data)]
        sizes = [min(32768, len(data) - i * 32768)
                 for i in range(len(frames))]
        folders.append((frames, sizes))
        expect.append(data)
    outs = native.mszip_folders(folders)
    assert outs == expect


def test_native_rejects_garbage():
    assert native.mszip_folder([b"\xff\x88garbage"], [500]) is None


def test_native_rejects_wrong_size():
    data = b"size " * 2000
    frames = [f[2:] for f in mszip_c.compress_frames(data)]
    assert native.mszip_folder(frames, [len(data) + 3]) is None


def test_native_lzss_matches_scalar():
    rng = random.Random(35)
    for mode in (0, 1, 2):
        for data in [b"", b"lzss " * 2000,
                     bytes(rng.randrange(256) for _ in range(5000))]:
            stream = lzss_c.compress(data, mode)
            assert native.lzss_decompress(stream, mode) == \
                lzss_scalar.decompress(stream, mode)
            # truncated
            t = stream[: len(stream) // 2]
            assert native.lzss_decompress(t, mode) == \
                lzss_scalar.decompress(t, mode)


def test_cab_native_engine_golden():
    path = os.path.join(oracle.REF_TEST_FILES, "cabd", "mszip_lzx_qtm.cab")
    d = CabDecompressor(engine="native")
    cab = d.open(path)
    f = next(f for f in cab.files if (f.folder.comp_type & 0xF) == 1)
    s = BytesSink()
    d.extract(f, s)
    assert hashlib.md5(s.getvalue()).hexdigest() == \
        "940cba86658fbceb582faecd2b5975d1"


def test_cab_native_engine_matches_scalar():
    rng = random.Random(36)
    files = [("x.bin", bytes(rng.randrange(256) for _ in range(50000))),
             ("y.txt", b"hello native " * 4000)]
    cab_bytes = cab_c.write_cab(files=files, compression="mszip")
    for f_scalar, f_native in zip(CabDecompressor().open(cab_bytes).files,
                                  CabDecompressor(engine="native")
                                  .open(cab_bytes).files):
        s1, s2 = BytesSink(), BytesSink()
        CabDecompressor().extract(f_scalar, s1)
        d = CabDecompressor(engine="native")
        d.extract(d.open(cab_bytes).files[0], s2)  # warm separate instance
    # simpler: full-archive comparison
    d1 = CabDecompressor()
    d2 = CabDecompressor(engine="native")
    c1, c2 = d1.open(cab_bytes), d2.open(cab_bytes)
    for a, b in zip(c1.files, c2.files):
        s1, s2 = BytesSink(), BytesSink()
        d1.extract(a, s1)
        d2.extract(b, s2)
        assert s1.getvalue() == s2.getvalue()


def test_native_lzx_cab_folder():
    """Native LZX on our stored-block cabs + the reference golden."""
    rng = random.Random(41)
    data = bytes(rng.choice(b"lzxdata!") for _ in range(90000))
    cab_bytes = cab_c.write_cab(files=[("z.bin", data)], compression="lzx",
                                window_bits=16)
    d = CabDecompressor(engine="native")
    cab = d.open(cab_bytes)
    s = BytesSink()
    d.extract(cab.files[0], s)
    assert s.getvalue() == data

    path = os.path.join(oracle.REF_TEST_FILES, "cabd", "mszip_lzx_qtm.cab")
    d2 = CabDecompressor(engine="native")
    cab2 = d2.open(path)
    f = next(f for f in cab2.files if (f.folder.comp_type & 0xF) == 3)
    s2 = BytesSink()
    d2.extract(f, s2)
    assert hashlib.md5(s2.getvalue()).hexdigest() == \
        "703474293b614e7110b3eb8ac2762b53"


def test_native_lzx_chm():
    from libmspack_tpu.compress import chm_c
    from libmspack_tpu.formats.chm import ChmDecompressor
    rng = random.Random(42)
    files = [(f"/n{i}.bin", bytes(rng.randrange(256) for _ in range(30000)))
             for i in range(3)]
    blob = chm_c.write_chm(files, window_bits=16, reset_frames=2)
    d = ChmDecompressor(engine="native")
    chm = d.open(blob)
    expect = dict(files)
    for f in chm.files:
        s = BytesSink()
        d.extract(f, s)
        assert s.getvalue() == expect[f.filename], f.filename


def test_native_lzx_matches_scalar_on_real_lzx():
    """Entropy-coded (non-stored) LZX: reference test cab decoded by
    native vs scalar engine."""
    path = os.path.join(oracle.REF_TEST_FILES, "cabd",
                        "normal_2files_2folders.cab")
    d1 = CabDecompressor()
    d2 = CabDecompressor(engine="native")
    c1, c2 = d1.open(path), d2.open(path)
    for a, b in zip(c1.files, c2.files):
        s1, s2 = BytesSink(), BytesSink()
        d1.extract(a, s1)
        d2.extract(b, s2)
        assert s1.getvalue() == s2.getvalue(), a.filename


def test_native_qtm_golden():
    path = os.path.join(oracle.REF_TEST_FILES, "cabd", "mszip_lzx_qtm.cab")
    d = CabDecompressor(engine="native")
    cab = d.open(path)
    f = next(f for f in cab.files if (f.folder.comp_type & 0xF) == 2)
    s = BytesSink()
    d.extract(f, s)
    assert hashlib.md5(s.getvalue()).hexdigest() == \
        "98fcfa4962a0f169a3c7fdbcb445cf17"


def test_cab_mszip_pipeline_matches_driver(tmp_path):
    """Whole-cab native pipeline == python driver output, and declines
    cabs it cannot handle exactly (bad checksum)."""
    import numpy as np
    from libmspack_tpu import native
    from libmspack_tpu.formats.cab import CabDecompressor
    if not native.available():
        pytest.skip("native engine unavailable")
    data1 = (b"alpha beta gamma " * 9000)[:120000]
    data2 = os.urandom(50000)
    cab = cab_c.write_cab(folders=[
        cab_c.FolderSpec([("a.txt", data1)], "mszip"),
        cab_c.FolderSpec([("b.bin", data2)], "mszip"),
    ])
    path = str(tmp_path / "p.cab")
    with open(path, "wb") as fh:
        fh.write(cab)
    d = CabDecompressor()
    parsed = d.open(path)
    img = np.frombuffer(cab, np.uint8)
    out = np.empty(len(data1) + len(data2), np.uint8)
    offs = native.cab_mszip_pipeline(
        img, [f.data[0].offset for f in parsed.folders],
        [f.num_blocks for f in parsed.folders], parsed.block_resv, out)
    assert offs == [0, len(data1), len(data1) + len(data2)]
    assert out[:len(data1)].tobytes() == data1
    assert out[len(data1):].tobytes() == data2

    # corrupt one payload byte -> checksum mismatch -> decline
    bad = bytearray(cab)
    blk_off = parsed.folders[0].data[0].offset
    bad[blk_off + 8 + 10] ^= 0xFF
    offs = native.cab_mszip_pipeline(
        np.frombuffer(bytes(bad), np.uint8),
        [f.data[0].offset for f in parsed.folders],
        [f.num_blocks for f in parsed.folders], parsed.block_resv, out)
    assert offs is None
