"""Batched speculative inflate vs scalar codec + CAB jax engine."""
import hashlib
import os
import random

import pytest

import oracle
from libmspack_tpu.compress import cab_c, mszip_c
from libmspack_tpu.formats.cab import CabDecompressor
from libmspack_tpu.ops import inflate_jax
from libmspack_tpu.system import BytesSink


def _datasets():
    rng = random.Random(77)
    return [
        b"",
        b"x",
        b"hello inflate " * 3000,
        bytes(rng.choice(b"abcdef") for _ in range(100000)),
        b"A" * 70000,
        bytes(rng.randrange(256) for _ in range(50000)),  # likely stored blocks
        (b"the quick brown fox " * 100 + bytes(rng.randrange(256)
                                               for _ in range(500))) * 40,
    ]


@pytest.mark.parametrize("di", range(7))
def test_inflate_folder_bit_exact(di):
    data = _datasets()[di]
    frames = mszip_c.compress_frames(data)
    if not frames:
        assert inflate_jax.inflate_folder([]) == b""
        return
    streams = [f[2:] for f in frames]
    sizes = [min(32768, len(data) - i * 32768) for i in range(len(frames))]
    out = inflate_jax.inflate_folder(streams, sizes)
    if out is None:
        pytest.skip("fallback path (stored blocks) — covered by cab engine test")
    assert out == data


def test_inflate_folder_cross_frame_history():
    """Match distances that reach into the previous frame."""
    base = bytes(random.Random(5).randrange(256) for _ in range(1000))
    data = base * 80  # 80KB of 1KB period: every frame references the last
    frames = mszip_c.compress_frames(data)
    streams = [f[2:] for f in frames]
    sizes = [min(32768, len(data) - i * 32768) for i in range(len(frames))]
    out = inflate_jax.inflate_folder(streams, sizes)
    assert out is not None and out == data


def test_inflate_rejects_garbage():
    assert inflate_jax.inflate_folder([b"\xffgarbage stream\x12\x34"],
                                      [100]) is None


def test_cab_jax_engine_matches_scalar():
    rng = random.Random(13)
    files = [
        ("a.txt", b"text data " * 5000),
        ("b.bin", bytes(rng.randrange(256) for _ in range(60000))),
        ("c.rep", bytes(rng.choice(b"xyz") for _ in range(45000))),
    ]
    cab_bytes = cab_c.write_cab(files=files, compression="mszip")
    scalar = CabDecompressor()
    fast = CabDecompressor(engine="jax")
    c1 = scalar.open(cab_bytes)
    c2 = fast.open(cab_bytes)
    for f1, f2 in zip(c1.files, c2.files):
        s1, s2 = BytesSink(), BytesSink()
        scalar.extract(f1, s1)
        fast.extract(f2, s2)
        assert s1.getvalue() == s2.getvalue(), f1.filename


def test_cab_jax_engine_on_reference_golden():
    """mszip member of mszip_lzx_qtm.cab via the jax engine."""
    path = os.path.join(oracle.REF_TEST_FILES, "cabd", "mszip_lzx_qtm.cab")
    d = CabDecompressor(engine="jax")
    cab = d.open(path)
    mszip_files = [f for f in cab.files
                   if (f.folder.comp_type & 0xF) == 1]
    assert mszip_files
    for f in mszip_files:
        s = BytesSink()
        d.extract(f, s)
        assert hashlib.md5(s.getvalue()).hexdigest() == \
            "940cba86658fbceb582faecd2b5975d1"


def test_jax_folder_pipeline_bit_exact():
    # (the third-generation fused phase A was deleted in round 5: the
    # Pallas kernels are the device path, inflate_jax the mesh/test
    # substrate — one legacy generation is enough)
    rng = random.Random(21)
    for data in [b"fused " * 5000,
                 bytes(rng.choice(b"abcdefgh") for _ in range(90000))]:
        frames = [f[2:] for f in mszip_c.compress_frames(data)]
        sizes = [min(32768, len(data) - i * 32768)
                 for i in range(len(frames))]
        out = inflate_jax.inflate_folder(frames, sizes)
        assert out is not None and out == data
