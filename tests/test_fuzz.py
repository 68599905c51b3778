"""Native-engine robustness: mutated / truncated / garbage streams must
return clean errors, never corrupt memory (the reference's PROTOS-C10
discipline, SURVEY §4.2, applied to the C++ engine).

Reduced-iteration version for the default suite; the full ASan sweep is
the same loops at 10x rounds under -fsanitize=address.

Regression pinned here: LZX pretree run code 19 followed by a second
pretree symbol of 17..19 wraps the delta length negative; the reference
stores it as unsigned char (e.g. 254) and make_decode_table ignores
lengths > 16 (readhuff.h loops bit_num 1..16). The native table builder
used to index its count[] histogram with the raw 254 — heap corruption
on malformed input (found by this fuzz).
"""
import random

import numpy as np
import pytest

from libmspack_tpu import native
from libmspack_tpu.compress import cab_c, lzx_e, mszip_c

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native engine unavailable")

ROUNDS = 400


def _data(seed=1234, n=120000):
    rng = random.Random(seed)
    words = [bytes(rng.choices(b'abcdef the of', k=rng.randint(3, 9)))
             for _ in range(40)]
    return b''.join(rng.choice(words) for _ in range(n // 2))[:n]


def test_lzx_mutation_fuzz():
    rng = random.Random(42)
    data = _data()
    for wb, ri in [(15, 0), (16, 2)]:
        stream, _ = lzx_e.compress(data, wb, reset_interval=ri)
        for _ in range(ROUNDS):
            b = bytearray(stream)
            for _ in range(rng.randint(1, 10)):
                p = rng.randrange(len(b))
                b[p] ^= rng.randrange(1, 256)
            out = native.lzx_decode(bytes(b), wb, ri, len(data))
            assert out is None or len(out) == len(data)
        for cut in range(0, len(stream), max(1, len(stream) // 50)):
            native.lzx_decode(stream[:cut], wb, ri, len(data))


def test_lzx_delta_and_garbage_fuzz():
    rng = random.Random(43)
    data = _data(5)
    base = data[:60000]
    stream, _ = lzx_e.compress(data, 18, is_delta=True, ref_data=base)
    for _ in range(ROUNDS):
        b = bytearray(stream)
        for _ in range(rng.randint(1, 10)):
            p = rng.randrange(len(b))
            b[p] ^= rng.randrange(1, 256)
        native.lzx_decode(bytes(b), 18, 0, len(data), is_delta=True,
                          ref_data=base)
    for _ in range(ROUNDS):
        g = bytes(rng.randrange(256) for _ in range(rng.randrange(1, 2000)))
        native.lzx_decode(g, rng.choice([15, 17, 21]), rng.choice([0, 2]),
                          rng.randrange(1, 150000))


def test_mszip_and_qtm_fuzz():
    rng = random.Random(44)
    data = _data(7)
    frames = [f[2:] for f in mszip_c.compress_frames(data)]
    sizes = [min(32768, len(data) - i * 32768) for i in range(len(frames))]
    out = np.empty(len(data), np.uint8)
    for _ in range(ROUNDS):
        fs = [bytearray(f) for f in frames]
        fi = rng.randrange(len(fs))
        for _ in range(rng.randint(1, 8)):
            p = rng.randrange(len(fs[fi]))
            fs[fi][p] ^= rng.randrange(1, 256)
        native.mszip_folder_into([bytes(f) for f in fs], sizes, out)
    for _ in range(ROUNDS):
        g = bytes(rng.randrange(256) for _ in range(rng.randrange(1, 2000)))
        native.qtm_decode(g, rng.choice([10, 15, 21]),
                          rng.randrange(1, 80000))


def test_cab_pipeline_fuzz():
    rng = random.Random(45)
    data = _data(9)
    cab = cab_c.write_cab(folders=[
        cab_c.FolderSpec([("a", data[:50000])], "mszip"),
        cab_c.FolderSpec([("b", data[50000:])], "lzx", 16),
        cab_c.FolderSpec([("c", data[:30000])], "none"),
    ])
    import libmspack_tpu as m
    d = m.create_cab_decompressor(engine="scalar")
    parsed = d.open(cab)
    offsets = [f.data[0].offset for f in parsed.folders]
    nbl = [f.num_blocks for f in parsed.folders]
    cts = [f.comp_type for f in parsed.folders]
    out = np.empty(len(data) + 30000, np.uint8)
    stage = np.empty(len(cab), np.uint8)
    for _ in range(ROUNDS):
        b = bytearray(cab)
        for _ in range(rng.randint(1, 10)):
            p = rng.randrange(len(b))
            b[p] ^= rng.randrange(1, 256)
        native.cab_pipeline(bytes(b), offsets, nbl, cts, 0, out, stage)


def test_pretree_run19_negative_wrap_regression():
    """The exact crash class: corrupt streams reaching HuffM::build with
    length values > 16 must fail cleanly. Replays the original fuzz
    recipe (seed 42, trial space that produced the crash)."""
    rng = random.Random(42)
    data = _data(1234, 120000)
    stream, _ = lzx_e.compress(data, 16, engine="python")
    for _ in range(1300):
        b = bytearray(stream)
        for _ in range(rng.randint(1, 8)):
            p = rng.randrange(len(b))
            b[p] ^= rng.randrange(1, 256)
        native.lzx_decode(bytes(b), 16, 0, len(data))
