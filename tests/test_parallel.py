"""Sharded decode over the 8-device virtual CPU mesh."""
import random

import pytest

jax = pytest.importorskip("jax")

from libmspack_tpu.compress import mszip_c
from libmspack_tpu.parallel import mesh as pmesh


def test_virtual_mesh_has_8_devices():
    assert len(jax.devices()) == 8


def test_sharded_decode_matches_scalar():
    rng = random.Random(17)
    data = (b"sharded decode test " * 300
            + bytes(rng.randrange(256) for _ in range(200))) * 30
    frames = mszip_c.compress_frames(data)
    streams = [f[2:] for f in frames]
    sizes = [min(32768, len(data) - i * 32768) for i in range(len(frames))]

    m = pmesh.default_mesh()
    out = pmesh.decode_frames_sharded(m, streams, sizes)
    assert out is not None
    assert out == data


def test_sharded_decode_2dev_subset():
    data = b"two device mesh " * 5000
    frames = mszip_c.compress_frames(data)
    streams = [f[2:] for f in frames]
    m = pmesh.default_mesh(2)
    out = pmesh.decode_frames_sharded(m, streams)
    assert out == data


def test_planner_corpus_extraction():
    import random
    from libmspack_tpu.compress import cab_c
    from libmspack_tpu.parallel import planner
    rng = random.Random(55)
    archives = []
    expects = []
    for k in range(3):
        files = [(f"f{k}{i}.bin",
                  bytes(rng.choice(b"planner!") for _ in range(20000 + i * 999)))
                 for i in range(2)]
        comp = ["mszip", "lzx", "none"][k]
        archives.append(cab_c.write_cab(files=files, compression=comp))
        expects.append(dict(files))
    results = planner.extract_corpus(archives)
    for got, want in zip(results, expects):
        assert got == want


def test_planner_quantum_via_reference_cab():
    import os
    import oracle
    from libmspack_tpu.parallel import planner
    path = os.path.join(oracle.REF_TEST_FILES, "cabd", "mszip_lzx_qtm.cab")
    import hashlib
    results = planner.extract_corpus([path])
    md5s = {n: hashlib.md5(b).hexdigest() for n, b in results[0].items()}
    assert md5s["mszip.txt"] == "940cba86658fbceb582faecd2b5975d1"
    assert md5s["lzx.txt"] == "703474293b614e7110b3eb8ac2762b53"
    assert md5s["qtm.txt"] == "98fcfa4962a0f169a3c7fdbcb445cf17"
