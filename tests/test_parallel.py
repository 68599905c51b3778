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
