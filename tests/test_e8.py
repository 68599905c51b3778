"""E8 call-translation parity vs the compiled reference oracle.

The reference untransforms each frame into a SEPARATE buffer
(lzxd.c:706-733 copies window->e8_buf), so match sources always see
PRE-transform bytes. Engines whose output buffer doubles as the match
window must defer E8 to a post-pass; these tests pin that by making
the second copy of an E8-dense page decode via matches whose sources
lie in frames that the output (but never the window) has already been
untransformed in.

Also pins the stream-global intel-state rule for chunked CHM-style
decode: intel_started / curpos / the frame counter never reset at
reset intervals (lzxd.c:707-713), so chunk-parallel fast paths must
decline and fall back to the sequential engine when intel E8 fires.
"""
import random

import pytest

import oracle
from libmspack_tpu import native
from libmspack_tpu.codecs.lzx import LzxDecompressor
from libmspack_tpu.compress.cab_c import FolderSpec, write_cab
from libmspack_tpu.formats.cab import CabDecompressor
from libmspack_tpu.system import BytesSink

FILESIZE = 0x00800000


def _scalar_decode(stream, wb, ri, out_len, is_delta=False, ref=None):
    pos = [0]

    def rd(n):
        c = stream[pos[0]:pos[0] + n]
        pos[0] += len(c)
        return c

    d = LzxDecompressor(rd, wb, ri, output_length=out_len,
                        is_delta=is_delta)
    if ref:
        d.set_reference_data(ref)
    out = bytearray()
    d.decompress(out_len, out.extend)
    return bytes(out)


def _e8_page(rng, size=40960):
    """Dense 0xE8 "call sites" with small positive operands (each gets
    rewritten: 0 <= abs < filesize) interleaved with matchable text."""
    page = bytearray()
    k = 0
    while len(page) < size:
        if k % 3 == 0:
            page += b"\xE8" + rng.randrange(0, 1 << 20).to_bytes(4, "little")
        else:
            page += b"call_site_%04d()" % (k % 97)
        k += 1
    return bytes(page[:size])


def _e8_cab(reps=2, seed=7):
    rng = random.Random(seed)
    page = _e8_page(rng)
    filler = rng.randbytes(20000)
    data = (page + filler) * reps  # repeats > 1 frame apart => matches
    spec = FolderSpec([("e8.bin", data)], "lzx", window_bits=17,
                      intel_filesize=FILESIZE)
    return write_cab(folders=[spec]), data


def _extract_all(blob, engine):
    d = CabDecompressor(engine=engine)
    cab = d.open(blob)
    outs = []
    for f in cab.files:
        s = BytesSink()
        d.extract(f, s)
        outs.append(s.getvalue())
    return outs


@pytest.fixture(scope="module")
def e8_cab(tmp_path_factory):
    blob, data = _e8_cab()
    path = tmp_path_factory.mktemp("e8") / "e8.cab"
    path.write_bytes(blob)
    rc, ref_outs = oracle.cab_extract_all(str(path))
    assert rc == 0 and len(ref_outs) == 1
    # sanity: the untransform must actually have changed bytes, and the
    # raw data must repeat (so matches reach into transformed frames)
    assert ref_outs[0] != data
    assert len(ref_outs[0]) == len(data)
    return blob, ref_outs[0]


def test_e8_matches_use_pretransform_window_scalar(e8_cab):
    blob, ref = e8_cab
    assert _extract_all(blob, "scalar") == [ref]


def test_e8_matches_use_pretransform_window_native(e8_cab):
    if not native.available():
        pytest.skip("native engine unavailable")
    blob, ref = e8_cab
    assert _extract_all(blob, "native") == [ref]


def test_e8_matches_use_pretransform_window_tpu(e8_cab):
    if not native.available():
        pytest.skip("native engine unavailable")
    blob, ref = e8_cab
    assert _extract_all(blob, "tpu") == [ref]


def test_e8_delta_prestart_ref_frames_not_transformed():
    """DELTA: frames BEFORE intel_started fires may contain 0xE8 bytes
    copied from reference data; the reference leaves those frames
    untransformed (intel_started only fires at an E8-capable block,
    lzxd.c:495-503). Pinned against the oracle via OAB incremental."""
    if not native.available():
        pytest.skip("native engine unavailable")
    from libmspack_tpu.compress.lzx_e import LzxEncoder

    rng = random.Random(11)
    base = _e8_page(rng, 4096)
    # the patch output: first copies base bytes (E8s from ref data),
    # then new E8-dense content so intel machinery engages
    out_data = base + _e8_page(rng, 40000)
    enc = LzxEncoder(17, is_delta=True, intel_filesize=FILESIZE)
    stream, _ = enc.compress(out_data, ref_data=base)
    decoded = native.lzx_decode(stream, 17, 0, len(out_data),
                                is_delta=True, ref_data=base)
    assert decoded is not None
    want = _scalar_decode(stream, 17, 0, len(out_data), is_delta=True,
                          ref=base)
    assert decoded == want


def test_e8_chm_chunked_falls_back_sequential():
    """A CHM-style multi-chunk LZX stream with intel E8 must decode
    exactly like the sequential reference: the chunk-parallel native
    grid declines (intel state is stream-global) and redoes the stream
    sequentially."""
    if not native.available():
        pytest.skip("native engine unavailable")
    import numpy as np

    from libmspack_tpu.compress.lzx_e import LzxEncoder

    rng = random.Random(13)
    page = _e8_page(rng)
    data = (page + rng.randbytes(20000)) * 3  # ~180 KB, 3+ intervals
    ri_frames = 2  # reset every 64 KiB
    enc = LzxEncoder(16, reset_interval=ri_frames,
                     intel_filesize=FILESIZE)
    stream, offsets = enc.compress(data)
    # scalar sequential decode = reference semantics (ground truth)
    want = _scalar_decode(stream, 16, ri_frames, len(data))

    # native sequential
    got = native.lzx_decode(stream, 16, ri_frames, len(data))
    assert got == want

    # chunk grid: per-interval offsets; must report intel fired
    ival = ri_frames * 32768
    chunk_offs = [offsets[i] for i in range(0, len(offsets), ri_frames)]
    sizes = [min(ival, len(data) - i * ival)
             for i in range(len(chunk_offs))]
    out = np.empty(len(data), np.uint8)
    ok, intel = native.lzx_chunks_into(stream, chunk_offs, 16,
                                       ri_frames, out, sizes)
    assert ok and intel  # chunks decoded, but intel means: redo


def test_e8_per_interval_filesize_replay():
    """intel_filesize is re-read at every reset interval
    (lzxd_reset_state clears header_read, lzxd.c:263); a deferred E8
    pass must replay the per-interval values, not the last one."""
    if not native.available():
        pytest.skip("native engine unavailable")
    from libmspack_tpu.compress.lzx_e import LzxEncoder

    rng = random.Random(17)
    data = (_e8_page(rng) + rng.randbytes(20000)) * 3
    ri = 2
    enc = LzxEncoder(16, reset_interval=ri, intel_filesize=FILESIZE)
    stream, _ = enc.compress(data)
    want = _scalar_decode(stream, 16, ri, len(data))
    got = native.lzx_decode(stream, 16, ri, len(data))
    assert got == want
