"""CHM driver vs the reference oracle on the CVE/encint corpus."""
import glob
import os

import pytest

import oracle
from libmspack_tpu import errors
from libmspack_tpu.formats.chm import ChmDecompressor
from libmspack_tpu.system import BytesSink

CHMD = os.path.join(oracle.REF_TEST_FILES, "chmd")


def _load(path: str) -> bytes:
    with open(path, "rb") as fh:
        data = fh.read()
    if path.endswith(".xor"):
        data = bytes(b ^ 0xFF for b in data)
    return data


def _our_outcome(data: bytes):
    d = ChmDecompressor()
    try:
        chm = d.open(data)
    except errors.MSPackError as e:
        return int(e.code), None, None
    listing = [(f.length, f.offset, f.section.id, f.filename)
               for f in chm.files]
    outs = []
    err = 0
    for f in chm.files:
        s = BytesSink()
        try:
            d.extract(f, s)
            outs.append(s.getvalue())
        except errors.MSPackError as e:
            if not err:
                err = int(e.code)
            outs.append(None)
    return err, listing, outs


@pytest.mark.parametrize("path", sorted(
    glob.glob(os.path.join(CHMD, "*.chm"))
    + glob.glob(os.path.join(CHMD, "*.chm.xor"))))
def test_chm_corpus_matches_oracle(path):
    data = _load(path)
    # oracle works on real files; write the un-xored bytes to tmp
    import tempfile
    fd, tmp = tempfile.mkstemp(suffix=".chm")
    os.write(fd, data)
    os.close(fd)
    try:
        ref_open_err, ref_list = oracle.chm_list(tmp)
        ref_ext_err, ref_outs = oracle.chm_extract_all(tmp)
    finally:
        os.unlink(tmp)

    our_err, our_list, our_outs = _our_outcome(data)

    if ref_open_err:
        assert our_err != 0, f"{path}: oracle rejected ({ref_open_err}), we accepted"
        return
    assert our_list is not None, f"{path}: oracle accepted, we rejected ({our_err})"
    # the C shim prints filenames as C strings: embedded NULs truncate
    assert [(l, o, n.split("\x00")[0]) for (l, o, _, n) in our_list] == \
        [(l, o, n) for (l, o, _, n) in ref_list], path
    # extraction outcomes: every file the oracle extracts cleanly must
    # match; files it fails on must fail for us too
    if ref_ext_err == 0 and our_err == 0:
        assert our_outs == ref_outs, path
    else:
        assert (ref_ext_err != 0) == (our_err != 0), \
            f"{path}: ours={our_err} ref={ref_ext_err}"


def test_parallel_reset_chunk_decode():
    """ResetTable chunks decode in parallel on the native engine and
    match the scalar reference path bit-exactly."""
    import random
    import libmspack_tpu as m
    from libmspack_tpu import native
    from libmspack_tpu.compress import chm_c
    from libmspack_tpu.system import BytesSink
    if not native.available():
        import pytest
        pytest.skip("native engine unavailable")
    rng = random.Random(3)
    words = [bytes(rng.choices(b'abcdef the of and <p>',
                               k=rng.randint(3, 11))) for _ in range(60)]
    big = b''.join(rng.choice(words) for _ in range(300_000))[:1_000_000]
    chm = chm_c.write_chm([("big.html", big)], window_bits=16,
                          reset_frames=2)
    outs = {}
    for eng in ("scalar", "native"):
        d = m.create_chm_decompressor(engine=eng)
        h = d.open(chm)
        f = [x for x in h.files if x.filename.endswith("big.html")][0]
        s = BytesSink()
        d.extract(f, s)
        outs[eng] = s.getvalue()
    assert outs["scalar"] == big
    assert outs["native"] == big


def test_chm_extraction_orders():
    """The reference's chmd_order.c discipline: extract every file in
    listed order, content order, reverse order, and interleaved across
    two decompressor instances — identical bytes each way."""
    import random
    import libmspack_tpu as m
    from libmspack_tpu.compress import chm_c
    from libmspack_tpu.system import BytesSink
    rng = random.Random(11)
    files = [(f"d/f{i}.txt",
              bytes(rng.choices(b"abcdef ", k=rng.randint(2000, 90000))))
             for i in range(6)]
    chm = chm_c.write_chm(files, window_bits=16, reset_frames=2)
    exp = dict(files)

    def get(d, h, f):
        s = BytesSink()
        d.extract(f, s)
        return s.getvalue()

    for eng in ("scalar", "native"):
        d = m.create_chm_decompressor(engine=eng)
        h = d.open(chm)
        members = [f for f in h.files if f.filename.startswith("d/")]
        listed = [get(d, h, f) for f in members]
        by_offset = sorted(members, key=lambda f: f.offset)
        d2 = m.create_chm_decompressor(engine=eng)
        h2 = d2.open(chm)
        offset_order = {f.filename: get(d2, h2, f) for f in by_offset}
        d3 = m.create_chm_decompressor(engine=eng)
        h3 = d3.open(chm)
        reverse = {f.filename: get(d3, h3, f) for f in reversed(members)}
        # interleaved across two instances
        da = m.create_chm_decompressor(engine=eng)
        db = m.create_chm_decompressor(engine=eng)
        ha, hb = da.open(chm), db.open(chm)
        inter = {}
        for fa, fb in zip(ha.files, hb.files):
            if fa.filename.startswith("d/"):
                inter[fa.filename] = get(da, ha, fa)
                assert get(db, hb, fb) == inter[fb.filename]
        for f, data in zip(members, listed):
            assert data == exp[f.filename], (eng, f.filename)
            assert offset_order[f.filename] == data
            assert reverse[f.filename] == data
            assert inter[f.filename] == data
