"""CAB driver + MSZIP/LZX/Quantum codecs vs the reference oracle."""
import glob
import hashlib
import itertools
import os

import pytest

import oracle
from libmspack_tpu import errors
from libmspack_tpu.formats.cab import CabDecompressor
from libmspack_tpu.system import BytesSink, HashSink

CABD = os.path.join(oracle.REF_TEST_FILES, "cabd")
CABS = oracle.REF_CAB_TESTS + "/cabs"


def extract_all(path, salvage=False, fix_mszip=False):
    d = CabDecompressor()
    if salvage:
        d.set_param(3, 1)
    if fix_mszip:
        d.set_param(1, 1)
    cab = d.open(path)
    outs = []
    for f in cab.files:
        s = BytesSink()
        d.extract(f, s)
        outs.append(s.getvalue())
    return cab, outs


def test_all_codecs_golden_md5():
    """The headline golden: mszip_lzx_qtm.cab members
    (reference: libmspack/test/cabd_test.c:461-482)."""
    cab, outs = extract_all(os.path.join(CABD, "mszip_lzx_qtm.cab"))
    md5s = [hashlib.md5(o).hexdigest() for o in outs]
    assert md5s == [
        "940cba86658fbceb582faecd2b5975d1",
        "703474293b614e7110b3eb8ac2762b53",
        "98fcfa4962a0f169a3c7fdbcb445cf17",
    ]


def test_simple_cab_golden():
    cab, outs = extract_all(os.path.join(CABS, "simple.cab"))
    assert [f.filename for f in cab.files] == ["hello.c", "welcome.c"]
    md5s = [hashlib.md5(o).hexdigest() for o in outs]
    assert md5s == ["c2535936b8908b1f8a28b7724a2c2045",
                    "67c981a019c21f3f4bb8f92efe4d95a1"]


def test_header_fields():
    """reference: cabd_test.c:38-82 header exactness."""
    d = CabDecompressor()
    cab = d.open(os.path.join(CABD, "normal_2files_2folders.cab"))
    assert len(cab.folders) == 2
    assert len(cab.files) == 4
    ref_err, entries = oracle.cab_list(os.path.join(CABD,
                                                    "normal_2files_2folders.cab"))
    assert ref_err == 0
    assert [(f.length, f.offset, f.filename) for f in cab.files] == \
        [(length, offset, name) for (length, offset, _, name) in entries]


@pytest.mark.parametrize("name", [
    "normal_2files_1folder.cab",
    "normal_2files_2folders.cab",
    "normal_255c_filename.cab",
    "reserve_---.cab", "reserve_--D.cab", "reserve_-F-.cab",
    "reserve_-FD.cab", "reserve_H--.cab", "reserve_H-D.cab",
    "reserve_HF-.cab", "reserve_HFD.cab",
])
def test_normal_cabs_match_oracle(name):
    path = os.path.join(CABD, name)
    if not os.path.exists(path):
        pytest.skip(f"{name} not in corpus")
    ref_err, ref_outs = oracle.cab_extract_all(path)
    assert ref_err == 0
    cab, outs = extract_all(path)
    assert outs == ref_outs


def test_bad_cabs_rejected_like_oracle():
    for name in ["bad_signature.cab", "bad_nofolders.cab", "bad_nofiles.cab",
                 "bad_folderindex.cab",
                 "partial_shortheader.cab", "partial_shortextheader.cab",
                 "partial_nodata.cab", "partial_nofiles.cab",
                 "partial_nofolder.cab", "partial_shortfolder.cab",
                 "partial_shortfile1.cab", "partial_shortfile2.cab",
                 "partial_str_nopname.cab", "partial_str_shortpname.cab",
                 "partial_str_nopinfo.cab", "partial_str_shortpinfo.cab",
                 "partial_str_nonname.cab", "partial_str_shortnname.cab",
                 "partial_str_noninfo.cab", "partial_str_shortninfo.cab"]:
        path = os.path.join(CABD, name)
        if not os.path.exists(path):
            continue
        import ctypes
        ref_err = oracle.lib().oracle_cab_list(path.encode(), b"/dev/null")
        d = CabDecompressor()
        try:
            d.open(path)
            our_err = 0
        except errors.MSPackError as e:
            our_err = int(e.code)
        assert our_err == ref_err, f"{name}: our={our_err} ref={ref_err}"


def test_cve_corpus_fails_cleanly():
    """All cabd CVE samples must either extract like the oracle or raise a
    clean MSPackError (reference: cabd_test.c:405-435)."""
    for path in sorted(glob.glob(os.path.join(CABD, "cve-*.cab"))):
        ref_err, ref_outs = oracle.cab_extract_all(path)
        try:
            cab, outs = extract_all(path)
            our_err = 0
        except errors.MSPackError as e:
            our_err = int(e.code)
            outs = None
        # the *open* may succeed while extraction fails; compare outcomes
        if ref_err == 0 and our_err == 0:
            assert outs == ref_outs, path
        else:
            assert our_err != 0 and ref_err != 0, \
                f"{path}: our={our_err} ref={ref_err}"


def test_extraction_order_invariance():
    """Extract 2-folder cab in both orders; sequential state reuse must not
    change results (reference: cabd_test.c:486-520)."""
    path = os.path.join(CABD, "mszip_lzx_qtm.cab")
    d = CabDecompressor()
    cab = d.open(path)
    files = list(cab.files)
    baseline = {}
    for f in files:
        s = BytesSink()
        d.extract(f, s)
        baseline[f.filename] = hashlib.md5(s.getvalue()).hexdigest()
    for perm in itertools.permutations(files):
        d2 = CabDecompressor()
        cab2 = d2.open(path)
        name_map = {f.filename: f for f in cab2.files}
        for f in perm:
            s = BytesSink()
            d2.extract(name_map[f.filename], s)
            assert hashlib.md5(s.getvalue()).hexdigest() == \
                baseline[f.filename], (f.filename, perm)


def test_search_embedded():
    path = os.path.join(CABS, "search.cab")
    d = CabDecompressor()
    cab = d.search(path)
    found = []
    while cab:
        found.append(cab.base_offset)
        cab = cab.next
    assert len(found) >= 1
    # reference finds the same cabinets with any searchbuf size
    d2 = CabDecompressor()
    d2.set_param(0, 4)
    cab2 = d2.search(path)
    found2 = []
    while cab2:
        found2.append(cab2.base_offset)
        cab2 = cab2.next
    assert found == found2


def test_multi_part_merge():
    """5-part split cabinet: append all parts, extract everything
    (reference: cabd_test.c:340-402, cabextract/test/split.test)."""
    parts = [os.path.join(CABD, f"multi_basic_pt{i}.cab") for i in range(1, 6)]
    d = CabDecompressor()
    cabs = [d.open(p) for p in parts]
    for a, b in zip(cabs, cabs[1:]):
        d.append(a, b)
    files = cabs[0].files
    assert len(files) > 0
    # oracle comparison: extract via reference with prepended/appended parts
    outs = []
    for f in files:
        s = BytesSink()
        d.extract(f, s)
        outs.append((f.filename, hashlib.md5(s.getvalue()).hexdigest(),
                     len(s.getvalue())))
    # all files must decode to their declared lengths
    for (name, md5, ln), f in zip(outs, files):
        assert ln == f.length, name


def test_salvage_hidden_files():
    """Files located via the header's files-offset rather than directly
    after the folders are only discovered in salvage mode
    (reference: cabd_test.c:235-280, cabd.c:463-501)."""
    path = os.path.join(CABD, "hidden-files.cab")
    cab, _ = extract_all(path)
    assert [f.filename for f in cab.files] == ["normal1.txt",
                                               "normal2.txt"]
    cab, outs = extract_all(path, salvage=True)
    assert [f.filename for f in cab.files] == [
        "normal1.txt", "normal2.txt", "hidden1.txt", "hidden2.txt"]
    # extraction must match the oracle in salvage mode byte-for-byte
    ref_err, ref_outs = oracle.cab_extract_all(path, salvage=True)
    assert [hashlib.md5(o).hexdigest() for o in outs] == \
        [hashlib.md5(o).hexdigest() for o in ref_outs]

    # hidden file beyond EOF / with bad folder id: only the normal file
    # is listed (reference checks the listing only, cabd_test.c:266-278)
    d = CabDecompressor()
    d.set_param(3, 1)
    for name in ("hidden-file-beyond-eof.cab",
                 "hidden-file-bad-folderid.cab"):
        cab = d.open(os.path.join(CABD, name))
        assert len(cab.files) == 1
