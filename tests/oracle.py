"""Golden-oracle wrapper: drives the compiled reference libmspack.

The reference is compiled once into .oracle/liboracle.so (sources read
from /root/reference, build artifacts kept inside this repo). Tests use
it to produce expected bytes for arbitrary archives; our decoders must
match bit-for-bit (SURVEY.md §4.2 oracle discipline).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ORACLE_DIR = os.path.join(REPO, ".oracle")
ORACLE_SO = os.path.join(ORACLE_DIR, "liboracle.so")
REF_MSPACK = "/root/reference/libmspack/mspack"

REF_TEST_FILES = "/root/reference/libmspack/test/test_files"
REF_CAB_TESTS = "/root/reference/cabextract/test"


def build_oracle() -> str:
    if os.path.exists(ORACLE_SO):
        return ORACLE_SO
    os.makedirs(ORACLE_DIR, exist_ok=True)
    srcs = [os.path.join(REF_MSPACK, f) for f in os.listdir(REF_MSPACK)
            if f.endswith(".c") and f != "debug.c"]
    srcs.append(os.path.join(REPO, "tests", "oracle_shim.c"))
    # 64-bit off_t build (distro default): large files + 9-byte ENCINTs
    cmd = ["gcc", "-O2", "-fPIC", "-shared", "-I", REF_MSPACK,
           "-DSIZEOF_OFF_T=8", "-D_FILE_OFFSET_BITS=64",
           "-o", ORACLE_SO] + srcs
    subprocess.run(cmd, check=True, capture_output=True)
    return ORACLE_SO


_lib = None


def lib() -> ctypes.CDLL:
    global _lib
    if _lib is None:
        _lib = ctypes.CDLL(build_oracle())
    return _lib


def _tmp(data: bytes | None = None) -> str:
    fd, path = tempfile.mkstemp()
    if data is not None:
        os.write(fd, data)
    os.close(fd)
    return path


def _run_1in_1out(fn_name: str, data: bytes) -> tuple[int, bytes]:
    inp = _tmp(data)
    out = _tmp()
    try:
        err = getattr(lib(), fn_name)(inp.encode(), out.encode())
        with open(out, "rb") as fh:
            return err, fh.read()
    finally:
        os.unlink(inp)
        os.unlink(out)


def szdd_decompress(data: bytes) -> tuple[int, bytes]:
    return _run_1in_1out("oracle_szdd", data)


def kwaj_decompress(data: bytes) -> tuple[int, bytes]:
    return _run_1in_1out("oracle_kwaj", data)


def oab_decompress(data: bytes) -> tuple[int, bytes]:
    return _run_1in_1out("oracle_oab", data)


def oab_decompress_incremental(patch: bytes, base: bytes) -> tuple[int, bytes]:
    p, b, out = _tmp(patch), _tmp(base), _tmp()
    try:
        err = lib().oracle_oab_incremental(p.encode(), b.encode(), out.encode())
        with open(out, "rb") as fh:
            return err, fh.read()
    finally:
        for f in (p, b, out):
            os.unlink(f)


def cab_list(path: str) -> tuple[int, list[tuple[int, int, int, str]]]:
    """Returns (err, [(length, offset, comp_type, name), ...])."""
    out = _tmp()
    try:
        err = lib().oracle_cab_list(path.encode(), out.encode())
        entries = []
        with open(out, "rb") as fh:
            for line in fh.read().splitlines():
                length, _, offset, ctype, name = line.split(b"\t", 4)
                entries.append((int(length), int(offset), int(ctype),
                                name.decode("latin-1")))
        return err, entries
    finally:
        os.unlink(out)


def cab_extract_all(path: str, salvage=False, fix_mszip=False
                    ) -> tuple[int, list[bytes]]:
    with tempfile.TemporaryDirectory() as d:
        err = lib().oracle_cab_extract_all(path.encode(), d.encode(),
                                           int(salvage), int(fix_mszip))
        outs = []
        i = 0
        while os.path.exists(os.path.join(d, f"m{i}")):
            with open(os.path.join(d, f"m{i}"), "rb") as fh:
                outs.append(fh.read())
            i += 1
        return err, outs


def chm_list(path: str) -> tuple[int, list[tuple[int, int, int, str]]]:
    out = _tmp()
    try:
        err = lib().oracle_chm_list(path.encode(), out.encode())
        entries = []
        with open(out, "rb") as fh:
            for line in fh.read().splitlines():
                length, offset, section, name = line.split(b"\t", 3)
                entries.append((int(length), int(offset), int(section),
                                name.decode("latin-1")))
        return err, entries
    finally:
        os.unlink(out)


def chm_extract_all(path: str) -> tuple[int, list[bytes]]:
    with tempfile.TemporaryDirectory() as d:
        err = lib().oracle_chm_extract_all(path.encode(), d.encode())
        outs = []
        i = 0
        while os.path.exists(os.path.join(d, f"m{i}")):
            with open(os.path.join(d, f"m{i}"), "rb") as fh:
                outs.append(fh.read())
            i += 1
        return err, outs
