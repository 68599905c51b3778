"""Auxiliary tool equivalents: cabsplit, wince_info, wince_rename
(reference: cabextract/src/{cabsplit,wince_info,wince_rename})."""
import io
import os
import struct
import tempfile

import oracle
from libmspack_tpu.cli import cabsplit, wince
from libmspack_tpu.compress import cab_c


def test_cabsplit_roundtrip(tmp_path):
    folders = [
        cab_c.FolderSpec([("f1/a.txt", b"alpha " * 5000),
                          ("f1/b.txt", b"beta " * 2000)], "mszip"),
        cab_c.FolderSpec([("f2/c.bin", os.urandom(40000))], "lzx", 15),
    ]
    cab = cab_c.write_cab(folders=folders)
    path = str(tmp_path / "multi.cab")
    with open(path, "wb") as fh:
        fh.write(cab)
    assert cabsplit.split_cabinet(path) is None
    expected = [[("f1/a.txt", b"alpha " * 5000), ("f1/b.txt", b"beta " * 2000)],
                [("f2/c.bin", folders[1].files[0][1])]]
    for i, exp in enumerate(expected):
        part = f"{path}.{i + 1:03d}"
        assert os.path.exists(part)
        err, outs = oracle.cab_extract_all(part)
        assert err == 0
        assert outs == [d for _, d in exp]


def _msce(strings, dirs, files, hives, keys, links, appname=b"TestApp",
          provider=b"TestCo"):
    """Build a synthetic MSCE header file."""
    body = bytearray()
    off0 = 100

    def sec(entries):
        nonlocal body
        start = off0 + len(body)
        for e in entries:
            body += e
        return start

    str_entries = [struct.pack("<HH", sid, len(s) + 1) + s + b"\x00"
                   for sid, s in strings]
    dir_entries = []
    for did, ids in dirs:
        payload = struct.pack(f"<{len(ids) + 1}H", *ids, 0)
        dir_entries.append(struct.pack("<HH", did, len(payload)) + payload)
    file_entries = [struct.pack("<HHHIH", fid, did, 0, flags, len(n) + 1)
                    + n + b"\x00" for fid, did, flags, n in files]
    hive_entries = []
    for hid, root, ids in hives:
        payload = struct.pack(f"<{len(ids) + 1}H", *ids, 0)
        hive_entries.append(struct.pack("<HHHH", hid, root, 0, len(payload))
                            + payload)
    key_entries = []
    for kid, hive, flags, name, data in keys:
        payload = name + b"\x00" + data
        key_entries.append(struct.pack("<HHHIH", kid, hive, 0, flags,
                                       len(payload)) + payload)
    link_entries = []
    for lid, ldir, fid, ltype, ids in links:
        payload = struct.pack(f"<{len(ids) + 1}H", *ids, 0)
        link_entries.append(struct.pack("<HHHHHH", lid, 0, ldir, fid, ltype,
                                        len(payload)) + payload)

    offs = [sec(str_entries), sec(dir_entries), sec(file_entries),
            sec(hive_entries), sec(key_entries), sec(link_entries)]
    app_off = off0 + len(body)
    body += appname + b"\x00"
    prov_off = off0 + len(body)
    body += provider + b"\x00"

    hdr = struct.pack(
        "<12I6H6I8H",
        0x4543534D, 0, 100 + len(body), 0, 0, 0xA11,
        3, 0, 4, 20, 0, 14132,
        len(str_entries), len(dir_entries), len(file_entries),
        len(hive_entries), len(key_entries), len(link_entries),
        *offs,
        app_off, len(appname) + 1, prov_off, len(provider) + 1, 0, 0, 0, 0)
    return hdr + bytes(body)


STRINGS = [(1, b"%CE1%"), (2, b"MyApp"), (3, b"Software"), (4, b"Vendor")]
DIRS = [(1, [1, 2])]          # \Program Files\MyApp
FILES = [(1, 1, 0, b"app.exe"), (2, 1, 0x80000000, b"readme.txt")]
HIVES = [(1, 3, [3, 4])]      # HKLM\Software\Vendor
KEYS = [(1, 1, 0x10001, b"Version", struct.pack("<I", 0x30004)),
        (2, 1, 0x00000, b"Name", b"My App\x00"),
        (3, 1, 0x00001, b"Blob", b"\x01\x02\xfe")]
LINKS = [(1, 2, 1, 1, [2])]   # \Windows\MyApp -> file 1


def test_wince_info_sections():
    data = _msce(STRINGS, DIRS, FILES, HIVES, KEYS, LINKS)
    path = tempfile.mktemp(suffix=".000")
    with open(path, "wb") as fh:
        fh.write(data)
    try:
        out = io.StringIO()
        wince.info(path, out=out)
        text = out.getvalue()
        assert "architecture = StrongARM" in text
        assert "min WinCE v. = 3.0" in text
        assert "max WinCE v. = 4.20 [build 14132]" in text
        assert "app name     = TestApp" in text
        assert "d01: \\Program Files\\MyApp" in text
        assert "f01: \\Program Files\\MyApp\\app.exe" in text
        assert "h01: HKEY_LOCAL_MACHINE\\Software\\Vendor" in text
        assert "[DWORD] 00030004" in text
        assert "[SZ] My App" in text
        assert "[BINARY] (3 bytes" in text
        assert "dest=<<\\Windows\\MyApp>>" in text
        assert "src=<<\\Program Files\\MyApp\\app.exe>>" in text
    finally:
        os.unlink(path)


def test_wince_rename(tmp_path):
    d = str(tmp_path)
    with open(os.path.join(d, "pkg.000"), "wb") as fh:
        fh.write(_msce(STRINGS, DIRS, FILES, HIVES, KEYS, LINKS))
    with open(os.path.join(d, "pkg.001"), "wb") as fh:
        fh.write(b"exe bytes")
    with open(os.path.join(d, "pkg.002"), "wb") as fh:
        fh.write(b"readme bytes")
    with open(os.path.join(d, "pkg.999"), "wb") as fh:
        fh.write(b"dll bytes")
    wince.rename(d)
    with open(os.path.join(d, "Program Files", "MyApp", "app.exe"),
              "rb") as fh:
        assert fh.read() == b"exe bytes"
    with open(os.path.join(d, "Program Files", "MyApp", "readme.txt"),
              "rb") as fh:
        assert fh.read() == b"readme bytes"
    with open(os.path.join(d, "header.bin"), "rb") as fh:
        assert fh.read(4) == b"MSCE"
    with open(os.path.join(d, "setup.dll"), "rb") as fh:
        assert fh.read() == b"dll bytes"
    with open(os.path.join(d, "setup.reg"), "rb") as fh:
        reg = fh.read().decode()
    assert reg.startswith("REGEDIT4\r\n")
    assert "[HKLM\\Software\\Vendor]" in reg
    assert '"Version"=dword:00030004' in reg
    assert '"Name"="My App"' in reg
    assert '"Blob"=hex:01,02,fe' in reg
