"""CLI integration tests pinned to the reference golden outputs
(reference: cabextract/test/*.test)."""
import io
import os
import subprocess
import sys

import pytest

import oracle

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CABS = os.path.join(oracle.REF_CAB_TESTS, "cabs")


def run_cli(args, cwd=None):
    env = dict(os.environ, PYTHONPATH=REPO, JAX_PLATFORMS="cpu")
    r = subprocess.run([sys.executable, "-m", "libmspack_tpu.cli.cabextract"]
                       + args, capture_output=True, text=True,
                       cwd=cwd or oracle.REF_CAB_TESTS, env=env)
    return r


def test_simple_list_golden():
    """Golden from cabextract/test/simple.test."""
    r = run_cli(["-l", "cabs/simple.cab"])
    assert r.stdout == """\
Viewing cabinet: cabs/simple.cab
 File size | Date       Time     | Name
-----------+---------------------+-------------
        77 | 12.03.1997 11:13:52 | hello.c
        74 | 12.03.1997 11:15:14 | welcome.c

All done, no errors.
"""


def test_simple_test_golden():
    r = run_cli(["-t", "cabs/simple.cab"])
    assert r.stdout == """\
Testing cabinet: cabs/simple.cab
  hello.c  OK                                  c2535936b8908b1f8a28b7724a2c2045
  welcome.c  OK                                67c981a019c21f3f4bb8f92efe4d95a1

All done, no errors.
"""


def test_dirwalk_vulns_sanitised(tmp_path):
    """Directory-traversal attacks must be neutralised
    (reference: cabextract/test/dirwalk-vulns.test)."""
    r = run_cli(["-d", str(tmp_path), os.path.join(CABS, "dirwalk-vulns.cab")])
    extracted = []
    for root, dirs, files in os.walk(tmp_path):
        for f in files:
            extracted.append(os.path.relpath(os.path.join(root, f), tmp_path))
    # nothing may escape the output directory
    for rel in extracted:
        assert not rel.startswith("..") and not os.path.isabs(rel), rel
    # everything landed inside tmp_path
    assert extracted, "nothing extracted"
    # the system must not have written outside tmp_path (spot check /tmp)
    assert not os.path.exists("/tmp/cabextract-test-vuln")


def test_split_cabinet_spanning_golden():
    """5-part split set, exact golden (reference: cabextract/test/split.test)."""
    r = run_cli(["-t", "cabs/split-1.cab"])
    assert r.stdout == """\
cabs/split-1.cab: extends to Split-2.CAB (Split cabinet file 2/5)
cabs/split-1.cab: extends to Split-3.CAB (Split cabinet file 3/5)
cabs/split-1.cab: extends to Split-4.CAB (Split cabinet file 4/5)
cabs/split-1.cab: extends to Split-5.CAB (Split cabinet file 5/5)
Testing cabinet: cabs/split-1.cab
  small1.bin  OK                               2ad5ba0f497f1e597ab187a2dfaa2e29
  small2.bin  OK                               1f862f9e36a32a74202c1120b9f06af7
  medium1.bin  OK                              0a7bd124a4c03a30329bd9ff06f71df7
  medium2.bin  OK                              b4b0a02ad6a1170d4b3db18cec616fcc
  small3.bin  OK                               bbaecacfeba976165e9d77bbecb0cbde
  medium3.bin  OK                              b98fe17e8afbcf05aefc5b2c4badbc28

All done, no errors.
"""
    assert r.returncode == 0


def test_split_cabinet_from_middle_golden():
    """Starting from part 3 loads both directions
    (reference: cabextract/test/split.test)."""
    r = run_cli(["-t", "cabs/split-3.cab"])
    assert "extends backwards to Split-2.CAB" in r.stdout
    assert "extends backwards to Split-1.CAB" in r.stdout
    assert "extends to Split-4.CAB" in r.stdout
    assert "extends to Split-5.CAB" in r.stdout
    assert r.stdout.count("  OK  ") == 6
    assert r.returncode == 0


def test_filter_and_pipe():
    r = run_cli(["-p", "-q", "-F", "hello.c", "cabs/simple.cab"])
    assert "main(void)" in r.stdout
    assert "welcome" not in r.stdout


def test_search_embedded_cab():
    r = run_cli(["-l", "-q", "cabs/search.cab"])
    assert "| Name" in r.stdout
    assert r.returncode == 0


def test_lowercase_option():
    r = run_cli(["-l", "-q", os.path.join(oracle.REF_TEST_FILES, "cabd",
                                          "normal_255c_filename.cab")])
    assert r.returncode == 0


def test_encoding_golden():
    """Golden listings with -e charset conversion
    (reference: cabextract/test/encoding.test)."""
    r = run_cli(["-e", "koi8_r", "-l", "cabs/encoding-koi8.cab"])
    assert r.stdout == """\
Viewing cabinet: cabs/encoding-koi8.cab
 File size | Date       Time     | Name
-----------+---------------------+-------------
         0 | 12.03.1997 11:13:52 | Здравствуйте, это канал об аниме?
         0 | 12.03.1997 11:13:52 | Да.
         0 | 12.03.1997 11:13:52 | Как мне пропатчить KDE2 под FreeBSD?

All done, no errors.
"""
    r = run_cli(["-e", "sjis", "-l", "cabs/encoding-sjis.cab"])
    assert "猿も木から落ちる" in r.stdout
    assert "虎穴に入らずんば虎子を得ず" in r.stdout
    assert r.stdout.strip().endswith("All done, no errors.")
    r = run_cli(["-e", "iso-8859-1", "-l", "cabs/encoding-latin1.cab"])
    assert "àáâãäåæçèéêëìíîïðñòóôõö÷øùúûüýþÿ" in r.stdout


def test_symlink_handling(tmp_path):
    """Symlink attack defences + -k and -n semantics
    (reference: cabextract/test/symlinks.test)."""
    t = str(tmp_path)
    other = os.path.join(t, "other.c")
    open(other, "w").close()
    os.makedirs(os.path.join(t, "1", "2"))
    os.mkdir(os.path.join(t, "other"))
    os.symlink(other, os.path.join(t, "plain.c"))
    os.symlink(os.path.join(t, "other"), os.path.join(t, "1", "2", "3"))

    r = run_cli(["-q", "-d", t, "cabs/dir.cab"])
    assert r.returncode == 0, r.stderr
    assert os.path.getsize(os.path.join(t, "plain.c")) > 0
    assert os.path.getsize(other) == 0          # symlink NOT followed
    assert os.path.getsize(os.path.join(t, "1", "2", "3", "4.c")) > 0
    assert not os.path.exists(os.path.join(t, "other", "4.c"))

    # -k: symlinks followed
    import shutil
    shutil.rmtree(os.path.join(t, "1", "2", "3"))
    os.unlink(os.path.join(t, "plain.c"))
    os.symlink(other, os.path.join(t, "plain.c"))
    os.symlink(os.path.join(t, "other"), os.path.join(t, "1", "2", "3"))
    r = run_cli(["-q", "-k", "-d", t, "cabs/dir.cab"])
    assert r.returncode == 0, r.stderr
    assert os.path.getsize(other) > 0
    assert os.path.islink(os.path.join(t, "plain.c"))
    assert os.path.getsize(os.path.join(t, "other", "4.c")) > 0
    assert os.path.islink(os.path.join(t, "1", "2", "3"))

    # -d path symlinks are preserved while archive-path symlinks are not
    shutil.rmtree(os.path.join(t, "1"))
    os.unlink(os.path.join(t, "other", "4.c"))
    os.unlink(other)
    os.unlink(os.path.join(t, "plain.c"))
    open(other, "w").close()
    os.mkdir(os.path.join(t, "real"))
    os.symlink(os.path.join(t, "real"), os.path.join(t, "fake"))
    os.makedirs(os.path.join(t, "fake", "dest", "1", "2"))
    os.symlink(os.path.join(t, "other"),
               os.path.join(t, "fake", "dest", "1", "2", "3"))
    os.symlink(other, os.path.join(t, "plain.c"))
    dest = os.path.join(t, "fake", "dest")
    r = run_cli(["-q", "-d", dest, "cabs/dir.cab"])
    assert r.returncode == 0, r.stderr
    assert os.path.getsize(os.path.join(dest, "plain.c")) > 0
    assert os.path.getsize(other) == 0
    assert os.path.getsize(os.path.join(dest, "1", "2", "3", "4.c")) > 0
    assert os.path.islink(os.path.join(t, "fake"))
    assert os.path.isdir(dest)

    # -n: never overwrite
    with open(os.path.join(dest, "plain.c"), "w") as fh:
        fh.write("hello\n")
    with open(os.path.join(dest, "1", "2", "3", "4.c"), "w") as fh:
        fh.write("world\n")
    r = run_cli(["-q", "-n", "-d", dest, "cabs/dir.cab"])
    assert r.returncode == 0, r.stderr
    assert open(os.path.join(dest, "plain.c")).read() == "hello\n"
    assert open(os.path.join(dest, "1", "2", "3", "4.c")).read() == "world\n"


def test_version_flag():
    r = run_cli(["--version"])
    assert r.returncode == 0
    assert "cabextract" in r.stdout
