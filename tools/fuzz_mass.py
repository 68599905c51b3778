"""Mass-corpus fuzz runner: the reference's PROTOS-C10 discipline
(reference: test/cabd_c10) applied to the full driver stack.

Generates valid archives for every format, then sweeps thousands of
mutations (bit flips, truncations, splices, garbage) through
open+extract of the *python driver* (host parsers + native engines +
salvage paths). Pass criteria: every archive either extracts or raises
a clean MSPackError — no crash, hang, or foreign exception.

    python tools/fuzz_mass.py [rounds_per_format] [seed]

Exit code 0 = clean sweep; prints a summary line per format.
"""
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import libmspack_tpu as m
from libmspack_tpu.errors import MSPackError
from libmspack_tpu.system import BytesSink


def _text(seed, n):
    rng = random.Random(seed)
    words = [bytes(rng.choices(b"abcdef the of lzx", k=rng.randint(3, 9)))
             for _ in range(40)]
    return b"".join(rng.choice(words) for _ in range(n // 2))[:n]


def build_archives():
    import glob
    from libmspack_tpu.compress import cab_c, lzss_c
    data = _text(7, 90000)
    arcs = {}
    arcs["cab"] = cab_c.write_cab(folders=[
        cab_c.FolderSpec([("a.txt", data[:40000])], "mszip"),
        cab_c.FolderSpec([("b.txt", data[40000:])], "lzx", 16),
        cab_c.FolderSpec([("q.txt", data[:20000])], "quantum", 15),
    ])
    arcs["szdd"] = lzss_c.szdd_compress(data[:30000])
    arcs["kwaj"] = lzss_c.kwaj_compress(data[:30000], method=2,
                                        filename="test.txt")
    chms = sorted(glob.glob("/root/reference/libmspack/test/test_files"
                            "/chmd/*.chm"))
    if chms:
        with open(chms[0], "rb") as fh:
            arcs["chm"] = fh.read()
    try:
        from libmspack_tpu.compress.oab_c import write_oab
        arcs["oab"] = write_oab(data[:50000])
    except Exception:
        pass
    return arcs


def drive(kind, blob):
    """Open + extract everything; only MSPackError is acceptable."""
    if kind == "cab":
        d = m.create_cab_decompressor()
        cab = d.open(blob)
        for f in cab.files:
            d.extract(f, BytesSink())
    elif kind == "chm":
        d = m.create_chm_decompressor()
        chm = d.open(blob)
        for f in chm.files[:8]:
            d.extract(f, BytesSink())
    elif kind == "szdd":
        d = m.create_szdd_decompressor()
        hdr = d.open(blob)
        d.extract(hdr, BytesSink())
    elif kind == "kwaj":
        d = m.create_kwaj_decompressor()
        hdr = d.open(blob)
        d.extract(hdr, BytesSink())
    elif kind == "oab":
        d = m.create_oab_decompressor()
        d.decompress(blob, BytesSink())


def mutate(rng, blob):
    b = bytearray(blob)
    kind = rng.randrange(4)
    if kind == 0:          # bit flips
        for _ in range(rng.randint(1, 16)):
            p = rng.randrange(len(b))
            b[p] ^= rng.randrange(1, 256)
    elif kind == 1:        # truncation
        b = b[:rng.randrange(1, len(b))]
    elif kind == 2:        # splice a shuffled window
        p = rng.randrange(len(b))
        n = min(len(b) - p, rng.randrange(1, 512))
        w = b[p:p + n]
        rng.shuffle(w)
        b[p:p + n] = w
    else:                  # zero a window
        p = rng.randrange(len(b))
        n = min(len(b) - p, rng.randrange(1, 2048))
        b[p:p + n] = bytes(n)
    return bytes(b)


def sweep(kind, blob, rounds, seed, time_budget_s=None):
    rng = random.Random(seed)
    fails = []
    t0 = time.time()
    done = 0
    for i in range(rounds):
        if time_budget_s and time.time() - t0 > time_budget_s:
            break
        mut = mutate(rng, blob)
        try:
            drive(kind, mut)
        except MSPackError:
            pass
        except Exception as e:   # noqa: BLE001 - the failure signal
            fails.append((i, type(e).__name__, str(e)[:80]))
        done = i + 1
    return done, fails


def main():
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    arcs = build_archives()
    bad = 0
    for kind, blob in arcs.items():
        t0 = time.time()
        done, fails = sweep(kind, blob, rounds, seed)
        dt = time.time() - t0
        print(f"{kind}: {done} mutations in {dt:.1f}s "
              f"({done/max(dt,1e-9):.0f}/s), {len(fails)} foreign "
              f"exceptions", flush=True)
        for f in fails[:5]:
            print("   ", f, flush=True)
        bad += len(fails)
    print("CLEAN SWEEP" if bad == 0 else f"{bad} FAILURES")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
