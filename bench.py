"""Benchmark: CAB-MSZIP decompression, framework vs reference C.

Pipeline measured (per run): open the cabinet, read + checksum-validate
every CFDATA block, decode all folders with the framework's native
multithreaded two-phase engine (phase A per-frame tokenisation across
a thread pool, phase B folder-ordered resolution), output into a
long-lived buffer. Baseline: the compiled reference libmspack
(single-threaded C — its only mode) extracting the same cabinet to
/dev/shm. Output verified bit-exact against the corpus every run.

The TPU device pipeline (ops/inflate_fused.py) is measured separately
in BENCHMARKS.md: entropy decode is gather-bound on TPU (~65M
gathers/s), so the framework's TPU-first split keeps entropy phases on
the host runtime and uses the TPU for MXU/VPU-shaped passes (CRC,
checksums, E8, scans) and device-resident delivery.

Prints ONE json line:
  {"metric": "mszip_decompress", "value": <GB/s decompressed>,
   "unit": "GB/s", "vs_baseline": <ours / reference>}
"""
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

CORPUS_MB = 96
FOLDER_MB = 24


def build_corpus(total_bytes: int) -> bytes:
    import numpy as np
    rng = np.random.RandomState(7)
    parts = []
    text = (b"The quick brown fox jumps over the lazy dog. "
            b"Pack my box with five dozen liquor jugs. ") * 40
    while sum(map(len, parts)) < total_bytes:
        parts.append(text)
        parts.append(rng.randint(0, 64, 2048, dtype=np.uint8).tobytes() * 4)
        parts.append(bytes(np.arange(256, dtype=np.uint8)) * 32)
    return b"".join(parts)[:total_bytes]


def build_cab(corpus: bytes) -> bytes:
    from libmspack_tpu.compress import cab_c
    folders = []
    fsz = FOLDER_MB << 20
    for i in range(0, len(corpus), fsz):
        folders.append(cab_c.FolderSpec(
            [(f"f{i}.bin", corpus[i : i + fsz])], "mszip"))
    return cab_c.write_cab(folders=folders)


def bench_reference(cab_path: str) -> float:
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.abspath(__file__)), "tests"))
    import oracle
    oracle.build_oracle()
    lib = oracle.lib()
    best = float("inf")
    for _ in range(3):
        with tempfile.TemporaryDirectory(dir="/dev/shm") as d:
            t0 = time.perf_counter()
            err = lib.oracle_cab_extract_all(cab_path.encode(), d.encode(),
                                             0, 0)
            dt = time.perf_counter() - t0
        assert err == 0, f"reference failed: {err}"
        best = min(best, dt)
    return best


def bench_ours(cab_path: str, corpus: bytes) -> float:
    import numpy as np

    from libmspack_tpu import native
    from libmspack_tpu.formats.cab import CabDecompressor

    out = native.Scratch().get(len(corpus))  # long-lived (service mode)
    result = {}

    def run():
        # header parse in python (KB-sized, branchy); all byte-volume
        # work — CFDATA walk, checksums, two-phase inflate — native
        d = CabDecompressor()
        cab = d.open(cab_path)
        img = np.memmap(cab_path, dtype=np.uint8, mode="r")
        offs = native.cab_mszip_pipeline(
            img, [fol.data[0].offset for fol in cab.folders],
            [fol.num_blocks for fol in cab.folders],
            cab.block_resv, out)
        assert offs is not None, "native pipeline declined bench cab"
        result["total"] = offs[-1]

    run()  # warmup (page faults, engine build)
    assert bytes(out[: result["total"]]) == corpus, "bit-exactness failed!"
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        run()
        dt = time.perf_counter() - t0
        print(f"# ours run: {dt:.3f}s", file=sys.stderr)
        best = min(best, dt)
    assert bytes(out[: result["total"]]) == corpus
    return best


def main():
    corpus = build_corpus(CORPUS_MB << 20)
    cab_bytes = build_cab(corpus)
    fd, cab_path = tempfile.mkstemp(suffix=".cab", dir="/dev/shm")
    os.write(fd, cab_bytes)
    os.close(fd)
    try:
        ref_t = bench_reference(cab_path)
        ours_t = bench_ours(cab_path, corpus)
    finally:
        os.unlink(cab_path)

    gb = len(corpus) / 1e9
    ours_gbps = gb / ours_t
    ref_gbps = gb / ref_t
    print(json.dumps({
        "metric": "mszip_decompress",
        "value": round(ours_gbps, 3),
        "unit": "GB/s",
        "vs_baseline": round(ours_gbps / ref_gbps, 3),
    }))
    print(f"# corpus {CORPUS_MB} MiB, ratio "
          f"{len(cab_bytes)/len(corpus):.3f}; reference {ref_gbps:.3f} GB/s "
          f"({ref_t:.3f}s, single-thread C); ours {ours_gbps:.3f} GB/s "
          f"({ours_t:.3f}s, {os.cpu_count()} threads)", file=sys.stderr)


if __name__ == "__main__":
    main()
