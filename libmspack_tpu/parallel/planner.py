"""Decode planning: corpus-scale batch extraction.

The reference processes archives serially (reference:
cabextract.c:383-385). Here a *plan* turns a corpus of archives into
independent decode jobs along the natural shard grid (SURVEY.md §2.4):
archive -> folder -> (frames / reset chunks), then executes them with
the best engine per job:

* MSZIP folders: one native thread-pool call for the whole batch
  (frame-level parallelism inside, folder-level across).
* LZX / Quantum folders: one native stream job per folder, pooled.
* NONE folders: raw copies.
* anything irregular (salvage cases, missing engines): scalar driver.

The same plan can be pointed at a jax Mesh (parallel.mesh) when the
output should stay device-resident.
"""
from __future__ import annotations

import dataclasses
from typing import List, Optional

from ..formats.cab import COMPTYPE_MASK, CabDecompressor, Cabinet
from ..system import PathOrBytes


@dataclasses.dataclass
class FolderJob:
    archive_idx: int
    folder_idx: int
    comp_name: str
    frames: Optional[list]      # mszip: CK-stripped streams
    blocks: Optional[list]      # lzx/qtm: raw block payloads
    sizes: list
    comp_type: int

    @property
    def out_len(self) -> int:
        return sum(self.sizes)


@dataclasses.dataclass
class Plan:
    archives: list
    cabinets: List[Cabinet]
    jobs: List[FolderJob]
    fallback: List[tuple]       # (archive_idx, folder_idx) for scalar path


def plan_archives(paths: List[PathOrBytes]) -> Plan:
    """Parse every archive on host and build the decode job list."""
    cabinets = []
    jobs: List[FolderJob] = []
    fallback = []
    d = CabDecompressor()
    for ai, path in enumerate(paths):
        cab = d.open(path)
        cabinets.append(cab)
        for fi, fol in enumerate(cab.folders):
            ct = fol.comp_type & COMPTYPE_MASK
            if ct == 1:
                collected = d.collect_mszip_frames(fol)
                if collected is None:
                    fallback.append((ai, fi))
                    continue
                frames, sizes = collected
                jobs.append(FolderJob(ai, fi, "mszip",
                                      [f[2:] for f in frames], None, sizes,
                                      fol.comp_type))
            elif ct in (2, 3):
                collected = d.collect_raw_blocks(fol)
                if collected is None:
                    fallback.append((ai, fi))
                    continue
                blocks, sizes = collected
                jobs.append(FolderJob(ai, fi,
                                      "lzx" if ct == 3 else "quantum",
                                      None, blocks, sizes, fol.comp_type))
            elif ct == 0:
                collected = d.collect_raw_blocks(fol)
                if collected is None:
                    fallback.append((ai, fi))
                    continue
                blocks, sizes = collected
                jobs.append(FolderJob(ai, fi, "none", None, blocks, sizes,
                                      fol.comp_type))
            else:
                fallback.append((ai, fi))
    return Plan(paths, cabinets, jobs, fallback)


def _native_archive_pipelines(plan: Plan, results: dict,
                              n_threads) -> None:
    """Whole-cabinet native fast path: one C call per archive does the
    CFDATA walk + checksums + all folder decodes against the mapped
    image — no per-folder Python copies (the same path bench.py
    measures at ~1.2 GB/s on this host; the per-job route below costs
    ~2x in slicing). Archives it declines fall through untouched."""
    import numpy as np

    from .. import native
    if not native.available():
        return
    from ..formats.cab import BLOCKMAX, COMPTYPE_MASK, INPUTMAX

    for ai, cab in enumerate(plan.cabinets):
        jobs = [j for j in plan.jobs if j.archive_idx == ai]
        if not jobs or any((ai, fi) in plan.fallback
                           for fi in range(len(cab.folders))):
            continue
        if any(len(fol.data) != 1 or fol.merge_prev or fol.merge_next
               for fol in cab.folders):
            continue
        if any((fol.comp_type & COMPTYPE_MASK) > 3
               for fol in cab.folders):
            continue
        try:
            src = plan.archives[ai]
            if isinstance(src, (bytes, bytearray)):
                img = np.frombuffer(src, np.uint8)
            else:
                img = np.memmap(src, dtype=np.uint8, mode="r")
            nblocks = sum(f.num_blocks for f in cab.folders)
            out = np.empty(max(nblocks * BLOCKMAX, 1), np.uint8)
            stage = None
            if any((f.comp_type & COMPTYPE_MASK) in (2, 3)
                   for f in cab.folders):
                stage = np.empty(nblocks * (INPUTMAX + 1), np.uint8)
            offs = native.cab_pipeline(
                img, [fol.data[0].offset for fol in cab.folders],
                [fol.num_blocks for fol in cab.folders],
                [fol.comp_type for fol in cab.folders],
                cab.block_resv, out, stage, n_threads=n_threads)
            if offs is None:
                continue
            for fi in range(len(cab.folders)):
                results[(ai, fi)] = out[offs[fi]:offs[fi + 1]]
        except Exception:
            continue


def execute(plan: Plan, n_threads: int | None = None,
            errors: dict | None = None, engine: str = "native") -> dict:
    """Run all jobs; returns {(archive_idx, folder_idx): folder_bytes}.

    engine="native" decodes MSZIP folders with the C++ thread pool;
    engine="tpu" batches them through the Pallas lane-parallel entropy
    kernel (parallel/tpu_pipeline.py) with the native phase-B resolve.
    Jobs the fast engines decline are re-run through the scalar driver
    so error semantics match the reference exactly. Decode failures are
    recorded in `errors` (same key -> exception) — partial folder bytes
    are still returned, like the reference's salvage discipline, but
    never silently (mspack.h error contract).

    engine="auto" routes by workload: the TPU path is chosen only
    when the host calibration (utils.engine_calibration, measured by
    tools/calibrate_engines.py) says it wins end-to-end at this
    plan's total output size — chips behind a slow host link never
    win, a fat PCIe host with a big batch does."""
    from .. import native

    if engine == "auto":
        from ..utils import choose_engine
        engine = choose_engine(sum(j.out_len for j in plan.jobs))

    results: dict = {}
    if engine == "native":
        _native_archive_pipelines(plan, results, n_threads)
    mszip_jobs = [j for j in plan.jobs if j.comp_name == "mszip"
                  and (j.archive_idx, j.folder_idx) not in results]
    if mszip_jobs and engine == "tpu":
        import jax
        from .tpu_pipeline import TpuMszipEngine
        eng = TpuMszipEngine(interpret=jax.default_backend() == "cpu")
        outs = eng.decode_folders(
            [(j.frames, j.sizes) for j in mszip_jobs], n_threads)
        if outs is not None:
            for j, out in zip(mszip_jobs, outs):
                results[(j.archive_idx, j.folder_idx)] = out
    elif mszip_jobs:
        outs = native.mszip_folders(
            [(j.frames, j.sizes) for j in mszip_jobs], n_threads)
        if outs is not None:
            for j, out in zip(mszip_jobs, outs):
                results[(j.archive_idx, j.folder_idx)] = out

    for j in plan.jobs:
        key = (j.archive_idx, j.folder_idx)
        if key in results:
            continue
        if j.comp_name == "none":
            results[key] = b"".join(j.blocks)
        elif j.comp_name == "lzx":
            out = native.lzx_decode(b"".join(j.blocks),
                                    (j.comp_type >> 8) & 0x1F, 0, j.out_len)
            if out is not None:
                results[key] = out
        elif j.comp_name == "quantum":
            stream = b"\xFF".join(j.blocks) + b"\xFF" if j.blocks else b""
            out = native.qtm_decode(stream, (j.comp_type >> 8) & 0x1F,
                                    j.out_len)
            if out is not None:
                results[key] = out

    # scalar fallback for declined/irregular folders
    todo = ([(j.archive_idx, j.folder_idx) for j in plan.jobs
             if (j.archive_idx, j.folder_idx) not in results]
            + plan.fallback)
    for ai, fi in todo:
        cab = plan.cabinets[ai]
        fol = cab.folders[fi]
        d = CabDecompressor()
        from ..system import BytesSink
        sink = BytesSink()
        # decode the folder by extracting its byte range via files
        files = [f for f in cab.files if f.folder is fol]
        if not files:
            continue
        end = max(f.offset + f.length for f in files)
        d._init_folder_state(fol)
        d._d.outsink = sink
        try:
            d._run_decomp(d._d, end)
        except Exception as exc:
            if errors is not None:
                errors[(ai, fi)] = exc
        finally:
            if d._d is not None:
                d._d.outsink = None
        results[(ai, fi)] = sink.getvalue()
    return results


def extract_corpus(paths: List[PathOrBytes],
                   n_threads: int | None = None,
                   errors: dict | None = None,
                   engine: str = "native") -> List[dict]:
    """Decode whole archives: returns per-archive {filename: bytes}.
    Folder decode failures land in `errors` keyed (archive, folder)."""
    plan = plan_archives(paths)
    folder_bytes = execute(plan, n_threads, errors=errors, engine=engine)
    out = []
    for ai, cab in enumerate(plan.cabinets):
        files = {}
        for f in cab.files:
            fi = next((i for i, fol in enumerate(cab.folders)
                       if fol is f.folder), None)
            if fi is None:
                continue
            blob = folder_bytes.get((ai, fi))
            if blob is None or f.offset + f.length > len(blob):
                continue
            files[f.filename] = bytes(blob[f.offset : f.offset + f.length])
        out.append(files)
    return out
