"""Multi-host decode: corpus scatter + result gather over processes.

The reference is a single-process C library; multi-host operation is
this framework's own design (SURVEY.md §5.8). The model:

* `initialize()` wraps jax.distributed.initialize — one process per
  host (or per simulated host in the 2-process CPU dryrun,
  tools/multihost_dryrun.py).
* Corpus scatter: independent decode units (CAB folders — the same
  grid every other parallel axis uses) are assigned round-robin to
  processes; each process decodes only its share with its local
  engines/mesh.
* Result gather: decoded folder bytes travel over the global device
  mesh via jax.experimental.multihost_utils.process_allgather, so
  every process assembles the complete member set. On TPU pods the
  gather rides ICI/DCN; on the CPU dryrun it exercises the identical
  code path through the distributed coordination service.
"""
from __future__ import annotations

import numpy as np


def initialize(coordinator_address: str, num_processes: int,
               process_id: int) -> None:
    """Bring up the JAX distributed runtime (idempotent)."""
    import jax

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id)


def decode_cab_multihost(path_or_bytes) -> dict | None:
    """Decode a cabinet across all processes.

    Every process parses the (KB-sized) container; folder i is decoded
    by process i % nproc; folder bytes are all-gathered so each
    process returns the full {filename: bytes} map. None = a folder
    declined its fast path (caller falls back to a local decode)."""
    import jax
    from jax.experimental import multihost_utils

    from ..formats.cab import COMPTYPE_MASK, CabDecompressor
    from ..system import BytesSink

    nproc = jax.process_count()
    pid = jax.process_index()

    d = CabDecompressor()
    cab = d.open(path_or_bytes)
    nf = len(cab.folders)

    # folder extents = the span its member files cover (the container
    # does not record a folder's total uncompressed size)
    sizes = np.zeros(nf, np.int64)
    for f in cab.files:
        fi = next(i for i, fol in enumerate(cab.folders)
                  if fol is f.folder)
        sizes[fi] = max(sizes[fi], f.offset + f.length)

    # decode my folders
    folder_parts: dict[int, bytes] = {}
    for fi, fol in enumerate(cab.folders):
        if fi % nproc != pid:
            continue
        members = [f for f in cab.files if f.folder is fol]
        blob = bytearray(int(sizes[fi]))
        for f in members:
            s = BytesSink()
            d.extract(f, s)
            blob[f.offset:f.offset + f.length] = s.getvalue()
        folder_parts[fi] = bytes(blob)

    # result gather: pad per-folder buffers to a common shape so the
    # allgather is a dense (nproc, nf, maxlen) exchange
    maxlen = int(sizes.max()) if nf else 0
    local = np.zeros((nf, maxlen), np.uint8)
    owned = np.zeros(nf, np.int64)
    for fi, blob in folder_parts.items():
        local[fi, :len(blob)] = np.frombuffer(blob, np.uint8)
        owned[fi] = 1
    gathered = multihost_utils.process_allgather(local)
    owners = multihost_utils.process_allgather(owned)
    folder_bytes = {}
    for fi in range(nf):
        owner = int(np.argmax(owners[:, fi]))
        if owners[owner, fi] == 0:
            return None
        folder_bytes[fi] = gathered[owner, fi, :sizes[fi]].tobytes()

    out = {}
    for f in cab.files:
        fi = next(i for i, fol in enumerate(cab.folders)
                  if fol is f.folder)
        blob = folder_bytes[fi]
        if f.offset + f.length > len(blob):
            return None
        out[f.filename] = blob[f.offset:f.offset + f.length]
    return out
