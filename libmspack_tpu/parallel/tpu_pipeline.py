"""TPU decode pipeline: device entropy phase + host resolve phase.

Executes a Plan's MSZIP folder jobs with the Pallas lane-parallel
entropy kernel (ops/pallas_inflate.py): frames of all folders are
batched into device lanes, phase A emits (step, lane) token traces on
the TPU, the traces are transposed device-side (so each lane is
contiguous), pulled to the host, and resolved into bytes by the native
C++ phase B (msp_resolve_traces) — matches chain across frames within
a folder exactly like the reference's carried window
(reference mszipd.c:407-459).

Lanes whose trace comes back flagged (corrupt frame, T-cap overrun)
are re-decoded by the host engine so error semantics stay identical to
the scalar driver.
"""
from __future__ import annotations

import numpy as np

SL, LN = 8, 128
LANES = SL * LN

# per-lane single-launch output budget for the LZX kernel: the
# (step, lane) trace is T_PAD x LANES x 8 bytes, and a lane decodes
# one stream — larger streams go to the native engine (or, later,
# segment across launches via kernel state export)
LZX_TPU_MAX_CHUNK = 128 * 1024


class TpuMszipEngine:
    """Batched MSZIP folder decode via the Pallas entropy kernel.

    phase_b: "host" resolves traces with the native C++ resolver
    (memcpy-speed; traces cross the device->host link), "device" runs
    the Pallas copy machine (ops/pallas_resolve.py) so only the
    resolved BYTES leave the device — device-resident end-to-end, at
    the scalar copy machine's rate.
    """

    def __init__(self, interpret: bool = False, phase_b: str = "host"):
        self.interpret = interpret
        self.phase_b = phase_b
        self._timings = {}

    def decode_folders(self, folders, n_threads=None):
        """folders: [(frames, sizes)] like native.mszip_folders.
        Returns list of per-folder bytes, or None if unavailable."""
        import jax
        import jax.numpy as jnp
        from .. import native
        from ..ops import pallas_inflate as pa
        import time

        jobs = []      # (folder_idx, frame_idx, stream, hist, size)
        for fi, (frames, sizes) in enumerate(folders):
            for k, (f, s) in enumerate(zip(frames, sizes)):
                jobs.append((fi, k, f, 0 if k == 0 else 32768, s))
        if not jobs:
            return [b"" for _ in folders]

        out_offsets = [0]
        for frames, sizes in folders:
            out_offsets.append(out_offsets[-1] + sum(sizes))
        out = np.empty(out_offsets[-1], np.uint8)

        # lane batches keep each folder's frames on consecutive lanes
        # of one batch (phase B chains history across those lanes)
        batches = self._split_on_folders(jobs)

        t0 = time.perf_counter()
        failed = set()
        # double-buffered pipeline: JAX dispatch is async, so batch
        # k+1's host pack + upload + kernel run overlap batch k's
        # trace pull + host resolve (the first np.asarray on batch k
        # blocks only on batch k's work). Depth 2 bounds device trace
        # memory to two (T_PAD, L) grids.
        inflight = []
        for batch in batches:
            inflight.append((batch, self._launch_batch(batch)))
            if len(inflight) > 1:
                b, h = inflight.pop(0)
                self._finish_batch(b, h, folders, out, out_offsets,
                                   failed, n_threads)
        for b, h in inflight:
            self._finish_batch(b, h, folders, out, out_offsets,
                               failed, n_threads)
        self._timings["total"] = time.perf_counter() - t0

        # host fallback for failed folders
        for fi in sorted(failed):
            frames, sizes = folders[fi]
            blob = native.mszip_folder(frames, sizes, n_threads)
            if blob is None:
                return None
            out[out_offsets[fi]:out_offsets[fi + 1]] = \
                np.frombuffer(blob, np.uint8)
        return [out[out_offsets[i]:out_offsets[i + 1]].tobytes()
                for i in range(len(folders))]

    @staticmethod
    def _split_on_folders(jobs):
        """Greedy batches of <= LANES lanes, folders kept whole."""
        by_folder = {}
        for j in jobs:
            by_folder.setdefault(j[0], []).append(j)
        batches = []
        cur = []
        for fi in sorted(by_folder):
            fj = by_folder[fi]
            if len(fj) > LANES:
                # giant folder: its own oversized marker batch (host path)
                batches.append(fj)
                continue
            if len(cur) + len(fj) > LANES:
                batches.append(cur)
                cur = []
            cur.extend(fj)
        if cur:
            batches.append(cur)
        return batches

    def _launch_batch(self, batch):
        """Dispatch phase A for one batch (async; nothing blocks)."""
        from ..ops import pallas_inflate as pa

        if len(batch) > LANES:
            return None
        frames = [j[2] for j in batch]
        hists = [j[3] for j in batch]
        sizes = [j[4] for j in batch]
        # worst-case steps: literal pairs decode 2 bytes/step, plus
        # header+wait slack per deflate block (the round-4 kernel
        # fuses match length+distance into one step)
        t_need = max(sizes) // 2 + 1536 if sizes else 1536
        # power-of-two buckets: batches share compiled kernels
        t_pad = min(18432, max(2048, 1 << (t_need - 1).bit_length()))
        tok, litw, cnt = pa.inflate_phase_a(
            frames, hists=hists, SL=SL, LN=LN, T_PAD=t_pad,
            interpret=self.interpret)
        return tok, litw, cnt, sizes

    def _finish_batch(self, batch, handle, folders, out, out_offsets,
                      failed, n_threads):
        import jax
        import jax.numpy as jnp
        from .. import native

        if handle is None:
            failed.update(j[0] for j in batch)
            return
        tok, litw, cnt, sizes = handle
        cnth = np.asarray(cnt)
        n = len(batch)
        errs = cnth[0, :n]
        outb = cnth[1, :n]
        tstop = int(cnth[2, :n].max()) + 1 if n else 1
        bad_lane = (errs != 0) | (outb != np.asarray(sizes))
        if self.phase_b == "device":
            done = self._resolve_device(batch, folders, out, out_offsets,
                                        failed, tok, litw, sizes,
                                        bad_lane, tstop)
            if done:
                return
        # transpose device-side so lanes are contiguous rows on host
        tokT = np.ascontiguousarray(
            np.asarray(jnp.transpose(tok[:tstop])), dtype=np.int32)
        litT = np.ascontiguousarray(
            np.asarray(jnp.transpose(litw[:tstop])), dtype=np.int32)

        # group batch lanes into folder runs
        lane = 0
        fl0, fnf, fsizes, fidx = [], [], [], []
        while lane < n:
            fi = batch[lane][0]
            cnt_f = sum(1 for j in batch if j[0] == fi)
            lanes_bad = bad_lane[lane:lane + cnt_f].any()
            if lanes_bad:
                failed.add(fi)
            else:
                fl0.append(lane)
                fnf.append(cnt_f)
                fsizes.extend(sizes[lane:lane + cnt_f])
                fidx.append(fi)
            lane += cnt_f
        if not fidx:
            return
        # resolve into a contiguous staging arena, then place
        offs = [0]
        for i, fi in enumerate(fidx):
            offs.append(offs[-1] + (out_offsets[fi + 1] - out_offsets[fi]))
        arena = np.empty(offs[-1], np.uint8)
        r = native.resolve_traces(tokT, litT, fl0, fnf, fsizes, arena,
                                  offs, n_threads)
        if r != 0:
            failed.update(fidx)
            return
        for i, fi in enumerate(fidx):
            out[out_offsets[fi]:out_offsets[fi + 1]] = \
                arena[offs[i]:offs[i + 1]]

    def _resolve_device(self, batch, folders, out, out_offsets, failed,
                        tok, litw, sizes, bad_lane, tstop):
        """Device phase B: the Pallas copy machine chains each folder's
        frames across consecutive lanes; only resolved bytes leave the
        device. Requires every mid-folder frame to fill its full
        32 KiB slot (cabd emits full blocks except the last,
        cabd.c:1362-1460); declines otherwise. Returns True when the
        batch was fully handled."""
        from ..ops import pallas_resolve as pr

        n = len(batch)
        hist_flags = [0 if batch[i][1] == 0 else 1 for i in range(n)]
        for i in range(n):
            last_of_folder = (i + 1 >= n or batch[i + 1][1] == 0)
            if not last_of_folder and sizes[i] != 32768:
                return False  # partial mid-frame: host resolve path
        if bad_lane.any():
            return False
        outb, cnts = pr.resolve_frames_device(
            tok, litw, sizes, hist_flags=hist_flags, n_steps=tstop,
            interpret=self.interpret)
        outh = np.asarray(outb[:n])
        cnth = np.asarray(cnts[:n])
        if not np.array_equal(cnth, np.asarray(sizes)):
            return False
        lane = 0
        while lane < n:
            fi = batch[lane][0]
            cnt_f = sum(1 for j in batch if j[0] == fi)
            pos = out_offsets[fi]
            for i in range(lane, lane + cnt_f):
                out[pos:pos + sizes[i]] = outh[i, :sizes[i]]
                pos += sizes[i]
            lane += cnt_f
        return True


class TpuLzxEngine:
    """Batched LZX stream decode via the Pallas lane kernel.

    Each job is an independent fresh-entropy-state LZX stream — a CAB
    folder within the per-lane budget (CAB LZX never resets,
    cabd.c:1249-1250, so a folder is one stream), a CHM reset-interval
    chunk (chmd.c:1172-1183 re-inits at reset points), or an OAB block.
    Streams batch onto device lanes; phase A (ops/pallas_lzx.py) emits
    token traces on the TPU; the native C++ resolver
    (msp_lzx_resolve_traces) turns them into bytes, including the E8
    call-translation untransform (lzxd.c:706-733).
    """

    def __init__(self, interpret: bool = False):
        self.interpret = interpret
        self.n_decoded = 0   # streams decoded via the kernel path
        self._timings = {}
        self._decline_on_intel = False

    def decode_streams(self, streams, out_lens, window_bits,
                       n_threads=None, decline_on_intel=False,
                       is_delta=False, refs=None):
        """streams: list of bytes; out_lens: decompressed sizes.
        Returns list of per-stream bytes, or None to fall back.

        decline_on_intel: callers whose streams are reset-interval
        chunks of ONE sequential stream (CHM section 1) must set this —
        intel E8 curpos / frame counter / intel_started are
        stream-global in the reference (lzxd.c:707-713), so chunk-local
        E8 would diverge; we fall back to the sequential host engine
        instead (real-world chunked sections never use E8: the
        reference's own ResetTable random access restarts that state).

        is_delta/refs: LZX DELTA streams (OAB blocks) with per-stream
        reference data preloaded at the window tail (lzxd.c:348-382).
        DELTA batches decline on intel E8 (pre-started frames may
        contain 0xE8 bytes from reference data, which the reference
        leaves untransformed — the native engine replays that exactly)
        and above the single-launch budget (no segmenting: every OAB
        block is an independent stream)."""
        import jax.numpy as jnp
        import numpy as np

        from .. import native
        from ..ops import pallas_lzx as plx

        if not streams:
            return []
        if not native.available():
            return None
        if is_delta and (window_bits > 18
                         or max(out_lens) > LZX_TPU_MAX_CHUNK):
            # DELTA windows up to 2^25 exist; the (NMAIN, 8, 128) key
            # table outgrows VMEM past 2^18 — native handles those
            return None
        self._decline_on_intel = decline_on_intel
        self._is_delta = is_delta
        self._refs = refs or [b""] * len(streams)
        outs = [None] * len(streams)
        # rate-homogeneous lane packing: lanes decode in lockstep, so
        # a batch costs its SLOWEST lane — sorting by compressed size
        # groups similar-length streams per launch (outputs land by
        # index, so order is free)
        order = sorted(range(len(streams)),
                       key=lambda i: len(streams[i]), reverse=True)
        # double-buffered pipeline over lane batches: JAX dispatch is
        # async, so batch k+1's pack + upload + kernel overlap batch
        # k's trace pull + native resolve (segmented batches are
        # inherently synchronous and flush the pipeline first)
        inflight = []

        def drain_one():
            sts, szs, ixs, h = inflight.pop(0)
            return self._finish_batch(sts, szs, window_bits, ixs, outs,
                                      n_threads, h)

        for b0 in range(0, len(order), LANES):
            idxs = order[b0:b0 + LANES]
            batch_streams = [streams[i] for i in idxs]
            batch_lens = [out_lens[i] for i in idxs]
            if max(batch_lens) > LZX_TPU_MAX_CHUNK:
                while inflight:
                    if not drain_one():
                        return None
                if self.interpret:
                    # multi-launch interpret runs are pathologically
                    # slow; CPU test runs take the host engine
                    return None
                if not self._decode_segmented(batch_streams, batch_lens,
                                              window_bits, idxs, outs,
                                              n_threads):
                    return None
                continue
            batch_refs = ([self._refs[i] for i in idxs]
                          if is_delta else None)
            inflight.append((batch_streams, batch_lens, idxs,
                             self._launch_batch(batch_streams,
                                                batch_lens,
                                                window_bits,
                                                refs=batch_refs)))
            if len(inflight) > 1 and not drain_one():
                return None
        while inflight:
            if not drain_one():
                return None
        return outs

    def _launch_batch(self, streams, sizes, window_bits, refs=None):
        """Dispatch phase A for one batch (async; nothing blocks)."""
        from ..ops import pallas_lzx as plx

        # literal-heavy streams need ~1 step/byte; typical streams
        # ~0.2 — overruns flag errv=2 and the caller falls back.
        # bucket to powers of two so batches share compiled kernels
        t_need = max(sizes) // 2 + 4096
        t_pad = max(4096, 1 << (t_need - 1).bit_length())
        delta = getattr(self, "_is_delta", False)
        hists = [len(r) for r in refs] if refs else None
        return plx.lzx_phase_a(streams, sizes, window_bits,
                               hists=hists, is_delta=delta,
                               T_PAD=t_pad, interpret=self.interpret)

    def _finish_batch(self, streams, sizes, window_bits, idxs, outs,
                      n_threads, handle):
        import jax.numpy as jnp
        import numpy as np

        from .. import native

        tok, litw, cnt = handle
        cnth = np.asarray(cnt)
        n = len(streams)
        if (cnth[0, :n] != 0).any():
            return False
        if not np.array_equal(cnth[1, :n], np.asarray(sizes)):
            return False
        tstop = int(cnth[2, :n].max()) + 1
        iflags = [int(cnth[4, i]) for i in range(n)]
        ifszs = [int(cnth[5, i]) for i in range(n)]
        delta = getattr(self, "_is_delta", False)
        if ((getattr(self, "_decline_on_intel", False) or delta)
                and any(iflags) and any(ifszs)):
            # DELTA: pre-started frames may hold 0xE8 bytes copied
            # from reference data; the trace resolver's whole-stream
            # E8 would transform them (the native engine replays the
            # exact first-started frame instead)
            return False
        tokT = np.ascontiguousarray(
            np.asarray(jnp.transpose(tok[:tstop])), dtype=np.int32)[:n]
        litT = np.ascontiguousarray(
            np.asarray(jnp.transpose(litw[:tstop])), dtype=np.int32)[:n]
        offs = [0]
        for s in sizes:
            offs.append(offs[-1] + s)
        arena = np.empty(offs[-1], np.uint8)
        hists = None
        if delta:
            # reference data preloads the window TAIL (lzxd.c:373-379)
            wsize = 1 << window_bits
            hists = np.zeros((n, wsize), np.uint8)
            for j, i in enumerate(idxs):
                ref = self._refs[i]
                if ref:
                    hists[j, wsize - len(ref):] = np.frombuffer(
                        ref, np.uint8)
        r = native.lzx_resolve_traces(tokT, litT, sizes, iflags, ifszs,
                                      window_bits, arena, offs,
                                      n_threads, hists=hists)
        if r != 0:
            return False
        for j, i in enumerate(idxs):
            outs[i] = arena[offs[j]:offs[j + 1]].tobytes()
        self.n_decoded += len(idxs)
        return True

    # segment output per launch: bounds the (step, lane) trace so a
    # reset-interval-0 CAB folder of any size decodes through the
    # kernel (cabd.c:1249-1250 never resets; the kernel exports its
    # full entropy state at the 32 KiB frame boundary and resumes)
    LZX_SEG = 64 * 1024

    def _decode_segmented(self, streams, total_lens, window_bits,
                          idxs, outs, n_threads):
        """Multi-launch decode: every launch advances each unfinished
        lane by <= LZX_SEG bytes (frame-aligned), carrying the kernel
        state (bit cursor, trees, LRU, block position) between
        launches; window tails chain phase B across segments, and the
        E8 untransform runs once at the end over pre-transform bytes."""
        import jax.numpy as jnp
        import numpy as np

        from .. import native
        from ..ops import pallas_lzx as plx

        n = len(streams)
        wsize = 1 << window_bits
        SEG = self.LZX_SEG
        pos = [0] * n
        parts = [bytearray() for _ in range(n)]
        tails = np.zeros((n, wsize), np.uint8)
        resume = None
        rem = list(streams)
        iflag = [0] * n
        ifsz = [0] * n
        t_pad = SEG + 4096
        while any(pos[i] < total_lens[i] for i in range(n)):
            targets = [min(total_lens[i], pos[i] + SEG)
                       for i in range(n)]
            res = plx.lzx_phase_a(rem, targets, window_bits,
                                  T_PAD=t_pad,
                                  interpret=self.interpret,
                                  resume=resume, return_state=True)
            tok, litw, cnt, st = res
            cnth = np.asarray(cnt)
            active = [i for i in range(n) if pos[i] < total_lens[i]]
            if any(cnth[0, i] != 0 for i in active):
                return False
            if any(cnth[1, i] != targets[i] for i in active):
                return False
            tstop = int(cnth[2, :n].max()) + 1
            tokT = np.ascontiguousarray(
                np.asarray(jnp.transpose(tok[:tstop])),
                dtype=np.int32)[:n]
            litT = np.ascontiguousarray(
                np.asarray(jnp.transpose(litw[:tstop])),
                dtype=np.int32)[:n]
            seg_lens = [targets[i] - pos[i] for i in range(n)]
            offs = [0]
            for s in seg_lens:
                offs.append(offs[-1] + s)
            arena = np.empty(max(offs[-1], 1), np.uint8)
            hists = (np.ascontiguousarray(tails)
                     if resume is not None else None)
            # E8 applies once at the end (the window carries
            # PRE-transform bytes, lzxd.c:706-733) -> iflags all 0
            r = native.lzx_resolve_traces(
                tokT, litT, seg_lens, [0] * n, [0] * n, window_bits,
                arena, offs, n_threads,
                hists=hists, e8_bases=None)
            if r != 0:
                return False
            for i in range(n):
                if seg_lens[i] == 0:
                    continue
                seg = arena[offs[i]:offs[i + 1]]
                parts[i].extend(seg)
                joined = np.concatenate([tails[i], seg])
                tails[i] = joined[-wsize:]
                iflag[i] = int(cnth[4, i])
                ifsz[i] = int(cnth[5, i])
                pos[i] = targets[i]
            # next segment's streams: each lane's remainder from its
            # exported word cursor (the bit buffer carries the tail)
            wpos = cnth[3, :n]
            rem = [rem[i][4 * int(wpos[i]):] for i in range(n)]
            resume = (cnth, np.asarray(st))
        if self._decline_on_intel and any(iflag) and any(ifsz):
            return False
        for j, i in enumerate(idxs):
            blob = np.frombuffer(bytes(parts[j]), np.uint8).copy()
            if iflag[j] and ifsz[j]:
                native.e8_decode_buf(blob, ifsz[j], 0)
            outs[i] = blob.tobytes()
        self.n_decoded += n
        return True


class TpuQtmEngine:
    """Batched Quantum folder decode via the Pallas lane kernel.

    Each lane is one CAB Quantum folder stream (0xFF trailers already
    injected, cabd.c:1327-1332). Quantum's adaptive models make a
    stream strictly sequential (qtmd.c:92-166); folders are the
    parallel axis. Phase B reuses the native LZX trace resolver (the
    kernel emits the same linear-distance token format, no E8).
    """

    def __init__(self, interpret: bool = False):
        self.interpret = interpret
        self.n_decoded = 0

    def decode_streams(self, streams, out_lens, window_bits,
                       n_threads=None):
        import numpy as np

        from .. import native

        if not streams:
            return []
        if not native.available():
            return None
        outs = [None] * len(streams)
        # double-buffered pipeline (see TpuLzxEngine.decode_streams);
        # rate-homogeneous batches (lockstep lanes cost their slowest)
        order = sorted(range(len(streams)),
                       key=lambda i: len(streams[i]), reverse=True)
        inflight = []
        for b0 in range(0, len(order), LANES):
            idxs = order[b0:b0 + LANES]
            sts = [streams[i] for i in idxs]
            szs = [out_lens[i] for i in idxs]
            if max(szs) > LZX_TPU_MAX_CHUNK:
                # flush the pipeline, then decode this batch in
                # segments with the kernel's model-state export
                for a in inflight:
                    if not self._finish_batch(a[0], a[1], window_bits,
                                              a[2], outs, n_threads,
                                              a[3]):
                        return None
                inflight = []
                if self.interpret:
                    # multi-launch interpret runs are pathologically
                    # slow; CPU test runs take the host engine
                    return None
                if not self._decode_segmented(sts, szs, window_bits,
                                              idxs, outs, n_threads):
                    return None
                continue
            inflight.append((sts, szs, idxs,
                             self._launch_batch(sts, szs, window_bits)))
            if len(inflight) > 1:
                a = inflight.pop(0)
                if not self._finish_batch(a[0], a[1], window_bits,
                                          a[2], outs, n_threads, a[3]):
                    return None
        for a in inflight:
            if not self._finish_batch(a[0], a[1], window_bits, a[2],
                                      outs, n_threads, a[3]):
                return None
        return outs

    def _launch_batch(self, streams, sizes, window_bits):
        """Dispatch phase A for one batch (async; nothing blocks)."""
        from ..ops import pallas_qtm as pq

        t_need = max(sizes) * 2 + 2048
        t_pad = max(4096, 1 << (t_need - 1).bit_length())
        # interpreter-mode cost scales with the lane grid (no Mosaic
        # tiling constraint there) — shrink it for CPU test runs
        sl = 1 if (self.interpret and len(streams) <= 128) else SL
        return pq.qtm_phase_a(streams, sizes, window_bits, SL=sl,
                              T_PAD=t_pad, interpret=self.interpret)

    def _finish_batch(self, streams, sizes, window_bits, idxs, outs,
                      n_threads, handle):
        import jax.numpy as jnp
        import numpy as np

        from .. import native

        tok, litw, cnt = handle
        cnth = np.asarray(cnt)
        n = len(streams)
        if (cnth[0, :n] != 0).any():
            return False
        if not np.array_equal(cnth[1, :n], np.asarray(sizes)):
            return False
        tstop = int(cnth[2, :n].max()) + 1
        tokT = np.ascontiguousarray(
            np.asarray(jnp.transpose(tok[:tstop])), dtype=np.int32)[:n]
        litT = np.ascontiguousarray(
            np.asarray(jnp.transpose(litw[:tstop])), dtype=np.int32)[:n]
        offs = [0]
        for s in sizes:
            offs.append(offs[-1] + s)
        arena = np.empty(offs[-1], np.uint8)
        r = native.lzx_resolve_traces(tokT, litT, sizes, [0] * n,
                                      [0] * n, window_bits, arena,
                                      offs, n_threads)
        if r != 0:
            return False
        for j, i in enumerate(idxs):
            outs[i] = arena[offs[j]:offs[j + 1]].tobytes()
        self.n_decoded += len(idxs)
        return True

    # segment output per launch: bounds the (step, lane) trace so a
    # Quantum folder of any size decodes through the kernel. The coder
    # re-inits at every 32 KiB frame (qtmd.c:430-442); the adaptive
    # MODELS carry — the kernel exports the whole (NT+1, 65) model
    # grid plus its bit cursor and pending-rescale flag per segment.
    QTM_SEG = 32 * 1024

    def _decode_segmented(self, streams, total_lens, window_bits,
                          idxs, outs, n_threads):
        """Multi-launch decode: every launch advances each unfinished
        lane by <= QTM_SEG bytes (frame-aligned), carrying the model
        grid between launches; window tails chain phase B across
        segments (no E8 in Quantum)."""
        import jax.numpy as jnp
        import numpy as np

        from .. import native
        from ..ops import pallas_qtm as pq

        n = len(streams)
        wsize = 1 << window_bits
        SEG = self.QTM_SEG
        pos = [0] * n
        parts = [bytearray() for _ in range(n)]
        tails = np.zeros((n, wsize), np.uint8)
        resume = None
        rem = list(streams)
        t_pad = SEG * 2 + 4096
        while any(pos[i] < total_lens[i] for i in range(n)):
            targets = [min(total_lens[i], pos[i] + SEG)
                       for i in range(n)]
            res = pq.qtm_phase_a(rem, targets, window_bits,
                                 T_PAD=t_pad,
                                 interpret=self.interpret,
                                 resume=resume, return_state=True)
            tok, litw, cnt, st = res
            cnth = np.asarray(cnt)
            active = [i for i in range(n) if pos[i] < total_lens[i]]
            if any(cnth[0, i] != 0 for i in active):
                return False
            if any(cnth[1, i] != targets[i] for i in active):
                return False
            tstop = int(cnth[2, :n].max()) + 1
            tokT = np.ascontiguousarray(
                np.asarray(jnp.transpose(tok[:tstop])),
                dtype=np.int32)[:n]
            litT = np.ascontiguousarray(
                np.asarray(jnp.transpose(litw[:tstop])),
                dtype=np.int32)[:n]
            seg_lens = [targets[i] - pos[i] for i in range(n)]
            offs = [0]
            for s in seg_lens:
                offs.append(offs[-1] + s)
            arena = np.empty(max(offs[-1], 1), np.uint8)
            hists = (np.ascontiguousarray(tails)
                     if resume is not None else None)
            r = native.lzx_resolve_traces(
                tokT, litT, seg_lens, [0] * n, [0] * n, window_bits,
                arena, offs, n_threads, hists=hists)
            if r != 0:
                return False
            for i in range(n):
                if seg_lens[i] == 0:
                    continue
                seg = arena[offs[i]:offs[i + 1]]
                parts[i].extend(seg)
                joined = np.concatenate([tails[i], seg])
                tails[i] = joined[-wsize:]
                pos[i] = targets[i]
            wposr = cnth[3, :n]
            rem = [rem[i][4 * int(wposr[i]):] for i in range(n)]
            resume = (cnth, np.asarray(st))
        for j, i in enumerate(idxs):
            outs[i] = bytes(parts[j])
        self.n_decoded += n
        return True
