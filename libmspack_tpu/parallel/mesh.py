"""Multi-chip scaling: SPMD decode over a jax.sharding.Mesh.

The reference is strictly single-threaded (reference: mspack.h:122-156);
scaling is this framework's own design (SURVEY.md §2.4, §7 step 8).

Shard grid (what the formats make legal):
* dp axis — archives / CAB folders / MSZIP frames / LZX reset
  intervals are independent decode units; we shard the frame batch.
* phase A (speculative entropy decode) is embarrassingly parallel
  across frames -> shard_map over dp, no communication.
* phase B needs cross-frame history (the 32 KiB window spans frame
  boundaries), so token streams are all-gathered over ICI before the
  folder-wide pointer-doubling resolve.

On a real pod slice the same code runs over ICI; tests emulate with 8
virtual CPU devices (tests/conftest.py).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
try:
    from jax import shard_map  # jax >= 0.6
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, PartitionSpec as P


def default_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), axis_names=("dp",))


def sharded_phase_a(mesh: Mesh, P_bits: int, R: int, S: int):
    """Build a pjit-ed, dp-sharded phase A over (B, S) frame data.

    Returns fn(data_flat (B*S,), starts (B,), lit_luts (B,32768),
    dist_luts (B,32768)) -> token arrays gathered on every device.
    B must be divisible by mesh size.
    """
    from ..ops.inflate_jax import _phase_a

    ndev = mesh.devices.size

    def local(data, starts, lit, dist):
        # data: (Bl*S,) local shard
        out = _phase_a(data, starts, lit, dist, P_bits, R, S)
        return out

    fn = shard_map(
        local, mesh=mesh,
        in_specs=(P("dp"), P("dp"), P("dp", None), P("dp", None)),
        out_specs=(P("dp", None), P("dp", None), P("dp", None),
                   P("dp", None), P("dp"), P("dp"), P("dp")))
    return jax.jit(fn)


@functools.partial(jax.jit, static_argnames=("n_out",))
def _gathered_phase_b(t_kind, t_outlen, t_dist, t_lit, frame_base, n_out):
    from ..ops.inflate_jax import _phase_b
    return _phase_b(t_kind, t_outlen, t_dist, t_lit, frame_base, n_out)


def decode_frames_sharded(mesh: Mesh, frames: list[bytes],
                          expected_sizes: list[int] | None = None
                          ) -> bytes | None:
    """Full sharded MSZIP folder decode: phase A dp-sharded over the
    mesh, tokens gathered, folder-wide phase B. Bit-exact vs the
    scalar codec; returns None for fallback cases."""
    from ..ops import inflate_jax as ij

    if not frames:
        return b""
    try:
        ndev = mesh.devices.size
        nominal = len(frames)
        # next power of two (recompile granularity), ndev-divisible
        B = max(ndev, 1 << max(0, nominal - 1).bit_length())
        B = ((B + ndev - 1) // ndev) * ndev
        frames = list(frames) + [ij._EMPTY_STREAM] * (B - nominal)
        S = ij._bucket(max(len(f) for f in frames) + 8, ij.S_BUCKETS)

        data = np.zeros((B, S), np.uint8)
        luts_l = np.zeros((B, 1 << 15), np.int32)
        luts_d = np.zeros((B, 1 << 15), np.int32)
        starts = np.zeros(B, np.int32)
        # single-deflate-block frames only on this path (the common
        # case); multi-block or stored frames fall back
        for i, f in enumerate(frames):
            data[i, : len(f)] = np.frombuffer(f, np.uint8)
            last, kind, *rest = ij._parse_block_header(f, 0)
            if kind != "huff" or not last:
                raise ij.NeedFallback("multi-block/stored frame")
            luts_l[i], luts_d[i], starts[i] = rest

        fa = sharded_phase_a(mesh, S * 8, ij.MAX_TOKENS, S)
        (t_kind, t_outlen, t_dist, t_lit, end_pos, chain_inv,
         reached) = fa(jnp.asarray(data.reshape(-1)), jnp.asarray(starts),
                       jnp.asarray(luts_l), jnp.asarray(luts_d))
        if bool(jnp.any(chain_inv)) or not bool(jnp.all(reached)):
            raise ij.NeedFallback("invalid chain")

        live = (t_kind == 0) | (t_kind == 1)
        frame_lens = jnp.sum(jnp.where(live, t_outlen, 0), axis=1)
        frame_lens_np = np.asarray(frame_lens)
        if expected_sizes is not None:
            exp = np.asarray(list(expected_sizes)
                             + [0] * (B - nominal), np.int64)
            if not np.array_equal(frame_lens_np, exp):
                raise ij.NeedFallback("frame length mismatch")
        total = int(frame_lens_np.sum())
        if total == 0:
            return b""
        base = np.zeros(B, np.int32)
        base[1:] = np.cumsum(frame_lens_np)[:-1]
        n_out = max(256, 1 << (total - 1).bit_length())
        out, bad = _gathered_phase_b(t_kind, t_outlen, t_dist, t_lit,
                                     jnp.asarray(base), n_out)
        if bool(bad):
            raise ij.NeedFallback("bad source")
        return np.asarray(out)[:total].tobytes()
    except ij.NeedFallback:
        return None


# ---------------------------------------------------------------------------
# ring phase B: per-shard resolve with ppermute window-state handoff
# (SURVEY §5.7 — replaces the all-gather + one-device resolve)
# ---------------------------------------------------------------------------

H_WIN = 32768  # MSZIP window: the only cross-frame state


def _expand_mszip_tokens(tok, litw, flen, N):
    """(T, L) pallas_inflate traces -> per-byte (ptr, litv) over a
    length-N space whose first H_WIN positions are the ring window.

    Every output byte gets a back-pointer: literals point at
    themselves (litv holds the value), match bytes point dist back.
    Tokens are the round-4 kernel format: 0x20000000|n packed
    literals, 0x40000000|nl<<25|len<<16|(dist-1) with nl carried
    literals."""
    T, L = tok.shape
    H = H_WIN
    v = jnp.transpose(tok)            # (L, T)
    w = jnp.transpose(litw)
    live = v >= 0
    is_lit = live & ((v >> 29) & 1).astype(bool)
    is_mt = live & ((v >> 30) & 1).astype(bool)
    nlit = jnp.where(is_lit, v & 7, jnp.where(is_mt, (v >> 25) & 3, 0))
    mlen = jnp.where(is_mt, (v >> 16) & 0x1FF, 0)
    tlen = nlit + mlen
    within = jnp.cumsum(tlen, axis=1) - tlen
    base = H + jnp.cumsum(flen) - flen          # (L,)
    out_start = (base[:, None] + within).reshape(-1)
    tlen_f = tlen.reshape(-1)
    v_f = v.reshape(-1)
    w_f = w.reshape(-1)
    nlit_f = nlit.reshape(-1)

    LT = L * T
    marks = jnp.zeros(N + 1, jnp.int32).at[
        jnp.where(tlen_f > 0, jnp.clip(out_start, 0, N), N)].max(
        jnp.arange(LT, dtype=jnp.int32) + 1)
    tok_id = jnp.clip(jax.lax.cummax(marks[:N]) - 1, 0, LT - 1)

    pos = jnp.arange(N, dtype=jnp.int32)
    st = jnp.take(out_start, tok_id)
    vv = jnp.take(v_f, tok_id)
    ww = jnp.take(w_f, tok_id)
    nl = jnp.take(nlit_f, tok_id)
    dist = (vv & 0x7FFF) + 1
    b_off = pos - st
    lit_byte = b_off < nl
    litval = (ww >> (8 * jnp.clip(b_off, 0, 3))) & 0xFF
    # positions past the produced bytes have no covering token — they
    # must self-point (garbage back-pointers there would flag the
    # roots<0 validity check)
    tot = H + jnp.sum(flen)
    ptr = jnp.where((pos < H) | (pos >= tot), pos,
                    jnp.where(lit_byte, pos, pos - dist))
    litv = jnp.where((pos >= H) & lit_byte & (pos < tot), litval, 0)
    return ptr, litv


def _point_roots(ptr, N):
    """Pointer-double to fixed points (literals / window positions).

    This is the expensive phase-B step and runs ONCE per shard —
    the ring then only substitutes window values through the root
    indirection (per-device work independent of ndev)."""
    rounds = max(1, N - 1).bit_length()

    def rd(_, p):
        return jnp.where(p >= 0, jnp.take(p, jnp.clip(p, 0, N - 1)), p)

    return jax.lax.fori_loop(0, rounds, rd, ptr)


class NeedFallback(Exception):
    pass


def _tpu_interpret() -> bool:
    return jax.default_backend() == "cpu"


def decode_frames_ring(mesh: Mesh, frames: list[bytes],
                       expected_sizes: list[int] | None = None
                       ) -> bytes | None:
    """Sharded MSZIP folder decode with ring phase B.

    Phase A is the PRODUCT Pallas lane kernel (ops/pallas_inflate.py),
    dp-sharded with no communication — compiled on real TPUs,
    interpreter mode on the virtual CPU mesh — so multi-block and
    stored frames ride the ring like any others (round 3 declined
    them). Phase B pointer-doubles every shard's byte back-pointers to
    their fixed points ONCE, in parallel; the ndev-step ring then only
    substitutes window values through the root indirection and hands
    the 32 KiB output tail onward via ppermute — per-device work no
    longer scales with ndev (round 3 re-ran the full resolve each
    step). Bit-exact vs the scalar codec; None = fall back."""
    from ..ops import pallas_inflate as pa

    if not frames:
        return b""
    try:
        ndev = mesh.devices.size
        nominal = len(frames)
        if expected_sizes is not None and \
                any(s > 32768 for s in expected_sizes):
            raise NeedFallback("frame larger than the MSZIP window")
        Bl = (nominal + ndev - 1) // ndev      # frames per shard
        if Bl > 1024:
            raise NeedFallback("folder larger than the lane grid")
        B = Bl * ndev
        frames = list(frames) + [b""] * (B - nominal)

        # pack each shard's frames into its own (W, SL, LN) word grid
        packs = [pa.pack_streams(frames[d * Bl:(d + 1) * Bl])
                 for d in range(ndev)]
        W = max(p[1] for p in packs)
        stream = np.zeros((ndev, W, 8, 128), np.uint32)
        for d, (arr, wd) in enumerate(packs):
            stream[d, :wd] = arr
        hist = np.zeros((ndev, 8, 128), np.int32)
        for g in range(1, B):
            hist[g // Bl, (g % Bl) // 128, (g % Bl) % 128] = 32768
        # ndev-padding lanes hold empty streams, which the kernel
        # flags as corrupt — mask them out of the error check
        valid = np.zeros((ndev, 1024), np.int32)
        for g in range(nominal):
            valid[g // Bl, g % Bl] = 1
        maxsz = (max(expected_sizes) if expected_sizes
                 else 32768)
        t_pad = min(18432, ((maxsz // 2 + 1536 + 255) // 256) * 256)
        fixk3, fixd3, fixf = pa.fixed_tables()
        ck, cd, cf = (jnp.asarray(fixk3), jnp.asarray(fixd3),
                      jnp.asarray(fixf))
        interp = _tpu_interpret()
        N_loc = Bl * 32768 + H_WIN

        def local(stream, hist, vmask):
            tok, litw, cnt = pa._run(stream[0], hist[0], ck, cd, cf,
                                     8, 128, W, t_pad, interp)
            T = t_pad
            tok = tok.reshape(T, 1024)[:, :Bl]
            litw = litw.reshape(T, 1024)[:, :Bl]
            cnt = cnt.reshape(8, 1024)
            vm = vmask[0, :Bl]
            errs = jnp.where(vm > 0, cnt[0, :Bl], 0)
            flen = jnp.where(vm > 0, cnt[1, :Bl], 0)
            tok = jnp.where(vm[None, :] > 0, tok, -1)
            ptr, litv = _expand_mszip_tokens(tok, litw, flen, N_loc)
            roots = _point_roots(ptr, N_loc)
            litr = jnp.take(litv, jnp.clip(roots, 0, N_loc - 1))
            inv = jnp.logical_or(jnp.any(errs != 0),
                                 jnp.any(roots < 0))
            tot = H_WIN + jnp.sum(flen)
            my = jax.lax.axis_index("dp")

            def ring_step(kdev, carry):
                win, res, restot = carry
                histv = jnp.take(win, jnp.clip(roots, 0, H_WIN - 1))
                out = jnp.where(roots < H_WIN, histv, litr)
                tail = jax.lax.dynamic_slice(
                    out, (jnp.maximum(tot - H_WIN, 0),), (H_WIN,))
                mine = kdev == my
                res = jnp.where(mine, out, res)
                restot = jnp.where(mine, tot - H_WIN, restot)
                win2 = jax.lax.ppermute(
                    tail, "dp",
                    [(i, (i + 1) % ndev) for i in range(ndev)])
                return (win2, res, restot)

            def vary(x):
                return jax.lax.pcast(x, ("dp",), to="varying")
            win0 = vary(jnp.zeros(H_WIN, jnp.int32))
            _, res, restot = jax.lax.fori_loop(
                0, ndev, ring_step,
                (win0, vary(jnp.zeros(N_loc, jnp.int32)),
                 vary(jnp.int32(0))))
            return (res[H_WIN:][None], restot[None], flen, inv[None])

        # check_vma=False: the pallas_call inside has no vma annotation
        fn = shard_map(
            local, mesh=mesh,
            in_specs=(P("dp"), P("dp"), P("dp")),
            out_specs=(P("dp", None), P("dp"), P("dp"), P("dp")),
            check_vma=False)
        res, restot, flen, inv = jax.jit(
            fn, static_argnums=())(jnp.asarray(stream),
                                   jnp.asarray(hist),
                                   jnp.asarray(valid))
        if bool(jnp.any(inv)):
            raise NeedFallback("kernel error / invalid chain")
        flen_np = np.asarray(flen)
        if expected_sizes is not None:
            exp = np.asarray(list(expected_sizes)
                             + [0] * (B - nominal), np.int64)
            if not np.array_equal(flen_np, exp):
                raise NeedFallback("frame length mismatch")
        res_np = np.asarray(res)
        restot_np = np.asarray(restot)
        parts = [res_np[d, :restot_np[d]].astype(np.uint8).tobytes()
                 for d in range(ndev)]
        return b"".join(parts)
    except NeedFallback:
        return None


LZX_MESH_CAP = 128 * 1024   # per-launch LZX output budget on the mesh
LZX_MESH_SEG = 64 * 1024    # segment size for larger streams
MESH_RESOLVE_BUDGET = 64 << 20  # per-device resolve elements (i32)


def _lanes_resolve(tok, litw, flen, Fl, WSIZE, stride, N_loc,
                   pfx=None):
    """Shared on-device phase B for LZX/Quantum lane traces.

    tok/litw: (Fl, T) int32 token planes (pallas_lzx token format,
    which pallas_qtm shares); flen: (Fl,) produced byte counts. Each
    lane owns a [WSIZE prefix | output] region of length `stride`;
    pfx (Fl, WSIZE) int32, when given, fills the prefix with the
    previous segment's window tail (zeros otherwise). Returns
    (out bytes over N_loc as int32, roots<0 invalid flag)."""
    T = tok.shape[1]
    live = tok >= 0
    is_lit = live & ((tok >> 29) & 1).astype(bool)
    is_mt = live & ((tok >> 30) & 1).astype(bool)
    nlit = jnp.where(is_lit, tok & 7, 0)
    mlen = jnp.where(is_mt, tok & 0xFFFFF, 0)
    tlen = nlit + mlen
    within = jnp.cumsum(tlen, axis=1) - tlen
    base = (jnp.arange(Fl, dtype=jnp.int32) * stride + WSIZE)
    out_start = (base[:, None] + within).reshape(-1)
    tlen_f = tlen.reshape(-1)
    v_f = tok.reshape(-1)
    w_f = litw.reshape(-1)
    nl_f = nlit.reshape(-1)
    LT = Fl * T
    marks = jnp.zeros(N_loc + 1, jnp.int32).at[
        jnp.where(tlen_f > 0, jnp.clip(out_start, 0, N_loc),
                  N_loc)].max(
        jnp.arange(LT, dtype=jnp.int32) + 1)
    tok_id = jnp.clip(jax.lax.cummax(marks[:N_loc]) - 1, 0, LT - 1)
    pos = jnp.arange(N_loc, dtype=jnp.int32)
    st = jnp.take(out_start, tok_id)
    ww = jnp.take(w_f, tok_id)
    nl = jnp.take(nl_f, tok_id)
    b_off = pos - st
    lit_byte = b_off < nl
    litval = (ww >> (8 * jnp.clip(b_off, 0, 3))) & 0xFF
    in_pfx = (pos % stride) < WSIZE
    # bytes past a lane's produced length self-point (no covering
    # token — see _expand_mszip_tokens)
    flen_b = jnp.take(flen, pos // stride)
    covered = ((pos % stride) - WSIZE) < flen_b
    ptr = jnp.where(in_pfx | ~covered, pos,
                    jnp.where(lit_byte, pos, pos - ww))
    litv = jnp.where(~in_pfx & lit_byte & covered, litval, 0)
    if pfx is not None:
        pidx = ((pos // stride) * WSIZE
                + jnp.clip(pos % stride, 0, WSIZE - 1))
        litv = jnp.where(in_pfx, jnp.take(pfx.reshape(-1), pidx),
                         litv)
    roots = _point_roots(ptr, N_loc)
    out = jnp.take(litv, jnp.clip(roots, 0, N_loc - 1))
    return out, jnp.any(roots < 0)


def _mesh_pack(streams, ndev, Fl, pack_fn, sl):
    """Pack per-device stream grids, padded to a common power-of-two
    word height (compile reuse across segments). sl: sublane count of
    the kernel grid — 8 compiled (1024 lanes), 1 in interpreter mode
    (the virtual CPU mesh pays per grid element)."""
    packs = [pack_fn(streams[d * Fl:(d + 1) * Fl], sl, 128)
             for d in range(ndev)]
    W = max(p[1] for p in packs)
    W = 1 << (W - 1).bit_length()
    stream = np.zeros((ndev, W, sl, 128), np.uint32)
    for dd, (arr, wd) in enumerate(packs):
        stream[dd, :wd] = arr
    return stream, W


def _grid_i32(vals, ndev, Fl, sl):
    g = np.zeros((ndev, sl, 128), np.int32)
    for i, v in enumerate(vals):
        g[i // Fl, ((i % Fl) // 128), (i % Fl) % 128] = v
    return g


def _mesh_sl(interp, Fl):
    sl = 1 if interp else 8
    while sl * 128 < Fl:
        sl *= 2
    return sl


def decode_lzx_streams_sharded(mesh: Mesh, streams: list[bytes],
                               sizes: list[int], window_bits: int,
                               decline_on_intel: bool = False
                               ) -> list[bytes] | None:
    """Independent LZX streams dp-sharded over the mesh: each device
    runs the product Pallas LZX kernel (compiled on real TPUs,
    interpreted on the virtual CPU mesh) on its lanes, then a local
    pointer-doubling resolve — no communication at all (the streams
    share no state; this is the folder-DP axis). Streams larger than
    LZX_MESH_CAP decode in LZX_MESH_SEG segments using the kernel's
    entropy-state export, window tails chaining phase B on device.

    Inputs must be WHOLE streams starting at output offset 0 (CAB
    folders; CHM reset chunks via decline_on_intel=True): the E8
    untransform applies host-side with curpos base 0 when flagged.
    Callers whose chunks slice ONE sequential stream must pass
    decline_on_intel=True — intel state is stream-global in the
    reference (lzxd.c:707-713), so chunked decode of an E8 section
    must fall back to the sequential engine."""
    if not streams:
        return []
    try:
        if max(sizes) > LZX_MESH_CAP:
            return _decode_lzx_sharded_seg(mesh, streams, sizes,
                                           window_bits,
                                           decline_on_intel)
        return _decode_lzx_sharded_one(mesh, streams, sizes,
                                       window_bits, decline_on_intel)
    except NeedFallback as e:
        _mesh_debug("decode_lzx_streams_sharded declined", e)
        return None
    except Exception as e:
        # XLA OOM / lowering failures on extreme shapes degrade to the
        # host path instead of escaping through decode_cab_sharded
        _mesh_debug("decode_lzx_streams_sharded failed", e)
        return None


def _mesh_debug(msg, exc):
    import os
    if os.environ.get("MSPACK_MESH_DEBUG"):
        import traceback
        print(f"# {msg}: {type(exc).__name__}: {exc}", flush=True)
        traceback.print_exc()


def _decode_lzx_sharded_one(mesh, streams, sizes, window_bits,
                            decline_on_intel):
    from ..ops import pallas_lzx as plx

    ndev = mesh.devices.size
    nominal = len(streams)
    Fl = (nominal + ndev - 1) // ndev
    if Fl > 1024:
        raise NeedFallback("too many streams")
    F = Fl * ndev
    streams = list(streams) + [b""] * (F - nominal)
    sizes_p = list(sizes) + [0] * (F - nominal)
    interp = _tpu_interpret()
    SLn = _mesh_sl(interp, Fl)
    NL = SLn * 128

    stream, W = _mesh_pack(streams, ndev, Fl, plx.pack_streams, SLn)
    outlen = _grid_i32(sizes_p, ndev, Fl, SLn)
    hist = np.zeros((ndev, SLn, 128), np.int32)
    valid = np.zeros((ndev, NL), np.int32)
    for g in range(nominal):
        valid[g // Fl, g % Fl] = 1
    WSIZE = 1 << window_bits
    cap = max(sizes)
    stride = WSIZE + cap
    N_loc = Fl * stride
    if N_loc > MESH_RESOLVE_BUDGET:
        raise NeedFallback("resolve buffer beyond budget")
    t_pad = ((cap + 4096 + 127) // 128) * 128

    _, st_rows = plx._state_layout(window_bits)
    car0 = jnp.zeros((32, SLn, 128), jnp.int32)
    st0 = jnp.zeros((st_rows, SLn, 128), jnp.int32)

    def local(stream, outlen, hist, vmask):
        tok, litw, cnt, _st = plx._run(stream[0], outlen[0],
                                       hist[0], car0, st0,
                                       SLn, 128, W, t_pad,
                                       window_bits, False, False,
                                       interp)
        T = t_pad
        tok = jnp.transpose(tok.reshape(T, NL)[:, :Fl])  # (Fl,T)
        litw = jnp.transpose(litw.reshape(T, NL)[:, :Fl])
        cnt = cnt.reshape(40, NL)   # rows 8+ = exported carries
        vm = vmask[0, :Fl]
        errs = jnp.where(vm > 0, cnt[0, :Fl], 0)
        flen = jnp.where(vm > 0, cnt[1, :Fl], 0)
        tok = jnp.where(vm[:, None] > 0, tok, -1)
        out, bad = _lanes_resolve(tok, litw, flen, Fl, WSIZE, stride,
                                  N_loc)
        inv = jnp.logical_or(jnp.any(errs != 0), bad)
        return (out[None], flen, errs, cnt[4, :Fl], cnt[5, :Fl],
                inv[None])

    fn = shard_map(
        local, mesh=mesh,
        in_specs=(P("dp"), P("dp"), P("dp"), P("dp")),
        out_specs=(P("dp", None), P("dp"), P("dp"), P("dp"),
                   P("dp"), P("dp")),
        check_vma=False)
    out, flen, errs, ifl, ifsz, inv = jax.jit(fn)(
        jnp.asarray(stream), jnp.asarray(outlen),
        jnp.asarray(hist), jnp.asarray(valid))
    if bool(jnp.any(inv)):
        raise NeedFallback("kernel error / invalid chain")
    flen_np = np.asarray(flen).reshape(-1)
    if not np.array_equal(flen_np[:nominal],
                          np.asarray(sizes, np.int64)):
        raise NeedFallback("size mismatch")
    out_np = np.asarray(out)
    ifl_np = np.asarray(ifl).reshape(-1)
    ifsz_np = np.asarray(ifsz).reshape(-1)
    if decline_on_intel and ifl_np[:nominal].any() \
            and ifsz_np[:nominal].any():
        raise NeedFallback("intel E8 state is stream-global")
    from ..ops import pallas_lzx as plx2
    results = []
    for g in range(nominal):
        dd, j = g // Fl, g % Fl
        blob = out_np[dd, j * stride + WSIZE:
                      j * stride + WSIZE + sizes[g]] \
            .astype(np.uint8).tobytes()
        if ifl_np[g] and ifsz_np[g]:
            blob = plx2.e8_decode(blob, int(ifsz_np[g]))
        results.append(blob)
    return results


def _decode_lzx_sharded_seg(mesh, streams, sizes, window_bits,
                            decline_on_intel):
    """Segmented mesh decode for streams beyond LZX_MESH_CAP: every
    launch advances each unfinished lane by <= LZX_MESH_SEG bytes
    (32 KiB frame aligned), the kernel's full entropy state (trees,
    bit cursor, LRU) carried between launches as dp-sharded arrays,
    and each lane's previous window tail preloading the resolve
    prefix on device."""
    from ..ops import pallas_lzx as plx

    ndev = mesh.devices.size
    nominal = len(streams)
    Fl = (nominal + ndev - 1) // ndev
    if Fl > 1024:
        raise NeedFallback("too many streams")
    F = Fl * ndev
    streams = list(streams) + [b""] * (F - nominal)
    sizes_p = list(sizes) + [0] * (F - nominal)
    WSIZE = 1 << window_bits
    interp = _tpu_interpret()
    SLn = _mesh_sl(interp, Fl)
    NL = SLn * 128
    SEG = LZX_MESH_SEG
    stride = WSIZE + SEG
    N_loc = Fl * stride
    if N_loc > MESH_RESOLVE_BUDGET:
        raise NeedFallback("resolve buffer beyond budget")
    t_pad = ((SEG + 4096 + 127) // 128) * 128
    _, st_rows = plx._state_layout(window_bits)

    valid = np.zeros((ndev, NL), np.int32)
    for g in range(nominal):
        valid[g // Fl, g % Fl] = 1

    def local(stream, outlen, prevpos, car, st_in, pfx, vmask, W,
              resume):
        tok, litw, cnt, st_out = plx._run(
            stream[0], outlen[0], jnp.zeros((SLn, 128), jnp.int32),
            car[0], st_in[0], SLn, 128, W, t_pad, window_bits, False,
            resume, interp)
        T = t_pad
        tok = jnp.transpose(tok.reshape(T, NL)[:, :Fl])
        litw = jnp.transpose(litw.reshape(T, NL)[:, :Fl])
        cnt = cnt.reshape(40, NL)
        vm = vmask[0, :Fl]
        pv = prevpos[0].reshape(NL)[:Fl]
        errs = jnp.where(vm > 0, cnt[0, :Fl], 0)
        seg_flen = jnp.where(vm > 0, cnt[1, :Fl] - pv, 0)
        tok = jnp.where(vm[:, None] > 0, tok, -1)
        out, bad = _lanes_resolve(tok, litw, seg_flen, Fl, WSIZE,
                                  stride, N_loc, pfx=pfx[0])
        inv = jnp.logical_or(jnp.any(errs != 0), bad)
        return (out[None], seg_flen, cnt[None], st_out[None],
                inv[None])

    fns = {}

    def run_seg(stream, outlen, prevpos, car, st_in, pfx, W, resume):
        key = (W, resume)
        if key not in fns:
            fn = shard_map(
                functools.partial(local, W=W, resume=resume),
                mesh=mesh,
                in_specs=(P("dp"), P("dp"), P("dp"), P("dp"),
                          P("dp"), P("dp"), P("dp")),
                out_specs=(P("dp", None), P("dp"), P("dp"),
                           P("dp"), P("dp")),
                check_vma=False)
            fns[key] = jax.jit(fn)
        return fns[key](stream, outlen, prevpos, car, st_in, pfx,
                        jnp.asarray(valid))

    pos = [0] * F
    parts = [bytearray() for _ in range(F)]
    tails = np.zeros((ndev, Fl, WSIZE), np.int32)
    rem = list(streams)
    car = np.zeros((ndev, 32, SLn, 128), np.int32)
    st = np.zeros((ndev, st_rows, SLn, 128), np.int32)
    resume = False
    ifl_np = np.zeros(F, np.int64)
    ifsz_np = np.zeros(F, np.int64)
    while any(pos[g] < sizes_p[g] for g in range(F)):
        targets = [min(sizes_p[g], pos[g] + SEG) for g in range(F)]
        stream, W = _mesh_pack(rem, ndev, Fl, plx.pack_streams, SLn)
        out, seg_flen, cnt, st_out, inv = run_seg(
            jnp.asarray(stream),
            jnp.asarray(_grid_i32(targets, ndev, Fl, SLn)),
            jnp.asarray(_grid_i32(pos, ndev, Fl, SLn)),
            jnp.asarray(car), jnp.asarray(st), jnp.asarray(tails),
            W, resume)
        if bool(jnp.any(inv)):
            raise NeedFallback("kernel error / invalid chain")
        cnth = np.asarray(cnt)          # (ndev, 40, 1024)
        segf = np.asarray(seg_flen).reshape(-1)
        out_np = np.asarray(out)
        for g in range(F):
            dd, j = g // Fl, g % Fl
            want = targets[g] - pos[g]
            if want == 0:
                continue
            if segf[g] != want:
                raise NeedFallback("segment length mismatch")
            seg = out_np[dd, j * stride + WSIZE:
                         j * stride + WSIZE + want].astype(np.uint8)
            parts[g].extend(seg.tobytes())
            joined = np.concatenate(
                [tails[dd, j].astype(np.uint8), seg])
            tails[dd, j] = joined[-WSIZE:].astype(np.int32)
            pos[g] = targets[g]
            ifl_np[g] = int(cnth[dd, 4, j])
            ifsz_np[g] = int(cnth[dd, 5, j])
        wpos = cnth[:, 3, :]
        rem = [rem[g][4 * int(wpos[g // Fl, g % Fl]):]
               for g in range(F)]
        car = np.ascontiguousarray(
            cnth[:, 8:40, :].reshape(ndev, 32, SLn, 128))
        st = np.asarray(st_out).reshape(ndev, st_rows, SLn, 128)
        resume = True
    if decline_on_intel and ifl_np[:nominal].any() \
            and ifsz_np[:nominal].any():
        raise NeedFallback("intel E8 state is stream-global")
    results = []
    for g in range(nominal):
        blob = bytes(parts[g])
        if ifl_np[g] and ifsz_np[g]:
            blob = plx.e8_decode(blob, int(ifsz_np[g]))
        results.append(blob)
    return results


QTM_MESH_CAP = 128 * 1024


def decode_qtm_streams_sharded(mesh: Mesh, streams: list[bytes],
                               sizes: list[int], window_bits: int
                               ) -> list[bytes] | None:
    """Independent Quantum folder streams (0xFF trailers injected)
    dp-sharded onto the Quantum lane kernel — the same no-comm
    folder-DP axis as LZX; phase B is the shared pointer-doubling
    resolve (the kernels emit one token format)."""
    from ..ops import pallas_qtm as pq

    if not streams:
        return []
    try:
        ndev = mesh.devices.size
        nominal = len(streams)
        if max(sizes) > QTM_MESH_CAP:
            raise NeedFallback("stream beyond mesh lane budget")
        if _tpu_interpret() and max(sizes) > 4096:
            # ~10 ms/step interpreted: the virtual mesh validates the
            # comm pattern on tiny folders; real chips take any size
            raise NeedFallback("interpret-mode budget")
        Fl = (nominal + ndev - 1) // ndev
        if Fl > 1024:
            raise NeedFallback("too many streams")
        F = Fl * ndev
        streams = list(streams) + [b""] * (F - nominal)
        sizes_p = list(sizes) + [0] * (F - nominal)
        interp = _tpu_interpret()
        SLn = _mesh_sl(interp, Fl)
        NL = SLn * 128

        stream, W = _mesh_pack(streams, ndev, Fl, pq.pack_streams,
                               SLn)
        outlen = _grid_i32(sizes_p, ndev, Fl, SLn)
        valid = np.zeros((ndev, NL), np.int32)
        for g in range(nominal):
            valid[g // Fl, g % Fl] = 1
        WSIZE = 1 << window_bits
        cap = max(sizes)
        stride = WSIZE + cap
        N_loc = Fl * stride
        if N_loc > MESH_RESOLVE_BUDGET:
            raise NeedFallback("resolve buffer beyond budget")
        t_pad = ((cap * 2 + 4096 + 127) // 128) * 128
        pi, pj, _ = pq._pair_arrays(window_bits)
        car0 = jnp.zeros((8, SLn, 128), jnp.int32)
        st0 = jnp.zeros((pq.NT + 1, pq.TROWS, SLn, 128), jnp.int32)

        def local(stream, outlen, vmask):
            tok, litw, cnt, _st = pq._run(
                stream[0], outlen[0], jnp.asarray(pi),
                jnp.asarray(pj), car0, st0, SLn, 128, W, t_pad,
                window_bits, False, interp)
            T = t_pad
            tok = jnp.transpose(tok.reshape(T, NL)[:, :Fl])
            litw = jnp.transpose(litw.reshape(T, NL)[:, :Fl])
            cnt = cnt.reshape(16, NL)
            vm = vmask[0, :Fl]
            errs = jnp.where(vm > 0, cnt[0, :Fl], 0)
            flen = jnp.where(vm > 0, cnt[1, :Fl], 0)
            tok = jnp.where(vm[:, None] > 0, tok, -1)
            out, bad = _lanes_resolve(tok, litw, flen, Fl, WSIZE,
                                      stride, N_loc)
            inv = jnp.logical_or(jnp.any(errs != 0), bad)
            return (out[None], flen, inv[None])

        fn = shard_map(
            local, mesh=mesh,
            in_specs=(P("dp"), P("dp"), P("dp")),
            out_specs=(P("dp", None), P("dp"), P("dp")),
            check_vma=False)
        out, flen, inv = jax.jit(fn)(
            jnp.asarray(stream), jnp.asarray(outlen),
            jnp.asarray(valid))
        if bool(jnp.any(inv)):
            raise NeedFallback("kernel error / invalid chain")
        flen_np = np.asarray(flen).reshape(-1)
        if not np.array_equal(flen_np[:nominal],
                              np.asarray(sizes, np.int64)):
            raise NeedFallback("size mismatch")
        out_np = np.asarray(out)
        results = []
        for g in range(nominal):
            dd, j = g // Fl, g % Fl
            results.append(out_np[dd, j * stride + WSIZE:
                                  j * stride + WSIZE + sizes[g]]
                           .astype(np.uint8).tobytes())
        return results
    except NeedFallback as e:
        _mesh_debug("decode_qtm_streams_sharded declined", e)
        return None
    except Exception as e:
        _mesh_debug("decode_qtm_streams_sharded failed", e)
        return None


def decode_cab_sharded(mesh: Mesh, path_or_bytes) -> dict | None:
    """Decode a whole cabinet over the mesh (EP-style per-codec
    dispatch, SURVEY §2.4): MSZIP folders through the ppermute ring
    (frames dp-sharded), LZX folders dp-sharded as independent lane
    streams (segmented via kernel state export when large), Quantum
    folders dp-sharded onto the Quantum lane kernel (host
    adaptive-arithmetic engine as fallback), NONE folders as raw
    copies.

    Returns {filename: bytes} for every member."""
    from ..formats.cab import CabDecompressor, COMPTYPE_MASK

    d = CabDecompressor()
    cab = d.open(path_or_bytes)
    folder_bytes = {}
    lzx_jobs = {}   # wb -> [(fi, stream, size)]
    qtm_jobs = {}
    for fi, fol in enumerate(cab.folders):
        ct = fol.comp_type & COMPTYPE_MASK
        if ct == 1:
            collected = d.collect_mszip_frames(fol)
            if collected is None:
                return None
            frames, sizes = collected
            blob = decode_frames_ring(mesh, [f[2:] for f in frames],
                                      sizes)
            if blob is None:
                return None
            folder_bytes[fi] = blob
        elif ct == 0:
            collected = d.collect_raw_blocks(fol)
            if collected is None:
                return None
            blocks, _ = collected
            folder_bytes[fi] = b"".join(blocks)
        elif ct == 3:
            collected = d.collect_raw_blocks(fol)
            if collected is None:
                return None
            blocks, sizes = collected
            wb = (fol.comp_type >> 8) & 0x1F
            lzx_jobs.setdefault(wb, []).append(
                (fi, b"".join(blocks), sum(sizes)))
        elif ct == 2:
            collected = d.collect_raw_blocks(fol)
            if collected is None:
                return None
            blocks, sizes = collected
            # cabd injects a 0xFF realign trailer after each block
            # (cabd.c:1327-1332)
            stream = b"".join(b + b"\xff" for b in blocks)
            qtm_jobs.setdefault((fol.comp_type >> 8) & 0x1F,
                                []).append((fi, stream, sum(sizes)))
        else:
            return None
    for wb, jobs in lzx_jobs.items():
        outs = decode_lzx_streams_sharded(
            mesh, [j[1] for j in jobs], [j[2] for j in jobs], wb)
        if outs is None:
            return None
        for (fi, _, _), blob in zip(jobs, outs):
            folder_bytes[fi] = blob
    for wb, jobs in qtm_jobs.items():
        outs = decode_qtm_streams_sharded(
            mesh, [j[1] for j in jobs], [j[2] for j in jobs], wb)
        if outs is None:
            # host adaptive-arithmetic engine fallback (folder-DP)
            from .. import native
            if not native.available():
                return None
            outs = []
            for _, stream, total in jobs:
                blob = native.qtm_decode(stream, wb, total)
                if blob is None:
                    return None
                outs.append(blob)
        for (fi, _, _), blob in zip(jobs, outs):
            folder_bytes[fi] = blob
    out = {}
    for f in cab.files:
        fi = next(i for i, fol in enumerate(cab.folders)
                  if fol is f.folder)
        blob = folder_bytes.get(fi)
        if blob is None or f.offset + f.length > len(blob):
            return None
        out[f.filename] = blob[f.offset:f.offset + f.length]
    return out


def decode_chm_sharded(mesh: Mesh, path_or_bytes) -> dict | None:
    """Decode a whole CHM over the mesh: the ResetTable shards
    section 1 into independent LZX reset-interval chunks
    (chmd.c:1147-1175 — the checkpoint grid IS the shard grid), each
    decoded on a kernel lane; section 0 members are raw copies.

    Returns {filename: bytes} for every listed member (content files
    only; system files excluded)."""
    from ..formats.chm import ChmDecompressor

    d = ChmDecompressor()
    chm = d.open(path_or_bytes)
    plan = d.sec1_chunk_plan(chm)
    sec1 = None
    if plan is not None:
        chunks, csizes, window_bits = plan
        outs = decode_lzx_streams_sharded(mesh, chunks, csizes,
                                          window_bits,
                                          decline_on_intel=True)
        if outs is not None:
            sec1 = b"".join(outs)
    out = {}
    for f in chm.files:
        if f.section is not None and f.section.id == 1:
            if sec1 is None or f.offset + f.length > len(sec1):
                return None
            out[f.filename] = sec1[f.offset:f.offset + f.length]
        else:
            from ..system import BytesSink
            s = BytesSink()
            d.extract(f, s)
            out[f.filename] = s.getvalue()
    return out
