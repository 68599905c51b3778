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


def _phase_b_hist(t_kind, t_outlen, t_dist, t_lit, frame_base, hist, N):
    """ops.inflate_jax._phase_b with a H_WIN-byte history prefix.

    Positions [0, H_WIN) of the output are `hist` (the window handed
    over from the previous shard); frame_base is already offset by
    +H_WIN. Matches may reach into the history."""
    B, R = t_kind.shape
    H = H_WIN
    live = (t_kind == 0) | (t_kind == 1)
    tlen = jnp.where(live, t_outlen, 0)
    within = jnp.cumsum(tlen, axis=1) - tlen
    out_start = (frame_base[:, None] + within).reshape(-1)
    flat_len = tlen.reshape(-1)

    T = B * R
    marks = jnp.zeros(N + 1, jnp.int32).at[
        jnp.where(flat_len > 0, jnp.clip(out_start, 0, N), N)].max(
        jnp.arange(T, dtype=jnp.int32) + 1)
    tok_id = jnp.clip(jax.lax.cummax(marks[:N]) - 1, 0, T - 1)

    bpos = jnp.arange(N, dtype=jnp.int32)
    k = jnp.take(t_kind.reshape(-1), tok_id)
    d = jnp.take(t_dist.reshape(-1), tok_id)
    l = jnp.take(t_lit.reshape(-1), tok_id)
    ptr = jnp.where(bpos < H, bpos,
                    jnp.where(k == 0, bpos, bpos - d))

    rounds = max(1, N - 1).bit_length()

    def round_(_, pp):
        return jnp.where(pp >= 0, jnp.take(pp, jnp.clip(pp, 0, N - 1)),
                         pp)

    root = jax.lax.fori_loop(0, rounds, round_, ptr)
    histv = jnp.take(hist, jnp.clip(root, 0, H - 1))
    out = jnp.where(root < H, histv, jnp.take(l, jnp.clip(root, 0, N - 1)))
    bad_src = jnp.any(root < 0)
    return out, bad_src


def decode_frames_ring(mesh: Mesh, frames: list[bytes],
                       expected_sizes: list[int] | None = None
                       ) -> bytes | None:
    """Sharded MSZIP folder decode with ring phase B.

    Phase A is dp-sharded (no communication). Phase B runs as an
    ndev-step ring: at step k shard k resolves its frames against the
    32 KiB window ppermute'd from shard k-1, then hands its own output
    tail onward — ndev * 32 KiB on the wire instead of an all-gather
    of the full token grid. Bit-exact vs the scalar codec; returns
    None for fallback cases (multi-block/stored frames)."""
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
        for i, f in enumerate(frames):
            data[i, : len(f)] = np.frombuffer(f, np.uint8)
            last, kind, *rest = ij._parse_block_header(f, 0)
            if kind != "huff" or not last:
                raise ij.NeedFallback("multi-block/stored frame")
            luts_l[i], luts_d[i], starts[i] = rest

        Bl = B // ndev                   # frames per shard
        N_loc = Bl * 32768 + H_WIN       # local resolve buffer
        R = ij.MAX_TOKENS

        def local(data, starts, lit, dist):
            (t_kind, t_outlen, t_dist, t_lit, end_pos, chain_inv,
             reached) = ij._phase_a(data, starts, lit, dist,
                                    S * 8, R, S)
            live = (t_kind == 0) | (t_kind == 1)
            flen = jnp.sum(jnp.where(live, t_outlen, 0), axis=1)
            base = H_WIN + jnp.cumsum(flen) - flen
            my = jax.lax.axis_index("dp")

            def ring_step(kdev, carry):
                win, res, restot = carry
                out, bad = _phase_b_hist(t_kind, t_outlen, t_dist,
                                         t_lit, base, win, N_loc)
                tot = H_WIN + jnp.sum(flen)
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
            inv = jnp.logical_or(jnp.any(chain_inv),
                                 jnp.logical_not(jnp.all(reached)))
            return (res[H_WIN:][None], restot[None], flen,
                    inv[None])

        fn = shard_map(
            local, mesh=mesh,
            in_specs=(P("dp"), P("dp"), P("dp", None), P("dp", None)),
            out_specs=(P("dp", None), P("dp"), P("dp"), P("dp")))
        res, restot, flen, inv = jax.jit(fn)(
            jnp.asarray(data.reshape(-1)), jnp.asarray(starts),
            jnp.asarray(luts_l), jnp.asarray(luts_d))
        if bool(jnp.any(inv)):
            raise ij.NeedFallback("invalid chain")
        flen_np = np.asarray(flen)
        if expected_sizes is not None:
            exp = np.asarray(list(expected_sizes)
                             + [0] * (B - nominal), np.int64)
            if not np.array_equal(flen_np, exp):
                raise ij.NeedFallback("frame length mismatch")
        res_np = np.asarray(res, np.uint8)
        restot_np = np.asarray(restot)
        parts = [res_np[d, :restot_np[d]].tobytes()
                 for d in range(ndev)]
        return b"".join(parts)
    except ij.NeedFallback:
        return None


def decode_cab_sharded(mesh: Mesh, path_or_bytes) -> dict | None:
    """Decode a whole cabinet over the mesh: MSZIP folders through the
    ring (folder = shard grid row, frames dp-sharded), NONE folders as
    raw copies; anything else -> None (host engines own it).

    Returns {filename: bytes} for every member."""
    from ..formats.cab import CabDecompressor, COMPTYPE_MASK

    d = CabDecompressor()
    cab = d.open(path_or_bytes)
    folder_bytes = {}
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
        else:
            return None
    out = {}
    for f in cab.files:
        fi = next(i for i, fol in enumerate(cab.folders)
                  if fol is f.folder)
        blob = folder_bytes.get(fi)
        if blob is None or f.offset + f.length > len(blob):
            return None
        out[f.filename] = blob[f.offset:f.offset + f.length]
    return out
