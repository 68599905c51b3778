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
        B = max(ndev, ij._bucket(nominal, ij.B_BUCKETS))
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
