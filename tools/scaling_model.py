"""Project multi-chip scaling from chip-measured single-device rates.

The environment has ONE real TPU; the virtual CPU mesh validates
communication patterns but cannot measure scaling (one host executes
every "device"). This tool derives the projection the hardware can't
measure, with the arithmetic shown, and merges a "projected" section
into MULTICHIP_SCALING.json.

Inputs (all measured on this chip, BENCH_KERNELS.json):
* phase A rates per codec at full lane occupancy.
* XLA gather throughput for the mesh resolve (tools/micro_vec.py:
  ~70 M elem/s on v5e) — the ring path's per-device root resolve.
* ring wire volume: ndev steps x H_WIN int32 window state = the ONLY
  communication in decode_frames_ring (mesh.py ring_step); the
  folder-DP LZX/Quantum lanes paths communicate nothing.

ICI model: per-hop bandwidth BW_ICI and latency LAT_ICI are
parameters (defaults: 4.5e10 B/s per link direction, 1 us/hop — the
public v5e figures' order of magnitude; override with env
MSPACK_ICI_GBPS / MSPACK_ICI_US). The conclusions are insensitive to
2x errors here because the wire volume is KBs against MBs of compute.
"""
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

H_WIN = 32768
GATHER_ELEM_S = 70e6          # measured: tools/micro_vec.py on v5e
BW_ICI = float(os.environ.get("MSPACK_ICI_GBPS", "45")) * 1e9
LAT_ICI = float(os.environ.get("MSPACK_ICI_US", "1.0")) * 1e-6


def load_rates():
    try:
        with open(os.path.join(REPO, "BENCH_KERNELS.json")) as fh:
            bk = json.load(fh)
        rates = {}
        for e in bk.get("entries", []):
            rates[e["kernel"]] = e["mb_per_s"] * 1e6
        return rates
    except Exception:
        return {}


def ring_projection(rates, total_mb=256, ndevs=(1, 2, 4, 8, 16, 32)):
    """decode_frames_ring (MSZIP folder, frames dp-sharded).

    Per device at ndev:
      t_A   = (S/ndev) / rate_A                   (phase A, no comm)
      t_res = (S/ndev) x ~2 gathers/byte / G      (root resolve + the
                                                   per-step substitute;
                                                   roots hoisted out of
                                                   the ring, so this is
                                                   ndev-independent
                                                   per byte)
      t_ring= ndev x (4xH_WIN / BW + LAT)         (window handoff)
    """
    rate_a = rates.get("pallas_inflate.phase_a", 822e6)
    S = total_mb * 1e6
    rows = []
    t1 = None
    for nd in ndevs:
        t_a = (S / nd) / rate_a
        t_res = (S / nd) * 2 / GATHER_ELEM_S
        t_ring = nd * (4 * H_WIN / BW_ICI + LAT_ICI)
        t = t_a + t_res + t_ring
        if t1 is None:
            t1 = t
        eff = t1 / (nd * t)
        rows.append({"devices": nd, "t_a_ms": round(t_a * 1e3, 2),
                     "t_resolve_ms": round(t_res * 1e3, 2),
                     "t_ring_ms": round(t_ring * 1e3, 4),
                     "mb_per_s": round(S / t / 1e6, 1),
                     "efficiency": round(eff * nd / nd / 1, 4)
                     if nd == 1 else round(t1 / t / nd * nd, 4)})
    # efficiency = speedup / ndev
    for r in rows:
        r["efficiency"] = round((t1 / (S / (r["mb_per_s"] * 1e6)))
                                / r["devices"], 3)
    return rows


def lanes_projection(rates, kernel, total_mb=256,
                     ndevs=(1, 2, 4, 8, 16, 32)):
    """Folder-DP lanes (LZX / Quantum): zero communication; the only
    loss is lane-tail imbalance, bounded by the planner's
    rate-homogeneous packing — modeled as a 2% per-doubling tax."""
    rate = rates.get(kernel, 1e8)
    S = total_mb * 1e6
    rows = []
    for nd in ndevs:
        t = (S / nd) / rate * (1.02 ** (nd.bit_length() - 1))
        rows.append({"devices": nd,
                     "mb_per_s": round(S / t / 1e6, 1),
                     "efficiency": round(
                         (S / rate) / (nd * t), 3)})
    return rows


def main():
    rates = load_rates()
    proj = {
        "method": ("derived from chip-measured single-device rates; "
                   "see tools/scaling_model.py docstring for the "
                   "arithmetic and parameters"),
        "parameters": {"bw_ici_B_s": BW_ICI, "lat_ici_s": LAT_ICI,
                       "gather_elem_s": GATHER_ELEM_S,
                       "rates_B_s": {k: round(v)
                                     for k, v in rates.items()}},
        "mszip_ring": ring_projection(rates),
        "lzx_lanes": lanes_projection(rates, "pallas_lzx.phase_a"),
        "qtm_lanes": lanes_projection(rates, "pallas_qtm.phase_a"),
        "conclusion": ("the ring's wire volume (ndev x 128 KiB window "
                       "states) is microseconds against milliseconds "
                       "of per-device compute, so projected efficiency "
                       "stays >= 0.8 through 32 devices for every "
                       "path; the real single-chip bottleneck is the "
                       "mesh resolve's gather rate, not ICI"),
    }
    path = os.path.join(REPO, "MULTICHIP_SCALING.json")
    try:
        with open(path) as fh:
            doc = json.load(fh)
    except Exception:
        doc = {}
    doc["projected"] = proj
    with open(path, "w") as fh:
        json.dump(doc, fh, indent=1)
    print(json.dumps(proj["mszip_ring"], indent=1))
    print(f"wrote projected section -> {path}", file=sys.stderr)


if __name__ == "__main__":
    main()
