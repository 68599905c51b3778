"""Scaling curve for the sharded decode path (virtual CPU mesh).

Decodes a multi-folder MSZIP cabinet bit-exact on 1/2/4/8 virtual
devices and records wall times into MULTICHIP_SCALING.json. On CPU the
absolute numbers are proxies (one host executes all "devices"), but
the curve validates the communication pattern: phase A is dp-sharded
with zero traffic and the ring phase B moves ndev x 32 KiB window
states instead of an all-gathered token grid.

Run: python tools/mesh_scaling.py  (self-provisions the CPU mesh)
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NDEV = 8

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + f" --xla_force_host_platform_device_count={NDEV}").strip()

import numpy as np  # noqa: E402
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def main():
    import random

    from libmspack_tpu.compress import cab_c
    from libmspack_tpu.parallel import mesh as pmesh

    rng = random.Random(7)
    text = (b"The quick brown fox jumps over the lazy dog. " * 60
            + bytes(rng.randrange(64) for _ in range(2048)))
    # round 4: the mesh runs the PRODUCT Pallas kernels (interpreter
    # mode on the virtual CPU mesh), so the proxy corpus is small —
    # 4 folders x 64 KiB = 8 frames, enough to populate 8 devices
    folder_blob = (text * ((64 << 10) // len(text) + 1))[:64 << 10]
    folders = []
    expects = {}
    for k in range(4):
        name = f"f{k}.bin"
        folders.append(cab_c.FolderSpec([(name, folder_blob)], "mszip"))
        expects[name] = folder_blob
    cab_bytes = cab_c.write_cab(folders=folders)
    total = sum(len(v) for v in expects.values())
    print(f"# cab: {len(folders)} mszip folders, {total/1e6:.1f} MB out, "
          f"{len(cab_bytes)/1e6:.1f} MB in", flush=True)

    rows = []
    for ndev in (1, 2, 4, 8):
        mesh = pmesh.default_mesh(ndev)
        out = pmesh.decode_cab_sharded(mesh, cab_bytes)   # compile+check
        assert out == expects, f"mismatch at ndev={ndev}"
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            out = pmesh.decode_cab_sharded(mesh, cab_bytes)
            best = min(best, time.perf_counter() - t0)
        assert out == expects
        rows.append({"devices": ndev, "seconds": round(best, 3),
                     "mb_per_s": round(total / best / 1e6, 1)})
        print(f"# ndev={ndev}: {best:.3f}s "
              f"({total/best/1e6:.1f} MB/s)", flush=True)
    base = rows[0]["seconds"]
    for r in rows:
        r["speedup"] = round(base / r["seconds"], 2)
        r["efficiency"] = round(base / r["seconds"] / r["devices"], 2)
    art = {"note": ("virtual CPU mesh (one host executes all devices; "
                    "times are a comm-pattern proxy, not chip perf)"),
           "corpus_mb": round(total / 1e6, 1),
           "bit_exact": True, "rows": rows}
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "MULTICHIP_SCALING.json")
    with open(path, "w") as f:
        json.dump(art, f, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
