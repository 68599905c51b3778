"""Bisect the pallas_inflate compile failure by early-returning step().

Generates a variant of ops/pallas_inflate.py with a `return` of the
current state inserted after a marker line, imports it, and compiles on
the chip. Usage: python tools/pa_bisect.py <marker-substring>
"""
import importlib.util
import sys
import os

RET = ("        return (t + 1, _alldone, mode, bitlo, bithi, navail, "
       "wpos, base, pend, outpos, litword, litcnt, finalf, prevlen, "
       "fillpos, nlit, ndist, npre, clraw_i, stored_rem, err, donestep)\n")

marker = sys.argv[1]
src_path = os.path.join(os.path.dirname(__file__), "..",
                        "libmspack_tpu", "ops", "pallas_inflate.py")
lines = open(src_path).readlines()
out = []
done = False
for ln in lines:
    out.append(ln)
    if not done and marker in ln:
        out.append(RET)
        done = True
assert done, f"marker {marker!r} not found"
tmp = "/tmp/pa_cut.py"
open(tmp, "w").write("".join(out))

spec = importlib.util.spec_from_file_location("pa_cut", tmp)
pa = importlib.util.module_from_spec(spec)
spec.loader.exec_module(pa)

import numpy as np
import zlib
import jax.numpy as jnp
raw = open("/root/reference/libmspack/mspack/lzxd.c", "rb").read()[:512]
co = zlib.compressobj(6, zlib.DEFLATED, -15)
frame = co.compress(raw) + co.flush()
try:
    stream, W = pa.pack_streams([frame])
    hist = np.zeros((8, 128), np.int32)
    fixk3, fixd3, fixf = pa.fixed_tables()
    # compile only — cut kernels deadlock at runtime (stage semaphores)
    pa._run.lower(jnp.asarray(stream), jnp.asarray(hist),
                  jnp.asarray(fixk3), jnp.asarray(fixd3),
                  jnp.asarray(fixf), 8, 128, W, 256).compile()
    print(f"CUT[{marker}]: compile OK")
except Exception as e:
    print(f"CUT[{marker}]: FAIL", str(e).split("\n")[0][:200])
