"""2-process multi-host dryrun (SURVEY §5.8, VERDICT r3 item 7).

Spawns two CPU processes that join one jax.distributed job, scatter a
multi-folder cabinet's folders between themselves, decode locally, and
all-gather the results — each process must assemble the full,
bit-exact member set. Validates the multi-host code path without a TPU
pod (the collective rides the same coordination service).

Run: python tools/multihost_dryrun.py
"""
import os
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WORKER = r'''
import os, sys, random
sys.path.insert(0, sys.argv[4])
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=2").strip()
import jax
jax.config.update("jax_platforms", "cpu")
from libmspack_tpu.parallel import multihost
multihost.initialize(sys.argv[1], 2, int(sys.argv[2]))
assert jax.process_count() == 2
cab_path = sys.argv[3]
out = multihost.decode_cab_multihost(cab_path)
assert out is not None, "multihost decode declined"
# verify against the authored corpus (deterministic rebuild)
rng = random.Random(404)
text = (b"multihost scatter/gather payload " * 80)
expects = {}
for k, comp in enumerate(["mszip", "lzx", "quantum", "none"]):
    blob = (text + bytes(rng.randrange(256) for _ in range(256))) * (2 + k)
    expects[f"{comp}{k}.bin"] = blob
assert out == expects, "multihost decode mismatch"
print(f"MULTIHOST-OK pid={jax.process_index()} files={len(out)}",
      flush=True)
'''


def main():
    import random

    from libmspack_tpu.compress import cab_c

    rng = random.Random(404)
    text = (b"multihost scatter/gather payload " * 80)
    folders = []
    for k, comp in enumerate(["mszip", "lzx", "quantum", "none"]):
        blob = (text + bytes(rng.randrange(256)
                             for _ in range(256))) * (2 + k)
        folders.append(cab_c.FolderSpec([(f"{comp}{k}.bin", blob)], comp))
    cab = cab_c.write_cab(folders=folders)
    fd, cab_path = tempfile.mkstemp(suffix=".cab")
    os.write(fd, cab)
    os.close(fd)

    import socket
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    coord = f"127.0.0.1:{port}"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS",)}
    procs = [subprocess.Popen(
        [sys.executable, "-c", WORKER, coord, str(pid), cab_path, repo],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env) for pid in range(2)]
    ok = 0
    for p in procs:
        out, _ = p.communicate(timeout=600)
        if "MULTIHOST-OK" in out:
            ok += 1
        else:
            print(out[-2000:])
    os.unlink(cab_path)
    if ok == 2:
        print("multihost dryrun: 2 processes, 4-codec cab scattered/"
              "gathered bit-exact on both")
        return 0
    print(f"multihost dryrun FAILED ({ok}/2)")
    return 1


if __name__ == "__main__":
    sys.exit(main())
