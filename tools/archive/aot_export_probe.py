"""Evaluate jax.export AOT for the CLI's fixed-geometry loop (VERDICT_r3 #6).

The question: with the persistent compile cache now DEFAULT ON (measured
108 s cold -> ~2.5 s warm per fresh process on this chip,
results/cli_overlap_cache_verify_r04.txt), does shipping a serialized
jax.export artifact buy anything further for a fixed geometry?

Method: export the flagship jittable step (__graft_entry__.entry: the
single-jit true-bob program) to a serialized artifact, then in FRESH
subprocesses measure time-to-first-output three ways:
  1. cold jit, empty compile cache        (the no-cache baseline)
  2. warm jit, populated compile cache    (what the CLI defaults to)
  3. deserialize(artifact) + call         (the jax.export path)

    python tools/aot_export_probe.py
"""

from __future__ import annotations

import os
import subprocess
import sys
import tempfile
import time

WORKER = r"""
import os, sys, time
t00 = time.time()
import numpy as np
import jax
mode, cache_dir, art_path = sys.argv[1], sys.argv[2], sys.argv[3]
if cache_dir != "-":
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
sys.path.insert(0, os.getcwd())
from __graft_entry__ import entry
fn, args = entry()
t0 = time.time()
if mode == "export":
    from jax import export
    with open(art_path, "rb") as f:
        reh = export.deserialize(f.read())
    out = reh.call(*args)
else:
    out = jax.jit(fn)(*args)
jax.block_until_ready(out)
print(f"{mode}: import+setup {t0-t00:.2f}s, first-output {time.time()-t0:.2f}s")
"""


def main() -> None:
    import jax
    from jax import export

    import numpy as np  # noqa: F401

    sys.path.insert(0, os.getcwd())
    from __graft_entry__ import entry

    fn, args = entry()
    t0 = time.time()
    exp = export.export(jax.jit(fn))(*args)
    blob = exp.serialize()
    print(f"export+serialize: {time.time()-t0:.2f}s, artifact "
          f"{len(blob)/1e6:.2f} MB")

    with tempfile.TemporaryDirectory() as td:
        art = os.path.join(td, "truebob.jaxexport")
        with open(art, "wb") as f:
            f.write(blob)
        wpath = os.path.join(td, "worker.py")
        with open(wpath, "w") as f:
            f.write(WORKER)
        cache = os.path.join(td, "xla_cache")

        def run(mode, cache_dir):
            t0 = time.time()
            r = subprocess.run(
                [sys.executable, wpath, mode, cache_dir, art],
                capture_output=True, text=True, cwd=os.getcwd(),
            )
            dt = time.time() - t0
            assert r.returncode == 0, r.stderr[-2000:]
            print(f"  [{dt:6.2f}s process] {r.stdout.strip()}")

        print("cold jit (no cache):")
        run("jit", "-")
        print("cold jit -> populates cache:")
        run("jit", cache)
        print("warm jit (persistent cache):")
        run("jit", cache)
        print("jax.export deserialize+call:")
        run("export", "-")
        run("export", "-")


if __name__ == "__main__":
    main()
