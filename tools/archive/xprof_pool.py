"""Per-op XProf attribution for pool_compat mode (round 4).

The exact-emulation mode runs 570 fps at 1080p 4:2:0 (round-4 driver
bench) vs ~9400 fps for the default mode — sequential by construction
(the pool is cross-plane/cross-frame state).  After the round-3 moves
(Pallas row-scan smoothing, time-major packed pool carry) the remaining
split between the smoothing kernel, the XLA prepare/finalize stages and
the lax.scan frame loop glue was never measured.  This tool captures an
XProf trace of the bench workload and aggregates per-op device time.

    python tools/xprof_pool.py [iters] [batch]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from xprof_summary import summarize_xplane  # noqa: E402


def main() -> None:
    from sangnom_tpu import Clip, get_format, sangnom2

    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    fmt = get_format("YUV420P8")
    rng = np.random.default_rng(7)
    planes = [
        rng.integers(0, 256, (B, 540, 1920)).astype(np.uint8),
        rng.integers(0, 256, (B, 270, 960)).astype(np.uint8),
        rng.integers(0, 256, (B, 270, 960)).astype(np.uint8),
    ]
    clip = Clip.from_numpy(planes, fmt)
    kw = dict(order=1, aa=48, aac=0, dh=True, pool_compat=True)

    @jax.jit
    def sync(ps):
        s = jnp.zeros((), jnp.float32)
        for p in ps:
            s = s + jnp.sum(p[:, -1].astype(jnp.float32))
        return s

    _ = float(sync(sangnom2(clip, **kw).planes))  # warm
    best = float("inf")
    for _t in range(3):
        t0 = time.perf_counter()
        acc = [sync(sangnom2(clip, **kw).planes) for _ in range(3)]
        np.asarray(jnp.stack(acc))
        best = min(best, (time.perf_counter() - t0) / 3)
    print(f"pool_compat throughput: {B / best:.1f} fps "
          f"({best * 1e6 / B:.0f} us/frame, B={B})")

    d = tempfile.mkdtemp(prefix="xprof_pool_")
    with jax.profiler.trace(d):
        acc = [sync(sangnom2(clip, **kw).planes) for _ in range(iters)]
        np.asarray(jnp.stack(acc))
    print(f"== pool_compat 1080p 4:2:0 dh ({iters} iters; durations are "
          f"SPANS — async DMA overlaps compute; trace kept at {d}):")
    summarize_xplane(d, top=24)


if __name__ == "__main__":
    main()
