"""Per-op XProf attribution for cfg4 — 1080i YUV422P10 bob dh (VERDICT_r3 #4).

cfg4 is the weakest BASELINE config (~2.7k fps vs 9.5k for u8 order=1):
packed smoothing is closed by analysis for >8-bit (storage-mask wrap,
ops/pallas_kernel.py), so the kernel runs 9 unpacked i32 slabs — but the
NON-kernel share at u16 (input relayout, in-kernel-weave output copies,
u16 DMA) was never measured.  This tool captures an XProf trace of the
exact bench workload (order=0 dh on alternating parity, the per-frame-
offset weave) and aggregates per-op device time, the same method as
tools/xprof_summary.py (results/xprof_attribution_r03.txt).

    python tools/xprof_cfg4.py [iters] [batch]
"""

from __future__ import annotations

import os
import sys
import tempfile

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from xprof_summary import summarize_xplane  # noqa: E402


def main() -> None:
    from sangnom_tpu import Clip, get_format, sangnom2

    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    fmt = get_format("YUV422P10")
    rng = np.random.default_rng(7)
    planes = []
    for i in range(3):
        pw, ph = fmt.plane_dims(1920, 540, i)
        planes.append(
            rng.integers(0, 1 << 16, (B, ph, pw)).astype(fmt.dtype))
    parity = np.arange(B) % 2 == 0
    clip = Clip.from_numpy(planes, fmt, parity=parity)

    @jax.jit
    def sync(ps):
        s = jnp.zeros((), jnp.float32)
        for p in ps:
            s = s + jnp.sum(p[:, -1].astype(jnp.float32))
        return s

    import time

    kw = dict(order=0, dh=True)
    _ = float(sync(sangnom2(clip, **kw).planes))  # warm
    # throughput reference (same methodology as bench._config_matrix)
    best = float("inf")
    for _t in range(3):
        t0 = time.perf_counter()
        acc = [sync(sangnom2(clip, **kw).planes) for _ in range(5)]
        np.asarray(jnp.stack(acc))
        best = min(best, (time.perf_counter() - t0) / 5)
    print(f"cfg4 throughput: {B / best:.0f} fps ({best * 1e3 / B * 1000:.1f}"
          f" us/frame, B={B})")

    d = tempfile.mkdtemp(prefix="xprof_cfg4_")
    with jax.profiler.trace(d):
        acc = [sync(sangnom2(clip, **kw).planes) for _ in range(iters)]
        np.asarray(jnp.stack(acc))
    print(f"== cfg4 10-bit bob dh ({iters} iters; durations are SPANS — "
          f"async DMA overlaps compute; trace kept at {d}):")
    summarize_xplane(d)


if __name__ == "__main__":
    main()
