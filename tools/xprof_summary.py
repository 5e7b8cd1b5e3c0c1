"""Device-op time attribution via jax.profiler.ProfileData (no TensorBoard).

Captures an XProf trace of the headline order=1-dh call and the true-bob
call, then aggregates per-op device time from the xplane — the tool behind
the attribution numbers in results/xprof_attribution_r03.txt.

    python tools/xprof_summary.py [iters]
"""

from __future__ import annotations

import glob
import os
import sys
import tempfile
from collections import defaultdict

import numpy as np

import jax
import jax.numpy as jnp


def summarize_xplane(trace_dir: str, top: int = 18) -> None:
    from jax.profiler import ProfileData

    files = glob.glob(trace_dir + "/**/*.xplane.pb", recursive=True)
    if not files:
        print(f"  (no xplane under {trace_dir})")
        return
    if len(files) > 1:
        print(f"  ({len(files)} xplane files under {trace_dir}; "
              f"summarizing all)")
    matched = 0
    for path in files:
        pd = ProfileData.from_file(path)
        for plane in pd.planes:
            if "TPU" not in plane.name:
                continue
            matched += 1
            tot: dict[str, float] = defaultdict(float)
            for line in plane.lines:
                for ev in line.events:
                    tot[ev.name] += ev.duration_ns / 1e6
            print(f"-- plane {plane.name}:")
            for name, ms in sorted(tot.items(), key=lambda kv: -kv[1])[:top]:
                print(f"   {ms:9.2f} ms  {name[:110]}")
    if not matched:
        print(f"  (no TPU plane in any of {len(files)} xplane files)")


def main() -> None:
    from sangnom_tpu import Clip, get_format, sangnom2
    from sangnom_tpu.core.fields import bob, separate_fields

    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    fmt = get_format("YUV420P8")
    rng = np.random.default_rng(7)
    planes = [rng.integers(0, 256, (60, 1080, 1920)).astype(np.uint8),
              rng.integers(0, 256, (60, 540, 960)).astype(np.uint8),
              rng.integers(0, 256, (60, 540, 960)).astype(np.uint8)]
    clip_in = Clip.from_numpy(planes, fmt, tff=True)
    fclip = separate_fields(clip_in)
    jax.block_until_ready(fclip.planes)

    @jax.jit
    def sync(ps):
        s = jnp.zeros((), jnp.float32)
        for p in ps:
            s = s + jnp.sum(p[:, -1].astype(jnp.float32))
        return s

    _ = float(sync(sangnom2(fclip, order=1, dh=True).planes))  # warm
    _ = float(sync(bob(clip_in).planes))

    for tag, fn in (("order1_dh", lambda: sangnom2(fclip, order=1, dh=True)),
                    ("true_bob", lambda: bob(clip_in))):
        d = tempfile.mkdtemp(prefix=f"xprof_{tag}_")
        with jax.profiler.trace(d):
            acc = [sync(fn().planes) for _ in range(iters)]
            np.asarray(jnp.stack(acc))
        print(f"== {tag} ({iters} iters; durations are SPANS — async DMA "
              f"overlaps compute; trace kept at {d}):")
        summarize_xplane(d)


if __name__ == "__main__":
    main()
