"""Measure --overlap-write on the real TPU: windowed CLI end-to-end time
with and without the writer thread, alternating arms (contended host),
byte-identical outputs asserted.

The mechanism: emit() blocks on the device->host fetch (np.asarray
releases the GIL on the transfer wait) and then serializes y4m; with
--overlap-write both happen on a writer thread while the main thread
reads/parses the next window.  On this tunneled host the fetch wait is
long, so the overlap is measurable even with one vCPU; on a production
multi-core host the serialization copy overlaps too.

    python tools/overlap_write_probe.py [frames] [window] [trials]
"""
from __future__ import annotations

import os
import subprocess
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    frames = int(sys.argv[1]) if len(sys.argv) > 1 else 96
    window = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    trials = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    from sangnom_tpu.core.clip import Clip
    from sangnom_tpu.io import write_y4m

    rng = np.random.default_rng(20260819)
    w, h = 640, 480
    planes = [
        rng.integers(0, 256, (frames, h >> s, w >> s), dtype=np.uint8)
        for s in (0, 1, 1)
    ]
    td = Path(tempfile.mkdtemp(prefix="sangnom_ovw_"))
    src = td / "in.y4m"
    write_y4m(str(src), Clip.from_numpy(planes, "YUV420P8"))
    cache = td / "xla_cache"  # shared compile cache: arms pay no compile skew

    def run(tag: str, extra: list[str]) -> float:
        dst = td / f"{tag}.y4m"
        t0 = time.perf_counter()
        res = subprocess.run(
            [sys.executable, "-m", "sangnom_tpu", str(src), str(dst),
             "--dh", "--window", str(window), "--cache-dir", str(cache),
             *extra],
            capture_output=True, text=True,
        )
        dt = time.perf_counter() - t0
        assert res.returncode == 0, (tag, res.stderr)
        return dt

    run("warmup", [])  # populate the compile cache

    times: dict[str, list[float]] = {"serial": [], "overlap": []}
    order = [("serial", []), ("overlap", ["--overlap-write"])]
    for t in range(trials):
        for tag, extra in (order if t % 2 == 0 else order[::-1]):
            times[tag].append(run(f"{tag}{t}", extra))

    b0 = (td / "serial0.y4m").read_bytes()
    for t in range(trials):
        assert b0 == (td / f"serial{t}.y4m").read_bytes()
        assert b0 == (td / f"overlap{t}.y4m").read_bytes()
    print("outputs byte-identical across all arms/trials")
    for tag, ts in times.items():
        print(f"{tag:8s} best {min(ts):6.2f} s   "
              f"trials {[f'{x:.2f}' for x in ts]}")
    print(f"overlap speedup x{min(times['serial']) / min(times['overlap']):.3f} "
          f"({frames}f {w}x{h} window={window}, end-to-end process time)")


if __name__ == "__main__":
    main()
