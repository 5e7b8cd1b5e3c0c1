"""Measure the --cache-dir persistent-compile-cache effect on the real TPU.

Runs the CLI three times in fresh processes on a small clip:
  1. cold   — fresh cache dir (populates it; pays trace+compile)
  2. warm   — same cache dir (loads compiled programs)
  3. nocache — no --cache-dir (the old behavior, for the honest delta)
Reports wall time per run and checks the outputs are byte-identical.

Evidence for the CLI `--cache-dir` flag (the one-shot analogue of the
AviSynth host keeping the process resident; reference hosts amortize
plugin init across a whole script run).
"""
from __future__ import annotations

import subprocess
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    from sangnom_tpu.core.clip import Clip
    from sangnom_tpu.core.formats import get_format
    from sangnom_tpu.io import write_y4m

    rng = np.random.default_rng(20260818)
    fmt = get_format("YUV420P8")
    n, h, w = 4, 64, 96
    planes = [
        rng.integers(0, 256, (n, h >> ss_h, w >> ss_w), dtype=np.uint8)
        for (ss_w, ss_h) in [(0, 0), (fmt.subsampling_w, fmt.subsampling_h),
                             (fmt.subsampling_w, fmt.subsampling_h)]
    ]
    clip = Clip.from_numpy(planes, fmt)

    with tempfile.TemporaryDirectory() as td:
        tdp = Path(td)
        src = tdp / "in.y4m"
        write_y4m(str(src), clip)
        cache = tdp / "xla_cache"

        def run(tag: str, dst: Path, cache_dir: Path | None) -> float:
            cmd = [sys.executable, "-m", "sangnom_tpu", str(src), str(dst),
                   "--order", "1", "--dh"]
            # round 4: the cache defaults ON (XDG path) — the uncached arm
            # must disable it explicitly
            cmd += ["--cache-dir", str(cache_dir) if cache_dir else ""]
            t0 = time.perf_counter()
            res = subprocess.run(cmd, capture_output=True, text=True)
            dt = time.perf_counter() - t0
            assert res.returncode == 0, (tag, res.stderr)
            print(f"{tag:8s} {dt:7.2f} s   ({res.stderr.strip().splitlines()[-1]})")
            return dt

        t_cold = run("cold", tdp / "o1.y4m", cache)
        n_entries = len(list(cache.iterdir()))
        t_warm = run("warm", tdp / "o2.y4m", cache)
        t_none = run("nocache", tdp / "o3.y4m", None)

        b1 = (tdp / "o1.y4m").read_bytes()
        assert b1 == (tdp / "o2.y4m").read_bytes() == (tdp / "o3.y4m").read_bytes()
        print(f"outputs byte-identical; cache entries: {n_entries}")
        print(f"warm saves {t_none - t_warm:.2f} s vs uncached "
              f"({t_none:.2f} -> {t_warm:.2f} s end-to-end process time)")


if __name__ == "__main__":
    main()
