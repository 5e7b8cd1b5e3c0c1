"""Headline benchmark: 1080p bob+dh deinterlace frames/sec/chip.

Matches BASELINE.json's metric: YUV420 8-bit, dh height-doubling to 1080p
(the "bob" configuration), bit-exact 8-bit output verified against the
native oracle before timing.

The reference publishes no numbers (BASELINE.md), so the baseline is
measured here: the native scalar oracle (the reference's C/opt=0 path
stand-in, single core) is timed on the same config and scaled by a
conservative 6x to estimate the reference's SSE2 path (16-byte vectors over
1/2-byte samples bound ideal speedup at 16/8x; measured SSE2 filters
typically land 4-6x over scalar).  ``vs_baseline`` is TPU fps over that
SSE2 estimate; the north-star target is >= 10.

Prints ONE JSON line to stdout; diagnostics go to stderr.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

SSE2_OVER_SCALAR = 6.0


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _extra_configs(Clip, get_format, sangnom2, checksum, rng):
    """--all: the other BASELINE.json configs, reported to stderr."""
    import time

    import jax.numpy as jnp
    import numpy as np

    cases = [
        ("cfg1 640x480 GRAY8 order=1", "GRAY8", 640, 480, dict(order=1)),
        ("cfg2 640x480 YUV420P8 order=2", "YUV420P8", 640, 480, dict(order=2)),
        ("cfg4 1080i YUV422P10 bob(dh)", "YUV422P10", 1920, 540,
         dict(order=0, dh=True)),
        ("cfg5 1080p GRAY16 aa=128", "GRAY16", 1920, 1080,
         dict(order=1, aa=128, aac=64)),
        ("cfg5f 540p YUV444PS", "YUV444PS", 960, 540, dict(order=2)),
    ]
    B = 16
    for name, fname, w, h, kw in cases:
        fmt = get_format(fname)
        planes = []
        for i in range(fmt.num_planes):
            pw, ph = fmt.plane_dims(w, h, i)
            if fmt.is_float:
                planes.append(rng.random((B, ph, pw), np.float32))
            else:
                top = (1 << (8 * fmt.component_size)) - 1
                planes.append(
                    rng.integers(0, top + 1, (B, ph, pw)).astype(fmt.dtype))
        clip = Clip.from_numpy(planes, fmt)
        _ = float(checksum(sangnom2(clip, opt=-1, **kw).planes))  # warm
        best = float("inf")
        for _t in range(3):
            t0 = time.perf_counter()
            acc = []
            for _ in range(5):
                acc.append(checksum(sangnom2(clip, opt=-1, **kw).planes))
            np.asarray(jnp.stack(acc))
            best = min(best, (time.perf_counter() - t0) / 5)
        log(f"  {name}: {B / best:8.0f} frames/s")


def main() -> None:
    import jax

    from sangnom_tpu import Clip, get_format, sangnom2
    from sangnom_tpu.oracle import sangnom2_frame_oracle

    log("devices:", jax.devices())
    backend = jax.default_backend()

    fmt = get_format("YUV420P8")
    rng = np.random.default_rng(7)
    B = 64
    planes = [
        rng.integers(0, 256, (B, 540, 1920)).astype(np.uint8),
        rng.integers(0, 256, (B, 270, 960)).astype(np.uint8),
        rng.integers(0, 256, (B, 270, 960)).astype(np.uint8),
    ]
    clip = Clip.from_numpy(planes, fmt)
    kwargs = dict(order=1, aa=48, aac=0, dh=True)

    # --- correctness gate: bit-exact vs the native oracle ------------------
    # (a single-frame clip: fetching full 64-frame planes through the device
    # tunnel costs minutes and proves nothing more)
    clip1 = Clip.from_numpy([p[:1] for p in planes], fmt)
    out = sangnom2(clip1, opt=-1, **kwargs)
    jax.block_until_ready(out.planes)
    want = sangnom2_frame_oracle([p[0] for p in planes], fmt, **kwargs)
    for i in range(3):
        got = np.asarray(out.planes[i])[0]
        if not np.array_equal(got, want[i]):
            log(f"BIT-EXACTNESS FAILURE plane {i}")
            print(json.dumps({"metric": "1080p_bob_dh_fps_per_chip",
                              "value": 0.0, "unit": "frames/s",
                              "vs_baseline": 0.0, "error": "parity"}))
            sys.exit(1)
    log("bit-exactness vs native oracle: OK (all planes)")

    # --- TPU throughput ----------------------------------------------------
    # Methodology: under the axon tunnel, block_until_ready can return
    # before remote execution completes; a device-side checksum fetched at
    # the end of each trial forces the full chain.  Best of 3 trials.
    import jax.numpy as jnp

    def checksum(planes):
        s = jnp.zeros((), jnp.float32)
        for p in planes:
            s = s + jnp.sum(p.astype(jnp.float32))
        return s

    iters = 10
    _ = float(checksum(sangnom2(clip, opt=-1, **kwargs).planes))  # warm
    dt = float("inf")
    for _trial in range(5):
        t0 = time.perf_counter()
        acc = []
        for _ in range(iters):
            out = sangnom2(clip, opt=-1, **kwargs)
            acc.append(checksum(out.planes))
        np.asarray(jnp.stack(acc))  # forces every iteration
        dt = min(dt, (time.perf_counter() - t0) / iters)
    fps = B / dt
    log(f"{backend} fused-pallas: {dt*1e3:.2f} ms / {B} frames "
        f"-> {fps:.0f} frames/s (best of 5 trials, checksum-forced)")

    # --- measured baseline: native scalar oracle, single core --------------
    # best-of-N single frames: robust against transient CPU contention
    # (an inflated baseline would understate vs_baseline, a deflated one
    # would overstate it — take the oracle's true capability)
    frame = [p[0] for p in planes]
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        sangnom2_frame_oracle(frame, fmt, **kwargs)
        best = min(best, time.perf_counter() - t0)
    scalar_fps = 1.0 / best
    sse2_est = scalar_fps * SSE2_OVER_SCALAR
    log(f"native scalar oracle: {scalar_fps:.1f} fps "
        f"-> SSE2 estimate x{SSE2_OVER_SCALAR}: {sse2_est:.1f} fps")

    if "--all" in sys.argv:
        log("extra configs (BASELINE.json list):")
        _extra_configs(Clip, get_format, sangnom2, checksum, rng)

    print(json.dumps({
        "metric": "1080p_bob_dh_fps_per_chip",
        "value": round(fps, 1),
        "unit": "frames/s",
        "vs_baseline": round(fps / sse2_est, 2),
        "baseline_sse2_est_fps": round(sse2_est, 1),
        "scalar_oracle_fps": round(scalar_fps, 1),
        "backend": backend,
        "batch": B,
    }))


if __name__ == "__main__":
    main()
