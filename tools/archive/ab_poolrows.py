"""Interleaved sweep: `smooth_pool_pallas` rows-per-grid-step (R).

R amortizes per-step DMA latency; the scan-vs-pallas baseline A/B is
results/poolpallas_ab_r03.txt (scan 64.3 fps, pallas R=1 161.4 fps,
bit-identical).  Here all arms are the Pallas backend at different R,
device-side bit-equality asserted against the R=1 arm.

Run ON THE TPU:  python tools/ab_poolrows.py [R ...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from sangnom_tpu import get_format  # noqa: E402
from sangnom_tpu.ops import pool_carry  # noqa: E402

RS = [int(a) for a in sys.argv[1:]] or [1, 4, 8, 16, 32]
ROUNDS = 5
ITERS = 2


@jax.jit
def _sync(outs):
    s = jnp.zeros((), jnp.float32)
    for p in jax.tree_util.tree_leaves(outs):
        s = s + jnp.sum(p[:, -1].astype(jnp.float32))
    return s


def main():
    print("devices:", jax.devices(), flush=True)
    fmt = get_format("YUV420P8")
    rng = np.random.default_rng(11)
    B = 8
    planes = tuple(
        jnp.asarray(rng.integers(0, 256, s, dtype=np.uint8))
        for s in [(B, 540, 1920), (B, 270, 960), (B, 270, 960)]
    )

    arms = {}
    for R in RS:
        jf = jax.jit(lambda p, _r=R: pool_carry.sangnom2_pool_impl(
            p, None, fmt, 1, 48, 0, True, True, True, opt=1))
        old = pool_carry.POOL_ROWS_PER_STEP
        pool_carry.POOL_ROWS_PER_STEP = R  # read at trace time
        try:
            t0 = time.perf_counter()
            out = jf(planes)
            _ = float(_sync(out))
            print(f"R={R}: warmup {time.perf_counter() - t0:.1f}s",
                  flush=True)
        finally:
            pool_carry.POOL_ROWS_PER_STEP = old
        arms[R] = (jf, out)

    base = arms[RS[0]][1]
    for R in RS[1:]:
        for a, b in zip(jax.tree_util.tree_leaves(base),
                        jax.tree_util.tree_leaves(arms[R][1])):
            assert bool(jnp.all(a == b)), f"R={R} differs from R={RS[0]}"
    print("bit-identity across R arms: OK", flush=True)

    best = {R: float("inf") for R in RS}
    for r in range(ROUNDS):
        line = []
        for R in RS:
            jf = arms[R][0]
            t0 = time.perf_counter()
            for _ in range(ITERS):
                _ = float(_sync(jf(planes)))
            dt = (time.perf_counter() - t0) / (ITERS * B)
            best[R] = min(best[R], dt)
            line.append(f"R{R} {dt * 1e6:8.1f}")
        print(f"round {r}: " + "  ".join(line) + "  us/f", flush=True)
    print("best-of: " + "  ".join(
        f"R{R} {1.0 / best[R]:.1f} fps" for R in RS))


if __name__ == "__main__":
    main()
