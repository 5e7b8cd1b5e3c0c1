"""Interleaved A/B: pool smoothing kernel hbox form — shared
ops.pallas_kernel._hbox7 (3-roll cumulative-sub bulk + exact edge slabs)
vs the naive fully-clamped 6-concat form (pool_carry.POOL_HBOX_SHARED,
read at trace time).  Bench config, opt=1, device bit-equality asserted.

Run ON THE TPU:  python tools/ab_poolhbox.py
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

ROUNDS = 5
ITERS = 2
B = 8


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
    planes = tuple(
        jnp.asarray(rng.integers(0, 256, s, dtype=np.uint8))
        for s in [(B, 540, 1920), (B, 270, 960), (B, 270, 960)]
    )

    arms = {}
    for name, shared in (("naive6", False), ("shared3", True)):
        jf = jax.jit(lambda p, _n=name: pool_carry.sangnom2_pool_impl(
            p, None, fmt, 1, 48, 0, True, True, True, opt=1))
        old = pool_carry.POOL_HBOX_SHARED
        pool_carry.POOL_HBOX_SHARED = shared
        try:
            t0 = time.perf_counter()
            out = jf(planes)
            _ = float(_sync(out))
            print(f"{name}: warmup {time.perf_counter() - t0:.1f}s",
                  flush=True)
        finally:
            pool_carry.POOL_HBOX_SHARED = old
        arms[name] = (jf, out)

    for a, b in zip(jax.tree_util.tree_leaves(arms["naive6"][1]),
                    jax.tree_util.tree_leaves(arms["shared3"][1])):
        assert bool(jnp.all(a == b)), "hbox forms differ"
    print("bit-identity naive6 vs shared3: OK", flush=True)

    best = {n: float("inf") for n in arms}
    for r in range(ROUNDS):
        line = []
        for n, (jf, _) in arms.items():
            t0 = time.perf_counter()
            for _ in range(ITERS):
                _ = float(_sync(jf(planes)))
            dt = (time.perf_counter() - t0) / (ITERS * B)
            best[n] = min(best[n], dt)
            line.append(f"{n} {dt * 1e6:8.1f} us/f")
        print(f"round {r}: " + "  ".join(line), flush=True)
    f0, f1 = 1.0 / best["naive6"], 1.0 / best["shared3"]
    print(f"best-of: naive6 {f0:.1f} fps  shared3 {f1:.1f} fps  "
          f"delta {(f1 / f0 - 1) * 100:+.1f}%")


if __name__ == "__main__":
    main()
