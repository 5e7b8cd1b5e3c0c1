"""Interleaved A/B: pool_compat frame-parallel fast path vs the sequential
Pallas scan (both opt=1).

The fast path (`ops.pool_carry._frames_independent`) engages on stride-
aligned luma widths with luma processed first — the bench pool line's 1080p
geometry qualifies — and folds POOL_FAST_BATCH frames into ONE Pallas
row-scan walk per plane.  Arms: sequential (POOL_FAST=False) vs fast at a
K sweep.  Device-side bit-equality of outputs AND final pool asserted
before timing; fresh jit closures per arm traced with the arm's flag
values; interleaved rounds (pool-contended chip).

Run ON THE TPU:  python tools/ab_poolfast.py [B]
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
SWEEP = (8, 16, 32)


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
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    planes = tuple(
        jnp.asarray(rng.integers(0, 256, s, dtype=np.uint8))
        for s in [(B, 540, 1920), (B, 270, 960), (B, 270, 960)]
    )

    arms = {}

    def add_arm(name, fast, k, recompute=False):
        pool_carry.POOL_FAST = fast
        pool_carry.POOL_FAST_BATCH = k
        pool_carry.POOL_FINALIZE_RECOMPUTE = recompute
        jf = jax.jit(lambda p: pool_carry.sangnom2_pool_impl(
            p, None, fmt, 1, 48, 0, True, True, True, opt=1))
        t0 = time.perf_counter()
        out = jf(planes)
        _ = float(_sync(out))
        print(f"{name}: warmup {time.perf_counter() - t0:.1f}s", flush=True)
        arms[name] = (jf, out)

    add_arm("seq", False, 16)
    for k in SWEEP:
        if k <= B:
            add_arm(f"fast{k}", True, k)
    add_arm("fastRC", True, 16, recompute=True)
    pool_carry.POOL_FAST = True
    pool_carry.POOL_FAST_BATCH = 16
    pool_carry.POOL_FINALIZE_RECOMPUTE = False

    ref = jax.tree_util.tree_leaves(arms["seq"][1])
    for name, (_, out) in arms.items():
        if name == "seq":
            continue
        for a, b in zip(ref, jax.tree_util.tree_leaves(out)):
            assert bool(jnp.all(a == b)), f"{name} differs from seq"
    print("bit-identity (outputs + final pool) all arms: OK", flush=True)

    best = {n: float("inf") for n in arms}
    for r in range(ROUNDS):
        line = []
        for n, (jf, _) in arms.items():
            t0 = time.perf_counter()
            for _ in range(ITERS):
                _ = float(_sync(jf(planes)))
            dt = (time.perf_counter() - t0) / (ITERS * B)
            best[n] = min(best[n], dt)
            line.append(f"{n} {dt * 1e6:9.1f} us/f")
        print(f"round {r}: " + "  ".join(line), flush=True)
    f_seq = 1.0 / best["seq"]
    print(f"best-of: seq {f_seq:.1f} fps", flush=True)
    for n in arms:
        if n == "seq":
            continue
        f = 1.0 / best[n]
        print(f"         {n} {f:.1f} fps  delta {(f / f_seq - 1) * 100:+.1f}%",
              flush=True)


if __name__ == "__main__":
    main()
