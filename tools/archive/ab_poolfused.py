"""Interleaved A/B: pool_compat Pallas backends — the split path (time-major
row-scan kernel + XLA prepare/finalize, round 3) vs the SPLIT3 carry backend (round 4b) vs the FUSED pool kernel
(prepare+smooth+finalize in one Pallas walk, (row0, body, tail) carry,
round 4; ops.pool_carry.POOL_FUSED).

Bench geometry (1080p YUV420P8 B=8, order=1 aa=48 dh) plus the unaligned
carried-state geometry (1912 wide).  Device-side bit-equality of outputs
AND final pool asserted across arms before timing; arms own fresh jit
closures traced under their flag value; timing checksum-forced,
interleaved (pool-contended chip).

Run ON THE TPU:  python tools/ab_poolfused.py
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


@jax.jit
def _sync(outs):
    s = jnp.zeros((), jnp.float32)
    for p in jax.tree_util.tree_leaves(outs):
        s = s + jnp.sum(p[:, -1].astype(jnp.float32))
    return s


def run_geometry(tag, planes, B):
    fmt = get_format("YUV420P8")
    arms = {}
    for name, fused, split3 in (("tm", False, False),
                                ("split3", False, True),
                                ("fused", True, False)):
        pool_carry.POOL_FUSED = fused
        pool_carry.POOL_SPLIT3 = split3
        jf = jax.jit(lambda p: pool_carry.sangnom2_pool_impl(
            p, None, fmt, 1, 48, 0, True, True, True, opt=1))
        t0 = time.perf_counter()
        out = jf(planes)
        _ = float(_sync(out))
        print(f"[{tag}] {name}: warmup {time.perf_counter() - t0:.1f}s",
              flush=True)
        arms[name] = (jf, out)

    base = jax.tree_util.tree_leaves(arms["tm"][1])
    for n in ("split3", "fused"):
        for a, b in zip(base, jax.tree_util.tree_leaves(arms[n][1])):
            assert bool(jnp.all(a == b)), f"[{tag}] {n} differs from tm"
    print(f"[{tag}] bit-identity tm vs split3 vs fused "
          f"(outputs + final pool): OK", flush=True)

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
        print(f"[{tag}] round {r}: " + "  ".join(line), flush=True)
    f0 = 1.0 / best["tm"]
    msg = f"[{tag}] best-of: tm {f0:.1f} fps"
    for n in ("split3", "fused"):
        fn = 1.0 / best[n]
        msg += f"  {n} {fn:.1f} fps ({(fn / f0 - 1) * 100:+.1f}%)"
    print(msg, flush=True)


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(11)
    B = 8
    planes = tuple(
        jnp.asarray(rng.integers(0, 256, s, dtype=np.uint8))
        for s in [(B, 540, 1920), (B, 270, 960), (B, 270, 960)]
    )
    run_geometry("1080p aligned", planes, B)
    planes_u = tuple(
        p[:, :, : (1912 if i == 0 else 956)] for i, p in enumerate(planes)
    )
    run_geometry("1912 unaligned", planes_u, B)


if __name__ == "__main__":
    main()
