"""Interleaved A/B: pool_compat smoothing backend — jnp lax.scan (opt=0)
vs the Pallas row-scan kernel (opt=1, ops.pool_carry.smooth_pool_pallas).

Bench config: 1080p YUV420P8 B=8, order=1 aa=48 dh (the bench.py pool
line).  Device-side bit-equality of outputs AND final pool asserted before
timing.  Arms own fresh jit closures (pjit keys on the callable); timing is
checksum-forced; arms interleaved (pool-contended chip).

Run ON THE TPU:  python tools/ab_poolpallas.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from sangnom_tpu import get_format  # noqa: E402
from sangnom_tpu.ops.pool_carry import sangnom2_pool_impl  # noqa: E402

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
    for name, opt in (("scan", 0), ("pallas", 1)):
        jf = jax.jit(lambda p, _o=opt: sangnom2_pool_impl(
            p, None, fmt, 1, 48, 0, True, True, True, opt=_o))
        t0 = time.perf_counter()
        out = jf(planes)
        _ = float(_sync(out))
        print(f"{name} (opt={opt}): warmup {time.perf_counter() - t0:.1f}s",
              flush=True)
        arms[name] = (jf, out)

    for a, b in zip(jax.tree_util.tree_leaves(arms["scan"][1]),
                    jax.tree_util.tree_leaves(arms["pallas"][1])):
        assert bool(jnp.all(a == b)), "pallas pool output differs from scan"
    print("bit-identity scan vs pallas (outputs + final pool): OK",
          flush=True)

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
    f0, f1 = 1.0 / best["scan"], 1.0 / best["pallas"]
    print(f"best-of: scan {f0:.1f} fps  pallas {f1:.1f} fps  "
          f"delta {(f1 / f0 - 1) * 100:+.1f}%")


if __name__ == "__main__":
    main()
