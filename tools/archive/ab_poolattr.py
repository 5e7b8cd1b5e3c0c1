"""Pool-compat time attribution: GRAY8 1080p (ONE pool pass/frame) vs
YUV420P8 1080p (THREE passes/frame, same luma pool geometry — chroma
passes smooth the full luma-sized pool).  The per-pass smoothing cost is
~(t_yuv - t_gray)/2; the GRAY time bounds the non-smoothing remainder
(prepare/finalize/weave/scan glue + one pass).  Interleaved arms, opt=1.

Run ON THE TPU:  python tools/ab_poolattr.py
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
B = 8


@jax.jit
def _sync(outs):
    s = jnp.zeros((), jnp.float32)
    for p in jax.tree_util.tree_leaves(outs):
        s = s + jnp.sum(p[:, -1].astype(jnp.float32))
    return s


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(11)
    y = jnp.asarray(rng.integers(0, 256, (B, 540, 1920), dtype=np.uint8))
    u = jnp.asarray(rng.integers(0, 256, (B, 270, 960), dtype=np.uint8))
    v = jnp.asarray(rng.integers(0, 256, (B, 270, 960), dtype=np.uint8))

    arms = {}
    for name, fmtname, planes in (
        ("gray_1pass", "GRAY8", (y,)),
        ("yuv_3pass", "YUV420P8", (y, u, v)),
    ):
        fmt = get_format(fmtname)
        jf = jax.jit(lambda p, _f=fmt: sangnom2_pool_impl(
            p, None, _f, 1, 48, 48, True, True, True, opt=1))
        t0 = time.perf_counter()
        out = jf(planes)
        _ = float(_sync(out))
        print(f"{name}: warmup {time.perf_counter() - t0:.1f}s", flush=True)
        arms[name] = (jf, planes)

    best = {n: float("inf") for n in arms}
    for r in range(ROUNDS):
        line = []
        for n, (jf, planes) in arms.items():
            t0 = time.perf_counter()
            for _ in range(ITERS):
                _ = float(_sync(jf(planes)))
            dt = (time.perf_counter() - t0) / (ITERS * B)
            best[n] = min(best[n], dt)
            line.append(f"{n} {dt * 1e6:8.1f} us/f")
        print(f"round {r}: " + "  ".join(line), flush=True)
    tg, ty = best["gray_1pass"], best["yuv_3pass"]
    per_pass = (ty - tg) / 2
    print(f"best-of: gray {tg * 1e6:.0f} us/f  yuv {ty * 1e6:.0f} us/f")
    print(f"=> smoothing pass ~{per_pass * 1e6:.0f} us; "
          f"non-smoothing bound (gray minus one pass) "
          f"~{(tg - per_pass) * 1e6:.0f} us")


if __name__ == "__main__":
    main()
