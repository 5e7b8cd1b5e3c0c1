"""Localize the Mosaic-only pool fast-path divergence
(results/poolfast_ab_r03b.txt: fast arms differ from seq on hardware while
interpret mode matches).

Level 1 — kernel only: random pool rows [P+1, C, S] smoothed by the jnp
scan twin vs `_smooth_rows_pallas` (the new R==1 shifted-index-map form),
at C=5 (seq shape), C=40 and C=80 (folded fast shapes).  A diff here
convicts the kernel/BlockSpec path at that slab count.

Level 2 — impl: N=4 1080p 4:2:0 dh order=1: opt=0 scan backend vs
sequential Pallas vs fast K=1/2/4.  First differing plane + index printed.

Run ON THE TPU:  python tools/probe_poolfast_parity.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from sangnom_tpu import get_format  # noqa: E402
from sangnom_tpu.ops import pool_carry  # noqa: E402
from sangnom_tpu.ops.primitives import KernelSpec  # noqa: E402
from sangnom_tpu.ops.reference import smooth_scan  # noqa: E402


def level1():
    fmt = get_format("YUV420P8")
    spec = KernelSpec.from_format(fmt)
    rng = np.random.default_rng(7)
    P, S = 540, 1920
    for C in (5, 40, 80):
        rows = jnp.asarray(
            rng.integers(0, 256, (P + 1, C, S), dtype=np.int64).astype(
                np.int32
            )
        )
        want = jax.jit(
            lambda r: smooth_scan(
                jnp.moveaxis(r, 1, 0), spec, init=jnp.moveaxis(r, 1, 0)[:, 0]
            )
        )(rows)  # [P-1, C, S]
        got = jax.jit(
            lambda r: pool_carry._smooth_rows_pallas(r, spec, packed=False)
        )(rows)
        want = jnp.moveaxis(want, 1, 1)  # already [P-1, C, S]
        eq = bool(jnp.all(want == got))
        print(f"level1 C={C}: {'OK' if eq else 'DIFF'}", flush=True)
        if not eq:
            d = jnp.argwhere(want != got, size=10, fill_value=-1)
            print("  first diffs [row, slab, col]:")
            print(np.asarray(d))
            w0 = np.asarray(want)
            g0 = np.asarray(got)
            for r, c, col in np.asarray(d):
                if r < 0:
                    break
                print(f"  [{r},{c},{col}] want {w0[r, c, col]} "
                      f"got {g0[r, c, col]}")


def level2():
    fmt = get_format("YUV420P8")
    rng = np.random.default_rng(11)
    B = 4
    planes = tuple(
        jnp.asarray(rng.integers(0, 256, s, dtype=np.uint8))
        for s in [(B, 540, 1920), (B, 270, 960), (B, 270, 960)]
    )

    outs = {}

    def arm(name, opt, fast, k):
        pool_carry.POOL_FAST = fast
        pool_carry.POOL_FAST_BATCH = k
        jf = jax.jit(lambda p, _o=opt: pool_carry.sangnom2_pool_impl(
            p, None, fmt, 1, 48, 0, True, True, True, opt=_o))
        outs[name] = [np.asarray(x) for x in
                      jax.tree_util.tree_leaves(jf(planes))]
        print(f"arm {name} done", flush=True)

    arm("scan0", 0, False, 1)
    arm("seqP", 1, False, 1)
    for k in (1, 2, 4):
        arm(f"fast{k}", 1, True, k)
    pool_carry.POOL_FAST = True
    pool_carry.POOL_FAST_BATCH = 16

    names = list(outs)
    ref = outs["scan0"]
    for n in names[1:]:
        for i, (a, b) in enumerate(zip(ref, outs[n])):
            if not np.array_equal(a, b):
                d = np.argwhere(a != b)
                print(f"level2 {n} vs scan0: leaf {i} differs at "
                      f"{len(d)} cells; first {d[:5].tolist()}", flush=True)
                idx = tuple(d[0])
                print(f"  want {a[idx]} got {b[idx]}")
                break
        else:
            print(f"level2 {n} vs scan0: OK", flush=True)


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    level1()
    level2()
