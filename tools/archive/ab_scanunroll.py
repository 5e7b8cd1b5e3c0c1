"""Interleaved A/B: `smooth_scan` lax.scan ``unroll`` factor.

The jnp row scan's per-step tensors are tiny ([9, S] lanes), so on TPU the
scan is loop-overhead-bound; `lax.scan(unroll=k)` replicates the step body
(same ops, same association — bit-exact by construction, asserted below on
full outputs) and amortizes the per-iteration overhead.  Affects the two
scan-built backends: pool_compat (`sangnom2_pool_impl`) and opt=0
(`sangnom2_impl`).

Methodology: one process, one arm per unroll factor; each arm owns its own
`jax.jit` object and `reference.SCAN_UNROLL` is set at TRACE time (the
warmup call), so the interleaved timed calls each hit their arm's compiled
code.  Timing is checksum-forced (the axon tunnel makes block_until_ready
unreliable); arms are interleaved because the chip is pool-contended
(sequential arms mis-measure by up to +-25%).

Run ON THE TPU:  python tools/ab_scanunroll.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from sangnom_tpu import get_format  # noqa: E402
from sangnom_tpu.ops import reference  # noqa: E402
from sangnom_tpu.ops.pool_carry import sangnom2_pool_impl  # noqa: E402
from sangnom_tpu.ops.sangnom import sangnom2_impl  # noqa: E402

UNROLLS = [1, 8, 16]
ROUNDS = 5
KW = dict(order=1, aa=48, aac=0, dh=True, luma=True, chroma=True)


@jax.jit
def _sync(outs):
    s = jnp.zeros((), jnp.float32)
    for p in jax.tree_util.tree_leaves(outs):
        s = s + jnp.sum(p[:, -1].astype(jnp.float32))
    return s


def make_arm(u, fn, planes):
    """Per-arm jit: SCAN_UNROLL is read at trace time (the warmup call).
    A FRESH function object per arm — pjit's cache keys on the wrapped
    callable, so arms sharing one `fn` would silently reuse the first
    arm's trace (observed: 0.1s 'compiles' and exact ties)."""
    jf = jax.jit(lambda p, _fn=fn: _fn(p))
    old = reference.SCAN_UNROLL
    reference.SCAN_UNROLL = u
    try:
        t0 = time.perf_counter()
        out = jf(planes)
        _ = float(_sync(out))
        print(f"  unroll={u}: compile+warmup {time.perf_counter() - t0:.1f}s",
              flush=True)
    finally:
        reference.SCAN_UNROLL = old
    return jf, out


def run_group(name, fn, planes, nframes, iters):
    print(f"== {name} ==", flush=True)
    arms = {u: make_arm(u, fn, planes) for u in UNROLLS}
    # bit-identity across arms (device-side equality, scalar fetch)
    base = arms[UNROLLS[0]][1]
    for u in UNROLLS[1:]:
        for a, b in zip(jax.tree_util.tree_leaves(base),
                        jax.tree_util.tree_leaves(arms[u][1])):
            assert bool(jnp.all(a == b)), f"{name}: unroll={u} output differs"
    print("  bit-identity across arms: OK", flush=True)

    best = {u: float("inf") for u in UNROLLS}
    for r in range(ROUNDS):
        line = []
        for u in UNROLLS:
            jf = arms[u][0]
            t0 = time.perf_counter()
            for _ in range(iters):
                _ = float(_sync(jf(planes)))
            dt = (time.perf_counter() - t0) / (iters * nframes)
            best[u] = min(best[u], dt)
            line.append(f"u{u} {dt * 1e6:9.1f} us/f")
        print(f"  round {r}: " + "  ".join(line), flush=True)
    fps = {u: 1.0 / best[u] for u in UNROLLS}
    base_fps = fps[UNROLLS[0]]
    for u in UNROLLS:
        d = (fps[u] / base_fps - 1) * 100
        print(f"  best-of unroll={u}: {fps[u]:7.1f} fps  ({d:+.1f}%)",
              flush=True)
    return fps


def main():
    groups = sys.argv[1:] or ["scan"]
    print("devices:", jax.devices(), flush=True)
    print("groups:", groups, flush=True)
    fmt = get_format("YUV420P8")
    rng = np.random.default_rng(11)
    summary = {}

    def mk(B):
        return tuple(
            jnp.asarray(rng.integers(0, 256, s, dtype=np.uint8))
            for s in [(B, 540, 1920), (B, 270, 960), (B, 270, 960)]
        )

    if "scan" in groups:
        # isolated row scan at the pool's geometry (cheap compile: one scan,
        # no frame loop) — does unroll help the scan AT ALL?
        from sangnom_tpu.ops.primitives import KernelSpec
        from sangnom_tpu.ops.reference import smooth_scan

        spec = KernelSpec.from_format(fmt)
        raw = jnp.asarray(
            rng.integers(0, 256, (9, 541, 1920)).astype(spec.acc_dtype))

        def scan_fn(r):
            return smooth_scan(r, spec)

        # "frames" = smoothing passes; a pool frame runs 3 of these
        summary["smooth_scan [9,541,1920]"] = run_group(
            "isolated smooth_scan, pool geometry", scan_fn, raw, 1, iters=20)

    if "pool" in groups:
        Bp = 8
        planes_p = mk(Bp)

        def pool_fn(planes):
            return sangnom2_pool_impl(planes, None, fmt, 1, 48, 0, True,
                                      True, True)

        summary[f"pool_compat B={Bp}"] = run_group(
            f"pool_compat 1080p YUV420P8 B={Bp} (bench config)",
            pool_fn, planes_p, Bp, iters=2)

    if "opt0" in groups:
        Br = 16
        planes_r = mk(Br)

        def ref_fn(planes):
            return sangnom2_impl(planes, None, fmt, opt=0, **KW)

        summary[f"opt=0 bob+dh B={Br}"] = run_group(
            f"opt=0 1080p YUV420P8 bob+dh B={Br}", ref_fn, planes_r, Br,
            iters=2)

    print("\nSUMMARY")
    for name, fps in summary.items():
        u_best = max(fps, key=fps.get)
        print(f"  {name}: " + "  ".join(
            f"u{u}={fps[u]:.1f}" for u in UNROLLS) +
            f"  -> best unroll={u_best}")


if __name__ == "__main__":
    main()
