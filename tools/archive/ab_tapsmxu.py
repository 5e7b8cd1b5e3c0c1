"""Interleaved A/B: _TAPS_MXU (per-step tap shifts as int8 permutation
matmuls on the MXU) vs the pltpu.roll tap engine, on the headline
workloads.

Background (results/mxu_probe_r03.txt, mxu_step_probe_r03.txt): the
single-chip kernel is ROLL-bound, the permute unit is throughput-bound
with no second VPU-side shift datapath, but int8 permutation matmuls
move lanes at 3.5x the roll rate and the MXU co-issues ~55% free next
to a roll chain.  The step-shaped mock probe crashed Mosaic for
probe-structural reasons, so the net question (matmul + assembly cost
vs 6 saved rolls, inside the real dependency chain) is answered here,
in the production kernel.

Two workloads, each with its own fresh jit per arm (the flag is read at
trace time): order=1 dh 1080p YUV420P8 B=120 (the kernel-dominant
headline regime) and TRUE BOB (interlaced 1080p, alternating parity,
B_in=60 -> 120 output frames).  Arms alternate within every trial and
the order rotates across trials (the chip is pool-contended; sequential
arms mis-measure by up to +-25%).

Usage: python tools/ab_tapsmxu.py [trials] [iters]
"""
from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from sangnom_tpu.core.formats import get_format
from sangnom_tpu.ops import pallas_kernel as pk
from sangnom_tpu.ops.sangnom import sangnom2_impl


def log(*a):
    print(*a, file=sys.stderr, flush=True)


assert jax.default_backend() == "tpu", jax.default_backend()
log("devices:", jax.devices())

fmt = get_format("YUV420P8")
rng = np.random.default_rng(11)
B = 120
planes_o1 = tuple(
    jax.device_put(rng.integers(0, 256, (B, h, w)).astype(np.uint8))
    for h, w in ((540, 1920), (270, 960), (270, 960))
)
parity_o1 = jnp.zeros((B,), jnp.bool_)

B_in = B // 2
planes_bob = tuple(
    jax.device_put(rng.integers(0, 256, (B_in, h, w)).astype(np.uint8))
    for h, w in ((1080, 1920), (540, 960), (540, 960))
)
parity_bob = jnp.asarray(np.tile(np.array([True, False]), B_in))


def make_arm(mxu: bool):
    pk._TAPS_MXU = mxu

    @jax.jit
    def f_o1(planes, parity):
        return sangnom2_impl(planes, parity, fmt, order=1, aa=48, aac=0,
                             dh=True, luma=True, chroma=True, opt=1)

    @jax.jit
    def f_bob(planes, parity):
        return sangnom2_impl(planes, parity, fmt, order=0, aa=48, aac=0,
                             dh=True, luma=True, chroma=True, opt=1,
                             interlaced_tff=True)

    o1 = f_o1(planes_o1, parity_o1)
    ob = f_bob(planes_bob, parity_bob)
    jax.block_until_ready(o1)
    jax.block_until_ready(ob)
    pk._TAPS_MXU = False
    return (f_o1, f_bob), (o1, ob)


log("tracing/compiling roll arm ...")
f_roll, out_roll = make_arm(False)
log("tracing/compiling mxu arm ...")
f_mxu, out_mxu = make_arm(True)

for wi in range(2):
    for i in range(3):
        assert np.array_equal(np.asarray(out_roll[wi][i]),
                              np.asarray(out_mxu[wi][i])), ("parity", wi, i)
log("arms bit-identical (both workloads, all planes)")


@jax.jit
def sync(planes):
    s = jnp.zeros((), jnp.float32)
    for p in planes:
        s = s + jnp.sum(p[:, -1].astype(jnp.float32))
    return s


trials = int(sys.argv[1]) if len(sys.argv) > 1 else 6
iters = int(sys.argv[2]) if len(sys.argv) > 2 else 8

for label, wi, pl, par, nout in (
    ("order=1 dh", 0, planes_o1, parity_o1, B),
    ("TRUE BOB", 1, planes_bob, parity_bob, B),
):
    res = {"roll": [], "mxu": []}
    arms = [("roll", f_roll[wi]), ("mxu", f_mxu[wi])]
    # warm both
    for _, f in arms:
        float(sync(f(pl, par)))
    for t in range(trials):
        for name, f in arms:
            t0 = time.perf_counter()
            acc = [sync(f(pl, par)) for _ in range(iters)]
            np.asarray(jnp.stack(acc))
            res[name].append((time.perf_counter() - t0) / iters / nout * 1e6)
        arms = arms[1:] + arms[:1]
    r, m = min(res["roll"]), min(res["mxu"])
    log(f"{label}: roll best {r:.1f} us/f  trials "
        f"{['%.1f' % v for v in res['roll']]}")
    log(f"{label}: mxu  best {m:.1f} us/f  trials "
        f"{['%.1f' % v for v in res['mxu']]}")
    log(f"{label}: mxu vs roll: {(r - m) / m * 100:+.1f}% "
        f"({r:.1f} -> {m:.1f} us/f)")
