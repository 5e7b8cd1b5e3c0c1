"""Interleaved A/B: leading-pair f32 hbox (pallas_kernel._FLOAT_HBOX_PAIR).

cfg5f shape: 960x540 YUV444PS order=2 aa=48 aac=48 B=64, opt=1 (float
in-kernel weave on, the round-3 default), checksum-forced.  Two arms with
their OWN fresh jit (the hook is trace-time): exact (6 rolls + 6 selects
per slab, the prior default) vs pair (5 + 5, fp association unchanged
operation-for-operation).  Arms rotate order every trial; the chip is
pool-contended, so only interleaved arms measure honestly.

Capture to results/floatpair_ab_r03.txt.
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root, so `python tools/x.py` works uninstalled
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


assert jax.default_backend() == "tpu"
fmt = get_format("YUV444PS")
B = 64
rng = np.random.default_rng(7)
planes = tuple(
    jax.device_put(rng.random((B, 540, 960), dtype=np.float32))
    for _ in range(3)
)
parity = jnp.zeros((B,), jnp.bool_)


def make_arm(pair):
    pk._FLOAT_HBOX_PAIR = pair

    @jax.jit
    def f(planes, parity):
        return sangnom2_impl(planes, parity, fmt, order=2, aa=48, aac=48,
                             dh=False, luma=True, chroma=True, opt=1)

    out = f(planes, parity)
    jax.block_until_ready(out)
    return f, out


f_e, o_e = make_arm(False)
f_p, o_p = make_arm(True)
for i in range(3):
    assert np.array_equal(np.asarray(o_e[i]), np.asarray(o_p[i])), i
log("arms bit-identical (all planes)")


@jax.jit
def sync(planes):
    s = jnp.zeros((), jnp.float32)
    for p in planes:
        s = s + jnp.sum(p[:, -1])
    return s


iters = 8
res = {"exact": [], "pair": []}
arms = [("exact", f_e), ("pair", f_p)]
for trial in range(8):
    for name, f in arms:
        t0 = time.perf_counter()
        acc = [sync(f(planes, parity)) for _ in range(iters)]
        np.asarray(jnp.stack(acc))
        res[name].append((time.perf_counter() - t0) / iters / B * 1e6)
    arms = arms[1:] + arms[:1]  # rotate order
for name, v in res.items():
    log(f"{name}: best {min(v):.1f} us/f  trials {[f'{x:.1f}' for x in v]}")
e, p = min(res["exact"]), min(res["pair"])
log(f"pair hbox vs exact: {(e - p) / e * 100:+.1f}%")
