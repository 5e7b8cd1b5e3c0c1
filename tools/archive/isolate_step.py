"""Isolate the stepv/stepm compile crash (results/mxu_step_probe_r03.txt).

The step-shaped calibration arms (tools/calibrate_vpu.py STEP_KINDS) kill
the remote tpu_compile_helper with exit code 1 and no diagnostic.  Three
candidate ingredients, probed independently here:

  bigslab  — rolladd chain on the [5G, W] hbox-stack slab (600 sublanes);
             tests whether rolls on 1200-vreg values are the problem
  bigshift — rolls by W-1/W-2/W-3 (the stepv tap spelling of left shifts)
             on the normal [G, W] slab; tests the near-width shift amount
  unroll   — stepv's exact body at k=1 (one unrolled iteration); tests
             compile-size scaling
  fori     — stepv's body inside lax.fori_loop (compile-size-safe form)

Usage: python tools/isolate_step.py [arm,arm,...]
"""
from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import functools
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

G, W = 120, 2048
STEPS = 8  # compile probe, not a timing run


def _body(kind: str, k: int, a_ref, a2_ref, b_ref, b2_ref):
    kind = kind.removesuffix("_iota")
    w = b_ref.shape[-1]

    def one(carry):
        a, a2, b, b2 = carry
        if kind == "roll2chz":
            # roll2ch, but the init wrote broadcast-of-input (no 3-D iota)
            hb = a + pltpu.roll(a, 1, axis=a.ndim - 1)
            a = hb + pltpu.roll(hb, 2, axis=a.ndim - 1)
            return a, a2, b, b2
        if kind.startswith("ramt"):
            # single 3-D roll by a specific amount (kind = "ramtN")
            amt = int(kind[4:])
            a, a2 = pltpu.roll(a, amt, axis=a.ndim - 1) + a2, a
            return a, a2, b, b2
        if kind == "hboxtree":
            # chained rolls + adds only (no sub, no writeback)
            S = a.shape[-1]
            hb = a + pltpu.roll(a, (-1) % S, axis=a.ndim - 1)
            hc = hb + pltpu.roll(hb, (-2) % S, axis=a.ndim - 1)
            a = hc + pltpu.roll(hc, 3, axis=a.ndim - 1)
            return a, a2, b, b2
        if kind == "hboxsub":
            # tree + the dedup subtraction, no writeback
            S = a.shape[-1]
            hb = a + pltpu.roll(a, (-1) % S, axis=a.ndim - 1)
            hc = hb + pltpu.roll(hb, (-2) % S, axis=a.ndim - 1)
            a = hc + pltpu.roll(hc, 3, axis=a.ndim - 1) - a
            return a, a2, b, b2
        if kind == "hboxwb":
            # tree + writeback, no subtraction
            S = a.shape[-1]
            hb = a + pltpu.roll(a, (-1) % S, axis=a.ndim - 1)
            hc = hb + pltpu.roll(hb, (-2) % S, axis=a.ndim - 1)
            a = ((hc + pltpu.roll(hc, 3, axis=a.ndim - 1)) >> 4) & 0x00FF00FF
            return a, a2, b, b2
        if kind == "hboxfull":
            # the PRODUCTION _hbox7 (sub3 tree + edge slabs + concat)
            from sangnom_tpu.ops import pallas_kernel as pk
            a = ((pk._hbox7(a, 1920, a.shape[-1]) >> 4) & 0x00FF00FF)
            return a, a2, b, b2
        if kind == "roll2ch":
            # two CHAINED rolls (roll of a roll-derived value)
            hb = a + pltpu.roll(a, 1, axis=a.ndim - 1)
            a = hb + pltpu.roll(hb, 2, axis=a.ndim - 1)
            return a, a2, b, b2
        if kind == "hboxprod":
            # the production _rot spelling: _rot(x, k) = roll by (-k) % S
            S = a.shape[-1]
            hb = a + pltpu.roll(a, (-1) % S, axis=a.ndim - 1)
            hc = hb + pltpu.roll(hb, (-2) % S, axis=a.ndim - 1)
            a = ((hc + pltpu.roll(hc, 3, axis=a.ndim - 1) - a) >> 4) & 0x00FF00FF
            return a, a2, b, b2
        if kind == "hboxk":
            # the REAL kernel's sub3 hbox tree + writeback, k times
            hb = a + pltpu.roll(a, 1, axis=a.ndim - 1)
            hc = hb + pltpu.roll(hb, 2, axis=a.ndim - 1)
            a = ((hc + pltpu.roll(hc, 3, axis=a.ndim - 1) - a) >> 4) & 0x00FF00FF
            return a, a2, b, b2
        if kind in ("bigslab", "slab3d", "slab3d1", "unroll", "fori"):
            a, a2 = pltpu.roll(a, 1, axis=a.ndim - 1) + a2, a
            if kind != "slab3d1":
                a, a2 = pltpu.roll(a, 2, axis=a.ndim - 1) + a2, a
                a, a2 = pltpu.roll(a, 3, axis=a.ndim - 1) + a2, a
        if kind in ("bigshift", "unroll", "fori"):
            acc = b2
            for s in (1, 2, 3, w - 1, w - 2, w - 3):
                acc = acc + pltpu.roll(b, s, axis=1)
            b, b2 = acc, b
        elif kind == "smallshift":
            acc = b2
            for s in (1, 2, 3, 4, 5, 6):
                acc = acc + pltpu.roll(b, s, axis=1)
            b, b2 = acc, b
        return a, a2, b, b2

    carry = (a_ref[...], a2_ref[...], b_ref[...], b2_ref[...])
    if kind == "fori":
        carry = jax.lax.fori_loop(0, k, lambda i, c: one(c), carry)
    else:
        for _ in range(k):
            carry = one(carry)
    a, a2, b, b2 = carry
    a_ref[...], a2_ref[...] = a, a2
    b_ref[...], b2_ref[...] = b, b2
    atail = a[0, :, :128] if a.ndim == 3 else a[:G, :128]
    return b[:, :128] + atail


def _kernel(in_ref, out_ref, a_ref, a2_ref, b_ref, b2_ref, *, kind, k):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        seed = in_ref[...].astype(jnp.int32) & 0xFF
        if kind.endswith("_iota"):
            a_ref[...] = jax.lax.broadcasted_iota(
                jnp.int32, a_ref.shape, 1) % 251
            a2_ref[...] = jax.lax.broadcasted_iota(
                jnp.int32, a_ref.shape, 0) % 241
        elif a_ref.shape[:-2] == (5,):
            a_ref[...] = jnp.stack([seed, seed, seed, seed, seed])
            a2_ref[...] = jnp.stack([seed] * 5) ^ 0x55
        else:
            a_ref[...] = jnp.broadcast_to(seed, a_ref.shape)
            a2_ref[...] = jnp.broadcast_to(seed ^ 0x55, a_ref.shape)
        b_ref[...] = seed
        b2_ref[...] = b_ref[...] ^ 0x55AA55

    out_ref[0] = _body(kind, k, a_ref, a2_ref, b_ref, b2_ref)


@functools.partial(jax.jit, static_argnames=("kind", "k"))
def _run(src, kind: str, k: int):
    kern = functools.partial(_kernel, kind=kind, k=k)
    base = kind.removesuffix("_iota")
    ah = ((5 * G,) if base == "bigslab"
          else (5, G) if (base in ("slab3d", "slab3d1", "unroll", "fori",
                                   "hboxk", "hboxprod", "hboxtree",
                                   "hboxsub", "hboxwb", "roll2ch",
                                   "hboxfull", "roll2chz")
                          or base.startswith("ramt"))
          else (G,))
    ah = ah + (W,)
    scratches = [pltpu.VMEM(ah, jnp.int32), pltpu.VMEM(ah, jnp.int32),
                 pltpu.VMEM((G, W), jnp.int32), pltpu.VMEM((G, W), jnp.int32)]
    return pl.pallas_call(
        kern,
        grid=(STEPS,),
        in_specs=[pl.BlockSpec((G, W), lambda t: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, G, 128), lambda t: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((STEPS, G, 128), jnp.int32),
        scratch_shapes=scratches,
        interpret=jax.default_backend() != "tpu",
    )(src)


def main():
    arms = (sys.argv[1].split(",") if len(sys.argv) > 1 else
            ["bigslab@1", "bigshift@1", "smallshift@1", "unroll@1",
             "unroll@4", "unroll@12", "fori@12"])
    print(f"devices: {jax.devices()}", flush=True)
    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.integers(0, 255, (G, W)), jnp.int32)
    for arm in arms:
        kind, _, kspec = arm.partition("@")
        k = int(kspec) if kspec else 1
        t0 = time.perf_counter()
        try:
            out = _run(src, kind, k)
            s = float(jnp.sum(out[:, :, :1].astype(jnp.float32)))
            dt = time.perf_counter() - t0
            print(f"  {arm:14s}: OK (compile+run {dt:.1f}s, checksum {s:.0f})",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            dt = time.perf_counter() - t0
            print(f"  {arm:14s}: FAIL after {dt:.1f}s "
                  f"({type(e).__name__}: {str(e).splitlines()[0][:140]})",
                  flush=True)


if __name__ == "__main__":
    main()
