"""VPU op-rate calibration for the cost model (VERDICT_r2 "Next round" #3).

Measures the ACHIEVED per-op issue rate on this chip for each vector-op
class the fused kernel (sangnom_tpu/ops/pallas_kernel.py) is built from —
add, lane-rotate (pltpu.roll), compare+select, shift+mask, minimum, and a
kernel-shaped blend — at the kernel's own operating shape ([g, W] i32
slabs inside a sequential Pallas grid with persistent VMEM scratch).

Methodology: each arm times the SAME kernel at two unrolled chain lengths
K1 < K2 and reports the DIFFERENTIAL rate

    rate = (K2 - K1) * steps * g * W / (t(K2) - t(K1))

which cancels the per-step fixed costs (grid bookkeeping, input/output
DMA, scratch load/store), leaving the pure issue throughput of that op
class.  Chains are data-dependent (each op consumes the previous result),
so the measured rate is the LATENCY-BOUND serial issue rate — the same
regime the real kernel's dependent stages run in, and the correct
denominator for "fraction of achievable" (the nominal 4-ALU peak assumes
4 independent chains).

Usage:  python tools/calibrate_vpu.py [reps] [arm1,arm2,...]
Each arm is an op kind, optionally "kind@width" to narrow the slab (the
width axis answers whether an op's cost scales with vreg count — the
input for any lane-packing arithmetic).  Default arms cover the kernel's
op classes.  Writes one human-readable block; capture to results/.
"""
from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root, so `python tools/x.py` works uninstalled

import functools
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

G, W = 120, 2048  # the u8 1080p luma kernel's slab shape
STEPS = 512       # ~ the 539-step 1080p grid


def _chain(kind: str, x, y, k: int, x_ref=None):
    """k data-dependent ops of the given class; returns the chain tail.

    Every arm is written as a two-register recurrence (Fibonacci-style
    swap) so NO prefix of the chain is constant-foldable: a first attempt
    with one-register chains (``x = x + y`` repeated) measured 694% of
    nominal peak — XLA/Mosaic strength-reduced it to ``x + K*y``.

    The v-prefixed arms get the (lane-padded) scratch ref: they express
    the lane shift as a VMEM round-trip (store + static-offset load)
    instead of an in-register pltpu.roll — the question is whether the
    load datapath realigns cheaper than the permute unit.  The store
    each iteration also makes the loads non-hoistable (the ref changes).

    The 4-register arms (rolladd2, rollvshift) run TWO independent
    chains interleaved: they measure whether independent work overlaps
    (pipelining on the permute unit itself, or co-issue between the
    permute unit and the load-realign path).  If rollvshift iterates at
    rolladd's rate, the vshift rides free and the kernel can split its
    shifts across both datapaths.

    The mm-prefixed arms probe the MXU as a shift datapath: a lane shift
    is a permutation matrix, so a 128x128 banded-permutation matmul
    produces one shifted copy of a [R, 128]-slab view per pass (raw u8
    pixels are bf16-exact; wider values need 8-bit digit passes).  Each
    mm iteration moves G*W elements — the SAME element count as one
    lane-roll of the [G, W] slab — so the printed Tops/s is directly
    comparable to the roll arm's.  mmroll is the co-issue question the
    round-3 probe never asked (it tested permute-vs-permute and
    permute-vs-load, never permute-vs-MXU): one roll+add chain and one
    INDEPENDENT matmul chain interleaved.  If mmroll iterates at the
    SLOWER of (rolladd, mmbf16) alone, the two units overlap and the
    roll-bound kernel can offload shift work to an otherwise-idle MXU;
    if it lands on the serial sum, the MXU datapath is closed too."""
    w = x.shape[-1]
    if kind == "rolladd2":
        # control: 2 INDEPENDENT roll+add chains.  rate ~2x rolladd =>
        # the permute unit pipelines (rolladd's figure is latency-bound
        # and the real kernel's ILP already fills the unit); rate ~1x
        # => throughput-bound, only a second datapath can add shifts.
        u, v = x ^ 0x33CC33, y ^ 0x0F0F0F
        for _ in range(k):
            x, y = pltpu.roll(x, 1, axis=x.ndim - 1) + y, x
            u, v = pltpu.roll(u, 1, axis=u.ndim - 1) + v, u
        return x + y + u + v
    if kind == "rollvshift":
        # co-issue probe: one permute-unit shift chain + one VMEM
        # round-trip shift chain, independent.  5 nominal slab-ops/iter.
        u, v = x ^ 0x33CC33, y ^ 0x0F0F0F
        for _ in range(k):
            x_ref[:, :w] = u
            x, y = pltpu.roll(x, 1, axis=x.ndim - 1) + y, x
            u, v = x_ref[:, 1:1 + w] + v, u
        return x + y + u + v
    for _ in range(k):
        if kind == "add":
            x, y = x + y, x                       # 1 op
        elif kind == "roll":
            x, y = pltpu.roll(x, 1, axis=x.ndim - 1) , x  # 1 op
        elif kind == "roll3":
            # same primitive, the kernel's largest static shift — does the
            # issue cost depend on the shift amount?
            x, y = pltpu.roll(x, 3, axis=x.ndim - 1), x
        elif kind in ("roll_sub", "troll_sub"):
            # rotate along the SUBLANE axis instead of lanes: if this
            # issues much faster, a transposed slab layout ([W, g] with
            # the column shifts riding sublanes) could dethrone the
            # lane-roll bound.  The t-prefixed arm runs on the ACTUAL
            # candidate shape ([W, G] scratch, 256 sublane tiles).
            x, y = pltpu.roll(x, 1, axis=0), x
        elif kind == "troll3":
            # transposed slab, kernel's largest shift along sublanes
            x, y = pltpu.roll(x, 3, axis=0), x
        elif kind == "rolladd":
            # NON-COLLAPSIBLE lane roll: pure roll chains compose
            # (roll^K == one roll by K) and Mosaic proved willing to
            # collapse them on some shapes (troll_sub measured 2530% of
            # peak); interleaving an add breaks composability.  2 ops.
            x, y = pltpu.roll(x, 1, axis=x.ndim - 1) + y, x
        elif kind == "trolladd":
            # non-collapsible SUBLANE roll on the transposed slab. 2 ops.
            x, y = pltpu.roll(x, 1, axis=0) + y, x
        elif kind == "trolladd8":
            # sublane roll by a full vreg height (8): pure register
            # renaming if Mosaic exploits it. 2 ops.
            x, y = pltpu.roll(x, 8, axis=0) + y, x
        elif kind == "vshift1":
            # ONE lane shift via VMEM round-trip: store the line, read it
            # back at lane offset 1.  Compare ITERATION RATE vs rolladd
            # (same shift+add, permute-unit spelling). 3 slab-ops nominal.
            x_ref[:, :w] = x
            x, y = x_ref[:, 1:1 + w] + y, x
        elif kind == "vshift6":
            # the taps7 pattern: ONE store amortized over SIX distinct
            # static-offset reads (the kernel computes 6 shifts of each
            # freshly built line).  13 slab-ops nominal; compare per-shift
            # cost vs roll's. If loads realign off the permute unit's
            # critical path this wins despite more nominal ops.
            x_ref[:, :w] = x
            acc = y
            for s in range(1, 7):
                acc = acc + x_ref[:, s:s + w]
            x, y = acc, x
        elif kind == "tadd":
            # transposed slab adds: lane under-utilization check (G=120
            # of 128 lanes occupied)
            x, y = x + y, x
        elif kind == "tmix":
            # the kernel blend with its rotation riding SUBLANES — the
            # direct "what would the transposed kernel achieve" figure
            r = pltpu.roll(x, 1, axis=0)
            x, y = jnp.where(x > y, (x + r) >> 1, (r & 0x00FF00FF) + y), x
        elif kind == "concat_rot":
            # the same rotation spelled as static slices + concatenate —
            # does Mosaic lower this cheaper than the roll primitive?
            x, y = jnp.concatenate([x[:, 1:], x[:, :1]], axis=1), x
        elif kind == "jroll":
            # jnp.roll spelling (sanity: should match pltpu.roll)
            x, y = jnp.roll(x, 1, axis=x.ndim - 1), x
        elif kind == "where":
            # compare+select, the finalize stage's building block —
            # 2 cost-model ops
            x, y = jnp.where(x > y, y, x), x
        elif kind == "shift_and":
            # writeback/calc building block: shift + mask + add = 3 ops
            x, y = ((x >> 1) & 0x00FF00FF) + y, x
        elif kind == "min":
            x, y = jnp.minimum(x, y), x           # 1 op
        elif kind == "mul":
            x = x * x                             # 1 op, non-foldable
        elif kind == "mix":
            # the kernel's approximate blend per cost-model weights:
            # hbox-ish rot+add, finalize-ish cmp+sel, writeback-ish
            # shift/and, predictor-ish add (7 cost-model ops/iter)
            r = pltpu.roll(x, 1, axis=x.ndim - 1)
            x, y = jnp.where(x > y, (x + r) >> 1, (r & 0x00FF00FF) + y), x
        else:
            raise ValueError(kind)
    return x + y


# cost-model ops per chain iteration (utils/cost_model.py accounting:
# where = cmp+sel = 2, shift_and = 3, mix = roll+cmp+add+shift+and+add+sel
# = 7, others = 1)
OPS_PER_ITER = {"add": 1, "roll": 1, "roll3": 1, "roll_sub": 1,
                "concat_rot": 1, "jroll": 1, "where": 2, "shift_and": 3,
                "min": 1, "mul": 1, "mix": 7,
                "troll_sub": 1, "troll3": 1, "tadd": 1, "tmix": 7,
                "rolladd": 2, "trolladd": 2, "trolladd8": 2,
                "vshift1": 3, "vshift6": 13, "rolladd2": 4, "rollvshift": 5,
                # mm arms: 1 "shift-equivalent" per iteration (one matmul
                # pass moves G*W elements, like one lane-roll of the slab);
                # mmroll = roll + add + one matmul shift-equivalent.
                "mmbf16": 1, "mmf32": 1, "mmint8": 1, "mmroll": 3,
                # step arms: 21 roll-unit-equivalents per iteration (the
                # u8 luma step's shift engine: 3 rolls x 5 packed hbox
                # slabs + 6 tap rolls); stepm replaces the 6 tap rolls
                # with int8 slab-dots of the same element count, so the
                # two arms print comparable "shift-engine Tops/s".
                # steph is the hbox-only control (15 roll-units).
                "stepv": 21, "stepm": 21, "stepmbf": 21, "steph": 15}

MM_KINDS = ("mmbf16", "mmf32", "mmint8", "mmroll")
STEP_KINDS = ("stepv", "stepm", "stepmbf", "steph")


def _mm_seed(r: int, dtype) -> jnp.ndarray:
    """Layout-native [r, 128] seed (values 0..250, exact in every probe
    dtype) — avoids a cross-lane reshape of the i32 input slab."""
    row = jax.lax.broadcasted_iota(jnp.int32, (r, 128), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (r, 128), 1)
    return ((row * 7 + col * 13) % 251).astype(dtype)


def _mm_perm(dtype) -> jnp.ndarray:
    """128x128 shift-by-one permutation matrix (the banded-matmul form of
    a lane roll restricted to one slab)."""
    row = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
    return (col == (row + 1) % 128).astype(dtype)


def _mm_chain(kind: str, k: int, x_ref, y_ref, z_ref, w_ref, m_ref):
    """k iterations of the mm-arm recurrences; returns a [G, 128] i32
    value to consume (so no chain is dead-code-eliminated)."""
    m = m_ref[...]
    z, wv = z_ref[...], w_ref[...]
    if kind == "mmroll":
        x, y = x_ref[...], y_ref[...]
        for _ in range(k):
            x, y = pltpu.roll(x, 1, axis=x.ndim - 1) + y, x
            z, wv = (
                jnp.dot(z.astype(jnp.bfloat16), m,
                        preferred_element_type=jnp.float32) + wv,
                z,
            )
        x_ref[...], y_ref[...] = x, y
        z_ref[...], w_ref[...] = z, wv
        return x[:, :128] + z[:G, :].astype(jnp.int32)
    for _ in range(k):
        if kind == "mmbf16":
            # realistic digit-pass shape: f32 accumulator state, bf16
            # inputs (the per-pass convert is part of the real cost)
            z, wv = (
                jnp.dot(z.astype(jnp.bfloat16), m,
                        preferred_element_type=jnp.float32) + wv,
                z,
            )
        elif kind == "mmf32":
            z, wv = jnp.dot(z, m, preferred_element_type=jnp.float32) + wv, z
        elif kind == "mmint8":
            acc = jnp.dot(z, m, preferred_element_type=jnp.int32)
            z, wv = (acc + wv.astype(jnp.int32)).astype(jnp.int8), z
        else:
            raise ValueError(kind)
    z_ref[...], w_ref[...] = z, wv
    return z[:G, :].astype(jnp.int32)


def _step_chain(kind: str, k: int, a_ref, b_ref, b2_ref,
                m_ref=None, out_ref=None):
    """k iterations of the kernel-step shift-engine mock.

    Every arm carries the NON-NEGOTIABLE hbox work in the REAL kernel's
    form: the sub3 rotate tree (3 dependent rolls + adds + one exact
    sub, pallas_kernel._hbox7 _HBOX_SUB3) plus the writeback shift+mask,
    on a [5, G, W] slab stack — 3-D like the kernel's own [9, B, S_pad]
    stacks, single live chain.  (Both a 2-D [5G, W] spelling AND a
    two-register Fibonacci swap on the 3-D stack crash or pathologically
    slow the Mosaic backend — tools/archive/isolate_step.py: bigslab/slab3d;
    one swap-chain roll on [5,120,2048] took 143 s to compile.  The
    real kernel's single-live-chain tree form compiles in seconds.)

    On top of the hbox chain, each arm runs the tap engine of one
    [G, W] row batch:

      stepv  — taps as 6 pltpu.rolls (the current kernel's engine)
      stepm  — taps as int8 per-slab permutation matmuls: per 128-lane
               slab one [128, 6*128] bulk dot and two [128, 3*128]
               neighbor-spill dots (the exact MAC count a real 6-shift
               MXU offload pays), assembled EXACTLY as the kernel
               would: lane-slice + mask + per-tap use
      stepmbf — same structure in bf16 (the no-int8-tiling fallback)

    The hbox chain and the tap work are INDEPENDENT — modeling the
    raw-carry-pipelined restructure where the next row's taps do not
    feed this step's smoothing.  If stepm iterates faster than stepv,
    the MXU hides the tap shifts behind the roll-bound hbox and the
    kernel offload is worth building."""
    w = b_ref.shape[-1]
    ns = w // 128
    a = a_ref[...]
    b, b2 = b_ref[...], b2_ref[...]
    if kind not in ("stepv", "steph"):
        m = m_ref[...]
    for _ in range(k):
        # hbox sub3 tree + writeback, the kernel's exact smoothing form
        # (15 roll-units per iteration on the 5-slab stack)
        hb = a + pltpu.roll(a, 1, axis=a.ndim - 1)
        hc = hb + pltpu.roll(hb, 2, axis=a.ndim - 1)
        a = ((hc + pltpu.roll(hc, 3, axis=a.ndim - 1) - a) >> 4) & 0x00FF00FF
        if kind == "steph":
            continue  # hbox-only control (15 roll-units/iter)
        if kind == "stepv":
            acc = b2
            for s in (1, 2, 3, w - 1, w - 2, w - 3):
                acc = acc + pltpu.roll(b, s, axis=1)
            b, b2 = acc & 0xFF, b
        else:
            if kind == "stepm":
                xb = b.astype(jnp.int8)   # u8 wrap; & 0xFF recovers exactly
                acc_dt = jnp.int32
            else:
                xb = b.astype(jnp.bfloat16)
                acc_dt = jnp.float32
            taps = []
            for j in range(ns):
                xj = xb[:, j * 128 : (j + 1) * 128]
                jr, jl = (j + 1) % ns, (j - 1) % ns
                xr = xb[:, jr * 128 : jr * 128 + 128]
                xl = xb[:, jl * 128 : jl * 128 + 128]
                bulk = jnp.dot(xj, m[:, :768], preferred_element_type=acc_dt)
                rc = jnp.dot(xr, m[:, 768:1152],
                             preferred_element_type=acc_dt)
                lc = jnp.dot(xl, m[:, 1152:1536],
                             preferred_element_type=acc_dt)
                taps.append(jnp.concatenate(
                    [bulk[:, :384] + rc, bulk[:, 384:] + lc], axis=-1))
            # assemble the 6 [G, w] tap arrays the way the kernel consumes
            # them: per-tap 128-lane slices concatenated across slabs
            acc = b2
            for ti in range(6):
                tap = jnp.concatenate(
                    [t[:, ti * 128 : (ti + 1) * 128] for t in taps], axis=-1)
                if kind == "stepmbf":
                    tap = tap.astype(jnp.int32)
                acc = acc + (tap & 0xFF)
            b, b2 = acc & 0xFF, b
    a_ref[...] = a
    b_ref[...], b2_ref[...] = b, b2
    return b[:, :128] + a[0, :, :128]


def _kernel(in_ref, out_ref, *scratch, kind, k):
    t = pl.program_id(0)
    transposed = kind in ("troll_sub", "troll3", "tadd", "tmix", "trolladd", "trolladd8")
    padded = kind in ("vshift1", "vshift6", "rollvshift")  # scratch is 128 lanes wider
    w = in_ref.shape[-1]

    if kind in MM_KINDS:
        if kind == "mmroll":
            x_ref, y_ref, z_ref, w_ref, m_ref = scratch
        else:
            z_ref, w_ref, m_ref = scratch
            x_ref = y_ref = None
        r = z_ref.shape[0]

        @pl.when(t == 0)
        def _():
            z_ref[...] = _mm_seed(r, z_ref.dtype)
            row = jax.lax.broadcasted_iota(jnp.int32, (r, 128), 0)
            col = jax.lax.broadcasted_iota(jnp.int32, (r, 128), 1)
            w_ref[...] = ((row * 11 + col * 5) % 241).astype(w_ref.dtype)
            m_ref[...] = _mm_perm(m_ref.dtype)
            if kind == "mmroll":
                x_ref[...] = in_ref[...].astype(jnp.int32)
                y_ref[...] = x_ref[...] ^ 0x55AA55

        out_ref[0] = _mm_chain(kind, k, x_ref, y_ref, z_ref, w_ref, m_ref)
        return

    if kind in STEP_KINDS:
        if kind in ("stepv", "steph"):
            a_ref, b_ref, b2_ref = scratch
            m_ref = None
        else:
            a_ref, b_ref, b2_ref, m_ref = scratch

        @pl.when(t == 0)
        def _():
            # Seed the 3-D slab stack from the INPUT, never from a 3-D
            # iota: broadcasted_iota on a [5, G, W] scratch feeding
            # chained rolls crashes the Mosaic backend (isolate_step.py:
            # roll2ch FAIL vs roll2chz OK — identical roll chain, the
            # only difference is the init).
            seed = in_ref[...].astype(jnp.int32) & 0xFF
            a_ref[...] = jnp.stack([seed, seed ^ 0x55, (seed >> 1) & 0xFF,
                                    seed ^ 0xA3, (seed + 17) & 0xFF])
            b_ref[...] = seed
            b2_ref[...] = (in_ref[...].astype(jnp.int32) >> 3) & 0xFF
            if m_ref is not None:
                blocks = [_mm_perm(m_ref.dtype)] * 12
                m_ref[...] = jnp.concatenate(blocks, axis=1)

        out_ref[0] = _step_chain(kind, k, a_ref, b_ref, b2_ref, m_ref)
        return

    x_ref, y_ref = scratch

    @pl.when(t == 0)
    def _():
        seed = in_ref[...].astype(jnp.int32)
        if transposed:
            seed = seed.T  # one-time; differential timing cancels it
        if padded:
            x_ref[...] = jnp.concatenate([seed, seed[:, :128]], axis=1)
            y_ref[...] = x_ref[...] ^ 0x55AA55
        else:
            x_ref[...] = seed
            y_ref[...] = seed ^ 0x55AA55

    x = _chain(kind, x_ref[:, :w] if padded else x_ref[...],
               y_ref[:, :w] if padded else y_ref[...], k,
               x_ref=x_ref)
    if padded:
        x_ref[:, :w] = x
    else:
        x_ref[...] = x
    if transposed:
        out_ref[0, :, :x.shape[1]] = x[:G, :]
    else:
        out_ref[0] = x[:, :128]


@functools.partial(jax.jit, static_argnames=("kind", "k", "w"))
def _run(src, kind: str, k: int, w: int = W):
    kern = functools.partial(_kernel, kind=kind, k=k)
    if kind in MM_KINDS:
        r = G * w // 128  # slab-view rows: G*W elements per matmul pass
        zdt = jnp.int8 if kind == "mmint8" else jnp.float32
        mdt = (jnp.int8 if kind == "mmint8"
               else jnp.float32 if kind == "mmf32" else jnp.bfloat16)
        scratches = [pltpu.VMEM((r, 128), zdt), pltpu.VMEM((r, 128), zdt),
                     pltpu.VMEM((128, 128), mdt)]
        if kind == "mmroll":
            scratches = [pltpu.VMEM((G, w), jnp.int32),
                         pltpu.VMEM((G, w), jnp.int32)] + scratches
    elif kind in STEP_KINDS:
        scratches = [pltpu.VMEM((5, G, w), jnp.int32),
                     pltpu.VMEM((G, w), jnp.int32),
                     pltpu.VMEM((G, w), jnp.int32)]
        if kind not in ("stepv", "steph"):
            mdt = jnp.int8 if kind == "stepm" else jnp.bfloat16
            scratches += [pltpu.VMEM((128, 1536), mdt)]
    else:
        scratch = ((w, G) if kind in ("troll_sub", "troll3", "tadd", "tmix", "trolladd", "trolladd8")
                   else (G, w + 128) if kind in ("vshift1", "vshift6", "rollvshift")
                   else (G, w))
        scratches = [pltpu.VMEM(scratch, jnp.int32),
                     pltpu.VMEM(scratch, jnp.int32)]
    return pl.pallas_call(
        kern,
        grid=(STEPS,),
        in_specs=[pl.BlockSpec((G, w), lambda t: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, G, 128), lambda t: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((STEPS, G, 128), jnp.int32),
        scratch_shapes=scratches,
        interpret=jax.default_backend() != "tpu",
    )(src[:, :w])


def _time(src, kind, k, iters=3, w=W):
    out = _run(src, kind, k, w)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        # checksum-forced completion (block_until_ready unreliable on axon)
        s = float(jnp.sum(_run(src, kind, k, w)[:, :, :1].astype(jnp.float32)))
        best = min(best, time.perf_counter() - t0)
        del s
    return best


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    print(f"devices: {jax.devices()}", flush=True)
    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.integers(0, 255, (G, W)), jnp.int32)

    K1, K2 = 32, 96
    nominal = 8 * 128 * 4 * 0.94e9
    print(f"slab [{G}, {W}] i32, {STEPS} steps, differential K={K1}->{K2}; "
          f"nominal v5e VPU peak {nominal/1e12:.2f} Tops/s", flush=True)
    results = {}
    kinds = ("add", "mul", "min", "roll", "shift_and", "where", "mix")
    if len(sys.argv) > 2:  # explicit arm list, e.g. the rotate-form probe;
        kinds = tuple(sys.argv[2].split(","))  # "kind@width" narrows the slab
    for arm in kinds:
        kind, _, wspec = arm.partition("@")
        w = int(wspec) if wspec else W
        # composite step arms carry 21 op-units per iteration — short
        # chains keep the unrolled Mosaic body compilable in seconds
        k1, k2 = (4, 12) if kind in STEP_KINDS else (K1, K2)
        best_rate = 0.0
        for _ in range(reps):
            try:
                t1 = _time(src, kind, k1, w=w)
                t2 = _time(src, kind, k2, w=w)
            except Exception as e:  # noqa: BLE001 — probe arms may not lower
                print(f"  {arm:10s}: DOES NOT COMPILE "
                      f"({type(e).__name__}: {str(e).splitlines()[0][:120]})",
                      flush=True)
                best_rate = -1.0
                break
            if t2 <= t1:
                continue
            elems = (k2 - k1) * OPS_PER_ITER[kind] * STEPS * G * w
            best_rate = max(best_rate, elems / (t2 - t1))
        results[arm] = best_rate
        if best_rate < 0.0:
            continue  # compile failure already reported
        if best_rate == 0.0:
            # every rep measured t(K2) <= t(K1) — contention noise, not a
            # rate; a silent 0.00 would poison the achievable denominator
            print(f"  {arm:10s}: MEASUREMENT FAILED (all {reps} reps "
                  f"non-monotonic; chip contended?) — rerun", flush=True)
            continue
        print(f"  {arm:10s}: {best_rate/1e12:6.2f} Tops/s "
              f"({best_rate/nominal*100:5.1f}% of nominal peak)", flush=True)

    mix = results.get("mix")
    if mix is None:
        return  # explicit arm list without the blend — rates only
    if mix == 0.0:
        print("\nkernel-blend 'mix' measurement FAILED; no achievable "
              "figure this run — rerun on a quieter chip.", flush=True)
        sys.exit(1)
    print(f"\nkernel-blend achievable ('mix'): {mix/1e12:.2f} Tops/s = "
          f"{mix/nominal*100:.0f}% of nominal; the cost model's "
          f"'fraction of achievable' divides by this.", flush=True)


if __name__ == "__main__":
    main()
