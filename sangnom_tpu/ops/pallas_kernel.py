"""Fused Pallas TPU kernel — the performance backend (opt=1 / auto-on-TPU).

Fuses the reference's three raster passes (prepare -> 9x smooth -> finalize,
reference src/SangNom2.cpp:259-273) into ONE kernel so the 9 error maps never
touch HBM.  The TPU grid walks kept-line pairs top to bottom — TPU grids
execute sequentially on a core, so the in-place vertical smoothing recursion
(SURVEY.md §2 quirk 1; reference src/SangNom2.cpp:129-131, 155-157) becomes
the grid dimension, with VMEM scratch carrying between steps:

  sm_ref    smoothed row b-1            raw_ref   raw error maps of row b
  pair_ref  the 14 clamped pixel taps + 4 predictor values of kept pair
            (b-1, b) — computed once per pair and reused by the NEXT step's
            finalize instead of recomputing (the reference recomputes,
            src/SangNom2.cpp:176-195; same values either way)

Per grid step t (buffer row b = t+1):

    vals       = pair_values(kept[b], kept[b+1])     # taps + predictors
    raw[b+1]   = error_maps(vals)                    # zero past the end
    sm[b]      = hbox7_clamped(sm[b-1] + raw[b] + raw[b+1]) / 16
    out[b-1]   = finalize(pair_ref, sm[b])           # previous step's vals
    carry     <- sm[b], raw[b+1], vals

The kernel is VPU-compute-bound (measured flat across batch/chunk sizes), so
the horizontal 7-tap box sum — the dominant op count, 9 maps wide — runs as
a hierarchical rotate tree on the bulk (4 rotates instead of 6 clamped
shifts) with exact edge-clamped values recomputed on one 128-lane slab per
side and merged back; bit-exactness is unchanged because only columns whose
taps never cross an edge use the bulk path.

Clamp geometry matches the reference exactly: pixel taps clamp at the plane
width w (loadPixel, reference src/SangNom2.cpp:25-34), smoothing taps clamp
at the padded buffer stride S (reference src/SangNom2.cpp:141-150).  Columns
>= S never feed back (the clamp keeps all reads below S), so the kernel
computes on a 128-lane-aligned width S_pad >= S with garbage tolerated
beyond S.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# The smoothing-width bounds are GEOMETRY facts shared by every backend
# (the parity target must not be perturbable by perf-module edits), so
# they live in core.geometry; re-exported here under the historical names
# for the perf tools/tests that import them from this module.
from sangnom_tpu.core.geometry import (
    creep_bound,  # noqa: F401  (parallel/sharding's bound, same helper)
    decay_hops as _decay_hops,  # noqa: F401
    width_tiers as _width_tiers,
)
from sangnom_tpu.ops.primitives import (
    KernelSpec,
    abs_diff,
    avg_pair,
    calc_sangnom,
    smooth_writeback,
)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _col_iota(shape):
    return jax.lax.broadcasted_iota(jnp.int32, shape, len(shape) - 1)


# Trace-time switch: pltpu.roll vs the concatenate rotate (A/B hook).
# The Mosaic roll primitive measured +2.5%/+7.6% best-of over two
# interleaved A/B runs on the headline (results/rollprim_ab_interleaved
# .txt) — it lowers to lane-aligns where the concatenate forms vreg
# copies.
_ROLL_PRIM = True


def _rot(a: jnp.ndarray, k: int) -> jnp.ndarray:
    """Circular lane rotate: out[..., x] = a[..., (x + k) mod S]."""
    kk = k % a.shape[-1]
    if kk == 0:
        return a
    if _ROLL_PRIM:
        return pltpu.roll(a, (-k) % a.shape[-1], axis=a.ndim - 1)
    return jnp.concatenate([a[..., kk:], a[..., :kk]], axis=-1)


def _clamp_edges(a: jnp.ndarray, rolled: jnp.ndarray, k: int,
                 n: int) -> jnp.ndarray:
    """Edge-clamp select over a circularly rotated copy: the vectorized
    loadPixel (reference src/SangNom2.cpp:25-34).  ``rolled`` must equal
    the circular rotate _rot(a, k) wherever the select keeps it."""
    col = _col_iota(a.shape)
    if k > 0:
        return jnp.where(col >= n - k, a[..., n - 1 : n], rolled)
    return jnp.where(col < -k, a[..., :1], rolled)


def _shift_clamped(a: jnp.ndarray, k: int, n: int) -> jnp.ndarray:
    """tap[x] = a[..., clamp(x + k, 0, n - 1)] for x < n (values for x >= n
    are bounded but unspecified).  Rotate + edge select."""
    if k == 0:
        return a
    return _clamp_edges(a, _rot(a, k), k, n)


def _taps7(a: jnp.ndarray, n: int) -> list[jnp.ndarray]:
    # NOTE: an hbox-style bulk-rotate + edge-slab variant of these clamped
    # taps was built and interleave-A/B'd on v5e in round 2: 1.8% SLOWER —
    # the merge concatenates cost more than the 12 saved compare+selects
    # (Mosaic issues selects cheaply; concatenate forces lane copies).
    # Keep the straightforward clamped form.
    return [_shift_clamped(a, k, n) for k in range(-3, 4)]


# Trace-time switch: the per-step tap shifts ride the MXU as int8
# permutation matmuls instead of the permute unit (A/B hook, round 3).
# Rationale: the kernel is ROLL-bound and the permute unit is
# throughput-bound with no second shift datapath on the VPU side
# (results/coissue_probe_r03.txt) — but int8 permutation matmuls move
# lanes at 3.5x the roll rate (mmint8 1.94 vs roll 0.56 Tops/s
# element-rate) and the MXU co-issues ~55% free next to a roll chain
# (mmroll arm, results/mxu_probe_r03.txt).  The step-shaped mock probe
# could not answer the net question (Mosaic crashes on the probe's
# scratch/init structure, results/mxu_step_probe_r03.txt), so the A/B
# lives here in the production kernel.  u8 formats only (values 0..255
# survive the int8 wrap; & 0xFF after the i32-accumulated dot recovers
# them exactly).
_TAPS_MXU = False

# Tap order inside the matmul matrix: in-slab blocks 0..5, then the
# right-neighbor spill blocks for the positive shifts, then the
# left-neighbor spill blocks for the negative ones.
_MXU_TAP_SHIFTS = (1, 2, 3, -1, -2, -3)


def _mxu_taps_on(spec: KernelSpec) -> bool:
    return _TAPS_MXU and not spec.is_float and spec.mask == 0xFF


def _taps_mm_matrix() -> jnp.ndarray:
    """[128, 1536] int8 shift-permutation matrix: for each tap shift s in
    _MXU_TAP_SHIFTS an in-slab banded block (out[c] = in[c+s] where c+s
    stays inside the 128-lane slab), then the neighbor-spill blocks
    (rows of the adjacent slab that cross the boundary).  Exactly one 1
    per output column across (in-slab + spill), so the i32-accumulated
    int8 dot reproduces the lane value bit-for-bit modulo 256."""
    row = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
    blocks = [(row == col + s).astype(jnp.int8) for s in _MXU_TAP_SHIFTS]
    blocks += [(row + 128 == col + s).astype(jnp.int8) for s in (1, 2, 3)]
    blocks += [(row == col + s + 128).astype(jnp.int8) for s in (-1, -2, -3)]
    return jnp.concatenate(blocks, axis=1)


def _taps7_mxu(a: jnp.ndarray, n: int, m: jnp.ndarray) -> list[jnp.ndarray]:
    """`_taps7` with the six lane shifts computed on the MXU (see
    _TAPS_MXU).  Per 128-lane slab: one [128, 768] in-slab dot plus two
    [128, 384] neighbor-spill dots; modular neighbor indexing makes the
    assembled value exactly the circular rotate _rot(a, s), and the same
    `_clamp_edges` select as the roll path finishes the loadPixel
    semantics — bit-exact by construction."""
    W = a.shape[-1]
    ns = W // 128
    x8 = a.astype(jnp.int8)  # u8 wraps into int8; & 0xFF recovers exactly
    outs = []
    for j in range(ns):
        jr, jl = (j + 1) % ns, (j - 1) % ns
        bulk = jnp.dot(x8[..., j * 128 : (j + 1) * 128], m[:, :768],
                       preferred_element_type=jnp.int32)
        rc = jnp.dot(x8[..., jr * 128 : jr * 128 + 128], m[:, 768:1152],
                     preferred_element_type=jnp.int32)
        lc = jnp.dot(x8[..., jl * 128 : jl * 128 + 128], m[:, 1152:1536],
                     preferred_element_type=jnp.int32)
        outs.append(jnp.concatenate(
            [bulk[..., :384] + rc, bulk[..., 384:] + lc], axis=-1))
    taps = {0: a}
    for ti, s in enumerate(_MXU_TAP_SHIFTS):
        rolled = jnp.concatenate(
            [o[..., ti * 128 : (ti + 1) * 128] for o in outs], axis=-1
        ) & 0xFF
        taps[s] = _clamp_edges(a, rolled, s, n)
    return [taps[k] for k in range(-3, 4)]


def _hbox7_exact(line: jnp.ndarray, S: int) -> jnp.ndarray:
    """Reference-exact 7-tap box sum, taps clamped at S."""
    t = _taps7(line, S)
    s = t[0]
    for tp in t[1:]:
        s = s + tp
    return s


# Trace-time switch: hierarchical rotate tree + edge-slab merge vs the
# fully clamped 6-roll form (A/B hook; exact form measured -15.3%,
# results/hboxexact_ab_interleaved.txt).
_HBOX_TREE = True
# Edge-merge strategy for the tree: "concat" merges the edge slabs into
# the value with a 4-part concatenate; "refstore" stores the bulk to
# sm_ref and overwrites two aligned 128-lane slabs in place (A/B hook;
# jax.lax.dynamic_update_slice has no Mosaic lowering, ref slice-stores
# are the TPU-native form of the same fixup).
_HBOX_MERGE = "concat"


# A/B hook: the rolled f32 hbox below was BUILT AND REJECTED on hardware
# (round 3, -4.6% interleaved A/B at 540p YUV444PS,
# results/floathbox_ab_interleaved.txt): dropping the 6 clamp selects
# per slab costs MORE in the 4-part edge-merge concatenate — the same
# lesson as the round-2 bulk-rotate tap rejection (concats force lane
# copies; Mosaic issues selects cheaply).
_FLOAT_HBOX_ROLLED = False

# A/B hook: leading-pair roll reuse for the f32 hbox (round 3).  The
# reference's left-to-right 7-tap order starts with (t-3 + t-2); that
# exact fp add is computable ONCE as p[x] = line[x] + line[clamp(x+1)]
# and rotated into place (lead = rot(p, -3)), and p's clamped +1 tap IS
# tap t+1, reused later in the chain — 5 rolls + 5 selects per slab
# instead of 6 + 6, with NO edge-slab concatenate (the failure mode of
# _FLOAT_HBOX_ROLLED) and the fp association unchanged operation-for-
# operation.  The float kernel runs 9 unpacked slabs, so this cuts ~1/6
# of the dominant-stage rolls on the roll-bound kernel.  Default ON:
# the hardware interleaved A/B (tools/archive/ab_floatpair.py, 8 rotating-order
# trials at cfg5f with the float weave on) measured +7.9% bit-identical
# (results/floatpair_ab_r03.txt).  The -4.6% _FLOAT_HBOX_ROLLED
# rejection was the cautionary tale for "obviously fewer ops" float
# hbox variants — this one has no concat merge (the rolled form's
# failure mode), and the chip confirmed it.
_FLOAT_HBOX_PAIR = True


def _hbox7_float_pair(line: jnp.ndarray, S: int) -> jnp.ndarray:
    """f32 7-tap box sum, leading-pair roll reuse (see _FLOAT_HBOX_PAIR).

    Operation-identical to `_hbox7_exact`: every column sums the same
    clamped tap VALUES in the same left-to-right order — only the
    (t-3 + t-2) partial sum is computed at shift 0 and rotated, instead
    of rotating both operands first."""
    t_p1 = _shift_clamped(line, 1, S)      # tap +1, also p's second term
    p = line + t_p1                        # p[x] = line[x] + line[clamp(x+1)]
    col = _col_iota(line.shape)
    edge2 = line[..., :1] + line[..., :1]  # t-3 + t-2 == 2*line[0] at x < 3
    lead = jnp.where(col < 3, edge2, _rot(p, -3))
    s = lead + _shift_clamped(line, -1, S)
    s = s + line
    s = s + t_p1
    s = s + _shift_clamped(line, 2, S)
    return s + _shift_clamped(line, 3, S)

# Trace-time switch: 3-roll cumulative-sum integer hbox bulk vs the
# 4-roll rotate tree (A/B hook).  b covers taps {0,1}, c covers {0..3},
# and c[x] + c[x-3] double-counts only tap 0, which one exact integer
# subtraction removes — one fewer roll on the DOMINANT smoothing slabs
# (the kernel is ROLL-bound: rolls issue at ~1/13 the add rate,
# tools/calibrate_vpu.py).  Wrap contamination stays within 3 lanes per
# side (b: 1, c: 3, rot(c,-3): 3 at the left), so the edge-slab merge
# boundaries are IDENTICAL to the tree's.  Integer-only: the form
# reassociates and uses subtraction (exact in wrap arithmetic; per-field
# exact for the packed path since every field of c+d >= the field of
# line, so no cross-field borrow).
_HBOX_SUB3 = True


def _hbox7_float_rolled(line: jnp.ndarray, S: int) -> jnp.ndarray:
    """f32 7-tap box sum, association-preserving rolled bulk.

    The reference's left-to-right tap ORDER is retained (t-3 + t-2 + t-1 +
    x + t+1 + t+2 + t+3 — fp addition is not associative and the result
    feeds an exact-equality min-select), but the bulk taps are PURE
    circular rolls: only the 3 edge columns per side (plus wrap-
    contaminated lanes, which coincide) see different tap VALUES, and
    those columns are recomputed exactly on one 128-lane slab per side
    and merged — dropping the 6 compare+select clamp pairs per slab from
    the bulk (the f32 analogue of the integer rotate tree's edge-slab
    merge; the tree itself is unavailable to f32 because it reassociates).
    Bit-exact (tests/test_pallas.py) but measured SLOWER — see
    _FLOAT_HBOX_ROLLED above.
    """
    taps = [_rot(line, k) for k in (-3, -2, -1)]
    bulk = taps[0] + taps[1] + taps[2] + line
    for k in (1, 2, 3):
        bulk = bulk + _rot(line, k)
    left = _hbox7_exact(line[..., :128], 128)
    right = _hbox7_exact(line[..., S - 128 : S], 128)
    S_pad = line.shape[-1]
    parts = [left[..., :3], bulk[..., 3 : S - 3], right[..., -3:]]
    if S_pad > S:
        parts.append(bulk[..., S:])  # cols >= S: unspecified, never read
    return jnp.concatenate(parts, axis=-1)


def _hbox7(line: jnp.ndarray, S: int, S_pad: int,
           is_float: bool = False) -> jnp.ndarray:
    """7-tap box sum with clamp-at-S semantics for all columns < S.

    Bulk: hierarchical rotate tree (a = rot(-1)+id+rot(+1); h = rot(a,-2) +
    line + rot(a,+2)) — pure circular rotates, no edge selects.  Only the 3
    columns at each boundary (and wrap-contaminated lanes, which coincide)
    differ from the clamped semantics; those are recomputed exactly on a
    128-lane slab per side and merged.  Falls back to the fully clamped
    form for narrow planes where the slabs would overlap.  Float cannot
    use the TREE (it changes fp32 summation association vs the reference's
    left-to-right order — integer addition is associative, fp is not,
    and the result feeds an exact-equality min-select) but keeps the
    rolled-bulk + edge-slab form in the reference's tap order
    (_hbox7_float_rolled)."""
    if is_float and _FLOAT_HBOX_PAIR:
        return _hbox7_float_pair(line, S)  # clamped: no slab-width bound
    if S_pad < 384 or not _HBOX_TREE:
        return _hbox7_exact(line, S)
    if is_float:
        if _FLOAT_HBOX_ROLLED:
            return _hbox7_float_rolled(line, S)
        return _hbox7_exact(line, S)

    if _HBOX_SUB3:
        b = line + _rot(line, 1)
        c = b + _rot(b, 2)              # taps {0..3}
        bulk = c + _rot(c, -3) - line   # {-3..0} + {0..3}, tap 0 removed
    else:
        a = _rot(line, -1) + line + _rot(line, 1)
        bulk = _rot(a, -2) + line + _rot(a, 2)

    # exact left edge: columns 0..2 depend on line[0..5] only
    left = _hbox7_exact(line[..., :128], 128)
    # exact right edge: columns S-3..S-1 depend on line[S-7..S-1]; the slab's
    # right boundary IS the global clamp boundary S
    right = _hbox7_exact(line[..., S - 128 : S], 128)

    mid = bulk[..., 3 : S - 3]
    parts = [left[..., :3], mid, right[..., -3:]]
    if S_pad > S:
        parts.append(bulk[..., S:])  # cols >= S: unspecified, never read back
    return jnp.concatenate(parts, axis=-1)


# pair_values layout inside the [18, B, S_pad] carry:
#   0..6   curr taps  -3..+3        7..13  next taps  -3..+3
#   14/15  fwd1/fwd2               16/17  bwd1/bwd2
def _pair_values(c, n, spec: KernelSpec, w: int) -> list[jnp.ndarray]:
    """The 14 clamped neighborhood taps and 4 directional predictors of one
    kept-line pair (reference src/SangNom2.cpp:87-106)."""
    ct = _taps7(c, w)
    nt = _taps7(n, w)
    fwd1 = calc_sangnom(ct[2], ct[3], ct[4], spec)
    fwd2 = calc_sangnom(nt[4], nt[3], nt[2], spec)
    bwd1 = calc_sangnom(ct[4], ct[3], ct[2], spec)
    bwd2 = calc_sangnom(nt[2], nt[3], nt[4], spec)
    return ct + nt + [fwd1, fwd2, bwd1, bwd2]


def _error_maps(v: list[jnp.ndarray], spec: KernelSpec, w: int,
                S_pad: int) -> jnp.ndarray:
    """9 raw error maps from pair values; [9, B, S_pad] with columns >= w
    zeroed (the zero-defined padding contract, SURVEY.md §2 quirk 2).  Map
    order is spatial priority (reference enum Buffers, src/SangNom2.h:8-20;
    stores at src/SangNom2.cpp:103-117)."""
    (cm3, cm2, cm1, c0, cp1, cp2, cp3,
     nm3, nm2, nm1, n0, np1, np2, np3,
     fwd1, fwd2, bwd1, bwd2) = v
    maps = jnp.stack(
        [
            abs_diff(cm3, np3),
            abs_diff(cm2, np2),
            abs_diff(cm1, np1),
            abs_diff(fwd1, fwd2),
            abs_diff(c0, n0),
            abs_diff(bwd1, bwd2),
            abs_diff(cp1, nm1),
            abs_diff(cp2, nm2),
            abs_diff(cp3, nm3),
        ]
    )
    if w == S_pad:
        return maps  # no padding columns to zero
    zero = jnp.zeros((), maps.dtype)
    return jnp.where(_col_iota(maps.shape) < w, maps, zero)


# Two u8 error maps share one i32 lane through the smoothing stage (C
# numerics only): every smoothing intermediate of a u8 map fits 16 bits
# (map values are bounded by the STORAGE mask M = 0xFF; vertical 3-sum
# <= 3*255 = 765, worst hbox intermediate is the _HBOX_SUB3 bulk
# c + rot(c, -3) <= 8*765 = 6120), so maps i and i+5 ride one slab as
# (map_i << 16) | map_(i+5) and the vertical adds + hbox rotate tree —
# the measured binding op count (compare results/decay_ab_interleaved.txt,
# a smoothing-stage cut that paid ~1:1, with
# results/rowcarry_ab_interleaved.txt, a prepare-stage cut that paid
# nothing) — run on 5 slabs instead of 9.  Fields never interact: sums
# stay < 2^16 per field, and the packed writeback (h >> 4) & 0x00FF00FF
# wraps each field to u8 exactly like the scalar (sum >> 4) & 0xFF (bits
# 4..11 of each field are untouched by the other's).
#
# u8-ONLY, and not just for 16-bit data: a "pack 10/12-bit too" variant
# was analyzed and closed (round 3).  The bound that matters is the
# STORAGE mask, not the nominal depth — the reference templates on
# ComponentSize alone (src/SangNom2.cpp:314-318), so every >8-bit format
# wraps at 0xFFFF, and the wrapped predictor (4*p1 + 5*p2 - p3) >> 3 &
# 0xFFFF reaches 65534 from in-range 10-bit pixels (p1 = p2 = 0, p3 = 9
# gives s = -9 -> 65534; verified against tests/scalar_model._calc_int),
# putting map values 3/5 at ~2^16 and overflowing a 16-bit field at the
# first vertical sum for ANY input range.  The SSE2-numerics saturating
# writeback is per-field nonlinear — it keeps the unpacked path too.
def _packed_smoothing(spec: KernelSpec) -> bool:
    return not spec.is_float and not spec.sse2 and spec.mask == 0xFF


def _pack_maps(m: jnp.ndarray) -> jnp.ndarray:
    """[9, ...] raw error maps -> [5, ...] packed slabs."""
    return jnp.concatenate([(m[0:4] << 16) | m[5:9], m[4:5]], axis=0)


def _unpack_sm(sm_p: jnp.ndarray) -> list[jnp.ndarray]:
    """[5, ...] packed smoothed slabs -> the 9 maps (writeback already
    masked each field to the pixel range, so plain shift/mask extracts)."""
    hi = sm_p[0:4] >> 16
    lo = sm_p[0:4] & 0xFFFF
    return [hi[0], hi[1], hi[2], hi[3], sm_p[4],
            lo[0], lo[1], lo[2], lo[3]]


def _finalize(v, sm, aaf, spec: KernelSpec) -> jnp.ndarray:
    """Min-error priority select for one output row (reference
    src/SangNom2.cpp:161-257); reverse-order masked overwrites realize the
    if-chain priority exactly (same trick as the reference's SIMD path,
    src/SangNom2_SSE2.cpp:1032-1058)."""
    (cm3, cm2, cm1, c0, cp1, cp2, cp3,
     nm3, nm2, nm1, n0, np1, np2, np3,
     fwd1, fwd2, bwd1, bwd2) = v
    # 9-way min as an elementwise tree (Mosaic has no int16 axis-reduce)
    mn = sm[0]
    for i in range(1, 9):
        mn = jnp.minimum(mn, sm[i])
    # Select the two average OPERANDS through the priority chain and average
    # once at the end — the average is a pure function of its operands, so
    # this is value-identical to selecting among nine precomputed averages
    # but does half the arithmetic.
    a, b = cm3, np3
    for idx, xa, xb in (
        (8, cp3, nm3),
        (1, cm2, np2),
        (7, cp2, nm2),
        (2, cm1, np1),
        (6, cp1, nm1),
        (3, fwd1, fwd2),
        (5, bwd1, bwd2),
    ):
        hit = sm[idx] == mn
        a = jnp.where(hit, xa, a)
        b = jnp.where(hit, xb, b)
    aaf_c = jnp.asarray(aaf, c0.dtype)
    vert = (sm[4] == mn) | (mn > aaf_c)
    a = jnp.where(vert, c0, a)
    b = jnp.where(vert, n0, b)
    return avg_pair(a, b, spec)


def _kernel(k0_ref, k1_ref, k2_ref, out_ref, sm_ref, raw_ref, pair_ref,
            prev_ref=None, off_ref=None, mm_ref=None, *, spec, w, W_act,
            W_sm, S_clamp, n_steps, aaf, weave_offset=None):
    t = pl.program_id(0)
    # rows stream in the narrow STORAGE dtype (u8/u16/f32) and widen to the
    # accumulator inside VMEM — 4x less DMA for 8-bit planes
    acc = spec.acc_dtype
    k2 = k2_ref[0].astype(acc)

    packed = _packed_smoothing(spec)

    def raw_of(v):
        # raw maps live on the ACTIVE width; zero-extend to the smoothing
        # width (columns beyond are zero-defined padding anyway)
        m = _error_maps(v, spec, w, W_act)
        if packed:
            m = _pack_maps(m)
        if W_sm > W_act:
            m = jnp.concatenate(
                [m, jnp.zeros(m.shape[:-1] + (W_sm - W_act,), m.dtype)],
                axis=-1,
            )
        return m

    @pl.when(t == 0)
    def _():
        # buffer row 0 is zero-defined; raw[1] comes from kept pair (0, 1),
        # whose taps/predictors seed the pair carry for this step's finalize
        v01 = _pair_values(k0_ref[0].astype(acc), k1_ref[0].astype(acc),
                           spec, w)
        pair_ref[...] = jnp.stack(v01)
        raw_ref[...] = raw_of(v01)
        sm_ref[...] = jnp.zeros(sm_ref.shape, sm_ref.dtype)
        if mm_ref is not None:
            mm_ref[...] = _taps_mm_matrix()

    # pair (b-1, b) values, computed by the previous step (or above at t=0)
    pv = [pair_ref[i] for i in range(18)]

    # pair (b, b+1): row b's half is ALREADY in the carry — pv's `next`
    # taps are its taps, and a row's mirror-tap predictors swap roles when
    # it turns from `next` into `curr` (fwd1_new = bwd2_old, bwd1_new =
    # fwd2_old; reference src/SangNom2.cpp:103-106 computes calc() on
    # mirrored tap triples) — so only row b+1's 7 taps and 2 predictors
    # are new work (measured +4.6%: results/pairreuse_ab_interleaved.txt).
    nt = _taps7(k2, w) if mm_ref is None else _taps7_mxu(k2, w, mm_ref[...])
    v12 = pv[7:14] + nt + [
        pv[17], calc_sangnom(nt[4], nt[3], nt[2], spec),
        pv[15], calc_sangnom(nt[2], nt[3], nt[4], spec),
    ]
    raw_next = raw_of(v12)
    # past the last pair, raw[bufH] is the zero-defined row
    raw_next = jnp.where(t < n_steps - 1, raw_next, jnp.zeros((), raw_next.dtype))

    # recursive smoothing step (reference src/SangNom2.cpp:126-159): the
    # vertical 3-sum uses the ALREADY-SMOOTHED previous row from scratch
    line = sm_ref[...] + raw_ref[...] + raw_next
    if packed:
        wb = lambda x: jnp.right_shift(x, 4) & 0x00FF00FF  # noqa: E731
    else:
        wb = lambda x: smooth_writeback(x, spec)  # noqa: E731
    refstore = (_HBOX_MERGE == "refstore" and not spec.is_float
                and W_sm >= 384 and S_clamp % 128 == 0 and S_clamp >= 256)
    if refstore:
        # rotate tree on the bulk, with the two edge slabs fixed up by
        # aligned 128-lane slice-STORES into sm_ref instead of a 4-part
        # value concatenate; the merged row is re-read for finalize
        a_ = _rot(line, -1) + line + _rot(line, 1)
        bulk = _rot(a_, -2) + line + _rot(a_, 2)
        left = _hbox7_exact(line[..., :128], 128)
        right = _hbox7_exact(line[..., S_clamp - 128 : S_clamp], 128)
        col = _col_iota(left.shape)
        sm_bulk = wb(bulk)
        sm_ref[...] = sm_bulk
        sm_ref[:, :, 0:128] = jnp.where(col < 3, wb(left),
                                        sm_bulk[..., :128])
        sm_ref[:, :, S_clamp - 128 : S_clamp] = jnp.where(
            col >= 125, wb(right), sm_bulk[..., S_clamp - 128 : S_clamp]
        )
        smv = sm_ref[:, :, 0:W_act]
    else:
        sm = wb(_hbox7(line, S_clamp, W_sm, spec.is_float))
        sm_ref[...] = sm
        smv = sm[..., :W_act]
    if packed:
        sm9 = _unpack_sm(smv)
    else:
        sm9 = [smv[i] for i in range(9)]

    # finalize values are already wrapped to the storage range; the cast
    # back to the narrow dtype is value-preserving
    res = _finalize(pv, sm9, aaf, spec).astype(out_ref.dtype)
    if weave_offset is None:
        out_ref[0] = res
    else:
        # in-kernel weave: each step emits output rows {2t, 2t+1} of the
        # final interleaved plane (kept rows are already in VMEM as inputs
        # — writing them here replaces a whole-plane XLA interleave pass).
        # The grid runs ONE extra step (t == n_steps) for the tail rows;
        # its finalize result is discarded via the selects below.
        k0_raw = k0_ref[0]  # kept row t, STORAGE dtype (pre-widening)
        if weave_offset == "pf":
            # PER-FRAME offsets, read as data ([g] lanes of off_ref): the
            # interpolated rows are offset-independent — only the output
            # row placement differs — so one kernel serves a mixed-parity
            # batch (true bob's alternation) at two extra lane-broadcast
            # selects per step.  Both placements below are exactly the
            # static offset==0 / offset==1 emissions.
            off0 = off_ref[:, 0:1] == 0  # [g, 1], broadcasts over lanes
            out_ref[0] = jnp.where(off0 | (t == 0), k0_raw, prev_ref[...])
            out_ref[1] = jnp.where(off0 & (t < n_steps), res, k0_raw)
            prev_ref[...] = res
        elif weave_offset == 0:
            # rows {2t, 2t+1} = (kept[t], interp[t]); tail rows
            # {2n, 2n+1} = (kept[bufH-1], duplicate) — boundary line
            # duplication per reference src/SangNom2.cpp:381-385
            out_ref[0] = k0_raw
            out_ref[1] = jnp.where(t < n_steps, res, k0_raw)
        else:
            # rows {2t, 2t+1} = (interp[t-1], kept[t]); row 0 duplicates
            # kept[0] (reference src/SangNom2.cpp:386-391).  interp rows
            # are emitted one step LATE, carried in prev_ref scratch.
            out_ref[0] = jnp.where(t == 0, k0_raw, prev_ref[...])
            out_ref[1] = k0_raw
            prev_ref[...] = res
    raw_ref[...] = raw_next
    pair_ref[...] = jnp.stack(v12)


_VMEM_LIMIT_BYTES = 64 * 1024 * 1024
# k1 (the second kept row) is read at t==0 only; a CONSTANT BlockSpec
# index map lets the Pallas pipeline skip its re-fetch on every later
# step (the moving-index form re-DMAs one row block per step).  A/B hook.
_K1_CONST = True
# Chunk-cap A/B hook (frames per kernel invocation; budget still binds).
# 256 lets the narrow chroma planes run the fused-UV batch as ONE chunk
# (240 frames at the B=120 headline): +4.2% interleaved A/B vs 128,
# results/cap256_ab_interleaved.txt; wide planes stay budget-bound.
_CHUNK_CAP = 256


def _kernel_batch(W_sm: int, W_act: int, spec: KernelSpec) -> int:
    """Frames per kernel invocation.

    Bigger chunks amortize per-grid-step cost (measured ~5% from 8 -> 64 at
    1080p in round 1; +2.7% from 48 -> 96 at B=96, and +2.9% from the
    UV-fused chroma batch running 1x128 instead of 2x64, both round-2
    interleaved A/Bs — results/chunkcap_ab_interleaved.txt); the budget
    keeps the persistent VMEM carries (sm+raw at [n_sm, g, W_sm], pair at
    [18, g, W_act]; n_sm = 5 when the packed u8 smoothing applies) plus
    kernel-body temporaries inside the scoped-VMEM window.  u8 1080p luma
    reaches g=128, the fused-UV chroma batch g=240+ (both verified
    compiling + running on hardware); wider planes scale down (u8 4K: 64)
    and clamp to the 8-sublane tile.
    """
    n_sm = 5 if _packed_smoothing(spec) else 9
    per_frame = 4 * (2 * n_sm * W_sm + 18 * W_act)  # sm+raw / pair carries
    return _batch_clamp(per_frame)


def _batch_clamp(per_frame_bytes: int) -> int:
    """Shared frame-batch clamp: 28 MiB persistent-carry budget within the
    64 MiB scoped-VMEM window, the _CHUNK_CAP A/B hook (read at call time
    so cap sweeps hit every path), 8-sublane rounding.  Used by
    _kernel_batch above and the sharded analogues in
    parallel/fused_smooth so a cap/budget sweep cannot silently measure a
    stale sharded arm."""
    g = (28 * 1024 * 1024) // per_frame_bytes
    return int(max(8, min(_CHUNK_CAP, (g // 8) * 8)))




def interpolate_field_batch(
    kept: jnp.ndarray, aaf, spec: KernelSpec, stride: int,
    plane_width: int | None = None,
) -> jnp.ndarray:
    """[N, bufH, w] kept field (STORAGE dtype) -> [N, bufH-1, w] interpolated
    lines in the same dtype; widening happens inside the kernel.
    ``plane_width`` exists for interface parity with the sharded backend
    (unsharded: array width == plane width).

    Batches larger than the VMEM budget run in fixed-size chunks via
    `lax.map` (sequential on the chip — the kernel is serial per core
    anyway; cross-chip scaling shards frames, see sangnom_tpu.parallel).
    All layout work (pad, transpose) is hoisted OUT of the map body as a
    few whole-batch XLA ops, so the map iterations are pure kernel
    launches with no serialized per-chunk glue.
    """
    B, bufH, w = kept.shape
    if bufH < 2:
        return jnp.zeros((B, 0, w), kept.dtype)
    W_act, W_sm, S_clamp = _width_tiers(w, bufH, stride, spec)
    # Balance chunk size across the minimum number of chunks, so padding
    # stays under one sublane tile per chunk (a flat g=64 would pad a
    # 65-frame batch to 128 — ~2x wasted work).
    n_chunks = -(-B // _kernel_batch(W_sm, W_act, spec))
    per_chunk = -(-B // n_chunks)
    g = min(B, _round_up(per_chunk, 8))
    n_steps = bufH - 1

    pad = (-B) % g
    G = (B + pad) // g
    # one zero row below (raw[bufH] operand), zero columns out to W_act,
    # frames padded to a whole number of chunks
    kp = jnp.pad(kept, ((0, pad), (0, 1), (0, W_act - w)))
    # [G, bufH+1, g, W_act]: row-major chunk layout in one big transpose.
    # (Reading the frame-major layout directly via [g, 1, W] blocks is NOT
    # possible: Mosaic requires the last two block dims to be multiples of
    # (8, 128) or equal to the array dims — a 1-row block is rejected at
    # lowering, so the host-side transpose to row-major is load-bearing.)
    kp = jnp.moveaxis(kp.reshape(G, g, bufH + 1, W_act), 2, 1)

    run = functools.partial(
        _interp_chunk, aaf=aaf, spec=spec, g=g, n_steps=n_steps, w=w,
        W_act=W_act, W_sm=W_sm, S_clamp=S_clamp,
    )
    if G == 1:
        out = run(kp[0])[None]
    else:
        out = jax.lax.map(run, kp)  # [G, n_steps, g, W_act]
    out = jnp.moveaxis(out, 2, 1).reshape(G * g, n_steps, W_act)
    return out[:B, :, :w]


def _interp_chunk(keptp, *, aaf, spec, g, n_steps, w, W_act, W_sm, S_clamp):
    """keptp: [bufH+1, g, W_act] row-major chunk -> [n_steps, g, W_act].

    Row-major layout: blocks of one full [g, W] row slab satisfy the TPU
    (sublane, lane) tiling rule for any g, and the sequential row walk is
    the leading (grid) dimension.
    """
    body = functools.partial(
        _kernel, spec=spec, w=w, W_act=W_act, W_sm=W_sm, S_clamp=S_clamp,
        n_steps=n_steps, aaf=aaf,
    )
    use_mm = _mxu_taps_on(spec)
    if use_mm:
        def kernel(k0, k1, k2, out, sm, raw, pair, mm):
            body(k0, k1, k2, out, sm, raw, pair, mm_ref=mm)
    else:
        kernel = body
    row_view = lambda o: pl.BlockSpec(  # noqa: E731
        (1, g, W_act), lambda t, o=o: (t + o, 0, 0),
        memory_space=pltpu.VMEM,
    )
    k1_view = (
        pl.BlockSpec((1, g, W_act), lambda t: (1, 0, 0),
                     memory_space=pltpu.VMEM)
        if _K1_CONST else row_view(1)
    )
    out_spec = pl.BlockSpec(
        (1, g, W_act), lambda t: (t, 0, 0), memory_space=pltpu.VMEM
    )
    out_shape = jax.ShapeDtypeStruct((n_steps, g, W_act), keptp.dtype)
    scratch = [
        # smoothed row b-1 and raw row b (5 packed slabs for u8-C)
        pltpu.VMEM((5 if _packed_smoothing(spec) else 9, g, W_sm),
                   spec.acc_dtype),
        pltpu.VMEM((5 if _packed_smoothing(spec) else 9, g, W_sm),
                   spec.acc_dtype),
        pltpu.VMEM((18, g, W_act), spec.acc_dtype),  # pair taps/preds
    ]
    if use_mm:
        scratch.append(pltpu.VMEM((128, 1536), jnp.int8))  # tap perm matrix
    return pl.pallas_call(
        kernel,
        grid=(n_steps,),
        in_specs=[row_view(0), k1_view, row_view(2)],
        out_specs=out_spec,
        out_shape=out_shape,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT_BYTES
        ),
        interpret=jax.default_backend() != "tpu",
    )(keptp, keptp, keptp)


def interpolate_field(kept: jnp.ndarray, aaf, spec: KernelSpec, stride: int):
    """Single-frame convenience wrapper."""
    return interpolate_field_batch(kept[None], aaf, spec, stride)[0]


def deinterlace_field_batch_fused(
    kept: jnp.ndarray, offset, aaf, spec: KernelSpec, stride: int,
    interlaced_tff: bool | None = None,
) -> jnp.ndarray:
    """In-kernel weave: [N, bufH, w] kept field -> the COMPLETE deinterlaced
    plane [N, 2*bufH, w], kept/interpolated rows interleaved per ``offset``
    with the boundary line duplicated — no XLA-side interleave pass (which
    measures ~17% of the headline pipeline).

    ``offset`` is a static int (0/1: the output row layout is baked into
    the kernel) or a per-frame [N] array — the per-frame form reads the
    offsets as data inside the kernel (two lane-broadcast selects per
    step), serving order=0 mixed-parity batches (true bob's deterministic
    alternation, reference src/SangNom2.cpp:336-341) without the XLA
    weave, the frame gathers (~4x, rejected round 2), or the strided
    even/odd split (tied at best, results/altsplit_ab_interleaved.txt).

    ``interlaced_tff`` non-None: ``kept`` is an INTERLACED [N, 2*bufH, w]
    plane and output frame 2j+b weaves field b of input frame j (the bob
    pipeline).  The row index 2r+b factors as [r, b], so the field split
    is absorbed into this wrapper's chunk transpose as one fused relayout
    — a materialized SeparateFields copy measured ~11% of true bob at
    1080p.  The bool is the field dominance (True: b=0 is the first/top
    field).
    """
    per_frame_off = not isinstance(offset, int)
    if interlaced_tff is None:
        B, bufH, w = kept.shape
    else:
        n_in, H, w = kept.shape
        B, bufH = 2 * n_in, H // 2
    W_act, W_sm, S_clamp = _width_tiers(w, bufH, stride, spec)
    n_chunks = -(-B // _kernel_batch(W_sm, W_act, spec))
    per_chunk = -(-B // n_chunks)
    g = min(B, _round_up(per_chunk, 8))
    n_steps = bufH - 1

    pad = (-B) % g
    G = (B + pad) // g
    # TWO zero rows below: the weave grid runs one extra step whose pair
    # views reach kept rows bufH and bufH+1
    if interlaced_tff is None:
        kp = jnp.pad(kept, ((0, pad), (0, 2), (0, W_act - w)))
        kp = jnp.moveaxis(kp.reshape(G, g, bufH + 2, W_act), 2, 1)
    else:
        # B and g are even (B = 2*n_in; g is 8-aligned or == B), so the
        # frame pad is pad//2 input frames; chunk c's field f is input
        # frame c*(g//2) + f//2, field bit b = f & 1 (flipped for
        # bottom-field-first).  FOUR zero rows on the interlaced array =
        # two zero rows below each field in the [r, b] factorization.
        kp = jnp.pad(kept, ((0, pad // 2), (0, 4), (0, W_act - w)))
        kp = kp.reshape(G, g // 2, bufH + 2, 2, W_act)
        if not interlaced_tff:
            kp = kp[:, :, :, ::-1]
        # [G, g//2, bufH+2, 2, W] -> [G, bufH+2, g//2, 2, W] -> merge fields
        kp = jnp.moveaxis(kp, 2, 1).reshape(G, bufH + 2, g, W_act)

    run = functools.partial(
        _deint_chunk, offset="pf" if per_frame_off else offset, aaf=aaf,
        spec=spec, g=g, n_steps=n_steps, w=w, W_act=W_act, W_sm=W_sm,
        S_clamp=S_clamp,
    )
    if per_frame_off:
        # [G, g, 128] i32 lane-broadcast chunks (a (g, 128) block is the
        # smallest Mosaic-tileable shape; ~60 KiB at g=120, fetched once
        # per grid step)
        offp = jnp.pad(jnp.asarray(offset, jnp.int32), (0, pad))
        offp = jnp.broadcast_to(offp[:, None], (B + pad, 128))
        offp = offp.reshape(G, g, 128)
        if G == 1:
            out = run((kp[0], offp[0]))[None]
        else:
            out = jax.lax.map(run, (kp, offp))
    elif G == 1:
        out = run(kp[0])[None]
    else:
        out = jax.lax.map(run, kp)  # [G, 2*bufH, g, W_act]
    out = jnp.moveaxis(out, 2, 1).reshape(G * g, 2 * bufH, W_act)
    return out[:B, :, :w]


def _deint_chunk(keptp, *, offset, aaf, spec, g, n_steps, w, W_act, W_sm,
                 S_clamp):
    """keptp: [bufH+2, g, W_act] row-major chunk (or, for offset=="pf", a
    (chunk, [g, 128] offsets) tuple) -> [2*bufH, g, W_act] woven output
    (see deinterlace_field_batch_fused)."""
    per_frame_off = offset == "pf"
    offp = None
    if per_frame_off:
        keptp, offp = keptp
    body = functools.partial(
        _kernel, spec=spec, w=w, W_act=W_act, W_sm=W_sm, S_clamp=S_clamp,
        n_steps=n_steps, aaf=aaf, weave_offset=offset,
    )
    use_mm = _mxu_taps_on(spec)
    has_prev = offset == 1 or per_frame_off

    def kernel(*refs):
        # Pallas passes refs as (inputs..., out, scratch...); route the
        # optional off input / prev / mm scratch to _kernel's keywords.
        if per_frame_off:
            k0, k1, k2, off, out, *sc = refs
        else:
            (k0, k1, k2, out, *sc), off = refs, None
        prev = sc[3] if has_prev else None
        mm = sc[3 + has_prev] if use_mm else None
        body(k0, k1, k2, out, sc[0], sc[1], sc[2], prev, off, mm)
    row_view = lambda o: pl.BlockSpec(  # noqa: E731
        (1, g, W_act), lambda t, o=o: (t + o, 0, 0),
        memory_space=pltpu.VMEM,
    )
    k1_view = (
        pl.BlockSpec((1, g, W_act), lambda t: (1, 0, 0),
                     memory_space=pltpu.VMEM)
        if _K1_CONST else row_view(1)
    )
    out_spec = pl.BlockSpec(
        (2, g, W_act), lambda t: (t, 0, 0), memory_space=pltpu.VMEM
    )
    out_shape = jax.ShapeDtypeStruct(
        (2 * (n_steps + 1), g, W_act), keptp.dtype
    )
    n_sm = 5 if _packed_smoothing(spec) else 9
    scratch = [
        pltpu.VMEM((n_sm, g, W_sm), spec.acc_dtype),  # smoothed row b-1
        pltpu.VMEM((n_sm, g, W_sm), spec.acc_dtype),  # raw row b
        pltpu.VMEM((18, g, W_act), spec.acc_dtype),  # pair taps/preds
    ]
    if has_prev:
        scratch.append(pltpu.VMEM((g, W_act), keptp.dtype))  # carried interp
    if use_mm:
        scratch.append(pltpu.VMEM((128, 1536), jnp.int8))  # tap perm matrix
    in_specs = [row_view(0), k1_view, row_view(2)]
    operands = [keptp, keptp, keptp]
    if per_frame_off:
        in_specs.append(pl.BlockSpec(
            (g, 128), lambda t: (0, 0), memory_space=pltpu.VMEM
        ))
        operands.append(offp)
    return pl.pallas_call(
        kernel,
        grid=(n_steps + 1,),
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=out_shape,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT_BYTES
        ),
        interpret=jax.default_backend() != "tpu",
    )(*operands)


# consumed by ops.sangnom.deinterlace_plane_batch for static-offset,
# unsharded dispatches through this backend
interpolate_field_batch.fused_weave = deinterlace_field_batch_fused
