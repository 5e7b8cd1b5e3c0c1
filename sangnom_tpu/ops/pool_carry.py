"""Pool-compat backend: bit-exact emulation of the reference's SHARED buffer
pool (``pool_compat=True``).

The reference allocates ONE 9-buffer pool sized by the LUMA geometry
(stride = ceil32(luma width), bufferHeight = luma h_out/2; reference
src/SangNom2.cpp:287-288, 303-310) and reuses it for every plane of every
frame without reinitialization.  Each plane pass then

  * prepares only rows 1..h_p/2-1, cols 0..w_p-1 (src/SangNom2.cpp:75-124),
  * but SMOOTHS the full pool — all rows 1..bufferHeight-1 over the full
    stride (src/SangNom2.cpp:268-270: ``processBuffers_c(...bufferHeight)``),
  * and finalizes from rows 1..h_p/2-1, cols 0..w_p-1 (src/SangNom2.cpp:272).

For subsampled chroma the prepared region is strictly smaller than the
smoothed region, so the smoothing pass reads back the PREVIOUS pass's
smoothed data in the stale rows (rows >= h_c/2: the previous plane's maps)
and the stale columns (cols >= w_c: the previous plane's maps, whose
influence creeps 3 columns inward per smoothed row through the 7-tap
horizontal box).  That contamination is deterministic — the pool's only
never-written cells (row 0 and row bufferHeight, src/SangNom2.cpp:79 vs
129-133) are zero pages from the allocator in practice — so a live
reference build is reproducible bit-for-bit by threading the pool as
explicit state: planes in Y->U->V order within a frame, frames in clip
order (a `lax.scan`; frame parallelism is fundamentally unavailable in this
mode whenever the pool state survives a frame boundary, e.g. luma=False or
unaligned widths).

The default ``pool_compat=False`` path (ops/reference.py, the Pallas kernel,
and the sharded backends) instead zero-defines every out-of-plane pool cell
— deviation 1 in docs/PARITY.md — which is frame-parallel and identical to
this mode for the first processed plane of the first frame.

Numerics (maps, smoothing, priority select) are imported from
ops/reference.py — this module adds the pool state threading plus a Pallas
twin of the smoothing pass (`smooth_pool_pallas`, selected by ``opt`` like
the normal path's backends and bit-identical to the scan by construction).
"""

from __future__ import annotations

import functools
from typing import Union

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sangnom_tpu.core.formats import VideoFormat
from sangnom_tpu.core.geometry import (
    aaf_as_pixel,
    buffer_height,
    buffer_stride_elems,
    round_up,
    scaled_aa_thresholds,
)
from sangnom_tpu.ops.primitives import KernelSpec, smooth_writeback
from sangnom_tpu.ops.reference import _error_maps, finalize_select, smooth_scan

Offset = Union[int, jax.Array]


def _pool_smooth_kernel(init_ref, r0_ref, r1_ref, out_ref, sm_ref, *,
                        spec: KernelSpec, S: int, packed: bool, R: int):
    """Grid step t smooths buffer rows t*R+1 .. t*R+R: for each, the
    vertical 3-sum of (carried smoothed row, raw rows b and b+1) then the
    7-tap horizontal box with taps clamped at the buffer stride S
    (reference src/SangNom2.cpp:129-152; the jnp twin is
    ops.reference.smooth_scan's step).  R rows per step amortize the
    per-step DMA latency (the recursion itself is serial — the R-row body
    is a static unroll on the carried row).  Columns >= S are
    stride-rounding padding: never read by a valid column's clamped taps,
    discarded by the caller."""
    from sangnom_tpu.ops.pallas_kernel import _hbox7

    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        sm_ref[...] = init_ref[0]

    sm = sm_ref[...]
    S_pad = sm.shape[-1]
    col = None

    def naive_tap(line, k):
        W = line.shape[-1]
        kk = k % W
        rolled = jnp.concatenate([line[..., kk:], line[..., :kk]], axis=-1)
        if k > 0:
            return jnp.where(col >= S - k, line[..., S - 1 : S], rolled)
        return jnp.where(col < -k, line[..., :1], rolled)

    for i in range(R):
        line = sm + r0_ref[i] + r1_ref[i]
        if POOL_HBOX_SHARED:
            # the shared clamped-at-S box sum: 3-roll cumulative-sub bulk
            # + exact edge slabs for integers (wrap/per-field exact), the
            # association-preserving leading-pair form for float — the
            # same code the fused kernel runs (ops.pallas_kernel._hbox7).
            # Measured a TIE vs the naive 6-concat form (-0.5%,
            # results/poolhbox_ab_r03.txt): the row recursion is a serial
            # latency chain and Mosaic folds static roll compositions, so
            # roll-count cuts don't pay here; kept for the single shared
            # hbox implementation.
            h = _hbox7(line, S, S_pad, is_float=spec.is_float)
        else:
            # naive fully-clamped 6-concat form (A/B hook)
            if col is None:
                col = jax.lax.broadcasted_iota(jnp.int32, line.shape,
                                               line.ndim - 1)
            h = naive_tap(line, -3)
            for k in (-2, -1):
                h = h + naive_tap(line, k)
            h = h + line
            for k in (1, 2, 3):
                h = h + naive_tap(line, k)
        if packed:
            # per-field (>>4) & 0xFF — ops.pallas_kernel._packed_smoothing
            sm = jnp.right_shift(h, 4) & 0x00FF00FF
        else:
            sm = smooth_writeback(h, spec)
        out_ref[i] = sm
    sm_ref[...] = sm


# Rows per grid step for `smooth_pool_pallas`.  R>1 would amortize
# per-step DMA latency, but the v5e sweep (results/poolrows_ab_r03.txt,
# interleaved, bit-identical arms) shows R=1 is BEST (155 vs 150 fps at
# R=4..32): Mosaic double-buffers the row blocks across grid steps, so the
# DMAs are already hidden and bigger blocks only add the shifted-view
# copies.  The R machinery stays for re-probing on other geometries.
POOL_ROWS_PER_STEP = 1
# Frame-parallel pool-compat fast path (see `_frames_independent`): REJECTED
# as a default (kept as an A/B hook).  The interleaved hardware A/B
# (results/poolfast_ab_r03.txt) shows it LOSES to the sequential Pallas scan
# at every chunk size (-17.7% K=8, -21.0% K=16, -24.0% K=32 — the folded
# K*C-slab kernel adds accumulator-width HBM staging for K frames' prepare/
# finalize), and a second hardware run (results/poolfast_ab_r03b.txt) ended
# in a bit-identity FAILURE ('fast8 differs from seq') that was never
# localized; CI runs Pallas in interpret mode on CPU and cannot catch a
# Mosaic-side divergence.  Bit-exactness is this mode's entire reason to
# exist, so the default stays False until a passing hardware bit-identity
# artifact AND a winning A/B are both committed.
POOL_FAST = False
POOL_FAST_BATCH = 16
# Recompute taps/predictors at the fast path's finalize (the reference
# recomputes too, src/SangNom2.cpp:176-195) instead of holding the 18
# accumulator-width tap arrays live across the kernel call — trades cheap
# elementwise recompute for their HBM round-trip IF XLA materializes them
# (it may already clone the producer fusion into both consumers).  A/B hook.
POOL_FINALIZE_RECOMPUTE = False
# Trace-time A/B hook: the shared ops.pallas_kernel._hbox7 (3-roll bulk +
# edge slabs) vs the naive fully-clamped 6-concat form in the pool kernel.
POOL_HBOX_SHARED = True
# Round-4 FULLY-fused pool backend: prepare+smooth+finalize in ONE Pallas
# walk per plane pass.  BUILT AND REJECTED (A/B hook kept): bit-identical
# on real Mosaic for both geometries but -5.1% aligned / -2.1% unaligned
# (results/ab_poolfused_r04.txt) — in-kernel prepare (6 taps7 rolls/step)
# and finalize EXTEND the serial roll-bound row chain, costing more than
# the vectorized XLA stages they replace; the same measured lesson as the
# MXU tap offload ("the tap result is on the critical path").
POOL_FUSED = False
# Round-4 split-carry backend: prepare/finalize stay vectorized XLA, the
# pool rides the frame scan as (row0, body, tail), and the smoothing
# kernel reads merged rows through VIEW index maps + a last-step tail
# select, eliminating the per-pass rows-assembly and pool-reconstruction
# concats (~20 MB accumulator-width each).  BUILT AND REJECTED as a TIE
# (A/B hook kept): bit-identical on real Mosaic, -0.3% aligned / -0.9%
# unaligned (results/ab_poolfused_r04.txt) — XLA already overlaps those
# copies behind the serial kernel+dispatch chain, so removing the traffic
# buys nothing.  With the fused kernel ALSO measured slower, pool-mode
# perf is structure-closed at the round-3 tm path: the serial row chain
# is the bound, not glue traffic.
POOL_SPLIT3 = False


def _pool_fused_kernel(kept_ref, b0_ref, b1_ref, row0_ref, tail_ref,
                       out_ref, smout_ref, sm_ref, raw_ref, pair_ref, *,
                       spec: KernelSpec, w: int, S: int, S_pad: int,
                       bufH_p: int, P: int, aaf, packed: bool):
    """Fused pool-compat plane pass: grid step t handles pool row b = t+1.

    Per step, IN KERNEL (vs the split path's three XLA/Pallas stages):
      raw_b1   = error maps of kept pair (b, b+1)        [when b+1 <= R]
      row_x    = raw_x on cols < w in the prepared rows, the OLD body row
                 elsewhere (the stale shared-pool reads, SURVEY.md §2 q6)
      sm_b     = hbox7_clamped_at_S(sm_{b-1} + row_b + row_{b+1}) / 16
      out[b-1] = finalize(pair (b-1, b) carry, sm_b)     [rows <= R real]
    The kept plane rides WHOLE in VMEM (accumulator dtype — Mosaic lowers
    dynamic sublane indexing for i32, not u8: tools/archive/probe_pool_dynrow.py)
    and rows are read with clamped dynamic indices; the smoothed rows
    stream out as the NEXT carry body directly.  Bit-exact to the split
    path by construction: identical primitives, association and clamp
    geometry (row values match the old rows-assembly cell for cell).
    """
    from sangnom_tpu.ops.pallas_kernel import (
        _col_iota,
        _error_maps,
        _finalize,
        _hbox7,
        _pack_maps,
        _pair_values,
        _taps7,
        _unpack_sm,
    )
    from sangnom_tpu.ops.primitives import calc_sangnom

    t = pl.program_id(0)
    R = bufH_p - 1  # prepared pool rows are 1..R (caller guarantees R >= 1)
    kmax = bufH_p - 1

    def krow(i):
        return kept_ref[pl.ds(jnp.minimum(i, kmax), 1), :]  # (1, S_pad)

    def raw_of(v):
        m = _error_maps(v, spec, w, S_pad)  # [9, 1, S_pad]; cols >= w zero
        if packed:
            m = _pack_maps(m)
        return m[:, 0, :]  # [C, S_pad]

    @pl.when(t == 0)
    def _():
        # seed: pair (0, 1) -> raw row 1; smoothed "row 0" is pool row 0
        v01 = _pair_values(krow(0), krow(1), spec, w)
        pair_ref[...] = jnp.concatenate(v01, axis=0)
        raw_ref[...] = raw_of(v01)
        sm_ref[...] = row0_ref[0]

    pv = [pair_ref[pl.ds(i, 1), :] for i in range(18)]

    # pair (b, b+1) via the pair-carry reuse trick (ops.pallas_kernel
    #._kernel: a row's mirror-tap predictors swap roles when it turns
    # from `next` into `curr`)
    nt = _taps7(krow(t + 2), w)
    v12 = pv[7:14] + nt + [
        pv[17], calc_sangnom(nt[4], nt[3], nt[2], spec),
        pv[15], calc_sangnom(nt[2], nt[3], nt[4], spec),
    ]
    raw_next = raw_of(v12)

    # stale-merge: prepared rows/cols take the raw maps, everything else
    # reads the OLD body (rows b, b+1), with row P = the never-smoothed
    # tail row (reference src/SangNom2.cpp:79 vs 129-133)
    b0 = b0_ref[0]
    b1 = jnp.where(t == P - 2, tail_ref[0], b1_ref[0])
    in_w = _col_iota(b0.shape) < w
    row_b = jnp.where((t <= R - 1) & in_w, raw_ref[...], b0)
    row_b1 = jnp.where((t + 1 <= R - 1) & in_w, raw_next, b1)

    line = sm_ref[...] + row_b + row_b1
    h = _hbox7(line, S, S_pad, is_float=spec.is_float)
    if packed:
        sm = jnp.right_shift(h, 4) & 0x00FF00FF
    else:
        sm = smooth_writeback(h, spec)
    sm_ref[...] = sm
    smout_ref[0] = sm

    sm9 = _unpack_sm(sm) if packed else [sm[i][None] for i in range(9)]
    res = _finalize(pv, sm9, aaf, spec)
    out_ref[0] = res.astype(out_ref.dtype)

    pair_ref[...] = jnp.concatenate(v12, axis=0)
    raw_ref[...] = raw_next


def _pool_smooth_tail_kernel(init_ref, r0_ref, r1_ref, tail_ref, out_ref,
                             sm_ref, *, spec: KernelSpec, S: int,
                             packed: bool, n_last: int):
    """The R=1 row-scan smoothing kernel on a MERGED rows array that
    excludes the pool's boundary rows: row 0 rides in as the seed
    (init_ref) and row P as a const block selected on the LAST step only —
    reads are value-identical to the concatenated [row0; merged; tail]
    form, so bit-exactness is structural."""
    from sangnom_tpu.ops.pallas_kernel import _hbox7

    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        sm_ref[...] = init_ref[0]

    r1 = jnp.where(t == n_last, tail_ref[0], r1_ref[0])
    line = sm_ref[...] + r0_ref[0] + r1
    h = _hbox7(line, S, line.shape[-1], is_float=spec.is_float)
    if packed:
        sm = jnp.right_shift(h, 4) & 0x00FF00FF
    else:
        sm = smooth_writeback(h, spec)
    out_ref[0] = sm
    sm_ref[...] = sm


def _smooth_rows_split3(row0, merged, tail, spec: KernelSpec, packed: bool,
                        S: int) -> jnp.ndarray:
    """pallas_call wrapper for `_pool_smooth_tail_kernel`: merged holds
    pool rows 1..P-1 pre-smoothing ([P-1, C, S_pad]); returns the smoothed
    rows in the same layout (the next carry body, no reconstruction)."""
    n, C, S_pad = merged.shape
    blk = lambda f: pl.BlockSpec(  # noqa: E731
        (1, C, S_pad), f, memory_space=pltpu.VMEM
    )
    kernel = functools.partial(
        _pool_smooth_tail_kernel, spec=spec, S=S, packed=packed,
        n_last=n - 1,
    )
    call = pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=[
            blk(lambda t: (0, 0, 0)),                       # row0 seed
            blk(lambda t: (t, 0, 0)),                       # row b = t+1
            blk(lambda t: (jnp.minimum(t + 1, n - 1), 0, 0)),  # row b+1
            blk(lambda t: (0, 0, 0)),                       # tail (row P)
        ],
        out_specs=blk(lambda t: (t, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, C, S_pad), merged.dtype),
        scratch_shapes=[pltpu.VMEM((C, S_pad), merged.dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
        interpret=jax.default_backend() != "tpu",
    )
    return call(row0, merged, merged, tail)


def interp_field_pool_split3(
    kept: jnp.ndarray, carry, aaf, spec: KernelSpec, S: int
) -> tuple[jnp.ndarray, tuple]:
    """Split-carry plane pass (POOL_SPLIT3): prepare/finalize vectorized in
    XLA exactly as `interp_field_pool_tm`, smoothing through
    `_smooth_rows_split3` on the (row0, body, tail) carry — for the
    stride-covering plane (aligned luma) the raw maps feed the kernel with
    NO rows-assembly copy at all, and no backend ever reconstructs the
    pool (body := kernel output)."""
    from sangnom_tpu.ops.pallas_kernel import _packed_smoothing
    from sangnom_tpu.ops.reference import (
        error_maps_list,
        finalize_select_from_taps,
        pair_taps,
    )

    row0, body, tail = carry
    out_dtype = kept.dtype
    kept = kept.astype(spec.acc_dtype)
    bufH_p, w = kept.shape
    Pm1, C, S_pad = body.shape
    packed = _packed_smoothing(spec)

    R = bufH_p - 1
    if R >= 1:
        curr, nxt = kept[:-1], kept[1:]
        taps, preds = pair_taps(curr, nxt, spec)
        m = error_maps_list(taps, preds)  # 9 x [R, w]
        if packed:
            slabs = [(m[i] << 16) | m[i + 5] for i in range(4)] + [m[4]]
        else:
            slabs = m
        raw = jnp.stack(slabs, axis=1)  # [R, C, w]
        if w < S_pad:
            # col-stale merge: prepared rows keep the previous pass's
            # smoothed data beyond the plane width (SURVEY.md §2 quirk 6)
            raw = jnp.concatenate([raw, body[:R, :, w:]], axis=2)
        # row-stale merge: rows R+1..P-1 keep the previous pass's rows
        merged = (jnp.concatenate([raw, body[R:]], axis=0)
                  if R < Pm1 else raw)
    else:
        merged = body

    sm = _smooth_rows_split3(row0, merged, tail, spec, packed, S)
    carry = (row0, sm, tail)
    if bufH_p < 2:
        return jnp.zeros((0, w), out_dtype), carry

    b = sm[:R, :, :w]
    if packed:
        bufs = tuple(b[:, i] >> 16 for i in range(4)) + (b[:, 4],) + tuple(
            b[:, i] & 0xFFFF for i in range(4)
        )
    elif spec.is_float:
        bufs = jnp.moveaxis(b, 1, 0)  # array form keeps jnp.min for fp
    else:
        bufs = tuple(b[:, i] for i in range(9))
    res = finalize_select_from_taps(taps, preds, bufs, aaf, spec)
    return res.astype(out_dtype), carry


def interp_field_pool_fused(
    kept: jnp.ndarray, carry, aaf, spec: KernelSpec, S: int
) -> tuple[jnp.ndarray, tuple]:
    """Fused-backend plane pass on the split carry (row0, body, tail), each
    [*, C, S_pad] accumulator-dtype (packed for u8; lane-padded — ``S`` is
    the TRUE buffer stride the hbox clamps at).  Returns
    (interp [bufH_p-1, w] storage-dtype, new carry) — the kernel's smoothed
    rows ARE the next body, no pool reconstruction."""
    row0, body, tail = carry
    out_dtype = kept.dtype
    bufH_p, w = kept.shape
    Pm1, C, S_pad = body.shape
    P = Pm1 + 1

    if bufH_p < 2:
        # degenerate plane (kept field < 2 rows): no prepare/finalize, but
        # the full pool still smooths — reuse the row-scan kernel on the
        # assembled rows at the TRUE stride (clamp semantics; the padding
        # lanes are garbage-but-unread and simply rewritten)
        rows = jnp.concatenate([row0, body, tail], axis=0)[:, :, :S]
        sm = _smooth_rows_pallas(rows, spec, _fused_packed(spec))
        if S_pad > S:
            sm = jnp.pad(sm, ((0, 0), (0, 0), (0, S_pad - S)))
        return jnp.zeros((0, w), out_dtype), (row0, sm, tail)

    packed = _fused_packed(spec)
    kept_acc = kept.astype(spec.acc_dtype)
    if w < S_pad:
        kept_acc = jnp.pad(kept_acc, ((0, 0), (0, S_pad - w)))

    kernel = functools.partial(
        _pool_fused_kernel, spec=spec, w=w, S=S, S_pad=S_pad,
        bufH_p=bufH_p, P=P, aaf=aaf, packed=packed,
    )
    n = P - 1
    body_blk = lambda f: pl.BlockSpec(  # noqa: E731
        (1, C, S_pad), f, memory_space=pltpu.VMEM
    )
    out, sm = pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((bufH_p, S_pad), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            body_blk(lambda t: (jnp.minimum(t, P - 2), 0, 0)),
            body_blk(lambda t: (jnp.minimum(t + 1, P - 2), 0, 0)),
            body_blk(lambda t: (0, 0, 0)),
            body_blk(lambda t: (0, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, S_pad), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            body_blk(lambda t: (t, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, 1, S_pad), spec.acc_dtype),
            jax.ShapeDtypeStruct((n, C, S_pad), spec.acc_dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((C, S_pad), spec.acc_dtype),   # sm row b-1
            pltpu.VMEM((C, S_pad), spec.acc_dtype),   # raw row b
            pltpu.VMEM((18, S_pad), spec.acc_dtype),  # pair (b, b+1)
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
        interpret=jax.default_backend() != "tpu",
    )(kept_acc, body, body, row0, tail)
    interp = out[: bufH_p - 1, 0, :w].astype(out_dtype)
    return interp, (row0, sm, tail)


def _fused_packed(spec: KernelSpec) -> bool:
    from sangnom_tpu.ops.pallas_kernel import _packed_smoothing

    return _packed_smoothing(spec)


def _pool_split_fused(pool: jnp.ndarray, spec: KernelSpec):
    """Public pool [9, P+1, S] -> the fused carry (row0, body, tail), each
    [*, C, S_pad] (packed pairs for u8, lane-padded).  Exact both ways —
    padding lanes are never read (the hbox clamps at S) and rewritten
    every pass."""
    from sangnom_tpu.ops.pallas_kernel import _pack_maps

    S = pool.shape[2]
    x = _pack_maps(pool) if _fused_packed(spec) else pool
    x = jnp.moveaxis(x, 1, 0)  # [P+1, C, S]
    S_pad = max(round_up(S, 128), 128)
    if S_pad > S:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, S_pad - S)))
    return x[:1], x[1:-1], x[-1:]


def _pool_join_fused(carry, spec: KernelSpec, S: int) -> jnp.ndarray:
    """Inverse of `_pool_split_fused`."""
    from sangnom_tpu.ops.pallas_kernel import _unpack_sm

    row0, body, tail = carry
    x = jnp.concatenate([row0, body, tail], axis=0)[:, :, :S]
    x = jnp.moveaxis(x, 0, 1)
    if _fused_packed(spec):
        x = jnp.stack(_unpack_sm(x))
    return x


def smooth_pool_pallas(pool: jnp.ndarray, spec: KernelSpec,
                       rows_per_step: int | None = None) -> jnp.ndarray:
    """Pallas twin of ``smooth_scan(pool, spec, init=pool[:, 0])`` for the
    full-pool smoothing pass: ONE kernel whose grid walks the row recursion
    with the carried smoothed row in VMEM scratch, instead of a lax.scan
    whose per-row while-loop step costs ~10 us on TPU (the pool mode runs
    1617 scan rows/frame at 1080p 4:2:0 — +151% end to end,
    results/poolpallas_ab_r03.txt).

    pool: [9, P+1, S] accumulator-dtype pool state (post-prepare).
    Returns smoothed rows [P-1, 9, S] — bit-exact to the jnp scan: the u8
    packed-pair form is legal here because every pool value (raw maps AND
    stale previously-smoothed rows) is writeback-masked to the pixel range,
    so 16-bit fields never carry across (ops.pallas_kernel._pack_maps).
    """
    from sangnom_tpu.ops.pallas_kernel import (
        _pack_maps,
        _packed_smoothing,
        _unpack_sm,
    )

    nine, Pp1, S = pool.shape
    if Pp1 - 2 <= 0:
        return jnp.zeros((0, nine, S), pool.dtype)
    packed = _packed_smoothing(spec)
    x = _pack_maps(pool) if packed else pool
    rows = jnp.moveaxis(x, 1, 0)  # [P+1, C, S]
    sm = _smooth_rows_pallas(rows, spec, packed, rows_per_step)  # [n, C, S]
    if packed:
        sm = jnp.stack(_unpack_sm(sm.swapaxes(0, 1))).swapaxes(0, 1)
    return sm


def _smooth_rows_pallas(rows: jnp.ndarray, spec: KernelSpec, packed: bool,
                        rows_per_step: int | None = None) -> jnp.ndarray:
    """The pallas_call behind `smooth_pool_pallas`, on time-major (and,
    for u8, packed) rows [P+1, C, S]; returns smoothed rows [P-1, C, S] in
    the same layout — the time-major pool backend feeds and consumes this
    directly, with no full-pool transposes."""
    Pp1, C, S = rows.shape
    n = Pp1 - 2  # smoothed rows 1..P-1
    S_pad = max(round_up(S, 128), 128)
    if S_pad > S:
        rows = jnp.pad(rows, ((0, 0), (0, 0), (0, S_pad - S)))

    R = rows_per_step if rows_per_step is not None else POOL_ROWS_PER_STEP
    R = max(1, min(R, n))
    n_steps = -(-n // R)
    n_pad = n_steps * R

    kernel = functools.partial(_pool_smooth_kernel, spec=spec, S=S,
                               packed=packed, R=R)
    if R == 1:
        # No staged shifted copies: the kernel reads the SAME rows array
        # through three BlockSpecs (constant seed row 0; raw rows t+1 and
        # t+2 — block-index maps are exactly row indices at block height
        # 1).  Saves two full-pool HBM copies per smoothing pass vs the
        # sliced-views form below; reads are identical, so bit-exactness
        # is structural.
        row_blk = lambda f: pl.BlockSpec(  # noqa: E731
            (1, C, S_pad), f, memory_space=pltpu.VMEM
        )
        call = pl.pallas_call(
            kernel,
            grid=(n_steps,),
            in_specs=[
                row_blk(lambda t: (0, 0, 0)),
                row_blk(lambda t: (t + 1, 0, 0)),
                row_blk(lambda t: (t + 2, 0, 0)),
            ],
            out_specs=row_blk(lambda t: (t, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((n_pad, C, S_pad), rows.dtype),
            scratch_shapes=[pltpu.VMEM((C, S_pad), rows.dtype)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024
            ),
            interpret=jax.default_backend() != "tpu",
        )
        return call(rows, rows, rows)[:, :, :S]  # [n, C, S]

    # R > 1 (re-probe hook): two R-row-shifted views of the raw rows: step
    # t's row i reads raw rows t*R+1+i and t*R+2+i (rows beyond P feed only
    # the discarded padding tail of the last step)
    r0 = rows[1:]
    r1 = rows[2:]
    if n_pad > r1.shape[0]:
        pad = n_pad - r1.shape[0]
        r0 = jnp.pad(r0, ((0, max(0, n_pad - r0.shape[0])), (0, 0), (0, 0)))
        r1 = jnp.pad(r1, ((0, pad), (0, 0), (0, 0)))

    blk = lambda: pl.BlockSpec(  # noqa: E731
        (R, C, S_pad), lambda t: (t, 0, 0), memory_space=pltpu.VMEM
    )
    call = pl.pallas_call(
        kernel,
        grid=(n_steps,),
        in_specs=[
            pl.BlockSpec((1, C, S_pad), lambda t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            blk(),
            blk(),
        ],
        out_specs=blk(),
        out_shape=jax.ShapeDtypeStruct((n_pad, C, S_pad), rows.dtype),
        scratch_shapes=[pltpu.VMEM((C, S_pad), rows.dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
        interpret=jax.default_backend() != "tpu",
    )
    return call(rows[:1], r0, r1)[:n, :, :S]  # [n, C, S]


def _pool_use_pallas(opt: int) -> bool:
    """Pool smoothing backend pick — the same policy as
    ops.sangnom._pick_backend: 0 jnp scan, 1 Pallas, auto by platform."""
    if opt == 0:
        return False
    if opt == 1:
        return True
    return jax.default_backend() == "tpu"


def _pool_pack_tm(pool: jnp.ndarray, spec: KernelSpec) -> jnp.ndarray:
    """Canonical pool state [9, P+1, S] -> the Pallas backend's internal
    carry: time-major [P+1, C, S], packed pairs for u8 (C=5).  Exact both
    ways — every pool cell is writeback-masked to the pixel range, so the
    16-bit fields round-trip losslessly.  Runs once per impl CALL (not per
    frame); the public pool format is unchanged."""
    from sangnom_tpu.ops.pallas_kernel import _pack_maps, _packed_smoothing

    x = _pack_maps(pool) if _packed_smoothing(spec) else pool
    return jnp.moveaxis(x, 1, 0)


def _pool_unpack_tm(pool_tm: jnp.ndarray, spec: KernelSpec) -> jnp.ndarray:
    """Inverse of `_pool_pack_tm`."""
    from sangnom_tpu.ops.pallas_kernel import _packed_smoothing, _unpack_sm

    x = jnp.moveaxis(pool_tm, 0, 1)
    if _packed_smoothing(spec):
        x = jnp.stack(_unpack_sm(x))
    return x


def interp_field_pool_tm(
    kept: jnp.ndarray, pool_tm: jnp.ndarray, aaf, spec: KernelSpec
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Time-major plane pass (the Pallas pool backend's twin of
    `interp_field_pool`): the pool rides as [P+1, C, S] — the smoothing
    kernel's native layout — so prepare's raw-map overwrite, the kernel
    I/O and the smoothed writeback all share one layout.  The layout-
    converting full-pool `dynamic-update-slice` copies this removes were
    ~40% of pool-mode device time (XProf, results/poolxprof_r03.txt).

    Bit-exact to `interp_field_pool` by construction: same primitives, same
    association (the integer finalize min runs as a chained jnp.minimum —
    exact for integers; float passes a stacked array to keep jnp.min);
    pinned four-way in tests/test_pool_compat.py and on hardware.
    """
    from sangnom_tpu.ops.pallas_kernel import _packed_smoothing
    from sangnom_tpu.ops.reference import (
        error_maps_list,
        finalize_select_from_taps,
        pair_taps,
    )

    out_dtype = kept.dtype
    kept = kept.astype(spec.acc_dtype)
    bufH_p, w = kept.shape
    Pp1 = pool_tm.shape[0]
    S = pool_tm.shape[2]
    packed = _packed_smoothing(spec)

    curr, nxt = kept[:-1], kept[1:]
    R = bufH_p - 1
    if R < 1:
        # degenerate plane (kept field < 2 rows): prepare writes nothing and
        # finalize has no rows, but the reference still smooths the full
        # pool (src/SangNom2.cpp:268-270)
        sm = _smooth_rows_pallas(pool_tm, spec, packed)
        pool_tm = jnp.concatenate(
            [pool_tm[:1], sm, pool_tm[Pp1 - 1 :]], axis=0
        )
        return jnp.zeros((0, w), out_dtype), pool_tm

    # R >= 1 from here: taps/preds feed both prepare and the finalize below.
    # prepare: overwrite rows 1..bufH_p-1, cols 0..w-1 ONLY — stale
    # cells elsewhere keep the previous pass's smoothed data
    taps, preds = pair_taps(curr, nxt, spec)
    m = error_maps_list(taps, preds)  # 9 x [R, w]
    if packed:
        slabs = [(m[i] << 16) | m[i + 5] for i in range(4)] + [m[4]]
    else:
        slabs = m
    raw = jnp.stack(slabs, axis=1)  # [R, C, w]
    if w < S:
        raw = jnp.concatenate([raw, pool_tm[1 : R + 1, :, w:]], axis=2)
    rows = jnp.concatenate([pool_tm[:1], raw, pool_tm[R + 1 :]], axis=0)

    # smooth: the FULL pool, rows 1..P-1 over the full stride; the row-0
    # seed is pool row 0 (never written — zero)
    sm = _smooth_rows_pallas(rows, spec, packed)  # [P-1, C, S]
    pool_tm = jnp.concatenate([pool_tm[:1], sm, pool_tm[Pp1 - 1 :]], axis=0)

    # finalize: read back rows 1..bufH_p-1, cols 0..w-1; unpack is
    # elementwise shift/mask fused into the select — no materialization
    b = sm[:R, :, :w]
    if packed:
        bufs = tuple(b[:, i] >> 16 for i in range(4)) + (b[:, 4],) + tuple(
            b[:, i] & 0xFFFF for i in range(4)
        )
    elif spec.is_float:
        bufs = jnp.moveaxis(b, 1, 0)  # array form keeps jnp.min for fp
    else:
        bufs = tuple(b[:, i] for i in range(9))
    res = finalize_select_from_taps(taps, preds, bufs, aaf, spec)
    return res.astype(out_dtype), pool_tm


def _frames_independent(luma_width: int, luma_h: int, fmt: VideoFormat,
                        dh: bool, luma: bool) -> bool:
    """True when every frame's pool-compat output is provably independent of
    the carried pool, so frames may be processed IN PARALLEL bit-exactly.

    Proof: the first plane processed in a frame is luma (``dh`` processes
    every plane; otherwise ``luma=True`` is required).  Its prepare
    overwrites pool rows 1..P-1 over cols 0..w-1; its smoothing pass reads
    exactly raw rows 1..P (rows[1:]/rows[2:] for steps 1..P-1), the row-0
    seed, and — through the stride-clamped 7-tap box — cols 0..S-1.  When
    ``w == S`` (stride-aligned luma width) and the luma kept field spans the
    full buffer height (even ``h`` or ``dh``), every cell that pass can read
    is either freshly prepared (rows 1..P-1) or one of the pool's two
    NEVER-written rows 0/P, which are zero for the life of any pool this
    module can produce (`init_pool` zeroes them; no pass writes them — an
    invariant of the pool-state representation, reference
    src/SangNom2.cpp:79 vs 129-133).  The luma pass is therefore a pure
    function of the frame, the chroma passes read only this frame's luma/
    chroma residue, and frame k's output and final pool never depend on
    frame k-1 — `test_pool_equals_zero_when_prepare_covers_pool` pins the
    observable consequence.  The carried-state cases (`w != stride`:
    pad-column carry; ``luma=False`` without dh: U inherits last frame's V)
    stay on the sequential scan."""
    return (
        (dh or luma)
        and buffer_stride_elems(luma_width, fmt.component_size) == luma_width
        and (dh or luma_h % 2 == 0)
    )


def _gather_kept_batch(p: jnp.ndarray, offset: Offset, dh: bool):
    """Batched `_gather_kept`: [N, h, w] -> [N, bufH_p, w]."""
    if dh:
        return p
    if isinstance(offset, int):
        return p[:, offset::2]
    return jax.vmap(lambda pp, oo: _gather_kept(pp, oo, False))(p, offset)


def _assemble_tm_batch(kept_tm: jnp.ndarray, interp_tm: jnp.ndarray,
                       offset: Offset):
    """Time-major batched `_assemble`: weave kept + missing lines.
    kept_tm [bufH_p, K, w], interp_tm [bufH_p-1, K, w] -> [2*bufH_p, K, w]."""
    bufH_p, K, w = kept_tm.shape

    def weave(top, bottom):
        return jnp.stack([top, bottom], axis=1).reshape(2 * bufH_p, K, w)

    out0 = weave(kept_tm, jnp.concatenate([interp_tm, kept_tm[-1:]], axis=0))
    out1 = weave(jnp.concatenate([kept_tm[:1], interp_tm], axis=0), kept_tm)
    if isinstance(offset, int):
        return out0 if offset == 0 else out1
    return jnp.where((offset == 0)[None, :, None], out0, out1)


def interp_field_pool_tm_batch(
    kept_tm: jnp.ndarray, pool_tmb: jnp.ndarray, aaf, spec: KernelSpec
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Frame-batched twin of `interp_field_pool_tm` for the fast path,
    entirely in the kernel-native time-major layout: kept_tm [bufH_p, K, w]
    (rows outermost, frames inside), pool_tmb [P+1, K, C, S] (each frame
    carries its OWN pool — fresh zeros at the frame's start, per
    `_frames_independent`).

    The K per-frame pools fold into the row-scan kernel's slab axis by a
    pure adjacent-axis reshape ([P+1, K, C, S] -> [P+1, K*C, S] — no
    relayout; a frame-major variant of this path measured -18% from the
    moveaxis copies alone, results/poolfast_ab_r03.txt): the recursion is
    serial over ROWS but elementwise across slabs, so one kernel walk
    smooths all K frames — the same P-1 grid steps the sequential mode
    spends per PLANE now serve the whole chunk, and each step's VPU work
    grows from C slabs (5 sublanes at u8 — mostly idle) to K*C.  The only
    layout moves left are the per-plane STORAGE-dtype kept/output
    transposes in the driver (u8-cheap).  Bit-exact to the sequential path
    by construction: identical primitives and association per frame, slab
    identity is invisible to the kernel (hbox/writeback act on the last
    axis only).
    """
    from sangnom_tpu.ops.pallas_kernel import _packed_smoothing
    from sangnom_tpu.ops.reference import (
        error_maps_list,
        finalize_select_from_taps,
        pair_taps,
    )

    out_dtype = kept_tm.dtype
    kept = kept_tm.astype(spec.acc_dtype)
    bufH_p, K, w = kept.shape
    Pp1, _, C, S = pool_tmb.shape
    packed = _packed_smoothing(spec)

    curr, nxt = kept[:-1], kept[1:]  # [R, K, w]
    R = bufH_p - 1

    def smooth_fold(rows):
        # adjacent-axis merge: no relayout
        sm_f = _smooth_rows_pallas(rows.reshape(Pp1, K * C, S), spec, packed)
        return sm_f.reshape(Pp1 - 2, K, C, S)  # [P-1, K, C, S]

    if R < 1:
        # degenerate plane (kept field < 2 rows): prepare writes nothing and
        # finalize has no rows, but the reference still smooths the full
        # pool (src/SangNom2.cpp:268-270)
        sm = smooth_fold(pool_tmb)
        pool_tmb = jnp.concatenate(
            [pool_tmb[:1], sm, pool_tmb[Pp1 - 1 :]], axis=0
        )
        return jnp.zeros((0, K, w), out_dtype), pool_tmb

    # R >= 1 from here: taps/preds feed both prepare and the finalize below.
    # pair_taps/error_maps_list are last-axis generic (neighborhood
    # pads axis -1; everything else is elementwise), so the leading
    # [row, frame] dims flow through the same functions untouched
    taps, preds = pair_taps(curr, nxt, spec)
    m = error_maps_list(taps, preds)  # 9 x [R, K, w]
    if packed:
        slabs = [(m[i] << 16) | m[i + 5] for i in range(4)] + [m[4]]
    else:
        slabs = m
    raw = jnp.stack(slabs, axis=2)  # [R, K, C, w]
    if w < S:
        raw = jnp.concatenate(
            [raw, pool_tmb[1 : R + 1, :, :, w:]], axis=3
        )
    rows = jnp.concatenate(
        [pool_tmb[:1], raw, pool_tmb[R + 1 :]], axis=0
    )

    sm = smooth_fold(rows)
    pool_tmb = jnp.concatenate(
        [pool_tmb[:1], sm, pool_tmb[Pp1 - 1 :]], axis=0
    )

    b = sm[:R, :, :, :w]  # [R, K, C, w]
    if packed:
        bufs = tuple(b[:, :, i] >> 16 for i in range(4)) + (b[:, :, 4],) + tuple(
            b[:, :, i] & 0xFFFF for i in range(4)
        )
    elif spec.is_float:
        bufs = jnp.moveaxis(b, 2, 0)  # array form keeps jnp.min for fp
    else:
        bufs = tuple(b[:, :, i] for i in range(9))
    if POOL_FINALIZE_RECOMPUTE:
        from sangnom_tpu.ops.reference import finalize_select

        res = finalize_select(curr, nxt, bufs, aaf, spec)
    else:
        res = finalize_select_from_taps(taps, preds, bufs, aaf, spec)
    return res.astype(out_dtype), pool_tmb


def init_pool(luma_width: int, luma_h_out: int, fmt: VideoFormat) -> jnp.ndarray:
    """Fresh pool state: [9, bufferHeight+1, stride], all zero (the
    reference's pool is malloc'd fresh pages — zero in practice — and its
    never-written cells stay zero forever)."""
    spec = KernelSpec.from_format(fmt)
    stride = buffer_stride_elems(luma_width, fmt.component_size)
    buf_h = buffer_height(luma_h_out)
    return jnp.zeros((9, buf_h + 1, stride), spec.acc_dtype)


def interp_field_pool(
    kept: jnp.ndarray, pool: jnp.ndarray, aaf, spec: KernelSpec
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """One plane pass against the shared pool.

    kept: [bufH_p, w] storage-dtype kept field (bufH_p = h_p_out/2).
    pool: [9, P+1, S] accumulator-dtype carried pool (P = luma bufferHeight).
    Returns (interpolated rows [bufH_p-1, w] in the storage dtype, new pool).
    """
    out_dtype = kept.dtype
    kept = kept.astype(spec.acc_dtype)
    bufH_p, w = kept.shape
    P = pool.shape[1] - 1

    curr, nxt = kept[:-1], kept[1:]

    # prepare: overwrite rows 1..bufH_p-1, cols 0..w-1 ONLY — stale cells
    # elsewhere keep the previous pass's smoothed data
    if bufH_p >= 2:
        raw = _error_maps(curr, nxt, spec)  # [9, bufH_p-1, w]
        pool = jax.lax.dynamic_update_slice(pool, raw, (0, 1, 0))

    # smooth: the FULL pool, rows 1..P-1 over the full stride, in place;
    # the row-0 seed is the pool's (never-written, zero) row 0
    sm = smooth_scan(pool, spec, init=pool[:, 0])  # [P-1, 9, S]
    pool = pool.at[:, 1:P].set(jnp.moveaxis(sm, 0, 1))

    if bufH_p < 2:
        return jnp.zeros((0, w), out_dtype), pool

    # finalize: read back rows 1..bufH_p-1, cols 0..w-1
    bufs = pool[:, 1:bufH_p, :w]
    res = finalize_select(curr, nxt, bufs, aaf, spec)
    return res.astype(out_dtype), pool


def _gather_kept(p: jnp.ndarray, offset: Offset, dh: bool) -> jnp.ndarray:
    """Kept-field rows of one frame's plane ([h, w] -> [bufH_p, w])."""
    if dh:
        return p
    if isinstance(offset, int):
        return p[offset::2]
    rows = offset + 2 * jnp.arange(p.shape[0] // 2)
    return jnp.take(p, rows, axis=0)


def _assemble(kept: jnp.ndarray, interp: jnp.ndarray, offset: Offset):
    """Weave kept + missing lines with boundary duplication
    (reference src/SangNom2.cpp:376-391), single frame."""
    bufH_p, w = kept.shape

    def weave(top, bottom):
        return jnp.stack([top, bottom], axis=1).reshape(2 * bufH_p, w)

    out0 = weave(kept, jnp.concatenate([interp, kept[-1:]], axis=0))
    out1 = weave(jnp.concatenate([kept[:1], interp], axis=0), kept)
    if isinstance(offset, int):
        return out0 if offset == 0 else out1
    return jnp.where(offset == 0, out0, out1)


def sangnom2_pool_impl(
    planes,
    parity,
    fmt: VideoFormat,
    order: int,
    aa: int,
    aac: int,
    dh: bool,
    luma: bool,
    chroma: bool,
    pool0: jnp.ndarray | None = None,
    numerics: str = "c",
    opt: int = -1,
):
    """Whole-clip transform with the shared-pool bug-compat semantics.

    planes: tuple of [N, h_i, w_i] arrays; frames are processed sequentially
    (lax.scan) threading the pool, planes in index order within each frame —
    exactly the reference's pass order.  Returns (out_planes, final_pool) so
    streaming callers (CLI --window) can carry the pool across chunks.
    ``numerics="sse2"`` composes the SSE2 numeric contract with the pool
    carry — a live reference build on its vectorized path.

    ``opt`` picks the smoothing-pass backend: 0 = jnp lax.scan,
    1/auto-on-TPU = the Pallas row-scan kernel (`smooth_pool_pallas`) —
    bit-identical on real Mosaic, +151% (64.3 -> 161.4 fps 1080p 4:2:0,
    results/poolpallas_ab_r03.txt) and ~60x faster first-call compile
    (the scan-of-scan XLA program took ~2.5 min to build).  Prepare/
    finalize stay XLA.  Frames are sequential; the frame-parallel fast path
    (`interp_field_pool_tm_batch`, legal when `_frames_independent` proves
    the carried pool unobservable AND no caller-supplied pool0 exists) is
    an A/B hook behind `POOL_FAST`, default OFF — it measured slower than
    the sequential scan at every chunk size and one hardware run recorded a
    bit-identity failure (see the POOL_FAST comment).
    """
    from sangnom_tpu.ops.sangnom import field_offsets  # cycle-free at runtime

    spec = KernelSpec.from_format(fmt, sse2=(numerics == "sse2"))
    N, h0, w0 = planes[0].shape
    h_out0 = 2 * h0 if dh else h0
    pool0_was_none = pool0 is None
    if pool0_was_none:
        pool0 = init_pool(w0, h_out0, fmt)
    aafs = scaled_aa_thresholds(aa, aac, fmt)
    process = [luma, chroma, chroma]
    offsets = field_offsets(order, parity)
    static_off = isinstance(offsets, int)
    use_pallas = _pool_use_pallas(opt)

    # The fast path recreates each frame's pool from zeros, so it may only
    # engage when no caller-supplied pool state exists: a pool0 produced by
    # this module has rows 0/P zero (the `_frames_independent` proof relies
    # on that), but an EXTERNALLY constructed pool0 with nonzero
    # never-written rows would silently diverge from the sequential path
    # instead of being honored — e.g. the CLI --window streaming carry
    # (`_sangnom2_pool_stream_jit`) threads pool state across chunks.
    if (
        use_pallas
        and POOL_FAST
        and pool0_was_none
        and _frames_independent(w0, h0, fmt, dh, luma)
    ):
        return _sangnom2_pool_batched(
            planes, offsets, fmt, spec, aafs, dh, process
        )

    use_fused = use_pallas and POOL_FUSED
    use_split3 = use_pallas and not use_fused and POOL_SPLIT3
    if use_fused or use_split3:
        stride = pool0.shape[2]
        carry0 = _pool_split_fused(pool0, spec)
        plane_pass = functools.partial(
            interp_field_pool_fused if use_fused else
            interp_field_pool_split3, S=stride,
        )
    elif use_pallas:
        carry0 = _pool_pack_tm(pool0, spec)
        plane_pass = interp_field_pool_tm
    else:
        carry0 = pool0
        plane_pass = interp_field_pool

    def frame_step(pool, xs):
        fplanes = xs[:-1]
        off = offsets if static_off else xs[-1]
        outs = []
        for i, p in enumerate(fplanes):
            if i >= 3:
                # alpha: passthrough (the reference never feeds it through
                # the pool, src/SangNom2.cpp:347)
                outs.append(jnp.repeat(p, 2, axis=0) if dh else p)
                continue
            if not dh and not process[i]:
                outs.append(p)  # skipped plane: pool untouched
                continue
            kept = _gather_kept(p, off, dh)
            aaf = aaf_as_pixel(aafs[i], fmt)
            interp, pool = plane_pass(kept, pool, aaf, spec)
            outs.append(_assemble(kept, interp, off))
        return pool, tuple(outs)

    xs = tuple(planes) + (
        (jnp.zeros((N,), jnp.int32),) if static_off else (offsets,)
    )
    final_pool, outs = jax.lax.scan(frame_step, carry0, xs)
    if use_fused or use_split3:
        final_pool = _pool_join_fused(final_pool, spec, stride)
    elif use_pallas:
        final_pool = _pool_unpack_tm(final_pool, spec)
    return outs, final_pool


def _sangnom2_pool_batched(planes, offsets, fmt: VideoFormat,
                           spec: KernelSpec, aafs, dh: bool, process):
    """Frame-parallel pool-compat driver (the `_frames_independent` fast
    path): each frame gets a fresh zero pool — provably what the sequential
    history would hand it — and chunks of `POOL_FAST_BATCH` frames run the
    plane passes batched, folding all frames of a chunk into ONE Pallas
    row-scan walk per plane.  The returned final pool is the last frame's
    (== the sequential final pool, since no state crosses frames here)."""
    N, h0, w0 = planes[0].shape
    h_out0 = 2 * h0 if dh else h0
    S = buffer_stride_elems(w0, fmt.component_size)
    P = buffer_height(h_out0)
    from sangnom_tpu.ops.pallas_kernel import _packed_smoothing

    C = 5 if _packed_smoothing(spec) else 9
    static_off = isinstance(offsets, int)

    out_chunks = []
    pool_last = None
    K = max(1, POOL_FAST_BATCH)
    for s in range(0, N, K):
        e = min(N, s + K)
        fpl = tuple(p[s:e] for p in planes)
        off = offsets if static_off else offsets[s:e]
        pool = jnp.zeros((P + 1, e - s, C, S), spec.acc_dtype)
        outs = []
        for i, p in enumerate(fpl):
            if i >= 3:
                # alpha passthrough (reference src/SangNom2.cpp:347)
                outs.append(jnp.repeat(p, 2, axis=1) if dh else p)
                continue
            if not dh and not process[i]:
                outs.append(p)
                continue
            # the only layout moves of the fast path: storage-dtype
            # frame<->row transposes of the plane itself (u8-cheap; the
            # accumulator-width pool/maps never change layout)
            kept_tm = jnp.moveaxis(_gather_kept_batch(p, off, dh), 0, 1)
            aaf = aaf_as_pixel(aafs[i], fmt)
            interp_tm, pool = interp_field_pool_tm_batch(
                kept_tm, pool, aaf, spec
            )
            out_tm = _assemble_tm_batch(kept_tm, interp_tm, off)
            outs.append(jnp.moveaxis(out_tm, 0, 1))
        out_chunks.append(outs)
        pool_last = pool[:, -1]
    outs = tuple(
        jnp.concatenate([c[i] for c in out_chunks], axis=0)
        if len(out_chunks) > 1 else out_chunks[0][i]
        for i in range(len(planes))
    )
    return outs, _pool_unpack_tm(pool_last, spec)
