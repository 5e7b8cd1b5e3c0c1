"""Chunked-Pallas smoothing for the width-sharded backend.

The jnp sharded smoothing (parallel/width_sharded.py) exchanges a 3-column
halo at EVERY row of the recursion — bufH ppermutes on the critical path,
each wrapping a single row of XLA elementwise ops.  This variant exploits
the influence cone instead: the recursion propagates horizontal influence
exactly 3 columns per row (reference src/SangNom2.cpp:129-152), so a shard
holding a (3R+3)-column halo of the smoothed carry row and of the raw maps
can compute R rows WITHOUT communication — the halo's validity shrinks by 3
columns per row and reaches exactly the local width on the chunk's last
row.  Per chunk: ONE ppermute (3R+3 columns of the carry row) + ONE Pallas
kernel running the R-row recursion entirely in VMEM; the raw maps are
halo-exchanged once for the whole plane.

Boundary semantics: the reference's hbox clamps its taps at the buffer
stride S (== the global sharded width).  Edge-REPLICATED halos on the
boundary shards realize the clamp exactly — a clamped tap reads col S-1,
and replication puts col S-1's value in every column beyond — identically
to the jnp sharded backend's per-row halo replication.

Bit-exactness: integer adds are associative so the in-kernel 7-tap sum is
trivially exact; for float the kernel keeps the reference's left-to-right
association (same order as ops/reference._hbox7).  Verified equal to the
scan backend on every sharded config in tests/test_sharding.py.

On non-TPU backends the kernel runs in Pallas interpret mode (exactly like
ops/pallas_kernel.py), which is how the CPU-mesh test suite and the
driver's multi-chip dryrun exercise this path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sangnom_tpu.ops.pallas_kernel import (
    _batch_clamp,
    _finalize,
    _pack_maps,
    _packed_smoothing,
    _rot,
    _unpack_sm,
)
from sangnom_tpu.ops.primitives import (
    KernelSpec,
    abs_diff,
    calc_sangnom,
    smooth_writeback,
)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _smooth_kernel(flags_ref, sm0_ref, r0_ref, r1_ref, out_ref, sm_ref, *,
                   spec, HK, W_loc, packed=False):
    """One chunk of the smoothing recursion: grid step t smooths row
    b0+t from (carried sm row, raw rows t and t+1), all on the halo-extended
    local width.

    flags_ref (SMEM, [2] i32): [is_leftmost_shard, is_rightmost_shard].
    The reference's hbox clamps its taps at the buffer stride, which makes
    every out-of-range column behave as a copy of the edge column.  The RAW
    halos realize that by one-time edge replication, but the recursively
    computed sm row must be RE-replicated at the global boundaries on every
    step (its in-halo values are computed, not copied — the jnp scan backend
    gets this implicitly by re-exchanging the line each row)."""
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        sm_ref[...] = sm0_ref[...]

    line = sm_ref[...] + r0_ref[0] + r1_ref[0]  # vertical 3-sum
    # 7-tap box sum, taps clamped at the extended-array edge (only the
    # cone-discarded outermost columns see the extended edge).
    # Left-to-right association, as the reference's C expression.
    W = line.shape[-1]
    col = jax.lax.broadcasted_iota(jnp.int32, line.shape, line.ndim - 1)

    def tap(k):
        kk = k % W
        rolled = jnp.concatenate([line[..., kk:], line[..., :kk]], axis=-1)
        if k > 0:
            return jnp.where(col >= W - k, line[..., W - 1 : W], rolled)
        return jnp.where(col < -k, line[..., :1], rolled)

    h = tap(-3)
    for k in (-2, -1):
        h = h + tap(k)
    h = h + line
    for k in (1, 2, 3):
        h = h + tap(k)
    if packed:
        # per-field (>>4) & 0xFF — see ops.pallas_kernel._packed_smoothing
        sm = jnp.right_shift(h, 4) & 0x00FF00FF
    else:
        sm = smooth_writeback(h, spec)

    # global-boundary replication of the computed row (see docstring): halo
    # columns of the leftmost/rightmost shard mirror their global edge col
    left = (flags_ref[0] != 0) & (col < HK)
    right = (flags_ref[1] != 0) & (col >= HK + W_loc)
    sm = jnp.where(left, sm[..., HK : HK + 1], sm)
    sm = jnp.where(right, sm[..., HK + W_loc - 1 : HK + W_loc], sm)

    out_ref[0] = sm
    sm_ref[...] = sm


def smooth_sharded_chunked(
    raw: jnp.ndarray, spec: KernelSpec, axis_name: str, chunk_rows: int = 16
) -> jnp.ndarray:
    """Sharded recursive smoothing, chunked-Pallas variant.

    raw: [9, N, bufH+1, W_loc] shard-local raw error maps (rows 0/bufH
    zero), accumulator dtype, inside shard_map.  Returns smoothed rows
    [bufH-1, 9, N, W_loc] — the same contract as
    ops.reference.smooth_scan(raw, row_axis=2).
    """
    from sangnom_tpu.parallel.width_sharded import _exchange_halo

    nine, N, bufHp1, W_loc = raw.shape
    bufH = bufHp1 - 1
    n_steps = bufH - 1
    if n_steps <= 0:
        return jnp.zeros((0, nine, N, W_loc), raw.dtype)

    # Packed-pair u8 smoothing (the sharded analogue of the single-chip
    # +20.9% win, ops.pallas_kernel._packed_smoothing): maps i and i+5
    # ride one i32 lane as 16-bit fields through the whole recursion, so
    # the kernel runs 5 slabs instead of 9 AND every halo collective
    # moves 4/9 less data.  Bit-exact: fields never interact (sums stay
    # < 2^16 per field) and the packed writeback wraps each field exactly
    # like the scalar; edge-replication selects copy whole lanes.
    packed = _packed_smoothing(spec)
    if packed:
        raw = _pack_maps(raw)
        nine = raw.shape[0]  # 5 packed slabs

    # halo radius: 3 cols/row of recursion creep + 3 hbox taps; the
    # exchange reaches only adjacent shards, so R adapts to thin shards
    R = max(1, min(chunk_rows, n_steps, (W_loc - 3) // 3 if W_loc > 6 else 1))
    HK = 3 * R + 3
    W_ext = max(_round_up(W_loc + 2 * HK, 128), 128)
    pad_r = W_ext - (W_loc + 2 * HK)  # slack on the right, edge-replicated

    # maps x frames flatten to independent rows for the smoothing pass;
    # ONE whole-field halo exchange on the full batch (sub-batches below
    # slice the exchanged array)
    rawx = _exchange_halo(raw.reshape(nine * N, bufHp1, W_loc), HK,
                          axis_name)
    rawx = jnp.pad(rawx, ((0, 0), (0, 0), (0, pad_r)), mode="edge")

    def _run(rawx_c: jnp.ndarray, Nc: int) -> jnp.ndarray:
        C = nine * Nc
        n_chunks = -(-n_steps // R)
        pad_rows = n_chunks * R + 1 - bufH  # raw rows 1..bufH feed steps
        rx = jnp.pad(rawx_c[:, 1:], ((0, 0), (0, pad_rows), (0, 0)))
        # [n_chunks, R+1, C, W_ext]: chunk c covers steps c*R..c*R+R-1,
        # reading raw rows (1+)c*R + t and + t+1 — overlapping row windows
        chunks = jnp.stack(
            [
                jnp.moveaxis(rx[:, c * R : c * R + R + 1], 0, 1)
                for c in range(n_chunks)
            ]
        )

        n_sh = jax.lax.axis_size(axis_name)
        idx = jax.lax.axis_index(axis_name)
        flags = jnp.stack(
            [(idx == 0).astype(jnp.int32),
             (idx == n_sh - 1).astype(jnp.int32)]
        )

        kernel = functools.partial(_smooth_kernel, spec=spec, HK=HK,
                                   W_loc=W_loc, packed=packed)
        row_view = lambda o: pl.BlockSpec(  # noqa: E731
            (1, C, W_ext), lambda t, o=o: (t + o, 0, 0),
            memory_space=pltpu.VMEM
        )
        call = pl.pallas_call(
            kernel,
            grid=(R,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((C, W_ext), lambda t: (0, 0),
                             memory_space=pltpu.VMEM),
                row_view(0),
                row_view(1),
            ],
            out_specs=pl.BlockSpec(
                (1, C, W_ext), lambda t: (t, 0, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((R, C, W_ext), raw.dtype),
            scratch_shapes=[pltpu.VMEM((C, W_ext), spec.acc_dtype)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024
            ),
            interpret=jax.default_backend() != "tpu",
        )

        def chunk_step(sm_local, raw_chunk):
            # ONE collective per R rows: the carried row's (3R+3)-col halo
            smx = _exchange_halo(sm_local, HK, axis_name)
            smx = jnp.pad(smx, ((0, 0), (0, pad_r)), mode="edge")
            out = call(flags, smx, raw_chunk, raw_chunk)  # [R, C, W_ext]
            sm_next = out[-1, :, HK : HK + W_loc]
            return sm_next, out[:, :, HK : HK + W_loc]

        sm0 = jnp.zeros((C, W_loc), raw.dtype)  # smoothed "row 0" seed
        _, sm = jax.lax.scan(chunk_step, sm0, chunks)
        return sm.reshape(n_chunks * R, nine, Nc, W_loc)[:n_steps]

    # Frame-batch bound: the kernel's persistent VMEM set (smx in-block,
    # row views, out block, scratch — all [C, W_ext] i32/f32 with
    # C = nine*N) scales linearly with the frame batch; same shared clamp
    # as the fused paths (ops.pallas_kernel._batch_clamp).
    g_max = _batch_clamp(4 * W_ext * nine * 6)
    if N <= g_max:
        sm = _run(rawx, N)
    else:
        rawv = rawx.reshape(nine, N, bufHp1, W_ext)
        n_fr = -(-N // g_max)
        per = -(-N // n_fr)
        outs = []
        for c in range(n_fr):
            sl = slice(c * per, min(N, (c + 1) * per))
            Nc = sl.stop - sl.start
            outs.append(
                _run(rawv[:, sl].reshape(nine * Nc, bufHp1, W_ext), Nc)
            )
        sm = jnp.concatenate(outs, axis=2)
    if packed:
        sm = jnp.stack(_unpack_sm(sm.swapaxes(0, 1))).swapaxes(0, 1)
    return sm


# ---------------------------------------------------------------------------
# Fully-fused sharded path (round 3): prepare + smoothing + finalize in ONE
# Pallas kernel per chunk — a width shard no longer runs XLA glue around a
# smoothing-only kernel (VERDICT_r2 "Next round" #4).
# ---------------------------------------------------------------------------


def _taps7_roll(a: jnp.ndarray) -> list[jnp.ndarray]:
    """Taps as PURE circular rolls — no clamp selects: the halo-extended
    array already carries real neighbor columns, edge-REPLICATED at the
    global boundaries by the kept exchange (loadPixel's clamp, reference
    src/SangNom2.cpp:25-34), and wrap contamination at the array ends lies
    outside the influence cone."""
    return [_rot(a, k) for k in range(-3, 4)]


def _pair_values_halo(c, n, spec: KernelSpec) -> list[jnp.ndarray]:
    """ops.pallas_kernel._pair_values with the halo tap source (same value
    layout: 14 taps + fwd1/fwd2/bwd1/bwd2)."""
    ct = _taps7_roll(c)
    nt = _taps7_roll(n)
    fwd1 = calc_sangnom(ct[2], ct[3], ct[4], spec)
    fwd2 = calc_sangnom(nt[4], nt[3], nt[2], spec)
    bwd1 = calc_sangnom(ct[4], ct[3], ct[2], spec)
    bwd2 = calc_sangnom(nt[2], nt[3], nt[4], spec)
    return ct + nt + [fwd1, fwd2, bwd1, bwd2]


def _full_kernel(meta_ref, sm0_ref, k0_ref, k1_ref, k2_ref, out_ref,
                 smout_ref, sm_ref, raw_ref, pair_ref, prev0_ref=None,
                 off_ref=None, prevout_ref=None, prev_ref=None, *, spec,
                 w_glob, W_loc, HALO, n_steps, aaf, packed,
                 weave_offset=None):
    """One fused chunk: grid step t computes buffer row b = base + t + 1 —
    pair values + raw maps (prepare), the smoothing recursion row, and the
    finalize select — entirely in VMEM on the halo-extended width.

    meta_ref (SMEM, [4] i32): [is_leftmost, is_rightmost, gcol0 (global
    column of array column 0), base (global step of chunk-local t=0)].
    Mirrors ops.pallas_kernel._kernel (pair-carry reuse, packed u8
    smoothing) with three sharding deltas: taps need no clamp selects
    (halo + global edge replication supply them), the raw zero-mask
    compares GLOBAL columns against the plane width, and the vertical-sum
    line is re-replicated at the GLOBAL edges each step (the hbox clamp at
    0/S, exactly `_smooth_kernel`'s fixup).

    ``weave_offset`` non-None selects IN-KERNEL WEAVE emission (the
    sharded analogue of ops.pallas_kernel._kernel's weave arm): each step
    emits output rows {2s, 2s+1} of the final interleaved plane for the
    GLOBAL step s = base + t, incl. the boundary-line duplication; the
    grid covers bufH steps (one more than interpolation needs) for the
    tail rows.  0/1 are static offsets; "pf" reads per-frame offsets from
    ``off_ref`` ([N, 128] i32 lanes).  offset 1 / "pf" emit the interp
    row one step late through ``prev_ref`` scratch, seeded across CHUNK
    boundaries from ``prev0_ref`` and carried out via ``prevout_ref``."""
    t = pl.program_id(0)
    acc = spec.acc_dtype
    left = meta_ref[0] != 0
    right = meta_ref[1] != 0
    gcol0 = meta_ref[2]
    base = meta_ref[3]
    k2 = k2_ref[0].astype(acc)

    def raw_of(v):
        (cm3, cm2, cm1, c0, cp1, cp2, cp3,
         nm3, nm2, nm1, n0, np1, np2, np3,
         fwd1, fwd2, bwd1, bwd2) = v
        maps = jnp.stack([
            abs_diff(cm3, np3), abs_diff(cm2, np2), abs_diff(cm1, np1),
            abs_diff(fwd1, fwd2), abs_diff(c0, n0), abs_diff(bwd1, bwd2),
            abs_diff(cp1, nm1), abs_diff(cp2, nm2), abs_diff(cp3, nm3),
        ])
        # zero-defined padding beyond the GLOBAL plane width (SURVEY.md §2
        # quirk 2); halo columns carry the neighbor's real global position
        gcol = gcol0 + jax.lax.broadcasted_iota(
            jnp.int32, maps.shape, maps.ndim - 1
        )
        maps = jnp.where(gcol < w_glob, maps, jnp.zeros((), maps.dtype))
        return _pack_maps(maps) if packed else maps

    @pl.when(t == 0)
    def _():
        v01 = _pair_values_halo(k0_ref[0].astype(acc), k1_ref[0].astype(acc),
                                spec)
        pair_ref[...] = jnp.stack(v01)
        raw_ref[...] = raw_of(v01)
        sm_ref[...] = sm0_ref[...]  # carried from the previous chunk
        if prev_ref is not None:
            prev_ref[...] = prev0_ref[...]  # interp row carried across chunks

    pv = [pair_ref[i] for i in range(18)]
    # pair-carry reuse (see ops.pallas_kernel._kernel): only row b+1's taps
    # and two predictors are new work
    nt = _taps7_roll(k2)
    v12 = pv[7:14] + nt + [
        pv[17], calc_sangnom(nt[4], nt[3], nt[2], spec),
        pv[15], calc_sangnom(nt[2], nt[3], nt[4], spec),
    ]
    raw_next = raw_of(v12)
    raw_next = jnp.where(base + t < n_steps - 1, raw_next,
                         jnp.zeros((), raw_next.dtype))

    line = sm_ref[...] + raw_ref[...] + raw_next
    # hbox clamp at the global 0/S edges: replicate the line's edge value
    # through the halo on the boundary shards (interior shards' halos hold
    # real neighbor data; the recursion re-fixes these columns every step)
    col = jax.lax.broadcasted_iota(jnp.int32, line.shape, line.ndim - 1)
    line = jnp.where(left & (col < HALO), line[..., HALO : HALO + 1], line)
    line = jnp.where(right & (col >= HALO + W_loc),
                     line[..., HALO + W_loc - 1 : HALO + W_loc], line)
    if spec.is_float:
        # left-to-right association (the reference's C expression order).
        # Default: the leading-pair roll reuse (ops.pallas_kernel
        # ._FLOAT_HBOX_PAIR, shared trace-time hook): the chain's first
        # add (t-3 + t-2) is computed once at shift 0 and rotated into
        # place, and its +1 operand IS tap t+1 — 5 rolls per slab
        # instead of 6.  Wrap contamination stays within 3 lanes per
        # side (rot(p,-3) reads p's last wrap lane into lane 2), the
        # same envelope as the pure tap rolls, re-fixed from the halo
        # every step.
        from sangnom_tpu.ops import pallas_kernel as _pk

        if _pk._FLOAT_HBOX_PAIR:
            t_p1 = _rot(line, 1)
            p = line + t_p1
            h = _rot(p, -3) + _rot(line, -1)
            h = h + line
            h = h + t_p1
            h = h + _rot(line, 2)
            h = h + _rot(line, 3)
        else:
            taps = _taps7_roll(line)
            h = taps[0]
            for tp in taps[1:3] + [line] + taps[4:]:
                h = h + tp
    else:
        # 3-roll cumulative-sub bulk (see ops.pallas_kernel._HBOX_SUB3;
        # +5.2% single-chip): wrap contamination stays within 3 lanes per
        # side, inside the halo the recursion re-fixes every step
        b = line + _rot(line, 1)
        cm = b + _rot(b, 2)             # taps {0..3}
        h = cm + _rot(cm, -3) - line    # {-3..3}, tap 0 dedup
    if packed:
        sm = jnp.right_shift(h, 4) & 0x00FF00FF
    else:
        sm = smooth_writeback(h, spec)
    sm_ref[...] = sm
    smout_ref[...] = sm  # constant index map: the last step's row survives

    sm9 = _unpack_sm(sm) if packed else [sm[i] for i in range(9)]
    res = _finalize(pv, sm9, aaf, spec).astype(out_ref.dtype)
    if weave_offset is None:
        out_ref[0] = res
    else:
        # in-kernel weave (the sharded analogue of ops.pallas_kernel
        # ._kernel's weave arm): GLOBAL step s emits output rows {2s, 2s+1}.
        # The grid covers one extra global step (s == n_steps) whose
        # finalize result is discarded by the selects below; res is valid
        # for s < n_steps only.
        s = base + t
        k0_raw = k0_ref[0]  # kept row s, STORAGE dtype (pre-widening)
        if weave_offset == "pf":
            off0 = off_ref[:, 0:1] == 0  # [N, 1], broadcasts over lanes
            out_ref[0] = jnp.where(off0 | (s == 0), k0_raw, prev_ref[...])
            out_ref[1] = jnp.where(off0 & (s < n_steps), res, k0_raw)
        elif weave_offset == 0:
            # rows {2s, 2s+1} = (kept[s], interp[s]); tail rows duplicate
            # the last kept line (reference src/SangNom2.cpp:381-385)
            out_ref[0] = k0_raw
            out_ref[1] = jnp.where(s < n_steps, res, k0_raw)
        else:
            # rows {2s, 2s+1} = (interp[s-1], kept[s]); row 0 duplicates
            # kept[0] (reference src/SangNom2.cpp:386-391) — interp rows
            # are emitted one step LATE through the prev carry
            out_ref[0] = jnp.where(s == 0, k0_raw, prev_ref[...])
            out_ref[1] = k0_raw
        if prev_ref is not None:
            prev_ref[...] = res
            prevout_ref[...] = res  # constant map: chunk's last res survives
    raw_ref[...] = raw_next
    pair_ref[...] = jnp.stack(v12)


def interpolate_fused_full(
    kept: jnp.ndarray, aaf, spec: KernelSpec, axis_name: str,
    plane_width: int | None = None, chunk_rows: int = 16,
) -> jnp.ndarray:
    """Fully-fused width-sharded interpolation: [N, bufH, W_loc] shard-local
    kept field (STORAGE dtype) -> [N, bufH-1, W_loc], same contract as
    `interpolate_field_width_sharded`; must run inside shard_map.

    Communication per plane: ONE kept-field halo exchange in the narrow
    storage dtype (4x less ICI than the widened exchange for 8-bit), then
    one (3R+6)-column carry-row ppermute per R rows.  Everything else —
    taps, predictors, error maps, the recursive smoothing, the priority
    select — runs in one Pallas kernel per chunk with the same VMEM
    carries as the single-chip kernel (pair-carry reuse, packed u8
    smoothing), so a width shard's compute path matches the single-chip
    fused kernel instead of per-row XLA glue.
    """
    return _fused_full(kept, aaf, spec, axis_name, plane_width, chunk_rows)


def deinterlace_fused_full(
    kept: jnp.ndarray, offsets, aaf, spec: KernelSpec, axis_name: str,
    plane_width: int | None = None, chunk_rows: int = 16,
) -> jnp.ndarray:
    """Sharded IN-KERNEL WEAVE: [N, bufH, W_loc] shard-local kept field ->
    the COMPLETE deinterlaced local plane [N, 2*bufH, W_loc], kept and
    interpolated rows interleaved per ``offsets`` with the boundary line
    duplicated — the sharded analogue of
    ops.pallas_kernel.deinterlace_field_batch_fused, so a width shard no
    longer pays the XLA-side interleave pass either.  ``offsets`` is a
    static int (0/1) or a per-frame [N] array (offsets read as data inside
    the kernel, serving order=0 mixed-parity batches).  Must run inside
    shard_map; same communication pattern as `interpolate_fused_full`.
    """
    per_frame = not isinstance(offsets, int)
    return _fused_full(
        kept, aaf, spec, axis_name, plane_width, chunk_rows,
        weave_offset="pf" if per_frame else offsets,
        offsets=offsets if per_frame else None,
    )


def _fused_batch(W_ext: int, n_sm: int) -> int:
    """Frames per fused-kernel invocation (the sharded analogue of
    ops.pallas_kernel._kernel_batch): 28 MiB budget over the per-frame
    persistent VMEM set — sm + raw scratch, sm0 input view and smout
    output (all [n_sm, g, W_ext] i32/f32), the 18-slab pair carry, and
    the prev/out storage rows — leaving the rest of the 64 MiB window
    for kernel-body temporaries (which also scale with g)."""
    per_frame = 4 * W_ext * (4 * n_sm + 18 + 2)
    return _batch_clamp(per_frame)


def _fused_full(
    kept: jnp.ndarray, aaf, spec: KernelSpec, axis_name: str,
    plane_width: int | None, chunk_rows: int,
    weave_offset=None, offsets=None, _keptx=None,
) -> jnp.ndarray:
    from sangnom_tpu.parallel.width_sharded import _exchange_halo

    out_dtype = kept.dtype
    N, bufH, W_loc = kept.shape
    n_steps = bufH - 1
    if n_steps <= 0:
        return jnp.zeros((N, 0, W_loc), out_dtype)
    w_glob = plane_width
    if w_glob is None:
        w_glob = W_loc * jax.lax.psum(1, axis_name)  # unsharded width
        # (sharded callers always pass plane_width; this keeps the
        # single-shard fallback well-defined)
    packed = _packed_smoothing(spec)
    n_sm = 5 if packed else 9
    weave = weave_offset is not None
    # interp rows are emitted one step late for offset 1 / per-frame
    # offsets: a cross-chunk carry rides the scan state
    prev_carry = weave_offset in (1, "pf")
    # the weave grid covers bufH global steps (one more than interpolation
    # needs) for the tail output rows
    n_tot = bufH if weave else n_steps

    # halo: 3 cols/row of recursion creep over R rows + 3 hbox taps
    # + 3 pixel taps (raw maps computed in-kernel from kept); the exchange
    # reaches only the adjacent shard, so HALO = 3R+6 <= W_loc (the caller
    # falls back to the chunked-smoothing path for W_loc < 9)
    R = max(1, min(chunk_rows, n_tot, (W_loc - 6) // 3))
    HALO = 3 * R + 6
    W_ext = max(_round_up(W_loc + 2 * HALO, 128), 128)
    pad_r = W_ext - W_loc - 2 * HALO

    # one whole-field exchange in the storage dtype; right slack is
    # edge-replicated (outside the cone; keeps the rightmost shard's
    # replication consistent)
    if _keptx is None:
        keptx = _exchange_halo(kept, HALO, axis_name)
        keptx = jnp.pad(keptx, ((0, 0), (0, 0), (0, pad_r)), mode="edge")
    else:
        keptx = _keptx  # recursion below: already exchanged, frame-sliced

    # Frame-batch chunking: every VMEM carry/block below scales linearly
    # with the frame batch ([n_sm, N, W_ext] x4 + the 18-slab pair carry),
    # so a production-sized local batch (headline B=120 at 1080p) would
    # blow the 64 MB scoped-VMEM window that the single-chip path avoids
    # via _kernel_batch.  Same shared clamp (28 MiB budget + _CHUNK_CAP),
    # counting this kernel's larger persistent set (sm+raw scratch, sm0
    # in, smout out, pair, prev/out rows); <= 2 distinct chunk shapes ->
    # <= 2 compiles.  The halo exchange above runs ONCE on the full batch
    # (same total bytes; one ppermute per plane, not one per sub-batch) —
    # sub-batches slice the exchanged array, geometry is N-independent.
    g_max = _fused_batch(W_ext, n_sm)
    if N > g_max:
        n_fr = -(-N // g_max)
        per = -(-N // n_fr)
        outs = []
        for c in range(n_fr):
            sl = slice(c * per, min(N, (c + 1) * per))
            off_c = (offsets[sl] if offsets is not None
                     and not isinstance(offsets, int) else offsets)
            outs.append(_fused_full(
                kept[sl], aaf, spec, axis_name, plane_width, chunk_rows,
                weave_offset, off_c, _keptx=keptx[sl],
            ))
        return jnp.concatenate(outs, axis=0)

    n_chunks = -(-n_tot // R)
    keptx = jnp.pad(keptx, ((0, 0), (0, n_chunks * R + 2 - bufH), (0, 0)))
    rows = jnp.moveaxis(keptx, 1, 0)  # [rows, N, W_ext]
    chunks = jnp.stack(
        [rows[c * R : c * R + R + 2] for c in range(n_chunks)]
    )  # [n_chunks, R+2, N, W_ext] (2 rows of overlap re-read per chunk)

    idx = jax.lax.axis_index(axis_name)
    n_sh = jax.lax.axis_size(axis_name)
    meta_base = jnp.stack([
        (idx == 0).astype(jnp.int32),
        (idx == n_sh - 1).astype(jnp.int32),
        (idx * W_loc - HALO).astype(jnp.int32),
    ])
    bases = jnp.arange(n_chunks, dtype=jnp.int32) * R

    body = functools.partial(
        _full_kernel, spec=spec, w_glob=w_glob, W_loc=W_loc, HALO=HALO,
        n_steps=n_steps, aaf=aaf, packed=packed, weave_offset=weave_offset,
    )
    row_view = lambda o: pl.BlockSpec(  # noqa: E731
        (1, N, W_ext), lambda t, o=o: (t + o, 0, 0), memory_space=pltpu.VMEM
    )
    const_view = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda t: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        const_view((n_sm, N, W_ext)),
        row_view(0), row_view(1), row_view(2),
    ]
    out_specs = [
        pl.BlockSpec((2 if weave else 1, N, W_ext), lambda t: (t, 0, 0),
                     memory_space=pltpu.VMEM),
        const_view((n_sm, N, W_ext)),
    ]
    out_shape = [
        jax.ShapeDtypeStruct(((2 if weave else 1) * R, N, W_ext), out_dtype),
        jax.ShapeDtypeStruct((n_sm, N, W_ext), spec.acc_dtype),
    ]
    scratch = [
        pltpu.VMEM((n_sm, N, W_ext), spec.acc_dtype),  # sm row b-1
        pltpu.VMEM((n_sm, N, W_ext), spec.acc_dtype),  # raw row b
        pltpu.VMEM((18, N, W_ext), spec.acc_dtype),    # pair carry
    ]
    per_frame = weave_offset == "pf"
    if prev_carry:
        in_specs.append(const_view((N, W_ext)))        # prev0 (chunk seed)
        if per_frame:
            in_specs.append(const_view((N, 128)))      # per-frame offsets
        out_specs.append(const_view((N, W_ext)))       # prevout
        out_shape.append(jax.ShapeDtypeStruct((N, W_ext), out_dtype))
        scratch.append(pltpu.VMEM((N, W_ext), out_dtype))  # carried interp

        if per_frame:
            def kernel(meta, sm0, k0, k1, k2, prev0, off, out, smout,
                       prevout, sm, raw, pair, prev):
                body(meta, sm0, k0, k1, k2, out, smout, sm, raw, pair,
                     prev0_ref=prev0, off_ref=off, prevout_ref=prevout,
                     prev_ref=prev)
        else:
            def kernel(meta, sm0, k0, k1, k2, prev0, out, smout, prevout,
                       sm, raw, pair, prev):
                body(meta, sm0, k0, k1, k2, out, smout, sm, raw, pair,
                     prev0_ref=prev0, prevout_ref=prevout, prev_ref=prev)
    else:
        kernel = body
    call = pl.pallas_call(
        kernel,
        grid=(R,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
        interpret=jax.default_backend() != "tpu",
    )
    if per_frame:
        # [N, 128] i32 lane-broadcast offsets (the smallest Mosaic-tileable
        # shape), constant across chunks
        offp = jnp.broadcast_to(
            jnp.asarray(offsets, jnp.int32)[:, None], (N, 128)
        )

    def chunk_step(carry, xs):
        sm_loc, prev = carry
        chunk, b = xs
        # ONE collective per R rows: the carry row's halo
        smx = _exchange_halo(sm_loc, HALO, axis_name)
        smx = jnp.pad(smx, ((0, 0), (0, 0), (0, pad_r)), mode="edge")
        meta = jnp.concatenate([meta_base, b[None]])
        operands = [meta, smx, chunk, chunk, chunk]
        if prev_carry:
            operands.append(prev)
            if per_frame:
                operands.append(offp)
            res, smo, prev = call(*operands)
        else:
            res, smo = call(*operands)
        return (smo[:, :, HALO : HALO + W_loc], prev), res

    sm0 = jnp.zeros((n_sm, N, W_loc), spec.acc_dtype)
    prev0 = jnp.zeros((N, W_ext), out_dtype)  # never read at global step 0
    (_, _), res = jax.lax.scan(chunk_step, (sm0, prev0), (chunks, bases))
    res = res.reshape(n_chunks * R * (2 if weave else 1), N, W_ext)
    res = res[: 2 * bufH if weave else n_steps, :, HALO : HALO + W_loc]
    return jnp.moveaxis(res, 0, 1).astype(out_dtype)
