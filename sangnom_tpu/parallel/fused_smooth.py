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
    _pack_maps,
    _packed_smoothing,
    _unpack_sm,
)
from sangnom_tpu.ops.primitives import KernelSpec, smooth_writeback


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

    C = nine * N  # maps x frames: independent rows for the smoothing pass
    rawx = _exchange_halo(raw.reshape(C, bufHp1, W_loc), HK, axis_name)
    rawx = jnp.pad(rawx, ((0, 0), (0, 0), (0, pad_r)), mode="edge")

    n_chunks = -(-n_steps // R)
    pad_rows = n_chunks * R + 1 - bufH  # raw rows 1..bufH feed the steps
    rawx = jnp.pad(rawx[:, 1:], ((0, 0), (0, pad_rows), (0, 0)))
    # [n_chunks, R+1, C, W_ext]: chunk c covers steps c*R..c*R+R-1, reading
    # raw rows (1+)c*R + t and + t+1 — overlapping row windows
    chunks = jnp.stack(
        [
            jnp.moveaxis(rawx[:, c * R : c * R + R + 1], 0, 1)
            for c in range(n_chunks)
        ]
    )

    n_sh = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    flags = jnp.stack(
        [(idx == 0).astype(jnp.int32), (idx == n_sh - 1).astype(jnp.int32)]
    )

    kernel = functools.partial(_smooth_kernel, spec=spec, HK=HK, W_loc=W_loc,
                               packed=packed)
    row_view = lambda o: pl.BlockSpec(  # noqa: E731
        (1, C, W_ext), lambda t, o=o: (t + o, 0, 0), memory_space=pltpu.VMEM
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
    _, sm = jax.lax.scan(chunk_step, sm0, chunks)  # [n_chunks, R, C, W_loc]
    sm = sm.reshape(n_chunks * R, nine, N, W_loc)[:n_steps]
    if packed:
        sm = jnp.stack(_unpack_sm(sm.swapaxes(0, 1))).swapaxes(0, 1)
    return sm
