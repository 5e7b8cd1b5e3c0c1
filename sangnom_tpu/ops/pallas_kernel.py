"""Fused Pallas TPU kernel — the performance backend (opt=1 / auto-on-TPU).

Fuses the reference's three raster passes (prepare -> 9x smooth -> finalize,
reference src/SangNom2.cpp:259-273) into ONE kernel so the 9 error maps never
touch HBM.  The TPU grid walks kept-line pairs top to bottom — TPU grids
execute sequentially on a core, so the in-place vertical smoothing recursion
(SURVEY.md §2 quirk 1; reference src/SangNom2.cpp:129-131, 155-157) becomes
the grid dimension, with the previous smoothed row and previous raw error
maps carried in VMEM scratch.  Per grid step t (buffer row b = t+1):

    raw[b+1]   = error_maps(kept[b], kept[b+1])        (zero past the end)
    sm[b]      = hbox7_clamped(sm[b-1] + raw[b] + raw[b+1]) / 16
    out[b-1]   = finalize(kept[b-1], kept[b], sm[b])
    carry      <- sm[b], raw[b+1]

HBM traffic per frame is just the kept field in (3 streamed row views) and
the interpolated field out — ~11 raster passes in the reference collapse to
~1.3.  A frame batch rides the sublane dimension so every VPU op is [B, W].

Bit-exact to the jnp reference path by construction: identical primitives
(sangnom_tpu.ops.primitives), identical clamp geometry — taps clamp at the
plane width w for pixel reads (reference loadPixel, src/SangNom2.cpp:25-34)
and at the padded buffer stride S for the smoothing pass (reference
src/SangNom2.cpp:141-150), with columns >= S never feeding back (the clamp
keeps all reads below S), so the kernel can compute on a 128-lane-aligned
width S_pad >= S with garbage tolerated beyond S.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sangnom_tpu.ops.primitives import KernelSpec, abs_diff, avg_pair, calc_sangnom


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _col_iota(shape):
    return jax.lax.broadcasted_iota(jnp.int32, shape, len(shape) - 1)


def _shift_clamped(a: jnp.ndarray, k: int, n: int) -> jnp.ndarray:
    """tap[x] = a[..., clamp(x + k, 0, n - 1)] for x < n (values for x >= n
    are bounded but unspecified).  Static-shape roll + edge select — the
    vectorized loadPixel (reference src/SangNom2.cpp:25-34)."""
    if k == 0:
        return a
    S = a.shape[-1]
    kk = k % S
    rolled = jnp.concatenate([a[..., kk:], a[..., :kk]], axis=-1)
    col = _col_iota(a.shape)
    if k > 0:
        return jnp.where(col >= n - k, a[..., n - 1 : n], rolled)
    return jnp.where(col < -k, a[..., :1], rolled)


def _taps7(a: jnp.ndarray, n: int) -> list[jnp.ndarray]:
    return [_shift_clamped(a, k, n) for k in range(-3, 4)]


def _error_maps(c, n, spec: KernelSpec, w: int) -> jnp.ndarray:
    """9 raw error maps for one kept-line pair; [9, B, S_pad] with columns
    >= w zeroed (the zero-defined padding contract, SURVEY.md §2 quirk 2).
    Map order is spatial priority (reference enum Buffers, src/SangNom2.h:
    8-20; stores at src/SangNom2.cpp:103-117)."""
    cm3, cm2, cm1, c0, cp1, cp2, cp3 = _taps7(c, w)
    nm3, nm2, nm1, n0, np1, np2, np3 = _taps7(n, w)
    fwd1 = calc_sangnom(cm1, c0, cp1, spec)
    fwd2 = calc_sangnom(np1, n0, nm1, spec)
    bwd1 = calc_sangnom(cp1, c0, cm1, spec)
    bwd2 = calc_sangnom(nm1, n0, np1, spec)
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
    zero = jnp.zeros((), maps.dtype)
    return jnp.where(_col_iota(maps.shape) < w, maps, zero)


def _finalize(c, n, sm, aaf, spec: KernelSpec, w: int) -> jnp.ndarray:
    """Min-error priority select for one output row (reference
    src/SangNom2.cpp:161-257); reverse-order masked overwrites realize the
    if-chain priority exactly (same trick as the reference's SIMD path,
    src/SangNom2_SSE2.cpp:1032-1058)."""
    cm3, cm2, cm1, c0, cp1, cp2, cp3 = _taps7(c, w)
    nm3, nm2, nm1, n0, np1, np2, np3 = _taps7(n, w)
    fwd1 = calc_sangnom(cm1, c0, cp1, spec)
    fwd2 = calc_sangnom(np1, n0, nm1, spec)
    bwd1 = calc_sangnom(cp1, c0, cm1, spec)
    bwd2 = calc_sangnom(nm1, n0, np1, spec)

    mn = jnp.min(sm, axis=0)
    res = avg_pair(cm3, np3, spec)
    for idx, val in (
        (8, avg_pair(cp3, nm3, spec)),
        (1, avg_pair(cm2, np2, spec)),
        (7, avg_pair(cp2, nm2, spec)),
        (2, avg_pair(cm1, np1, spec)),
        (6, avg_pair(cp1, nm1, spec)),
        (3, avg_pair(fwd1, fwd2, spec)),
        (5, avg_pair(bwd1, bwd2, spec)),
    ):
        res = jnp.where(sm[idx] == mn, val, res)
    aaf_c = jnp.asarray(aaf, c.dtype)
    return jnp.where((sm[4] == mn) | (mn > aaf_c), avg_pair(c0, n0, spec), res)


def _kernel(k0_ref, k1_ref, k2_ref, out_ref, sm_ref, raw_ref, *, spec, w, S,
            n_steps, aaf):
    t = pl.program_id(0)
    k0 = k0_ref[0]
    k1 = k1_ref[0]
    k2 = k2_ref[0]

    @pl.when(t == 0)
    def _():
        # buffer row 0 is zero-defined; raw[1] comes from kept rows (0, 1)
        sm_ref[...] = jnp.zeros(sm_ref.shape, sm_ref.dtype)
        raw_ref[...] = _error_maps(k0, k1, spec, w)

    raw_next = _error_maps(k1, k2, spec, w)
    # past the last pair, raw[bufH] is the zero-defined row
    raw_next = jnp.where(t < n_steps - 1, raw_next, jnp.zeros((), raw_next.dtype))

    # recursive smoothing step (reference src/SangNom2.cpp:126-159): the
    # vertical 3-sum uses the ALREADY-SMOOTHED previous row from scratch
    line = sm_ref[...] + raw_ref[...] + raw_next
    taps = _taps7(line, S)
    h = taps[0]
    for tp in taps[1:]:
        h = h + tp
    if spec.is_float:
        sm = h * jnp.float32(1.0 / 16.0)
    else:
        sm = jnp.right_shift(h, 4) & spec.mask

    out_ref[0] = _finalize(k0, k1, sm, aaf, spec, w)
    sm_ref[...] = sm
    raw_ref[...] = raw_next


# Frames per kernel invocation: bounds the [9, B, S_pad] VMEM scratch and
# kernel-body temporaries under the ~16 MB scoped-VMEM budget at 1080p.
_MAX_KERNEL_BATCH = 8


def interpolate_field_batch(
    kept: jnp.ndarray, aaf, spec: KernelSpec, stride: int
) -> jnp.ndarray:
    """[N, bufH, w] kept field -> [N, bufH-1, w] interpolated lines.

    Batches larger than the VMEM budget are processed in fixed-size chunks
    via `lax.map` (sequential on the chip — the kernel is serial per core
    anyway; cross-chip scaling shards frames, see sangnom_tpu.parallel).
    """
    B, bufH, w = kept.shape
    if bufH < 2:
        return jnp.zeros((B, 0, w), kept.dtype)
    if B > _MAX_KERNEL_BATCH:
        g = _MAX_KERNEL_BATCH
        pad = (-B) % g
        kp = jnp.pad(kept, ((0, pad), (0, 0), (0, 0)))
        chunks = kp.reshape(-1, g, bufH, w)
        out = jax.lax.map(
            lambda c: _interp_chunk(c, aaf, spec, stride), chunks
        )
        return out.reshape(-1, bufH - 1, w)[:B]
    return _interp_chunk(kept, aaf, spec, stride)


def _interp_chunk(
    kept: jnp.ndarray, aaf, spec: KernelSpec, stride: int
) -> jnp.ndarray:
    B, bufH, w = kept.shape
    S = stride
    S_pad = max(_round_up(S, 128), 128)
    n_steps = bufH - 1

    # Row-major layout [row, frame, column]: blocks of one full [B, S_pad]
    # row slab satisfy the TPU (sublane, lane) tiling rule for any B, and
    # the sequential row walk is the leading (grid) dimension.
    keptp = jnp.pad(kept, ((0, 0), (0, 1), (0, S_pad - w)))  # zero row below
    keptp = jnp.moveaxis(keptp, 1, 0)  # [bufH+1, B, S_pad]

    kernel = functools.partial(
        _kernel, spec=spec, w=w, S=S, n_steps=n_steps, aaf=aaf
    )
    row_view = lambda o: pl.BlockSpec(  # noqa: E731
        (1, B, S_pad), lambda t, o=o: (t + o, 0, 0), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        kernel,
        grid=(n_steps,),
        in_specs=[row_view(0), row_view(1), row_view(2)],
        out_specs=pl.BlockSpec(
            (1, B, S_pad), lambda t: (t, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n_steps, B, S_pad), kept.dtype),
        scratch_shapes=[
            pltpu.VMEM((9, B, S_pad), kept.dtype),  # smoothed row b-1
            pltpu.VMEM((9, B, S_pad), kept.dtype),  # raw row b
        ],
        interpret=jax.default_backend() != "tpu",
    )(keptp, keptp, keptp)
    return jnp.moveaxis(out, 0, 1)[..., :w]


def interpolate_field(kept: jnp.ndarray, aaf, spec: KernelSpec, stride: int):
    """Single-frame convenience wrapper."""
    return interpolate_field_batch(kept[None], aaf, spec, stride)[0]
