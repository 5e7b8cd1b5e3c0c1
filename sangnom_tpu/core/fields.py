"""Field-geometry clip utilities: SeparateFields / DoubleWeave / bob.

The reference's double-rate mode requires the host to prepare the clip:
"user must call std.SeparateFields().std.DoubleWeave() before use" for
order=0 (reference src/SangNom2.cpp:18-23).  A standalone framework provides
those host utilities itself, with AviSynth's field semantics:

- `separate_fields`: each interlaced frame -> two half-height field frames,
  ordered by the clip's field dominance (tff); per-field parity recorded.
- `double_weave`: frame n = weave of fields (n, n+1) — same frame count,
  double height, parity from the leading field.
- `bob`: the whole double-rate deinterlace pipeline:
  separate_fields -> double_weave -> SangNom2(order=0).
"""

from __future__ import annotations

import jax.numpy as jnp

from sangnom_tpu.core.clip import Clip


def separate_fields(clip: Clip, tff: bool | None = None) -> Clip:
    """[N, H, W] frames -> [2N, H/2, W] field frames.

    Field order follows ``tff`` (default: the clip's flag): tff=True emits
    (top, bottom) per frame, and the emitted parity array marks each top
    field True.
    """
    if clip.height % 2:
        raise ValueError("separate_fields: height must be even.")
    tff = clip.tff if tff is None else tff

    def split(p: jnp.ndarray) -> jnp.ndarray:
        n, h, w = p.shape
        top = p[:, 0::2]  # [N, h/2, w]
        bot = p[:, 1::2]
        first, second = (top, bot) if tff else (bot, top)
        return jnp.stack([first, second], axis=1).reshape(2 * n, h // 2, w)

    n = clip.num_frames
    parity = jnp.tile(jnp.asarray([tff, not tff]), n)
    return Clip(
        [split(p) for p in clip.planes],
        clip.format,
        parity=parity,
        tff=tff,
        props={**clip.props, "field_based": True},
    )


def weave(clip: Clip) -> Clip:
    """Inverse of separate_fields: field pairs (2k, 2k+1) -> [N/2, 2h, W]."""
    if clip.num_frames % 2:
        raise ValueError("weave: field count must be even.")
    parity = clip.parity_array()

    def join(p: jnp.ndarray) -> jnp.ndarray:
        m, h, w = p.shape
        pairs = p.reshape(m // 2, 2, h, w)
        return _weave_pair(pairs[:, 0], pairs[:, 1], parity[0::2])

    props = {k: v for k, v in clip.props.items() if k != "field_based"}
    return Clip([join(p) for p in clip.planes], clip.format,
                tff=clip.get_parity(0), props=props)


def _weave_pair(first, second, first_is_top):
    """Interleave two field batches by the first field's parity."""
    m, h, w = first.shape
    top_first = jnp.stack([first, second], axis=2).reshape(m, 2 * h, w)
    bot_first = jnp.stack([second, first], axis=2).reshape(m, 2 * h, w)
    return jnp.where(first_is_top[:, None, None], top_first, bot_first)


def double_weave(clip: Clip) -> Clip:
    """Field frames -> same-count full-height frames: frame n weaves fields
    (n, n+1); the last frame weaves (N-1, N-1) degenerately like AviSynth's
    final duplicated pairing."""
    parity = clip.parity_array()

    def dw(p: jnp.ndarray) -> jnp.ndarray:
        nxt = jnp.concatenate([p[1:], p[-1:]], axis=0)
        return _weave_pair(p, nxt, parity)

    return Clip(
        [dw(p) for p in clip.planes],
        clip.format,
        parity=clip.parity,
        tff=clip.tff,
        props=clip.props,
    )


def bob(clip: Clip, aa: int = 48, aac: int = 0, luma: bool = True,
        chroma: bool = True, opt: int = -1, tff: bool | None = None,
        pool_compat: bool = False, numerics: str = "c") -> Clip:
    """Double-rate deinterlace: SeparateFields -> DoubleWeave ->
    SangNom2(order=0) (the reference's documented double-rate recipe,
    src/SangNom2.cpp:18-23).  Returns 2N full-height frames."""
    from sangnom_tpu.api import sangnom2

    fields = separate_fields(clip, tff=tff)
    woven = double_weave(fields)
    return sangnom2(woven, order=0, aa=aa, aac=aac, luma=luma,
                    chroma=chroma, opt=opt, pool_compat=pool_compat,
                    numerics=numerics)
