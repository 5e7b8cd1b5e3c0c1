"""Mesh construction and the sharded filter entry point.

`sangnom2_sharded` is the multi-chip analogue of the host's frame-MT in the
reference (MT_MULTI_INSTANCE, reference src/SangNom2.h:63-66): frames shard
over the ``data`` mesh axis with zero communication, and optionally each
plane's width shards over the ``space`` axis with ppermute halo exchange
(sangnom_tpu.parallel.width_sharded).  Everything runs inside one
`shard_map`-wrapped jit so XLA lays collectives on ICI.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from sangnom_tpu.core.clip import Clip
from sangnom_tpu.ops.sangnom import sangnom2_impl
from sangnom_tpu.parallel.width_sharded import interpolate_field_width_sharded


def default_mesh(
    data: Optional[int] = None, space: int = 1, devices=None
) -> Mesh:
    """A ('data', 'space') mesh over the available devices.

    data defaults to len(devices) // space.  'data' shards frames
    (embarrassingly parallel); 'space' shards plane width (halo exchange).
    """
    devices = jax.devices() if devices is None else devices
    if data is None:
        data = len(devices) // space
    n = data * space
    if n > len(devices):
        raise ValueError(
            f"mesh {data}x{space} needs {n} devices, have {len(devices)}"
        )
    import numpy as np

    return Mesh(np.asarray(devices[:n]).reshape(data, space), ("data", "space"))


def _validate_width_sharding(clip: Clip, n_space: int) -> None:
    """The width-sharded path requires every plane width to equal its buffer
    stride (W % 32 == 0, so clamp-at-stride == clamp-at-width) and divide
    evenly across the space axis."""
    if clip.width % 32:
        raise ValueError(
            "width sharding requires the plane width to be a multiple of 32 "
            f"(got {clip.width}); use data-only sharding otherwise"
        )
    for i in range(min(3, clip.num_planes)):
        pw, _ = clip.format.plane_dims(clip.width, clip.height, i)
        if pw % n_space:
            raise ValueError(
                f"plane {i} width {pw} does not divide across "
                f"{n_space} 'space' shards"
            )
        if pw // n_space < 3:
            # halo exchange reaches only the adjacent shard; every tap spans
            # <= 3 columns, so each shard must own at least 3
            raise ValueError(
                f"plane {i} local width {pw // n_space} < 3: too many "
                f"'space' shards for width {pw}"
            )


def sangnom2_sharded(
    clip: Clip,
    mesh: Mesh,
    order: int = 1,
    aa: int = 48,
    aac: int = 0,
    threads: int = 0,
    dh: bool = False,
    luma: bool = True,
    chroma: bool = True,
    opt: int = -1,
    data_axis: str = "data",
    space_axis: Optional[str] = None,
) -> Clip:
    """SangNom2 over a device mesh.

    Frames shard over ``data_axis`` (padded to divide evenly, then trimmed).
    If ``space_axis`` is given, plane widths additionally shard over it and
    the smoothing recursion exchanges 3-column halos per row via ppermute.
    """
    from sangnom_tpu.api import _validate  # parameter surface parity

    _validate("SangNom2", clip, order, aa, aac, opt)
    del threads

    n_data = mesh.shape[data_axis]
    n_space = mesh.shape[space_axis] if space_axis else 1
    if space_axis:
        _validate_width_sharding(clip, n_space)

    N = clip.num_frames
    pad = (-N) % n_data
    planes = tuple(
        jnp.pad(p, ((0, pad), (0, 0), (0, 0))) if pad else p
        for p in clip.planes
    )
    parity = jnp.pad(clip.parity_array(), (0, pad)) if pad else clip.parity_array()

    if space_axis:
        interp_fn = lambda kept, aaf, spec, stride: (  # noqa: E731
            interpolate_field_width_sharded(kept, aaf, spec, space_axis)
        )
        plane_spec = P(data_axis, None, space_axis)
    else:
        interp_fn = None  # per-shard default backend (Pallas on TPU)
        plane_spec = P(data_axis, None, None)

    fmt = clip.format

    def local(planes_loc, parity_loc):
        return sangnom2_impl(
            planes_loc, parity_loc, fmt, order, aa, aac, dh, luma, chroma,
            opt, interp_fn=interp_fn,
        )

    shmapped = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(tuple(plane_spec for _ in planes), P(data_axis)),
        out_specs=tuple(plane_spec for _ in planes),
        check_vma=False,
    )
    out_planes = jax.jit(shmapped)(planes, parity)
    if pad:
        out_planes = tuple(p[:N] for p in out_planes)
    return clip.with_planes(out_planes)
