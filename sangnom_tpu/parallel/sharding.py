"""Mesh construction and the sharded filter entry point.

`sangnom2_sharded` is the multi-chip analogue of the host's frame-MT in the
reference (MT_MULTI_INSTANCE, reference src/SangNom2.h:63-66): frames shard
over the ``data`` mesh axis with zero communication, and optionally each
plane's width shards over the ``space`` axis with ppermute halo exchange
(sangnom_tpu.parallel.width_sharded).  Everything runs inside one
`shard_map`-wrapped jit so XLA lays collectives on ICI.
"""

from __future__ import annotations

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


def _validate_width_sharding(stride: int, n_space: int) -> None:
    """Every plane is padded to the luma-derived buffer stride before
    sharding, so the only requirements are on the stride itself."""
    if stride % n_space:
        raise ValueError(
            f"buffer stride {stride} does not divide across "
            f"{n_space} 'space' shards"
        )
    if stride // n_space < 3:
        # halo exchange reaches only the adjacent shard; every tap spans
        # <= 3 columns, so each shard must own at least 3
        raise ValueError(
            f"local width {stride // n_space} < 3: too many 'space' "
            f"shards for stride {stride}"
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
    smooth: Optional[str] = None,
    numerics: str = "c",
) -> Clip:
    """SangNom2 over a device mesh.

    Frames shard over ``data_axis`` (padded to divide evenly, then trimmed).
    If ``space_axis`` is given, plane widths additionally shard over it and
    the smoothing recursion exchanges 3-column halos per row via ppermute.
    ``smooth`` overrides the opt-derived sharded backend ("scan" |
    "chunked" | "fused"; see width_sharded.interpolate_field_width_sharded).
    ``numerics`` selects the reference numerics contract exactly as on the
    single-device surface ("c" | "sse2"); every sharded backend honors it
    through the shared primitives.
    """
    from sangnom_tpu.api import SangNomError, _validate  # surface parity
    from sangnom_tpu.core.geometry import buffer_stride_elems

    _validate("SangNom2", clip, order, aa, aac, opt)
    if numerics not in ("c", "sse2"):
        raise SangNomError(
            f"SangNom2: numerics must be 'c' or 'sse2', got {numerics!r}."
        )
    del threads

    n_data = mesh.shape[data_axis]
    n_space = mesh.shape[space_axis] if space_axis else 1
    fmt = clip.format
    stride = buffer_stride_elems(clip.width, fmt.component_size)
    if space_axis:
        _validate_width_sharding(stride, n_space)

    N = clip.num_frames
    pad = (-N) % n_data
    widths = tuple(p.shape[2] for p in clip.planes)
    planes = []
    for p in clip.planes:
        if pad:
            p = jnp.pad(p, ((0, pad), (0, 0), (0, 0)))
        if space_axis and p.shape[2] < stride:
            # pad every plane to the buffer stride with EDGE REPLICATION:
            # pixel taps that clamp at the true width then read the
            # replicated edge pixel (loadPixel semantics), while the
            # zero-defined raw-map padding is re-created inside the sharded
            # kernel by a global-column mask (see parallel.width_sharded)
            p = jnp.pad(p, ((0, 0), (0, 0), (0, stride - p.shape[2])),
                        mode="edge")
        planes.append(p)
    planes = tuple(planes)
    parity = jnp.pad(clip.parity_array(), (0, pad)) if pad else clip.parity_array()

    if space_axis:
        # opt=0 keeps the per-row-exchange scan (the parity target); opt=1
        # forces the FULLY-fused chunk kernel (round 3: prepare+smooth+
        # finalize in one Pallas kernel per chunk, interpolate_fused_full)
        # — the multi-chip performance path (bit-exact to the scan,
        # tests/test_sharding.py); auto mirrors _pick_backend: fused where
        # Pallas compiles (TPU), scan elsewhere (interpret mode is for
        # testing, not production CPU meshes)
        if smooth is None:
            if opt == 0:
                smooth = "scan"
            elif opt == 1:
                smooth = "fused"
            else:
                smooth = "fused" if jax.default_backend() == "tpu" else "scan"
        interp_fn = (
            lambda kept, aaf, spec, stride_, plane_width=None:  # noqa: E731
            interpolate_field_width_sharded(
                kept, aaf, spec, space_axis, plane_width, smooth=smooth
            )
        )
        plane_spec = P(data_axis, None, space_axis)
        impl_kw = dict(interp_fn=interp_fn, plane_widths=widths, stride=stride)
    else:
        plane_spec = P(data_axis, None, None)
        impl_kw = dict(interp_fn=None)  # per-shard default backend

    def local(planes_loc, parity_loc):
        return sangnom2_impl(
            planes_loc, parity_loc, fmt, order, aa, aac, dh, luma, chroma,
            opt, numerics=numerics, **impl_kw,
        )

    shmapped = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(tuple(plane_spec for _ in planes), P(data_axis)),
        out_specs=tuple(plane_spec for _ in planes),
        check_vma=False,
    )
    out_planes = jax.jit(shmapped)(planes, parity)
    out_planes = tuple(p[:N, :, :w] for p, w in zip(out_planes, widths))
    return clip.with_planes(out_planes)
