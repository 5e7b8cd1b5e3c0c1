"""Test harness configuration.

Tests run on a virtual 8-device CPU mesh (deterministic, no TPU needed) —
multi-chip sharding paths are validated here exactly as the driver's
`dryrun_multichip` does; real-chip numbers come from bench.py on TPU.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
# opt=1 off-TPU is gated like the reference's "opt=1 requires SSE2."
# construction check; the suite opts into interpret mode explicitly (the
# interpret-mode Pallas kernel is the OOB sanitizer, SURVEY.md §5)
os.environ.setdefault("SANGNOM_TPU_INTERPRET", "1")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon sitecustomize force-registers the TPU plugin and overrides
# jax_platforms to "axon,cpu" regardless of the env var — pin it back so
# tests really run on the virtual 8-device CPU mesh.
jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", jax.default_backend()
assert len(jax.devices()) == 8, jax.devices()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def make_plane(rng, h, w, fmt):
    """Random plane with full-range values (exercises wrap/extreme paths)."""
    if fmt.is_float:
        return (rng.random((h, w), dtype=np.float32) * 1.5 - 0.25).astype(
            np.float32
        )
    hi = (1 << fmt.bits) - 1
    # deliberately include out-of-nominal-range code values for >8-bit
    # formats: the reference wraps at the STORAGE width, not nominal bits
    top = min(hi * 2, (1 << (8 * fmt.component_size)) - 1)
    return rng.integers(0, top + 1, size=(h, w)).astype(fmt.dtype)


def make_planes(rng, w, h, fmt):
    planes = []
    for i in range(fmt.num_planes):
        pw, ph = fmt.plane_dims(w, h, i)
        planes.append(make_plane(rng, ph, pw, fmt))
    return planes
