"""CI coverage for the kept-but-default-off pool backend hooks.

POOL_FUSED and POOL_SPLIT3 were built, hardware-verified bit-identical and
REJECTED on perf (results/ab_poolfused_r04.txt) — they remain as A/B hooks
for re-probing, so CI must keep them bit-exact against the default path or
a future re-probe would measure a broken arm (the poolfast_ab_r03b lesson).
"""

import jax
import numpy as np
import pytest

from sangnom_tpu import Clip, get_format, sangnom2
from sangnom_tpu.ops import pool_carry


@pytest.fixture
def _set_flags():
    """Yields a setter that flips the pool backend hooks AND clears the jit
    caches, so the flipped arm genuinely re-traces (the hooks are read at
    trace time and are not part of the jit cache key — without the clear,
    the second arm would silently reuse the first arm's compiled program
    and the parity pin would be vacuous).  Teardown restores the defaults
    and clears again so hook-traced programs don't leak into later tests."""
    flags = (pool_carry.POOL_FUSED, pool_carry.POOL_SPLIT3,
             pool_carry.POOL_FAST)

    def set_flags(fused=False, split3=False, fast=False):
        pool_carry.POOL_FUSED = fused
        pool_carry.POOL_SPLIT3 = split3
        pool_carry.POOL_FAST = fast
        jax.clear_caches()

    yield set_flags
    (pool_carry.POOL_FUSED, pool_carry.POOL_SPLIT3,
     pool_carry.POOL_FAST) = flags
    jax.clear_caches()


def test_pool_fast_hook_matches_scan(rng, _set_flags):
    """The rejected frame-parallel fast path (POOL_FAST) stays parity-
    pinned in interpret mode on its engagement geometry (stride-aligned
    width, luma first, no caller pool0).  NOTE: this cannot prove Mosaic-
    side safety — one hardware run recorded a bit-identity failure
    (results/poolfast_ab_r03b.txt), which is why the flag is off."""
    fmt = get_format("YUV420P8")
    planes = [rng.integers(0, 256, (3, 16, 64)).astype(np.uint8),
              rng.integers(0, 256, (3, 8, 32)).astype(np.uint8),
              rng.integers(0, 256, (3, 8, 32)).astype(np.uint8)]
    clip = Clip.from_numpy(planes, fmt)
    want = sangnom2(clip, pool_compat=True, opt=0, order=1, dh=True)
    _set_flags(fast=True)
    assert pool_carry._frames_independent(64, 16, fmt, True, True)
    got = sangnom2(clip, pool_compat=True, opt=1, order=1, dh=True)
    for a, b in zip(got.planes, want.planes):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("hook", ["fused", "split3"])
@pytest.mark.parametrize(
    "fmt_name,w,h,kw",
    [
        ("YUV420P8", 64, 16, dict(order=1, dh=True)),          # aligned
        ("YUV420P8", 52, 16, dict(order=2)),                   # unaligned
        ("GRAY16", 48, 12, dict(order=1, numerics="sse2")),    # u16 sse2
        ("GRAYS", 64, 12, dict(order=0)),                      # float
    ],
)
def test_hook_backends_match_scan(rng, _set_flags, hook, fmt_name, w, h,
                                  kw):
    fmt = get_format(fmt_name)
    planes = []
    for i in range(fmt.num_planes):
        pw, ph = fmt.plane_dims(w, h, i)
        if fmt.is_float:
            planes.append((rng.random((3, ph, pw), np.float32) * 2 - 0.5)
                          .astype(np.float32))
        else:
            top = (1 << (8 * fmt.component_size)) - 1
            planes.append(
                rng.integers(0, top + 1, (3, ph, pw)).astype(fmt.dtype))
    parity = np.arange(3) % 2 == 0
    clip = Clip.from_numpy(planes, fmt, parity=parity)

    want = sangnom2(clip, pool_compat=True, opt=0, **kw)

    _set_flags(fused=hook == "fused", split3=hook == "split3")
    got = sangnom2(clip, pool_compat=True, opt=1, **kw)
    for i, (a, b) in enumerate(zip(got.planes, want.planes)):
        np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b),
            err_msg=f"{hook} plane {i} differs from scan")
