"""Pallas fused kernel vs jnp reference backend: bit-exact parity.

On CPU the Pallas kernel runs in interpreter mode (same program, no Mosaic
compile) — the race/OOB detector for block indexing per SURVEY.md §5; real
TPU execution is exercised by bench.py and the driver's compile check.
"""

import jax
import numpy as np
import pytest

from sangnom_tpu import Clip, get_format, sangnom2

from conftest import make_planes


def _run(fmt_name, w, h, rng, n=1, **kw):
    fmt = get_format(fmt_name)
    frames = [make_planes(rng, w, h, fmt) for _ in range(n)]
    planes = [np.stack([f[i] for f in frames]) for i in range(fmt.num_planes)]
    clip = Clip.from_numpy(planes, fmt, parity=kw.pop("parity", None))
    a = sangnom2(clip, opt=0, **kw)  # jnp reference
    b = sangnom2(clip, opt=1, **kw)  # fused Pallas
    for i in range(fmt.num_planes):
        np.testing.assert_array_equal(
            np.asarray(a.planes[i]), np.asarray(b.planes[i]), err_msg=f"plane {i}"
        )


@pytest.mark.parametrize(
    "fmt_name,w,h,kw",
    [
        ("GRAY8", 64, 32, dict(order=1)),
        ("YUV420P8", 48, 24, dict(order=2)),
        ("YUV420P8", 32, 16, dict(order=1, dh=True)),
        ("YUV422P10", 40, 20, dict(order=2)),
        ("GRAY16", 40, 16, dict(order=1, aa=128, aac=64)),
        ("YUV444PS", 40, 16, dict(order=2, aa=48, aac=48)),
        ("GRAY8", 31, 8, dict(order=1)),
        ("GRAY8", 32, 8, dict(order=2)),  # stride == w: taps clamp at edge
        ("GRAY8", 5, 8, dict(order=1)),
        ("GRAY8", 130, 10, dict(order=1)),  # stride 160 > 128: lane padding
        ("YUV411P8", 48, 16, dict(order=1, aa=48, aac=48)),  # 4:1:1 chroma
    ],
    ids=lambda v: str(v),
)
def test_pallas_matches_reference(rng, fmt_name, w, h, kw):
    _run(fmt_name, w, h, rng, **kw)


def test_pallas_batched_frames(rng):
    _run("GRAY8", 48, 16, rng, n=5, order=1)


def test_pallas_order0_mixed_parity(rng):
    parity = np.array([True, False, True, False])
    _run("GRAY8", 32, 16, rng, n=4, order=0, parity=parity)


def test_pallas_order0_mixed_parity_dh(rng):
    """True-bob shape: dh height doubling with alternating per-frame parity
    — the per-frame-offset in-kernel weave (round 3) against the jnp
    reference, including subsampled chroma."""
    parity = np.array([True, False, True, False, True])
    _run("YUV420P8", 48, 16, rng, n=5, order=0, dh=True, parity=parity)


def test_pallas_order0_nonuniform_groups(rng):
    """Non-alternating mixed parity (arbitrary pattern) through the
    per-frame-offset weave."""
    parity = np.array([False, False, True, False])
    _run("GRAY8", 40, 12, rng, n=4, order=0, dh=True, parity=parity)


def test_pallas_aa_zero(rng):
    _run("GRAY8", 32, 16, rng, aa=0, aac=0)


def test_pallas_float_rolled_hbox_wide(rng, monkeypatch):
    """The association-preserving rolled f32 hbox A/B hook
    (_hbox7_float_rolled: reference left-to-right fp tap order, pure-roll
    bulk + exact edge slabs) stays bit-exact on a wide float plane
    (S_pad >= 384).  Perf-rejected (-4.6%,
    results/floathbox_ab_interleaved.txt) but kept as a measured hook —
    exactness through the exact-equality min-select is the hard part."""
    import sangnom_tpu.ops.pallas_kernel as pk

    monkeypatch.setattr(pk, "_FLOAT_HBOX_ROLLED", True)
    _run("GRAYS", 500, 24, rng, order=1, aa=48, aac=48)


def test_pallas_float_pair_hbox(rng, monkeypatch):
    """Both arms of the f32 hbox A/B hook stay bit-exact.  The leading-
    pair form (_hbox7_float_pair: the chain's first add t-3 + t-2
    computed once at shift 0 and rotated, its +1 operand reused as tap
    t+1 — 5 rolls + 5 selects per slab, fp association unchanged
    operation-for-operation) is the DEFAULT since the +7.9% hardware A/B
    (results/floatpair_ab_r03.txt) and is covered by every float suite;
    this test pins the retained EXACT arm (6 + 6) on wide AND narrow
    float planes (both are fully clamped: no slab-width bound), through
    the single-chip kernel and the fully-fused sharded kernel
    (parallel/fused_smooth shares the hook)."""
    import sangnom_tpu.ops.pallas_kernel as pk
    from sangnom_tpu.parallel import default_mesh, sangnom2_sharded

    monkeypatch.setattr(pk, "_FLOAT_HBOX_PAIR", False)
    _run("GRAYS", 500, 24, rng, order=1, aa=48, aac=48)
    _run("YUV444PS", 48, 16, rng, order=2)
    clip = Clip.from_numpy(
        [make_planes(rng, 64, 16, get_format("GRAYS"))[0][None]], "GRAYS"
    )
    want = sangnom2(clip, opt=0, order=1)
    got = sangnom2_sharded(clip, default_mesh(data=1, space=4), order=1,
                           space_axis="space", opt=1)
    np.testing.assert_array_equal(np.asarray(got.planes[0]),
                                  np.asarray(want.planes[0]))
    jax.clear_caches()  # drop programs traced with the patched hook


def test_pallas_float_weave_dispatch(rng, monkeypatch):
    """Float formats take the in-kernel weave (round 3: the round-2 -18%
    rejection reversed at +24.2% after the 3-roll hbox + chunk-batch work,
    results/floatweave_ab_r03.txt).  Pins the dispatch — the XLA-side
    weave_assemble must NOT run for a float opt=1 single-device call —
    and keeps the _FLOAT_WEAVE=False A/B arm bit-exact."""
    import sangnom_tpu.ops.sangnom as sg

    calls = []
    real = sg.weave_assemble
    monkeypatch.setattr(
        sg, "weave_assemble", lambda *a, **k: calls.append(1) or real(*a, **k)
    )
    fmt = get_format("YUV444PS")
    planes = [
        np.stack([make_planes(rng, 40, 16, get_format("GRAYS"))[0]
                  for _ in range(2)])
        for _ in range(3)
    ]
    clip = Clip.from_numpy(planes, fmt)
    out_w = sangnom2(clip, order=2, aa=48, aac=48, opt=1)
    assert not calls, "float opt=1 fell back to the XLA weave"
    monkeypatch.setattr(sg, "_FLOAT_WEAVE", False)
    jax.clear_caches()  # the flag is read at trace time; drop the cached jit
    out_x = sangnom2(clip, order=2, aa=48, aac=48, opt=1)
    assert calls, "_FLOAT_WEAVE=False arm did not use the XLA weave"
    for i in range(3):
        np.testing.assert_array_equal(
            np.asarray(out_w.planes[i]), np.asarray(out_x.planes[i])
        )
    jax.clear_caches()  # drop the no-weave trace keyed like the default


def test_pallas_taps_mxu_arm(rng, monkeypatch):
    """The MXU tap-engine A/B hook (_TAPS_MXU: per-step tap shifts as int8
    permutation matmuls + the shared _clamp_edges selects) stays bit-exact.
    Perf-rejected on hardware (-2.8% order=1 dh / -0.5% true bob,
    results/tapsmxu_ab_r03.txt — the serial dot+assembly runs at roll-par
    and nothing overlaps on the critical path) but kept as the measured
    closure of the MXU-datapath question.  Wide u8 planes (multi-slab
    neighbor spills), dh weave both offsets, and mixed per-frame parity."""
    import sangnom_tpu.ops.pallas_kernel as pk

    monkeypatch.setattr(pk, "_TAPS_MXU", True)
    _run("GRAY8", 500, 24, rng, order=1, aa=48, aac=48)
    _run("YUV420P8", 48, 16, rng, n=3, order=0, dh=True,
         parity=np.array([True, False, True]))
    _run("GRAY8", 130, 10, rng, order=2, dh=True)
    jax.clear_caches()  # drop programs traced with the patched hook


def test_pallas_hbox_tree_arm(rng, monkeypatch):
    """The 4-roll rotate-tree integer hbox bulk (the _HBOX_SUB3=False A/B
    arm, superseded by the 3-roll cumulative-sub form at +5.2%/+5.6%,
    results/hbox3_ab_r03.txt) stays bit-exact, keeping the hook honest.
    Wide u8 + u16 planes so the bulk path (S_pad >= 384) actually runs."""
    import sangnom_tpu.ops.pallas_kernel as pk

    monkeypatch.setattr(pk, "_HBOX_SUB3", False)
    _run("GRAY8", 500, 24, rng, order=1, aa=48, aac=48)
    _run("GRAY16", 500, 16, rng, order=1, aa=48, aac=48)


def test_pallas_reduced_width_tiers(rng):
    """Subsampled chroma with a large luma stride exercises the kernel's
    width reduction with all three tiers DISTINCT (W_act < W_sm < S_pad):
    chroma w=640, bufH=42 against stride 1280 -> W_act=768,
    W_sm=roundup(640+129,128)=896, S_pad=1280 — covering the raw_of
    zero-extension branch and the W_sm/W_act scratch asymmetry."""
    from sangnom_tpu.core.geometry import width_tiers

    W_act, W_sm, _ = width_tiers(640, 42, 1280)
    assert W_act < W_sm < 1280, (W_act, W_sm)  # guard the test's own premise
    _run("YUV420P8", 1280, 168, rng, order=1, aa=48, aac=48)
