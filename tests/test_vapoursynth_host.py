"""Drive the VapourSynth host adapter against a mock host (VERDICT_r3 #8).

VapourSynth is not installable here (zero egress), so the adapter is
exercised against a minimal mock implementing the exact host surface the
adapter uses — `core.std.BlankClip`, `core.std.ModifyFrame` with a frame
selector, frames exposing plane arrays / `.copy()` / `.props`, and format
objects with the documented attributes.  The adapter itself contains no
mock-specific code: the same path runs against a real `vapoursynth`.
"""

import sys
import types

import numpy as np
import pytest

from sangnom_tpu import Clip, get_format, sangnom, sangnom2
from sangnom_tpu.api import SangNomError


# --- the mock host ----------------------------------------------------------

class _MockFormat:
    def __init__(self, color_family, bits, sample_type, sub_w, sub_h):
        self.color_family = color_family
        self.bits_per_sample = bits
        self.sample_type = sample_type
        self.subsampling_w = sub_w
        self.subsampling_h = sub_h


class _MockFrame:
    def __init__(self, planes, props=None):
        self._planes = [np.array(p) for p in planes]
        self.props = dict(props or {})

    def __getitem__(self, i):
        return self._planes[i]

    def copy(self):
        return _MockFrame(self._planes, self.props)


class _MockNode:
    def __init__(self, frames, fmt, width, height):
        self._frames = frames
        self.format = fmt
        self.width = width
        self.height = height

    @property
    def num_frames(self):
        return len(self._frames)

    def get_frame(self, n):
        return self._frames[n]


class _MockStd:
    def BlankClip(self, clip, width, height, length):
        sub_w, sub_h = clip.format.subsampling_w, clip.format.subsampling_h
        n_pl = len(clip.get_frame(0)._planes)
        dt = clip.get_frame(0)._planes[0].dtype
        frames = []
        for _ in range(length):
            planes = [np.zeros((height, width), dt)]
            for _i in range(n_pl - 1):
                planes.append(np.zeros(
                    (height >> sub_h, width >> sub_w), dt))
            frames.append(_MockFrame(planes))
        return _MockNode(frames, clip.format, width, height)

    def ModifyFrame(self, clip, clips, selector):
        class _Out(_MockNode):
            def get_frame(self, n):
                return selector(n, [c.get_frame(n) for c in clips])

        return _Out(clip._frames, clip.format, clip.width, clip.height)


def _install_mock(monkeypatch):
    vs = types.ModuleType("vapoursynth")
    vs.GRAY, vs.YUV, vs.RGB = 0, 1, 2
    vs.INTEGER, vs.FLOAT = 0, 1
    vs.core = types.SimpleNamespace(std=_MockStd())
    monkeypatch.setitem(sys.modules, "vapoursynth", vs)
    return vs


def _src_node(vs, rng, w=32, h=16, n=6, fmt_name="YUV420P8", props=None):
    fmt = get_format(fmt_name)
    sub = 1 if fmt.name.startswith("YUV420") else 0
    mock_fmt = _MockFormat(vs.YUV if fmt.num_planes == 3 else vs.GRAY,
                           fmt.bits, vs.FLOAT if fmt.is_float else vs.INTEGER,
                           sub, sub)
    frames = []
    all_planes = [[] for _ in range(fmt.num_planes)]
    for k in range(n):
        planes = []
        for i in range(fmt.num_planes):
            pw, ph = fmt.plane_dims(w, h, i)
            planes.append(rng.integers(0, 256, (ph, pw)).astype(fmt.dtype))
            all_planes[i].append(planes[-1])
        frames.append(_MockFrame(planes, (props or {}).get(k)))
    node = _MockNode(frames, mock_fmt, w, h)
    stacked = [np.stack(ps) for ps in all_planes]
    return node, stacked


def test_adapter_matches_direct_filter(rng, monkeypatch):
    vs = _install_mock(monkeypatch)
    from sangnom_tpu.hosts.vapoursynth import SangNom2

    node, stacked = _src_node(vs, rng)
    out = SangNom2(node, order=1, dh=True, opt=0, batch=4)
    want = sangnom2(Clip.from_numpy(stacked, "YUV420P8"),
                    order=1, dh=True, opt=0)
    assert out.height == 32
    for n in range(node.num_frames):
        f = out.get_frame(n)
        for i in range(3):
            np.testing.assert_array_equal(
                f[i], np.asarray(want.planes[i])[n],
                err_msg=f"frame {n} plane {i}")


def test_adapter_order0_field_props(rng, monkeypatch):
    """order=0 parity comes from the _Field frame prop (std.SeparateFields
    semantics: 1 = top), the analogue of host GetParity(n)."""
    vs = _install_mock(monkeypatch)
    from sangnom_tpu.hosts.vapoursynth import SangNom2

    props = {k: {"_Field": k % 2} for k in range(6)}
    node, stacked = _src_node(vs, rng, props=props)
    out = SangNom2(node, order=0, opt=0, batch=8)
    parity = np.arange(6) % 2 == 1
    want = sangnom2(Clip.from_numpy(stacked, "YUV420P8", parity=parity),
                    order=0, opt=0)
    for n in range(6):
        f = out.get_frame(n)
        for i in range(3):
            np.testing.assert_array_equal(
                f[i], np.asarray(want.planes[i])[n])


def test_adapter_pool_compat_chains_across_windows(rng, monkeypatch):
    """pool_compat through the adapter must be byte-identical to whole-clip
    processing even when the batch window is smaller than the clip — the
    pool is cross-frame state and chains through the windows (the round-4
    review's confirmed repro: unaligned w=52, batch=3, plane 0 diverged at
    frame 3 before the fix)."""
    vs = _install_mock(monkeypatch)
    from sangnom_tpu.hosts.vapoursynth import SangNom2

    node, stacked = _src_node(vs, rng, w=52, h=16, n=7)
    out = SangNom2(node, order=2, opt=0, batch=3, pool_compat=True)
    want = sangnom2(Clip.from_numpy(stacked, "YUV420P8"),
                    order=2, opt=0, pool_compat=True)
    for n in range(7):
        f = out.get_frame(n)
        for i in range(3):
            np.testing.assert_array_equal(
                f[i], np.asarray(want.planes[i])[n],
                err_msg=f"frame {n} plane {i}")
    # random access BEHIND the chain restarts it — still byte-identical
    f0 = out.get_frame(0)
    for i in range(3):
        np.testing.assert_array_equal(f0[i], np.asarray(want.planes[i])[0])


def test_adapter_propagates_source_props(rng, monkeypatch):
    """Output frames carry the SOURCE frame's props (colorimetry/range),
    with field-ness rewritten to progressive."""
    vs = _install_mock(monkeypatch)
    from sangnom_tpu.hosts.vapoursynth import SangNom2

    props = {k: {"_Matrix": 1, "_ColorRange": 1, "_Field": k % 2}
             for k in range(6)}
    node, _ = _src_node(vs, rng, props=props)
    out = SangNom2(node, order=0, opt=0, batch=8)
    f = out.get_frame(2)
    assert f.props["_Matrix"] == 1 and f.props["_ColorRange"] == 1
    assert f.props["_FieldBased"] == 0
    assert "_Field" not in f.props


def test_adapter_rejects_unsupported_depth(rng, monkeypatch):
    """9-bit VS formats raise the adapter's fail-fast SangNomError, not a
    raw registry KeyError."""
    vs = _install_mock(monkeypatch)
    from sangnom_tpu.hosts.vapoursynth import SangNom2

    node, _ = _src_node(vs, rng)
    node.format = _MockFormat(vs.YUV, 9, vs.INTEGER, 1, 1)
    with pytest.raises(SangNomError, match="unsupported bit depth 9"):
        SangNom2(node)


def test_adapter_legacy_and_errors(rng, monkeypatch):
    vs = _install_mock(monkeypatch)
    from sangnom_tpu.hosts.vapoursynth import SangNom, register

    node, stacked = _src_node(vs, rng)
    out = SangNom(node, order=0, opt=0, batch=3)  # legacy 0 = keep bottom
    want = sangnom(Clip.from_numpy(stacked, "YUV420P8"), order=0, opt=0)
    for n in (0, 5):
        f = out.get_frame(n)
        for i in range(3):
            np.testing.assert_array_equal(
                f[i], np.asarray(want.planes[i])[n])

    ns: dict = {}
    assert register(ns) == "SangNom2"
    assert set(ns) == {"SangNom2", "SangNom"}

    with pytest.raises(SangNomError, match="order must be between 0..2."):
        ns["SangNom2"](node, order=5).get_frame(0)
