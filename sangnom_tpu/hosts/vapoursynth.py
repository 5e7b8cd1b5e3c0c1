"""VapourSynth host adapter (VERDICT_r3 #8).

Exposes `SangNom2` / `SangNom` as VapourSynth filter callables — the same
two functions the reference registers into its host
(AvisynthPluginInit3, reference src/SangNom2.cpp:474-484) — built on this
framework's `register_plugin_functions` registry surface.  VapourSynth is
a natural host: the reference plugin itself is a port of the VapourSynth
`vapoursynth-sangnom` plugin (reference README.md:5).

Integration model: VapourSynth serves frames on demand through a filter
graph, so the adapter wraps the TPU filter as a dimension-aware
`std.ModifyFrame` node over a `std.BlankClip` of the OUTPUT geometry (the
standard VapourSynth recipe for Python filters that change frame size).
Because the frame server requests one frame at a time while the TPU wants
batches, the adapter processes frames in fixed windows of ``batch`` frames
and caches the most recent windows: sequential playback hits the TPU once
per window at full batch efficiency.

The module imports without VapourSynth installed (everything host-facing
resolves lazily); `tests/test_vapoursynth_host.py` drives it against a
mock implementing the exact host surface used here, and the same code path
runs unchanged against a real `vapoursynth` module.

THREADING NOTE: window batching means a selector may request OTHER source
frames of its window (`src.get_frame`) — a nested request that needs a
free VS worker thread.  The adapter never holds its cache lock across
those fetches, but under heavily parallel frame requests a stateful
Python filter can still exhaust the worker pool (every worker inside a
selector waiting on the same window).  If the host hangs, serialize
requests on this node (e.g. ``vspipe -r 1`` or ``core.num_threads = 1``)
or set ``batch=1`` (no cross-frame requests at all; TPU batching is then
per-frame).  ``pool_compat=True`` chains windows through the carried pool
state in clip order (byte-identical to whole-clip processing); random
access behind the chain restarts it from frame 0.

Usage (inside a .vpy script):

    import vapoursynth as vs
    from sangnom_tpu.hosts.vapoursynth import SangNom2
    clip = vs.core.ffms2.Source("in.mkv")
    clip = SangNom2(clip, order=1, aa=48, dh=True)
    clip.set_output()
"""

from __future__ import annotations

import threading
from typing import Any

import numpy as np

from sangnom_tpu.api import SangNomError, register_plugin_functions
from sangnom_tpu.core.clip import Clip
from sangnom_tpu.core.formats import get_format

# The framework's own host-agnostic function table (the analogue of the
# host's function registry the reference fills at plugin load).
_REGISTRY: dict = {}
_PLUGIN_ID = register_plugin_functions(_REGISTRY)


def _vs():
    import vapoursynth

    return vapoursynth


def _format_name_from_vs(fmt) -> str:
    """Map a VapourSynth format object to this framework's format name.

    Uses the documented VS attributes (color_family, bits_per_sample,
    sample_type, subsampling_w/h).  RGB and half-float formats raise the
    same fail-fast validation error the factory surface would."""
    vs = _vs()

    def check_bits(bits, is_float):
        if is_float and bits != 32:
            raise SangNomError("SangNom2: only 32-bit float is supported.")
        if not is_float and bits not in (8, 10, 12, 14, 16):
            # VS also has 9/11/13-bit formats; the registry (and the
            # reference's y4m-adjacent ecosystem) carries the even depths
            raise SangNomError(
                f"SangNom2: unsupported bit depth {bits} "
                f"(supported: 8/10/12/14/16-bit integer, 32-bit float).")

    if fmt.color_family == vs.GRAY:
        check_bits(fmt.bits_per_sample, fmt.sample_type == vs.FLOAT)
        if fmt.sample_type == vs.FLOAT:
            return "GRAYS"
        return f"GRAY{fmt.bits_per_sample}" if fmt.bits_per_sample > 8 else "GRAY8"
    if fmt.color_family != vs.YUV:
        raise SangNomError("SangNom2: clip must be in Y/YUV planar format.")
    sub = {(1, 1): "420", (1, 0): "422", (0, 0): "444",
           (2, 0): "411"}.get((fmt.subsampling_w, fmt.subsampling_h))
    if sub is None:
        raise SangNomError(
            f"SangNom2: unsupported subsampling "
            f"{fmt.subsampling_w}x{fmt.subsampling_h}.")
    check_bits(fmt.bits_per_sample, fmt.sample_type == vs.FLOAT)
    if fmt.sample_type == vs.FLOAT:
        return f"YUV{sub}PS"
    return f"YUV{sub}P{fmt.bits_per_sample}"


def _frame_planes(frame, num_planes) -> list[np.ndarray]:
    """Read a VS frame's planes as numpy copies ([h, w] each).  VS frames
    expose plane buffers through the array interface (`frame[i]`)."""
    return [np.asarray(frame[i]).copy() for i in range(num_planes)]


def _frame_parity(frame, n: int, tff: bool) -> bool:
    """Per-frame parity for order=0, from VS frame props when present:
    `_Field` (set by std.SeparateFields: 1 = top) wins, else `_FieldBased`
    (2 = tff, 1 = bff), else the adapter-level tff default — the analogue
    of the host GetParity(n) the reference consults
    (reference src/SangNom2.cpp:338)."""
    props = getattr(frame, "props", {}) or {}
    if "_Field" in props:
        return bool(props["_Field"])
    if "_FieldBased" in props and props["_FieldBased"] in (1, 2):
        return props["_FieldBased"] == 2
    return tff


class _WindowRunner:
    """Batches frame requests into TPU-sized windows with a tiny cache.

    Thread-safe for the VS frame server's parallel requests: the cache
    lock is never held across source-frame fetches (`fetch_frame` runs the
    host's own `get_frame`, which needs a free worker thread — holding a
    lock around it is the classic stateful-Python-filter deadlock, see the
    module docstring's threading note), and ``pool_compat`` windows chain
    through the carried pool state IN ORDER under a dedicated chain lock —
    output is byte-identical to whole-clip processing, exactly like the
    CLI's --window streaming (`sangnom2_pool_stream`).
    """

    def __init__(self, src, fmt_name: str, params: dict, tff: bool,
                 batch: int, cache_windows: int = 2):
        self.src = src
        self.fmt = get_format(fmt_name)
        self.params = params
        self.tff = tff
        self.batch = max(1, batch)
        self.cache_windows = max(1, cache_windows)
        self.legacy = bool(params.get("_legacy", False))
        self.pool_compat = bool(params.get("pool_compat", False))
        self._cache: dict[int, list[np.ndarray]] = {}  # window start -> planes
        self._order: list[int] = []
        self._lock = threading.Lock()
        self._chain = threading.Lock()  # pool_compat: windows run in order
        self._pool_state = None
        self._pool_next = 0  # next window start the pool chain will compute

    def _to_clip(self, frames):
        planes = [
            np.stack([fr["planes"][i] for fr in frames])
            for i in range(self.fmt.num_planes)
        ]
        parity = np.asarray([fr["parity"] for fr in frames], bool)
        return Clip.from_numpy(planes, self.fmt, parity=parity)

    def _run_window(self, frames: list) -> list[np.ndarray]:
        clip = self._to_clip(frames)
        params = {k: v for k, v in self.params.items() if k != "_legacy"}
        if self.pool_compat:
            # the pool is genuine cross-frame state: thread it through the
            # windows exactly as the CLI's --window mode does
            from sangnom_tpu.api import _LEGACY_ORDER_REMAP, _validate
            from sangnom_tpu.ops.sangnom import sangnom2_pool_stream

            kw = {k: params[k] for k in
                  ("order", "aa", "aac", "dh", "luma", "chroma",
                   "numerics", "opt") if k in params}
            if self.legacy:
                # the legacy surface has no dh/luma/chroma knobs; mirror
                # sangnom()'s fixed defaults (same policy as the CLI)
                _validate("SangNom", clip, kw.get("order", 1),
                          kw.get("aa", 48), 0, kw.get("opt", -1))
                order = kw.get("order", 1)
                kw = dict(order=_LEGACY_ORDER_REMAP[order]
                          if order != 1 else 1,
                          aa=kw.get("aa", 48), opt=kw.get("opt", -1),
                          numerics=kw.get("numerics", "c"))
            out, self._pool_state = sangnom2_pool_stream(
                clip, self._pool_state, **kw)
        else:
            fn = _REGISTRY["SangNom" if self.legacy else "SangNom2"]
            out = fn(clip, **params)
        return [np.asarray(p) for p in out.planes]

    def _fetch(self, start: int, fetch_frame) -> list:
        end = min(start + self.batch, self.src.num_frames)
        return [fetch_frame(k) for k in range(start, end)]

    def _store(self, start: int, outs) -> None:
        self._cache[start] = outs
        self._order.append(start)
        while len(self._order) > self.cache_windows:
            self._cache.pop(self._order.pop(0), None)

    def _slice(self, start: int, n: int) -> list[np.ndarray]:
        return [p[n - start] for p in self._cache[start]]

    def get(self, n: int, fetch_frame) -> list[np.ndarray]:
        """Output planes of frame ``n`` ([h, w] numpy per plane);
        ``fetch_frame(k)`` returns {"planes": [...], "parity": bool} for
        source frame k."""
        start = (n // self.batch) * self.batch
        with self._lock:
            if start in self._cache:
                return self._slice(start, n)

        if not self.pool_compat:
            frames = self._fetch(start, fetch_frame)  # no lock held
            with self._lock:
                if start not in self._cache:
                    self._store(start, self._run_window(frames))
                return self._slice(start, n)

        # pool_compat: compute every window up to `start` in clip order,
        # threading the pool state.  A request behind the chain (and out
        # of cache) restarts it from frame 0 — correct for random access,
        # efficient for the sequential playback the mode is meant for.
        with self._chain:
            with self._lock:
                if start in self._cache:
                    return self._slice(start, n)
                if start < self._pool_next:
                    self._pool_state, self._pool_next = None, 0
            s = self._pool_next
            while s <= start:
                frames = self._fetch(s, fetch_frame)  # no cache lock held
                outs = self._run_window(frames)
                with self._lock:
                    self._store(s, outs)
                    self._pool_next = s + self.batch
                s += self.batch
            with self._lock:
                return self._slice(start, n)


def _wrap(src, params: dict, batch: int, tff: bool | None, legacy: bool):
    vs = _vs()
    core = vs.core
    fmt_name = _format_name_from_vs(src.format)
    fmt = get_format(fmt_name)
    dh = bool(params.get("dh", False)) and not legacy
    out_h = src.height * 2 if dh else src.height

    runner = _WindowRunner(
        src, fmt_name, dict(params, _legacy=legacy),
        tff=(True if tff is None else tff), batch=batch,
    )

    # OUTPUT-geometry carrier clip: ModifyFrame requires the selector's
    # returned frame to match the clip it modifies, so dimension-changing
    # Python filters modify a blank clip of the output size (the standard
    # VapourSynth recipe) while reading the real source from `clips`.
    blank = core.std.BlankClip(
        clip=src, width=src.width, height=out_h, length=src.num_frames
    )

    def selector(n, f):
        # f: [blank frame, source frame n] per the clips list below
        fout = f[0].copy()
        src_frame = f[1]

        def fetch(k):
            fr = src_frame if k == n else src.get_frame(k)
            return {
                "planes": _frame_planes(fr, fmt.num_planes),
                "parity": _frame_parity(fr, k, runner.tff),
            }

        outs = runner.get(n, fetch)
        for i, plane in enumerate(outs):
            np.asarray(fout[i])[...] = plane
        # propagate the SOURCE frame's props (colorimetry, range,
        # timecodes — the v8 NewVideoFrameP analogue, reference
        # src/SangNom2.cpp:344); the filter emits progressive content, so
        # field-ness props are rewritten rather than forwarded
        fprops = getattr(fout, "props", None)
        if fprops is not None:
            for k, v in (getattr(src_frame, "props", {}) or {}).items():
                fprops[k] = v
            fprops["_FieldBased"] = 0
            try:
                del fprops["_Field"]
            except KeyError:
                pass
        return fout

    return core.std.ModifyFrame(clip=blank, clips=[blank, src],
                                selector=selector)


def SangNom2(clip, order: int = 1, aa: int = 48, aac: int = 0,
             threads: int = 0, dh: bool = False, luma: bool = True,
             chroma: bool = True, opt: int = -1, batch: int = 8,
             tff: bool | None = None, **compat) -> Any:
    """The SangNom2 surface as a VapourSynth filter (parameters, defaults
    and validation exactly as the registered script function; ``batch`` and
    ``tff`` are host-integration knobs: TPU window size and the order=0
    parity default when the stream carries no field props)."""
    params = dict(order=order, aa=aa, aac=aac, threads=threads, dh=dh,
                  luma=luma, chroma=chroma, opt=opt, **compat)
    return _wrap(clip, params, batch, tff, legacy=False)


def SangNom(clip, order: int = 1, aa: int = 48, opt: int = -1,
            batch: int = 8, tff: bool | None = None, **compat) -> Any:
    """The legacy SangNom surface as a VapourSynth filter."""
    params = dict(order=order, aa=aa, opt=opt, **compat)
    return _wrap(clip, params, batch, tff, legacy=True)


def register(namespace=None):
    """Attach the filter callables onto ``namespace`` (any object or dict) —
    the adapter-level analogue of AvisynthPluginInit3 (reference
    src/SangNom2.cpp:476-484).  Returns the plugin identifier."""
    fns = {"SangNom2": SangNom2, "SangNom": SangNom}
    if namespace is None:
        return _PLUGIN_ID
    for name, fn in fns.items():
        if isinstance(namespace, dict):
            namespace[name] = fn
        else:
            setattr(namespace, name, fn)
    return _PLUGIN_ID
