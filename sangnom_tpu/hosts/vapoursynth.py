"""VapourSynth host adapter (VERDICT_r3 #8; concurrency redesign r5).

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

THREADING MODEL (why this cannot exhaust the host worker pool):

1. Every source frame a selector needs is a host-prefetched DEPENDENCY.
   The node's ``clips`` list carries ``batch`` window-gather clips
   (``std.SelectEvery`` over an end-padded source) whose frame ``n`` is
   source frame ``(n // batch) * batch + j`` — so when the host invokes
   the selector for frame ``n``, it has already fetched the ENTIRE window
   of ``n`` through its own scheduler.  The selector never issues a
   nested ``src.get_frame`` — the classic stateful-Python-filter deadlock
   (every worker inside a selector waiting for a fetch that needs a free
   worker) is structurally impossible, not merely unlikely.
2. Concurrent requests that miss the cache dedupe through per-window
   single-flight events.  The computing thread needs only the TPU (its
   inputs were prefetched), so waiters always make progress; no lock is
   held across the computation, and cache hits for other windows are
   never blocked by an in-flight window.  A waiter that wakes to find its
   window evicted recomputes from its OWN prefetched frames — it never
   re-enters the host.
3. ``pool_compat=True`` chains windows through the carried pool state in
   clip order (byte-identical to whole-clip processing, exactly like the
   CLI's --window streaming).  Sequential playback — the only access
   pattern under which the mode's semantics are meaningful — advances the
   chain using prefetched frames only, so points 1-2 apply unchanged and
   that path is structurally safe.  Random access (a seek past or behind
   the chain) needs source windows the host did not prefetch; those
   fetches run on the adapter's own dedicated prefetch thread, NEVER on
   a VapourSynth worker — the same external-request mechanism an output
   loop (e.g. vspipe's get_frame) uses.  Honest residual condition: an
   external request still needs the host to have at least one worker not
   currently blocked inside THIS filter's selectors to produce the
   frame; if a seek storm occupies every worker, the fetch cannot
   complete.  The adapter therefore bounds the wait
   (``SANGNOM_VS_FETCH_TIMEOUT`` seconds, default 120) and raises a
   diagnostic error telling the caller to serialize the seek instead of
   hanging the process — a hang is structurally impossible, a loud
   failure under a pathological pattern is not.

Host-side cost of the prefetch design: each source frame is requested
``batch`` times by the graph (once per output frame of its window); the
source node's frame cache makes the repeats cache hits.  Keep ``batch``
moderate (the default 8 balances TPU batching against request fan-out).

The module imports without VapourSynth installed (everything host-facing
resolves lazily); `tests/test_vapoursynth_host.py` drives it against a
mock implementing the exact host surface used here — including a
multithreaded stress harness with out-of-order parallel requests and a
nested-fetch detector — and the same code path runs unchanged against a
real `vapoursynth` module.

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


def _window_dep_clips(core, src, batch: int) -> list:
    """``batch`` window-gather dependency clips: clip ``j``'s frame ``n``
    is source frame ``(n // batch) * batch + j`` (end-padded with the last
    frame so the trailing partial window still gathers).  Listing these in
    ``clips`` makes the host prefetch every source frame of ``n``'s window
    before the selector runs — the core of the no-nested-fetch design."""
    if batch == 1:
        return [src]
    n = src.num_frames
    pad = (-n) % batch
    padded = src
    if pad:
        last = core.std.Trim(src, first=n - 1, last=n - 1)
        padded = core.std.Splice(clips=[src, core.std.Loop(last, pad)])
    return [
        core.std.SelectEvery(padded, cycle=batch, offsets=[j] * batch)
        for j in range(batch)
    ]


class _WindowRunner:
    """Batches frame requests into TPU-sized windows with a tiny cache.

    Thread-safe for the VS frame server's parallel requests under the
    module-docstring threading model: ``get`` receives the request's
    whole source window HOST-PREFETCHED (so it never fetches), concurrent
    missers of one window dedupe through single-flight events, and no
    lock is held across TPU computation.  ``pool_compat`` windows chain
    through the carried pool state in clip order under ``_chain``;
    random-access gap/restart fetches run on the runner's dedicated
    prefetch thread via ``host_fetch`` — never on a VS worker.
    """

    def __init__(self, num_frames: int, fmt_name: str, params: dict,
                 tff: bool, batch: int, host_fetch=None,
                 cache_windows: int = 2):
        self.num_frames = num_frames
        self.fmt = get_format(fmt_name)
        self.params = params
        self.tff = tff
        self.batch = max(1, batch)
        self.cache_windows = max(1, cache_windows)
        self.legacy = bool(params.get("_legacy", False))
        self.pool_compat = bool(params.get("pool_compat", False))
        self._host_fetch = host_fetch  # k -> frame dict, host-served
        self._cache: dict[int, list[np.ndarray]] = {}  # window start -> planes
        self._order: list[int] = []
        self._lock = threading.Lock()
        self._inflight: dict[int, threading.Event] = {}
        # pool_compat chain state (guarded by _cond's lock): windows run
        # strictly in clip order, one computing thread at a time, with
        # ORDERED turn-taking across the active requests (lowest window
        # first) so parallel sequential lookahead consumes only
        # host-prefetched frames — see _get_pool
        self._cond = threading.Condition()
        self._chain_busy = False
        self._active: dict[int, int] = {}  # window start -> requester count
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

    def _store(self, start: int, outs) -> None:
        if start in self._cache:
            return
        self._cache[start] = outs
        self._order.append(start)
        while len(self._order) > self.cache_windows:
            self._cache.pop(self._order.pop(0), None)

    def _slice(self, start: int, n: int) -> list[np.ndarray]:
        return [p[n - start] for p in self._cache[start]]

    def _fetch_off_worker(self, start: int) -> list:
        """Source frames of the window at ``start``, fetched through the
        host on a fresh daemon thread (pool-mode random access only — the
        one path whose inputs the host did not prefetch).  The fetch
        consumes no VS worker itself, but PRODUCING the frame does need
        one free worker upstream (module docstring point 3), so the wait
        is bounded: a pathological seek storm fails loudly instead of
        hanging the host.  A per-fetch daemon thread (not a shared
        executor) means a timed-out fetch can never wedge later fetches
        behind its abandoned blocked call, and an abandoned thread never
        blocks interpreter exit."""
        import os as _os

        if self._host_fetch is None:
            raise SangNomError(
                "SangNom2: pool_compat random access needs a host fetch "
                "path (internal error: adapter wired without one).")
        end = min(start + self.batch, self.num_frames)
        box: list = []
        done = threading.Event()

        def fetch_range():
            try:
                box.append([self._host_fetch(k) for k in range(start, end)])
            except BaseException as e:  # noqa: BLE001 — re-raised below
                box.append(e)
            finally:
                done.set()

        threading.Thread(target=fetch_range, name="sangnom-prefetch",
                         daemon=True).start()
        timeout = float(_os.environ.get("SANGNOM_VS_FETCH_TIMEOUT", "120"))
        if not done.wait(timeout):
            raise SangNomError(
                "SangNom2: pool_compat random-access fetch timed out "
                f"after {timeout:.0f}s — the host could not serve the "
                "adapter's external frame request (every worker is likely "
                "blocked inside this filter). Request frames in clip "
                "order instead of seeking, or raise "
                "SANGNOM_VS_FETCH_TIMEOUT."
            )
        if isinstance(box[0], BaseException):
            raise box[0]
        return box[0]

    def get(self, n: int, window_frames_fn) -> list[np.ndarray]:
        """Output planes of frame ``n`` ([h, w] numpy per plane).
        ``window_frames_fn()`` builds {"planes": [...], "parity": bool}
        for EVERY source frame of ``n``'s window, in order, from the
        selector's host-prefetched dependency frames.  It is a CALLABLE
        so the plane copies (batch full-frame memcpys) happen only on a
        cache miss — cache hits (batch-1 of every batch sequential
        requests) skip them entirely."""
        start = (n // self.batch) * self.batch
        if self.pool_compat:
            return self._get_pool(n, start, window_frames_fn)
        return self._get_plain(n, start, window_frames_fn)

    def _get_plain(self, n: int, start: int, window_frames_fn):
        with self._lock:
            if start in self._cache:
                return self._slice(start, n)
            ev = self._inflight.get(start)
            if ev is None:
                ev = self._inflight[start] = threading.Event()
                owner = True
            else:
                owner = False
        if not owner:
            # the owner depends only on the TPU, never on the host —
            # waiting here cannot deadlock the worker pool
            ev.wait()
            with self._lock:
                if start in self._cache:
                    return self._slice(start, n)
            # evicted between set() and our wake: recompute from our own
            # prefetched frames (never re-enter the host)
            outs = self._run_window(window_frames_fn())
            return [p[n - start] for p in outs]
        try:
            outs = self._run_window(window_frames_fn())  # no lock held
            with self._lock:
                self._store(start, outs)
        finally:
            with self._lock:
                self._inflight.pop(start, None)
                ev.set()  # waiters recompute if the store above failed
        return [p[n - start] for p in outs]

    def _get_pool(self, n: int, start: int, window_frames_fn):
        """Pool windows run strictly in clip order, one computing thread
        at a time, with ORDERED turn-taking: among the requests currently
        inside this method, the lowest window goes first.  Under parallel
        sequential lookahead (a frame server pipelining requests for
        frames k, k+1, ...) every window's own requester is active when
        its turn comes, so the chain advances on host-prefetched frames
        ONLY — a later-window selector that happens to run first WAITS
        for its predecessors instead of re-entering the host (the naive
        first-come-takes-the-chain design would gap-fill via host
        fetches during plain playback).  Off-worker fetches happen only
        when the chain's next window has no active requester at all — a
        genuine seek."""
        with self._lock:
            if start in self._cache:
                return self._slice(start, n)
        with self._cond:
            self._active[start] = self._active.get(start, 0) + 1
            self._cond.notify_all()  # min(active) may have changed
        try:
            return self._get_pool_turns(n, start, window_frames_fn)
        finally:
            with self._cond:
                self._active[start] -= 1
                if not self._active[start]:
                    del self._active[start]
                self._cond.notify_all()

    def _get_pool_turns(self, n: int, start: int, window_frames_fn):
        restart = False
        with self._cond:
            while True:
                with self._lock:
                    if start in self._cache:
                        return self._slice(start, n)
                if not self._chain_busy:
                    if start == self._pool_next:
                        break  # my turn: advance on my prefetched frames
                    if start == min(self._active):
                        # lowest active request, and it is not the chain's
                        # next window: either behind (evicted — replay
                        # 0..start) or a genuine forward seek (gap-fill);
                        # both consume host fetches only for windows no
                        # active request can supply.  Deferring to
                        # min(active) in BOTH cases keeps liveness (the
                        # minimum is always eligible once the chain
                        # idles) and minimizes fetches: each lower window
                        # is served by its own requester's prefetched
                        # frames first.
                        restart = start < self._pool_next
                        break
                # chain busy, or an earlier active request will take the
                # turn first: wait (bounded re-check; progress guaranteed
                # — min(active) is always eligible once the chain idles)
                self._cond.wait(timeout=0.5)
            self._chain_busy = True
            if restart:
                self._pool_state, self._pool_next = None, 0
        try:
            s = self._pool_next
            while s <= start:
                frames = (window_frames_fn() if s == start
                          else self._fetch_off_worker(s))
                outs = self._run_window(frames)  # threads _pool_state
                with self._lock:
                    self._store(s, outs)
                with self._cond:
                    self._pool_next = s = s + self.batch
        finally:
            with self._cond:
                self._chain_busy = False
                self._cond.notify_all()
        with self._lock:
            return self._slice(start, n)


def _wrap(src, params: dict, batch: int, tff: bool | None, legacy: bool):
    vs = _vs()
    core = vs.core
    fmt_name = _format_name_from_vs(src.format)
    fmt = get_format(fmt_name)
    dh = bool(params.get("dh", False)) and not legacy
    out_h = src.height * 2 if dh else src.height
    batch = max(1, batch)
    tff_default = True if tff is None else tff

    def host_fetch(k):
        # pool-mode random access only; runs on the runner's own thread
        fr = src.get_frame(k)
        return {
            "planes": _frame_planes(fr, fmt.num_planes),
            "parity": _frame_parity(fr, k, tff_default),
        }

    runner = _WindowRunner(
        src.num_frames, fmt_name, dict(params, _legacy=legacy),
        tff=tff_default, batch=batch, host_fetch=host_fetch,
    )

    # OUTPUT-geometry carrier clip: ModifyFrame requires the selector's
    # returned frame to match the clip it modifies, so dimension-changing
    # Python filters modify a blank clip of the output size (the standard
    # VapourSynth recipe) while reading the real source from `clips`.
    blank = core.std.BlankClip(
        clip=src, width=src.width, height=out_h, length=src.num_frames
    )
    win_clips = _window_dep_clips(core, src, batch)

    def selector(n, f):
        # f: [blank frame, window frame 0, ..., window frame batch-1] per
        # the clips list below — the host prefetched n's ENTIRE source
        # window, so no nested get_frame ever runs on this worker
        fout = f[0].copy()
        start = (n // batch) * batch
        end = min(start + batch, src.num_frames)

        def window_frames_fn():
            # deferred: the batch full-frame plane copies run only when
            # the runner actually misses its window cache
            return [
                {
                    "planes": _frame_planes(f[1 + j], fmt.num_planes),
                    "parity": _frame_parity(f[1 + j], start + j,
                                            runner.tff),
                }
                for j in range(end - start)
            ]

        src_frame = f[1 + (n - start)]

        outs = runner.get(n, window_frames_fn)
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

    return core.std.ModifyFrame(clip=blank, clips=[blank] + win_clips,
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
