"""TPU campaign: fused Pallas kernel (opt=1) vs native oracle on real
hardware, across format families and geometries (a fixed shape set to bound
remote compiles), including chroma width-tier cases and batch chunking.

``--random N [seed]`` instead runs N randomly drawn cases (format, odd-ball
geometry, order/dh/aa/aac/plane-mask/parity all randomized) — each is a
fresh Mosaic compile, so N bounds wall-clock.
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root, so `python tools/x.py` works uninstalled
import sys

import numpy as np
from sangnom_tpu import Clip, get_format, sangnom2
from sangnom_tpu.oracle import sangnom2_frame_oracle

CASES = [
    # (fmt, w, h, n, kwargs)
    ("GRAY8", 640, 480, 2, dict(order=1)),                 # BASELINE cfg 1
    ("YUV420P8", 640, 480, 2, dict(order=2)),              # cfg 2
    ("YUV420P8", 640, 480, 2, dict(order=1, dh=True)),     # cfg 3
    ("YUV422P10", 1920, 540, 2, dict(order=0, dh=True)),   # cfg 4 (1080i bob)
    ("GRAY16", 1920, 1080, 1, dict(order=1, aa=128, aac=64)),  # cfg 5
    ("YUV444PS", 960, 540, 1, dict(order=2, aa=48, aac=16)),   # cfg 5 float
    ("YUV420P8", 1920, 1080, 9, dict(order=1, aa=48, aac=48)),  # chunk+tiers
    ("GRAY8", 1919, 1080, 1, dict(order=2)),               # odd width
    ("YUVA420P8", 640, 480, 1, dict(order=1, dh=True)),    # alpha + dh
    ("YUV411P8", 640, 480, 1, dict(order=1, aa=48, aac=48)),  # 4:1:1 chroma
    # 4K: exercises _kernel_batch VMEM scaling (g shrinks below 64) and
    # Mosaic layouts at W_sm=3840 on hardware
    ("YUV420P8", 3840, 2160, 2, dict(order=1, aa=48, aac=48)),
    ("GRAY16", 3840, 1080, 1, dict(order=2, dh=True)),     # 4K-wide u16 bob
]

RANDOM_FORMATS = [
    "GRAY8", "GRAY10", "GRAY16", "YUV420P8", "YUV420P10", "YUV420P16",
    "YUV422P8", "YUV422P12", "YUV444P8", "YUV444P14", "YUV411P8",
    "YUVA420P8", "YUVA444P16", "GRAYS", "YUV444PS",
]


def random_cases(n_cases: int, seed: int):
    rng = np.random.default_rng(seed)
    cases = []
    for _ in range(n_cases):
        fname = RANDOM_FORMATS[rng.integers(len(RANDOM_FORMATS))]
        # 411 needs w % 4 == 0; keep all dims subsampling-safe via mod 4,
        # then add the odd-ball variants the fixed set lacks
        w = int(rng.integers(24, 260)) * 4  # 96..1036
        h = int(rng.integers(4, 180)) * 4  # 16..716
        kw = dict(
            order=int(rng.integers(3)),
            dh=bool(rng.integers(2)),
            aa=int(rng.integers(129)),
            aac=int(rng.integers(129)),
            luma=bool(rng.integers(2)),
            chroma=bool(rng.integers(2)),
        )
        # don't burn a compile-bounded slot on a pure passthrough: with
        # dh=False and every processed plane masked off the filter copies
        # the input verbatim (dh=True always processes — SURVEY quirk 7)
        has_chroma = get_format(fname).num_planes > 1
        if not kw["dh"] and not kw["luma"] and not (
            kw["chroma"] and has_chroma
        ):
            kw["luma"] = True
        cases.append((fname, w, h, int(rng.integers(1, 4)), kw))
    return cases


def compat_cases(n_cases: int, seed: int):
    """Random cases over the COMPAT axes (numerics=sse2, pool_compat) —
    checked as opt=1 vs opt=0 on device (the CPU suites pin opt=0 to the
    native oracle; this validates the Pallas codegen of the compat
    variants on real Mosaic, where interpret-mode tests are blind)."""
    rng = np.random.default_rng(seed)
    cases = []
    for _ in range(n_cases):
        fname = RANDOM_FORMATS[rng.integers(len(RANDOM_FORMATS))]
        w = int(rng.integers(24, 200)) * 4
        h = int(rng.integers(4, 140)) * 4
        kw = dict(
            order=int(rng.integers(3)),
            dh=bool(rng.integers(2)),
            aa=int(rng.integers(129)),
            aac=int(rng.integers(129)),
            pool_compat=bool(rng.integers(2)),
        )
        if not get_format(fname).is_float:
            kw["numerics"] = "sse2" if rng.integers(2) else "c"
            if not kw["pool_compat"] and kw["numerics"] == "c":
                kw["numerics"] = "sse2"  # every case exercises a compat axis
        elif not kw["pool_compat"]:
            # float: numerics='sse2' is a documented no-op (primitives.py),
            # so forcing it would burn the slot on a plain opt1-vs-opt0
            # check AND drop the oracle anchor; take pool_compat instead
            kw["pool_compat"] = True
        cases.append((fname, w, h, int(rng.integers(1, 3)), kw))
    return cases


def bob_cases(n_cases: int, seed: int):
    """Random interlaced clips for the fused bob pipeline (round 3):
    checked as bob(opt=1) vs the explicit SeparateFields -> DoubleWeave ->
    SangNom2(order=0, opt=0) pipeline on device, plus a native-oracle
    anchor on the woven frames."""
    rng = np.random.default_rng(seed)
    fmts = [f for f in RANDOM_FORMATS if "A" not in f]  # alpha falls back
    cases = []
    for _ in range(n_cases):
        fname = fmts[rng.integers(len(fmts))]
        w = int(rng.integers(24, 200)) * 4
        h = int(rng.integers(6, 120)) * 4
        kw = dict(
            aa=int(rng.integers(129)),
            aac=int(rng.integers(129)),
            tff=bool(rng.integers(2)),
        )
        cases.append((fname, w, h, int(rng.integers(1, 4)), kw))
    return cases


def sharded_cases(n_cases: int, seed: int):
    """Random cases through sangnom2_sharded on a REAL 1-device
    ('data','space') mesh — the width-sharded kernels (fused / chunked /
    scan, incl. the creep/decay-bound padded widths) compiled by actual
    Mosaic instead of interpret mode, checked vs the unsharded opt=0
    backend on device plus a native-oracle anchor."""
    rng = np.random.default_rng(seed)
    cases = []
    for _ in range(n_cases):
        fname = RANDOM_FORMATS[rng.integers(len(RANDOM_FORMATS))]
        w = int(rng.integers(24, 200)) * 4
        h = int(rng.integers(4, 140)) * 4
        kw = dict(
            order=int(rng.integers(3)),
            dh=bool(rng.integers(2)),
            aa=int(rng.integers(129)),
            aac=int(rng.integers(129)),
            smooth=("fused", "chunked", "scan",
                    "fused_noweave")[rng.integers(4)],
        )
        if not get_format(fname).is_float and rng.integers(2):
            kw["numerics"] = "sse2"
        cases.append((fname, w, h, int(rng.integers(1, 4)), kw))
    return cases


CAMPAIGN = CASES
MODE = "oracle"
# one generator table instead of four copy-pasted argv blocks; every mode
# shares the N/seed convention (default seed 20260817)
_CAMPAIGN_MODES = {
    "--sharded": (sharded_cases, "sharded",
                  "sangnom2_sharded on a 1-device 'space' mesh vs "
                  "unsharded opt=0 + oracle anchor"),
    "--bob": (bob_cases, "bob",
              "fused bob opt=1 vs explicit pipeline opt=0 + oracle anchor"),
    "--compat": (compat_cases, "opt0", "opt=1 vs opt=0 on device"),
    "--random": (random_cases, "oracle", "full random draw vs oracle"),
}
for _flag, (_gen, _mode, _banner) in _CAMPAIGN_MODES.items():
    if _flag not in sys.argv:
        continue
    i = sys.argv.index(_flag)
    try:
        n_rand = int(sys.argv[i + 1])
    except (IndexError, ValueError):
        sys.exit(f"usage: parity_campaign_tpu.py {_flag} N [seed]")
    seed = int(sys.argv[i + 2]) if len(sys.argv) > i + 2 else 20260817
    CAMPAIGN = _gen(n_rand, seed)
    MODE = _mode
    print(f"{_flag[2:]} campaign: {n_rand} cases, seed {seed} ({_banner})",
          flush=True)
    break

fails = 0
for k, (fname, w, h, n, kw) in enumerate(CAMPAIGN):
    rng = np.random.default_rng(500 + k)
    fmt = get_format(fname)
    planes = []
    for i in range(fmt.num_planes):
        pw, ph = fmt.plane_dims(w, h, i)
        if fmt.is_float:
            planes.append((rng.random((n, ph, pw), np.float32)*2-0.5).astype(np.float32))
        else:
            top = (1 << (8*fmt.component_size)) - 1
            planes.append(rng.integers(0, top+1, (n, ph, pw)).astype(fmt.dtype))
    case_fails = 0
    if MODE == "bob":
        from sangnom_tpu.core.fields import bob, double_weave, separate_fields

        tff = kw.pop("tff")
        clip = Clip.from_numpy(planes, fmt, tff=tff)
        got = bob(clip, opt=1, **kw)
        woven = double_weave(separate_fields(clip))
        want_clip = sangnom2(woven, order=0, opt=0, **kw)
        for i in range(fmt.num_planes):
            if not np.array_equal(np.asarray(got.planes[i]),
                                  np.asarray(want_clip.planes[i])):
                case_fails += 1
                print(f"BOB MISMATCH {fname} {w}x{h} tff={tff} {kw} "
                      f"plane {i}", flush=True)
        # native-oracle anchor on the first and last output frames
        for fr in {0, 2 * n - 1}:
            want = sangnom2_frame_oracle(
                [np.asarray(p)[fr] for p in woven.planes], fmt, order=0,
                frame_parity=woven.get_parity(fr), **kw,
            )
            for i, wp in enumerate(want):
                if not np.array_equal(np.asarray(got.planes[i])[fr], wp):
                    case_fails += 1
                    print(f"BOB ORACLE MISMATCH {fname} {w}x{h} tff={tff} "
                          f"{kw} frame {fr} plane {i}", flush=True)
        kw["tff"] = tff  # restore for the verdict line
        fails += case_fails
        verdict = "OK" if case_fails == 0 else f"FAIL ({case_fails})"
        print(f"[{k+1}/{len(CAMPAIGN)}] bob {fname} {w}x{h} n={n} {kw}: "
              f"{verdict}", flush=True)
        continue
    clip = Clip.from_numpy(planes, fmt)
    if MODE == "sharded":
        from sangnom_tpu.parallel import default_mesh, sangnom2_sharded

        if kw.get("order") == 0 and n > 1:
            # MIXED per-frame parity: exercises the sharded per-frame-
            # offset ('pf') in-kernel weave with genuinely divergent
            # offsets on real Mosaic
            par = np.asarray(rng.integers(0, 2, n), dtype=bool)
            clip = Clip.from_numpy(planes, fmt, parity=par)
        mesh = default_mesh(data=1, space=1)
        got = sangnom2_sharded(clip, mesh, space_axis="space", **kw)
        base_kw = {k: v for k, v in kw.items() if k != "smooth"}
        want_clip = sangnom2(clip, opt=0, **base_kw)
        for i in range(fmt.num_planes):
            if not np.array_equal(np.asarray(got.planes[i]),
                                  np.asarray(want_clip.planes[i])):
                case_fails += 1
                print(f"SHARDED MISMATCH {fname} {w}x{h} {kw} plane {i}",
                      flush=True)
        okw = {k: v for k, v in base_kw.items() if k != "numerics"}
        if kw.get("numerics", "c") == "c":
            want = sangnom2_frame_oracle(
                [p[0] for p in planes], fmt,
                frame_parity=clip.get_parity(0), **okw,
            )
            for i, wp in enumerate(want):
                if not np.array_equal(np.asarray(got.planes[i])[0], wp):
                    case_fails += 1
                    print(f"SHARDED ORACLE MISMATCH {fname} {w}x{h} {kw} "
                          f"plane {i}", flush=True)
        fails += case_fails
        verdict = "OK" if case_fails == 0 else f"FAIL ({case_fails})"
        print(f"[{k+1}/{len(CAMPAIGN)}] sharded {fname} {w}x{h} n={n} "
              f"{kw}: {verdict}", flush=True)
        continue
    got = sangnom2(clip, opt=1, **kw)
    if MODE == "opt0":
        # compat axes: cross-check the two on-device backends whole-clip
        want_clip = sangnom2(clip, opt=0, **kw)
        for i in range(fmt.num_planes):
            if not np.array_equal(np.asarray(got.planes[i]),
                                  np.asarray(want_clip.planes[i])):
                case_fails += 1
                print(f"MISMATCH {fname} {w}x{h} {kw} plane {i}", flush=True)
        # oracle anchor where the oracle supports the case's compat axes
        # (pool_compat: yes; numerics=sse2: no — that contract's ground
        # truth is the in-place-compiled reference SSE2 itself,
        # tests/test_sse2_numerics.py).  Guards against a bug in a stage
        # SHARED by both backends passing the cross-check silently.
        if kw.get("numerics", "c") == "c":
            from sangnom_tpu.oracle import sangnom2_clip_oracle

            okw = {k: v for k, v in kw.items() if k != "numerics"}
            frames = [[p[f] for p in planes] for f in range(n)]
            pars = [bool(clip.get_parity(f)) for f in range(n)]
            want_o = sangnom2_clip_oracle(frames, fmt, parities=pars, **okw)
            for f in {0, n - 1}:
                for i in range(fmt.num_planes):
                    if not np.array_equal(np.asarray(got.planes[i])[f],
                                          want_o[f][i]):
                        case_fails += 1
                        print(f"ORACLE MISMATCH {fname} {w}x{h} {kw} "
                              f"frame {f} plane {i}", flush=True)
    else:
        # check first and last frame against the native oracle
        for fr in {0, n - 1}:
            want = sangnom2_frame_oracle(
                [p[fr] for p in planes], fmt,
                frame_parity=clip.get_parity(fr), **kw,
            )
            for i, wp in enumerate(want):
                g = np.asarray(got.planes[i])[fr]
                if not np.array_equal(g, wp):
                    case_fails += 1
                    print(f"MISMATCH {fname} {w}x{h} {kw} frame {fr} "
                          f"plane {i}", flush=True)
    fails += case_fails
    verdict = "OK" if case_fails == 0 else f"FAIL ({case_fails})"
    print(f"[{k+1}/{len(CAMPAIGN)}] {fname} {w}x{h} n={n} {kw}: {verdict}",
          flush=True)
print(f"TPU CAMPAIGN DONE: {len(CAMPAIGN)} cases, {fails} failures")
sys.exit(1 if fails else 0)  # scripted callers gate on $?
