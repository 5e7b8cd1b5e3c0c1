"""Headline benchmark: 1080p bob+dh deinterlace frames/sec/chip.

Matches BASELINE.json's metric LITERALLY (round 3): the timed headline is
TRUE BOB — interlaced 1080p YUV420 8-bit frames through the reference's
documented double-rate recipe (SeparateFields -> DoubleWeave ->
SangNom2(order=0), reference src/SangNom2.cpp:18-23, here core.fields.bob
with its fused fast path) — alternating per-frame parity included.  fps
counts OUTPUT (deinterlaced) frames, the same unit the SSE2 baseline
harness reports for its identical per-output-frame dh workload.  The
order=1 uniform-parity dh number (round 2's headline) is kept as the
``order1_dh_fps`` key.  Bit-exact 8-bit output is verified against the
native oracle before timing.

Baseline: the reference's OWN SSE2 path, measured single-core on this host
(tools/sse2_baseline compiles /root/reference/src/SangNom2_SSE2.cpp in place
behind a shim header and times its prepare/9x-process/finalize pipeline on
the same workload).  If the reference tree or toolchain is unavailable, the
recorded best-of-runs from 2026-08-20 on this host is used (119.7 fps,
uncontended; SSE2_MEASURED_FPS_RECORDED — also the FLOOR for contended
live runs, with the live number recorded alongside for audit).
``vs_baseline`` is TPU fps over measured SSE2 fps; the north-star target
is >= 10.

Also reported: the full BASELINE.json config matrix (each parity-gated
against the native oracle and timed), and the analytic VPU roofline
utilization (sangnom_tpu/utils/cost_model.py).

Prints ONE JSON line to stdout; diagnostics go to stderr.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

import numpy as np

# Best-of-runs measurement of the reference SSE2 path on this host
# (tools/sse2_baseline; best observed 2026-08-20 during the round-5 close,
# uncontended single core: ~8.4 ms/frame 1080p YUV420 bob+dh — supersedes
# the round-4 114.6 and the 2026-08-17 105.2).  Used as a floor: this
# host's lone vCPU is shared — contended live runs measure as low as
# ~39 fps, and a depressed baseline must not flatter vs_baseline.
SSE2_MEASURED_FPS_RECORDED = 119.7


def log(*a):
    print(*a, file=sys.stderr, flush=True)


# --- regression gate (VERDICT_r4 #3) ---------------------------------------
# The gate compares the live numbers against the best committed history
# (BENCH_r*.json at the repo root — the driver's per-round records) and
# LOUDLY flags any throughput metric that lands more than REGRESSION_TOL
# below its historical best.  Tolerance default 10% per the documented
# cross-process contention spread (CLAUDE.md: +-8%); override with
# SANGNOM_BENCH_TOLERANCE (fraction, e.g. 0.15).  The gate flags rather
# than exits: a contended trial must not zero out an otherwise-valid
# driver record, but the `regression` field makes a real drop impossible
# to ship silently.  Parity failures still exit nonzero as before.

try:
    REGRESSION_TOL = float(os.environ.get("SANGNOM_BENCH_TOLERANCE", "0.10"))
except ValueError:
    # the gate must never cost a bench run — not even to an env-var typo
    print("warning: ignoring malformed SANGNOM_BENCH_TOLERANCE "
          f"{os.environ['SANGNOM_BENCH_TOLERANCE']!r}; using 0.10",
          file=sys.stderr)
    REGRESSION_TOL = 0.10

#: throughput keys gated at the top level of the bench JSON
GATED_KEYS = ("value", "order1_dh_fps", "pool_compat_fps",
              "pool_compat_carried_fps")


def flatten_bench(rec: dict) -> dict:
    """Flat {metric: fps} map from one bench JSON (driver records wrap the
    line under "parsed"; a raw bench line is accepted as-is).  Shape-
    tolerant: a failed round's record may carry "parsed": null, and the
    gate must skip it, not crash the bench."""
    if not isinstance(rec, dict):
        return {}
    if "parsed" in rec:
        rec = rec["parsed"]
        if not isinstance(rec, dict):
            return {}
    out = {}
    for k in GATED_KEYS:
        v = rec.get(k)
        if isinstance(v, (int, float)) and v > 0:
            out[k] = float(v)
    for name, cfg in (rec.get("configs") or {}).items():
        v = cfg.get("fps") if isinstance(cfg, dict) else None
        if isinstance(v, (int, float)) and v > 0 and cfg.get("parity") == "ok":
            out[f"configs.{name}"] = float(v)
    return out


def load_bench_history(root: Path) -> list[dict]:
    """All committed BENCH_r*.json records, oldest first; unreadable or
    non-JSON files are skipped (the gate must never crash the bench)."""
    hist = []
    for p in sorted(root.glob("BENCH_r*.json")):
        try:
            hist.append(json.loads(p.read_text()))
        except Exception as e:
            log(f"regression gate: skipping {p.name}: {e}")
    return hist


def check_regression(current: dict, history: list[dict],
                     tolerance: float = REGRESSION_TOL,
                     spreads: dict | None = None) -> dict:
    """Pure gate logic (unit-tested in tests/test_bench_gate.py).

    Returns {"ok", "tolerance_pct", "best", "regressions"} where ``best``
    maps each gated metric to its best-of-history fps and ``regressions``
    lists metrics whose current value is below best*(1-tol_k).

    ``spreads`` maps a metric to the CURRENT run's observed relative
    round-to-round spread (fraction); the per-metric tolerance is
    max(tolerance, spread) — a metric whose own timing rounds swing 20%
    on the pool-contended chip cannot be held to a 10% floor without
    false alarms (sub-10ms configs measured 2x swings, e.g. cfg2 4.9k to
    9.6k fps across rounds of one process), while stable metrics keep
    the tight gate.  The applied tolerance is recorded per flagged
    metric for audit.  Metrics with no history (new configs) pass
    vacuously.
    """
    spreads = spreads or {}
    best: dict[str, float] = {}
    for rec in history:
        for k, v in flatten_bench(rec).items():
            best[k] = max(best.get(k, 0.0), v)
    cur = flatten_bench(current)
    regressions = []
    for k, floor_src in best.items():
        v = cur.get(k)
        if v is None:
            continue  # metric not measured this run (e.g. --headline-only)
        tol_k = max(tolerance, float(spreads.get(k, 0.0)))
        if v < floor_src * (1.0 - tol_k):
            regressions.append({
                "metric": k, "current": round(v, 1),
                "best": round(floor_src, 1),
                "drop_pct": round((1.0 - v / floor_src) * 100, 1),
                "tolerance_pct": round(tol_k * 100, 1),
            })
    return {
        "ok": not regressions,
        "tolerance_pct": round(tolerance * 100, 1),
        "best": {k: round(v, 1) for k, v in sorted(best.items())},
        "regressions": regressions,
    }


def measure_sse2_baseline() -> tuple[float, str, float]:
    """(fps, provenance, live_fps) of the reference SSE2 path, single core.
    ``live_fps`` is the unfloored live measurement (0.0 if none ran) so the
    floor substitution below is auditable in the JSON."""
    tool_dir = Path(__file__).parent / "tools" / "sse2_baseline"
    ref = Path(os.environ.get("SANGNOM_REF_DIR", "/root/reference/src"))
    if not (ref / "SangNom2_SSE2.cpp").exists():
        return SSE2_MEASURED_FPS_RECORDED, "recorded (reference tree absent)", 0.0
    try:
        subprocess.run(
            ["make", "-s", f"REF_DIR={ref}"], cwd=tool_dir, check=True,
            capture_output=True, text=True, timeout=300,
        )
        best = 0.0
        for _ in range(2):
            out = subprocess.run(
                [str(tool_dir / "sse2_baseline"), "30"], check=True,
                capture_output=True, text=True, timeout=600,
            )
            best = max(best, float(json.loads(out.stdout)["value"]))
        if best < SSE2_MEASURED_FPS_RECORDED:
            # this host's lone vCPU is shared; a contended live run must
            # not FLATTER vs_baseline — floor at the recorded best (both
            # numbers land in the JSON so the substitution is auditable)
            return SSE2_MEASURED_FPS_RECORDED, (
                f"recorded best (live run contended: {best:.1f} fps)"
            ), best
        return best, "measured live (tools/sse2_baseline)", best
    except Exception as e:  # toolchain missing, build failure, ...
        return SSE2_MEASURED_FPS_RECORDED, f"recorded (live run failed: {e})", 0.0


def _config_matrix(Clip, get_format, sangnom2, sync, rng, oracle_frame):
    """The other BASELINE.json configs: parity gate + throughput for each.
    Returns {name: {"fps": float, "parity": "ok"|"FAIL"}}.

    Note: chroma planes draw from the same full-range RNG as luma (fine —
    the filter treats planes independently and the thresholds are
    per-plane), and the one shared ``rng`` makes the matrix deterministic
    as a whole rather than per-config.  The parity gates here are
    single-frame; deep randomized coverage lives in
    tools/parity_campaign_{cpu,tpu}.py."""
    import jax.numpy as jnp

    cases = [
        ("cfg1_640x480_GRAY8_order1", "GRAY8", 640, 480, dict(order=1)),
        ("cfg2_640x480_YUV420P8_order2", "YUV420P8", 640, 480,
         dict(order=2)),
        ("cfg4_1080i_YUV422P10_bob_dh", "YUV422P10", 1920, 540,
         dict(order=0, dh=True)),
        ("cfg5_1080p_GRAY16_aa128", "GRAY16", 1920, 1080,
         dict(order=1, aa=128, aac=64)),
        ("cfg5f_540p_YUV444PS", "YUV444PS", 960, 540, dict(order=2)),
    ]
    B = 64  # throughput batch; chunk caps make small planes one chunk
    results = {}
    for name, fname, w, h, kw in cases:
        fmt = get_format(fname)
        planes = []
        for i in range(fmt.num_planes):
            pw, ph = fmt.plane_dims(w, h, i)
            if fmt.is_float:
                planes.append(rng.random((B, ph, pw), np.float32))
            else:
                top = (1 << (8 * fmt.component_size)) - 1
                planes.append(
                    rng.integers(0, top + 1, (B, ph, pw)).astype(fmt.dtype))
        clip = Clip.from_numpy(planes, fmt)
        # parity gate: first frame vs native oracle
        clip1 = Clip.from_numpy([p[:1] for p in planes], fmt)
        out1 = sangnom2(clip1, opt=-1, **kw)
        want = oracle_frame(
            [p[0] for p in planes], fmt,
            frame_parity=clip1.get_parity(0), **kw,
        )
        parity_ok = all(
            np.array_equal(np.asarray(out1.planes[i])[0], want[i])
            for i in range(fmt.num_planes)
        )
        # Eager filter call (the library's true dispatch path — an outer
        # jit would trace the parity array and defeat the order=0 static
        # split — and eager outputs are fully materialized, so nothing can
        # be dead-code-eliminated) + one jitted light sync dispatch.
        # Warm = compile + one TRIAL-SHAPED throwaway round: the r04 run
        # recorded cfg1/cfg2 ~36% low from a single-call warm (an
        # in-process re-measure hit 10.7k/9.0k fps; the first post-warm
        # rounds still ramped), the same first-window depression the
        # headline sections already warm through.
        _ = float(sync(sangnom2(clip, opt=-1, **kw).planes))
        np.asarray(jnp.stack(
            [sync(sangnom2(clip, opt=-1, **kw).planes) for _ in range(5)]))
        times = []
        for _t in range(4):
            t0 = time.perf_counter()
            acc = [sync(sangnom2(clip, opt=-1, **kw).planes)
                   for _ in range(5)]
            np.asarray(jnp.stack(acc))
            times.append((time.perf_counter() - t0) / 5)
        fps = B / min(times)
        # round-to-round spread of THIS run: feeds the regression gate's
        # per-metric tolerance (small configs swing far beyond the 10%
        # base on the pool-contended chip; the spread is the evidence)
        spread = (max(times) - min(times)) / max(times)
        results[name] = {
            "fps": round(fps, 1), "parity": "ok" if parity_ok else "FAIL",
            "spread_pct": round(spread * 100, 1),
        }
        log(f"  {name}: {fps:8.0f} frames/s parity={results[name]['parity']}"
            f" (round spread {spread * 100:.0f}%)")
    return results


def main() -> None:
    import jax

    from sangnom_tpu import Clip, get_format, sangnom2
    from sangnom_tpu.oracle import sangnom2_frame_oracle
    from sangnom_tpu.utils.cost_model import vpu_utilization

    log("devices:", jax.devices())
    backend = jax.default_backend()

    fmt = get_format("YUV420P8")
    rng = np.random.default_rng(7)
    # 120 frames = one luma kernel chunk at the VMEM cap; measured +12.1%
    # per frame over B=64 (results/batch120_ab_interleaved.txt; B=128
    # measured a tie at -1.3%)
    B = 120
    planes = [
        rng.integers(0, 256, (B, 540, 1920)).astype(np.uint8),
        rng.integers(0, 256, (B, 270, 960)).astype(np.uint8),
        rng.integers(0, 256, (B, 270, 960)).astype(np.uint8),
    ]
    clip = Clip.from_numpy(planes, fmt)
    kwargs = dict(order=1, aa=48, aac=0, dh=True)

    # --- correctness gate: bit-exact vs the native oracle ------------------
    # (a single-frame clip: fetching full 64-frame planes through the device
    # tunnel costs minutes and proves nothing more)
    clip1 = Clip.from_numpy([p[:1] for p in planes], fmt)
    out = sangnom2(clip1, opt=-1, **kwargs)
    jax.block_until_ready(out.planes)
    want = sangnom2_frame_oracle([p[0] for p in planes], fmt, **kwargs)
    for i in range(3):
        got = np.asarray(out.planes[i])[0]
        if not np.array_equal(got, want[i]):
            log(f"BIT-EXACTNESS FAILURE plane {i}")
            print(json.dumps({"metric": "1080p_bob_dh_fps_per_chip",
                              "value": 0.0, "unit": "frames/s",
                              "vs_baseline": 0.0, "error": "parity"}))
            sys.exit(1)
    log("bit-exactness vs native oracle: OK (all planes)")

    # --- TPU throughput ----------------------------------------------------
    # Methodology: under the axon tunnel, block_until_ready can return
    # before remote execution completes; a device-side reduction over the
    # outputs, fetched at the end of each trial, forces the full chain
    # (device streams execute in order and the reduction's operands are the
    # whole output buffers).  The filter call is EAGER — its outputs are
    # fully materialized jit results, so no filter or assembly work can be
    # dead-code-eliminated, and the order=0 static split sees concrete
    # parity exactly as real callers do.  The sync reduction is one jitted
    # dispatch reading ONE ROW per plane: a full-plane f32 checksum was
    # measured at ~2.8 ms device time per iteration (XProf, 2026-08-16) —
    # pure harness tax, since the buffer dependency alone gives the
    # ordering guarantee.  Best of 5 trials.
    import jax.numpy as jnp

    @jax.jit
    def sync(planes):
        s = jnp.zeros((), jnp.float32)
        for p in planes:
            s = s + jnp.sum(p[:, -1].astype(jnp.float32))
        return s

    iters = 10
    # warm: compile + one full-rate throwaway pass (BENCH_r03 recorded a
    # first trial 6x the rest — a single warm call does not flush the
    # first-dispatch overheads; a 3-call pass still left a 2.7x leak in
    # BENCH_r04's first trial, so the throwaway pass is trial-shaped)
    _ = float(sync(sangnom2(clip, opt=-1, **kwargs).planes))
    np.asarray(jnp.stack(
        [sync(sangnom2(clip, opt=-1, **kwargs).planes)
         for _ in range(iters)]))
    trials_o1 = []
    for _trial in range(5):
        t0 = time.perf_counter()
        acc = [sync(sangnom2(clip, opt=-1, **kwargs).planes)
               for _ in range(iters)]
        np.asarray(jnp.stack(acc))  # forces every iteration
        trials_o1.append((time.perf_counter() - t0) / iters)
    dt_o1 = min(trials_o1)
    fps_o1 = B / dt_o1
    log(f"{backend} order=1 dh: {dt_o1*1e3:.2f} ms / {B} frames "
        f"-> {fps_o1:.0f} frames/s (best of 5 trials, checksum-forced)")

    # --- TRUE BOB: the metric's literal workload --------------------------
    # Interlaced 1080p frames -> SeparateFields -> fused order=0 dh with
    # ALTERNATING per-frame parity (the per-frame-offset in-kernel weave).
    from sangnom_tpu.core.fields import bob, double_weave, separate_fields

    B_in = B // 2  # 60 interlaced frames -> B output frames
    bob_planes = [
        rng.integers(0, 256, (B_in, 1080, 1920)).astype(np.uint8),
        rng.integers(0, 256, (B_in, 540, 960)).astype(np.uint8),
        rng.integers(0, 256, (B_in, 540, 960)).astype(np.uint8),
    ]
    clip_bob = Clip.from_numpy(bob_planes, fmt, tff=True)
    # parity gate: 2 input frames -> 4 output frames, each vs the oracle on
    # the woven frame it is defined to equal
    clip2 = Clip.from_numpy([p[:2] for p in bob_planes], fmt, tff=True)
    out_bob = bob(clip2)
    woven = double_weave(separate_fields(clip2))
    for n in range(4):
        want = sangnom2_frame_oracle(
            [np.asarray(p)[n] for p in woven.planes], fmt, order=0,
            frame_parity=woven.get_parity(n),
        )
        for i in range(3):
            got = np.asarray(out_bob.planes[i])[n]
            if not np.array_equal(got, want[i]):
                log(f"BOB BIT-EXACTNESS FAILURE frame {n} plane {i}")
                print(json.dumps({"metric": "1080p_bob_dh_fps_per_chip",
                                  "value": 0.0, "unit": "frames/s",
                                  "vs_baseline": 0.0, "error": "bob parity"}))
                sys.exit(1)
    log("true-bob bit-exactness vs native oracle: OK (4 frames x 3 planes)")

    _ = float(sync(bob(clip_bob).planes))  # warm (compile)
    np.asarray(jnp.stack(  # untimed trial-shaped pass (see order=1 note)
        [sync(bob(clip_bob).planes) for _ in range(iters)]))
    trials = []
    for _trial in range(5):
        t0 = time.perf_counter()
        acc = [sync(bob(clip_bob).planes) for _ in range(iters)]
        np.asarray(jnp.stack(acc))
        trials.append((time.perf_counter() - t0) / iters)
    dt = min(trials)
    spread = (max(trials) - dt) / dt * 100
    fps = B / dt  # B output frames per bob() call
    log(f"{backend} TRUE BOB: {dt*1e3:.2f} ms / {B} output frames "
        f"-> {fps:.0f} frames/s (best of 5 trials, checksum-forced; "
        f"trial spread {spread:.0f}% — the chip is pool-contended)")

    # --- analytic VPU roofline ---------------------------------------------
    util = vpu_utilization(fps_o1, fmt, 1920, 540, dh=True)
    log(f"roofline: {util['ops_per_frame']/1e6:.0f}M vector ops/frame -> "
        f"{util['achieved_ops_per_s']/1e12:.2f} Tops/s = "
        f"{util['vpu_utilization']*100:.0f}% of nominal v5e VPU peak "
        f"({util['vpu_peak_ops_per_s']/1e12:.2f} Tops/s), "
        f"{util['vs_measured_achievable']*100:.0f}% of measured-achievable "
        f"for the kernel op blend "
        f"({util['measured_achievable_ops_per_s']/1e12:.2f} Tops/s, "
        f"tools/calibrate_vpu.py)")

    # --- measured baseline: the reference's own SSE2 path, single core -----
    sse2_fps, provenance, sse2_live_fps = measure_sse2_baseline()
    log(f"reference SSE2 baseline: {sse2_fps:.1f} fps [{provenance}]")

    # --- the full BASELINE.json config matrix -------------------------------
    configs = {}
    pool_fps = None
    pool_carried_fps = None
    pool_parity_fail = False
    # per-metric observed round spreads of THIS run, for the gate's
    # adaptive tolerance (max(base, spread) per metric)
    spreads = {
        "value": (max(trials) - min(trials)) / max(trials),
        "order1_dh_fps": (max(trials_o1) - min(trials_o1)) / max(trials_o1),
    }
    if "--headline-only" not in sys.argv:
        log("config matrix (BASELINE.json):")
        configs = _config_matrix(
            Clip, get_format, sangnom2, sync, rng, sangnom2_frame_oracle
        )
        for name, c in configs.items():
            spreads[f"configs.{name}"] = c.get("spread_pct", 0.0) / 100.0
        if any(c["parity"] != "ok" for c in configs.values()):
            log("CONFIG-MATRIX PARITY FAILURE")
        # pool_compat cost (VERDICT_r2 #6; accounting reconciled round 4):
        # the sequential carried-state scan is the ONLY shipping path — the
        # frame-parallel fast path was rejected (slower at every chunk size
        # + one hardware bit-identity failure, ops.pool_carry.POOL_FAST).
        # Two geometries, both parity-gated against the jnp-scan backend
        # (opt=0) before timing: the stride-aligned 1920-wide clip (the
        # common production case) and an UNALIGNED 1912-wide clip whose
        # pool pad columns genuinely carry state across frames.
        Bp = 32

        def time_pool(clip_p, n_frames, label):
            # Parity gate DEPTH: 8 frames, not 2 (ADVICE_r4) — the mode's
            # defining risk is divergence that only manifests in later
            # carried pool state (cf. the unlocalized poolfast hardware
            # failure), which a 2-frame gate could miss.  The opt=0 pass
            # is one-time gate cost, outside the timed loop.
            p2 = Clip.from_numpy(
                [np.asarray(pl)[:8] for pl in clip_p.planes], fmt
            )
            ref = sangnom2(p2, pool_compat=True, opt=0, **kwargs)
            got = sangnom2(p2, pool_compat=True, **kwargs)
            ok = all(
                np.array_equal(np.asarray(a), np.asarray(b))
                for a, b in zip(got.planes, ref.planes)
            )
            if not ok:
                log(f"POOL-COMPAT PARITY FAILURE ({label})")
                return None
            _ = float(sync(
                sangnom2(clip_p, pool_compat=True, **kwargs).planes))
            # best of 3 timing rounds: the first post-warm window measures
            # up to 5x slow on this chip (the same first-trial depression
            # the headline sections warm through; BENCH_r04_final recorded
            # 195 vs 570 fps from a single unlucky window)
            times = []
            for _r in range(3):
                t0 = time.perf_counter()
                acc = [sync(sangnom2(clip_p, pool_compat=True,
                                     **kwargs).planes) for _ in range(3)]
                np.asarray(jnp.stack(acc))
                times.append((time.perf_counter() - t0) / 3)
            f = n_frames / min(times)
            log(f"pool_compat {label}: {f:.1f} frames/s "
                f"(sequential carried-state scan, best of 3 rounds)")
            return f, (max(times) - min(times)) / max(times)

        clip_p = Clip.from_numpy([p[:Bp] for p in planes], fmt)
        pool_fps = time_pool(clip_p, Bp, "1080p 4:2:0 stride-aligned")
        clip_pu = Clip.from_numpy(
            [planes[0][:Bp, :, :1912],
             planes[1][:Bp, :, :956], planes[2][:Bp, :, :956]], fmt)
        pool_carried_fps = time_pool(clip_pu, Bp, "1912x1080 4:2:0 unaligned")
        pool_parity_fail = pool_fps is None or pool_carried_fps is None
        if pool_fps is not None:
            pool_fps, pool_spread = pool_fps
            spreads["pool_compat_fps"] = pool_spread
        if pool_carried_fps is not None:
            pool_carried_fps, pc_spread = pool_carried_fps
            spreads["pool_compat_carried_fps"] = pc_spread

    result = {
        "metric": "1080p_bob_dh_fps_per_chip",
        "value": round(fps, 1),
        "unit": "frames/s",
        "vs_baseline": round(fps / sse2_fps, 2),
        "order1_dh_fps": round(fps_o1, 1),
        "baseline_sse2_fps": round(sse2_fps, 1),
        "baseline_sse2_live_fps": round(sse2_live_fps, 1),
        "baseline_provenance": provenance,
        "trials_ms": [round(t * 1e3, 3) for t in trials],
        "order1_trials_ms": [round(t * 1e3, 3) for t in trials_o1],
        "pool_compat_fps": None if pool_fps is None else round(pool_fps, 1),
        "pool_compat_carried_fps": (
            None if pool_carried_fps is None else round(pool_carried_fps, 1)
        ),
        "vpu_utilization_pct": round(util["vpu_utilization"] * 100, 1),
        "vpu_vs_measured_achievable_pct": round(
            util["vs_measured_achievable"] * 100, 1),
        "trial_spread_pct": round(spread, 1),
        "backend": backend,
        "batch": B,
        "configs": configs,
    }
    # --- regression gate vs committed history (VERDICT_r4 #3) --------------
    gate = check_regression(result, load_bench_history(Path(__file__).parent),
                            spreads=spreads)
    result["regression"] = gate
    if not gate["ok"]:
        for r in gate["regressions"]:
            log(f"REGRESSION: {r['metric']} {r['current']} fps is "
                f"{r['drop_pct']}% below historical best {r['best']} fps "
                f"(tolerance {gate['tolerance_pct']}%)")
    print(json.dumps(result))
    if any(c["parity"] != "ok" for c in configs.values()) or pool_parity_fail:
        # same contract as the headline gate: a parity failure anywhere
        # fails the run (the JSON above still records which config),
        # so scripted callers gating on $? cannot record broken numbers
        sys.exit(1)


if __name__ == "__main__":
    main()
