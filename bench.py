"""Benchmark harness — one-line JSON for the driver + multi-config modes.

Default (driver) config: the BASELINE.json primary target — KITTI stereo
1242x375, D=128, 8 paths, LR-consistency + subpixel (config 2).  Metric is
Mpixel*disp/s = H*W*D*fps/1e6 (BASELINE.md).  `vs_baseline` is measured
throughput over the best prior-art per-chip anchor recorded in BASELINE.md
(embedded-GPU SGM, ~1650 Mpixel*disp/s on Tegra X1; the reference itself
is a single-threaded MATLAB/MEX CPU pipeline, far slower, and publishes no
numbers — BASELINE.json `published: {}`).

Env knobs:
  FSGM_BENCH_CONFIG  kitti (default) | tsukuba | kitti16 | flow | 4k | 4kflow
  FSGM_BENCH_BACKEND pallas | xla  (default: pallas on TPU)
  FSGM_BENCH_BATCH   frames per dispatch (default per config)
  FSGM_BENCH_STAGES  1 -> per-stage roofline table on stderr (JSONL:
                     wall, modeled HBM bytes, achieved GB/s, % of peak;
                     SURVEY.md §5 "roofline reporting"); stereo cfgs only
  FSGM_BENCH_GUARD   1 -> exit non-zero if ms/frame regresses past the
                     per-config tolerance vs bench_history.json
  FSGM_BENCH_TRACE   dir -> capture a jax.profiler trace of one timed
                     dispatch into <dir> (XProf/Perfetto; SURVEY.md §5)

Params for each config are loaded from the committed preset file in
configs/ (bench_params) — presets and bench cannot drift
(tests/unit/test_presets.py).

Measurement notes (axon relay): every timed call is salted so no two
executions are identical (the relay memoizes), and sync is a scalar
reduction fetched from inside the jit (block_until_ready does not reliably
block through the relay).  Stdout stays ONE parseable line; context goes
to stderr.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

# Anchor throughputs (Mpixel*disp/s); see BASELINE.md.
BASELINE_MPDS = 1650.0     # embedded-GPU SGM anchor (best prior art per chip)
SOL_MPDS = 16000.0         # derived HBM speed-of-light, SURVEY.md §7.4

CONFIGS = {
    # name: (H, W, D_or_labels, batch, metric_name, preset_file)
    "kitti":   (375, 1242, 128, 16, "kitti_stereo_sgm_throughput",
                "kitti_stereo.json"),
    "tsukuba": (288, 384, 64, 16, "tsukuba_stereo_sgm_throughput",
                "tsukuba.json"),
    # batch 16 (round 5): 10.09 vs 10.62 ms/frame back-to-back at batch 8
    # (relay floor amortization; compile ~45 s either way)
    "kitti16": (375, 1242, 128, 16, "kitti_16path_adaptive_throughput",
                "kitti_16path.json"),
    # batch 2 (round 5): 84.6 vs 93.8 ms/frame back-to-back — the ~25 ms
    # relay floor halves; the ~13 GB two-frame live set fits (no OOM)
    "4k":      (2160, 3840, 128, 2, "uhd_stereo_sgm_throughput",
                "tiled_4k.json"),
    # flow batch 8: amortizes the ~29 ms relay dispatch floor to ~3.6 ms/
    # frame (batch 2 left ~14.5 ms/frame of pure dispatch in the metric)
    "flow":    (368, 1232, 81, 8, "kitti_flow_fsgm_throughput",
                "kitti_flow.json"),
    # BASELINE config 5 names "4K stereo / flow": the flow leg, 5 levels
    # (coarsest 135x240), single frame per dispatch
    "4kflow":  (2160, 3840, 81, 1, "uhd_flow_fsgm_throughput",
                "kitti_flow.json"),
}

_CONFIG_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "configs")


def bench_params(cfg: str):
    """The exact params object benchmarked for `cfg`, constructed FROM the
    committed preset file (configs/*.json) so presets and bench can never
    drift (tests/unit/test_presets.py pins this).  The only difference
    applied on top of a preset is documented here: the 4K flow leg runs
    one extra pyramid level (coarsest 135x240 instead of 270x480 — the 4K
    frame needs it for the same relative search range)."""
    import dataclasses
    from fsgm_tpu.params import load_preset
    preset = load_preset(os.path.join(_CONFIG_DIR, CONFIGS[cfg][5]))
    if cfg in ("flow", "4kflow"):
        p = preset["flow"]
        if cfg == "4kflow":
            p = dataclasses.replace(p, levels=5)
        fb = os.environ.get("FSGM_BENCH_FB")
        fbg = os.environ.get("FSGM_BENCH_FBGRID")
        if fb or fbg:
            p = dataclasses.replace(
                p, fb_backward=fb or p.fb_backward,
                fb_grid=fbg or p.fb_grid)
        return p
    return preset["sgm"]


def flow_label_pixels(h: int, w: int, fp) -> int:
    """Actually-aggregated label-pixels per frame — the honest flow-Mpd/s
    numerator (round-3 verdict: the old `labels * 2 * H*W` counted the
    backward pass as a full-res pyramid while fb_backward='half' runs it
    at half resolution, and UNDER-counted the forward pyramid's coarse
    levels).  Sums H_l*W_l over every pyramid level each direction really
    aggregates, times the label count."""
    dims = [(h, w)]
    for _ in range(fp.levels - 1):
        dims.append((dims[-1][0] // 2, dims[-1][1] // 2))
    fwd = sum(hh * ww for hh, ww in dims)
    if fp.fb_backward == "half":
        bwd = sum(hh * ww for hh, ww in dims[1:])
    elif fp.fb_backward == "single":
        bwd = h * w
    else:                       # 'full' / 'cheap' aggregate every level
        bwd = fwd
    return (fwd + bwd) * fp.num_labels


def _timed(run, args, batch, repeats, salt_dtype):
    t0 = time.perf_counter()
    float(run(*args, salt_dtype(255)))
    compile_s = time.perf_counter() - t0
    times = []
    for rep in range(repeats):
        t0 = time.perf_counter()
        float(run(*args, salt_dtype(rep)))
        times.append(time.perf_counter() - t0)
    return float(np.median(times)) / batch, compile_s


def _stage_roofline(params, h, w, d, backend, iters=32) -> None:
    # iters amortizes the ~29 ms relay dispatch floor (at 8 iters it
    # inflated every stage by ~3.6 ms/iter and the GB/s by ~2x)
    """Per-stage roofline (SURVEY.md §5): times each pipeline stage as a
    K-iteration in-jit loop (relay-safe: salted, scalar-synced) and reports
    achieved HBM bandwidth vs the sgm_bytes_model estimate."""
    import jax
    import jax.numpy as jnp
    from fsgm_tpu.io.synthetic import random_dot_stereo
    from fsgm_tpu.ops.census import census_transform
    from fsgm_tpu.ops.cost import cost_volume_stereo
    from fsgm_tpu.ops import extract as ext
    from fsgm_tpu.utils.profiling import StageTimer, sgm_bytes_model

    il, ir, _ = random_dot_stereo(h, w, d, seed=0)
    il, ir = jnp.asarray(il), jnp.asarray(ir)

    if backend in ("pallas", "pallas_tr"):
        from fsgm_tpu.ops.pallas import aggregate_pallas as pagg
        s_dtype, _cdt = pagg.plan_dtypes(params.p2, params.s_invalid)
    else:
        s_dtype = jnp.int32
    s_item = jnp.zeros((), s_dtype).dtype.itemsize
    model = sgm_bytes_model(h, w, d, params.num_paths, s_itemsize=s_item)
    vol = h * w * d
    fam_bytes = vol * (1 + 2 * s_item)

    def cost_of(img_l, img_r):
        cl = census_transform(img_l, params.census_window)
        cr = census_transform(img_r, params.census_window)
        return cost_volume_stereo(cl, cr, params.max_disp,
                                  params.invalid_cost)

    def agg_family(cost_v, img_v, which):
        # xla / lane-major backends only; the pallas_tr stages below
        # mirror the real round-4 pipeline instead
        if backend == "pallas":
            from fsgm_tpu.ops.pallas import aggregate_pallas as pagg
            costp, imgp = pagg.pad_inputs(cost_v, img_v)
            s = jnp.zeros(costp.shape, s_dtype)
            if which == "cols":
                s = pagg.col_dir_sweep(costp, imgp, (0, 1), params.p1,
                                       params.p2, params.adaptive_p2, s)
                s = pagg.col_dir_sweep(costp, imgp, (0, -1), params.p1,
                                       params.p2, params.adaptive_p2, s)
            else:
                fam = [r for r in params.dirs
                       if (r[0] > 0) == (which == "down") and r[0] != 0]
                s = pagg.row_family_sweep(costp, imgp, fam, params.p1,
                                          params.p2, params.adaptive_p2, s)
            return s
        from fsgm_tpu.ops import aggregate as agg
        fams = {"down": [r for r in params.dirs if r[0] > 0],
                "up": [r for r in params.dirs if r[0] < 0],
                "cols": [r for r in params.dirs if r[0] == 0]}[which]
        s = jnp.zeros(cost_v.shape, jnp.int32)
        for r in fams:
            s = s + agg.aggregate_one_path(cost_v, img_v, r, params.p1,
                                           params.p2, params.adaptive_p2,
                                           agg.neighbor_min_1d
                                           ).astype(jnp.int32)
        return s

    def extract_stage(s_v):
        d_int = ext.wta(s_v)
        disp = ext.subpixel_refine(s_v, d_int)
        d_right = ext.wta_right_from_s(s_v, params.s_invalid)
        disp = ext.lr_check(disp, d_right, params.lr_max_diff,
                            params.max_disp)
        return ext.median_filter_3x3(disp)

    def loop(body):
        @jax.jit
        def run(salt, *args):
            def it(i, acc):
                s8 = (salt + i).astype(jnp.uint8)
                return acc + body(s8, *args)
            return jax.lax.fori_loop(0, iters, it, jnp.float32(0))
        return run

    if backend == "pallas_tr":
        # Mirror the REAL round-5 pipeline (models/stereo.py pair path):
        # strided-shear hlw + incremental-shear wlh cost kernels; fresh
        # first-family sweeps (mask-free pads, i32 carry scratch);
        # accumulate second families; fused paired extraction incl. the
        # in-kernel LR check and the s_h transpose.
        from fsgm_tpu.ops.pallas import cost_tr
        from fsgm_tpu.ops.pallas import aggregate_tr as ptr
        from fsgm_tpu.models.stereo import extract_disparity_kernel
        max_dx = max(abs(dx) for _dy, dx in params.dirs)
        pad8 = lambda n: -(-n // 8) * 8                  # noqa: E731
        hp = pad8(h)
        wp = pad8(w if pad8(w) - w >= max_dx else w + max_dx)
        down = [r for r in params.dirs if r[0] > 0]
        up = [r for r in params.dirs if r[0] < 0]
        fwd = [(dx, 0) for dy, dx in params.dirs if dy == 0 and dx > 0]
        bwd = [(dx, 0) for dy, dx in params.dirs if dy == 0 and dx < 0]

        def cost_build(a, b):
            cl = census_transform(a, params.census_window)
            cr = census_transform(b, params.census_window)
            cwlh = cost_tr.cost_volume_wlh(cl, cr, params.max_disp,
                                           params.invalid_cost,
                                           pad_w=wp)
            chlw = cost_tr.cost_volume_hlw(cl, cr, params.max_disp,
                                           params.invalid_cost,
                                           strided=True, pad_w=wp)
            return cwlh, chlw
        cwlh0, chlw0 = cost_build(il, ir)
        img_p = jnp.pad(il, ((0, hp - h), (0, wp - w)), mode="edge")
        imgt0 = img_p.T

        def sweep(c, g, fams, s, fresh, w_true=None):
            if fresh:
                return ptr.tr_family_sweep(c, g, fams, params.p1,
                                           params.p2, params.adaptive_p2,
                                           None, None, out_dtype=s_dtype,
                                           w_true=w_true)
            return ptr.tr_family_sweep(c, g, fams, params.p1, params.p2,
                                       params.adaptive_p2, s, None,
                                       w_true=w_true)
        s_v0 = sweep(chlw0, img_p, down, None, True, w)
        s_h0 = sweep(cwlh0, imgt0, fwd, None, True)
        s_h_t0 = jnp.transpose(sweep(cwlh0, imgt0, bwd, s_h0, False),
                               (2, 1, 0))

        def salted(c, s8):
            return jnp.clip(c + s8 % 3, 0, 255).astype(jnp.uint8)
        stages = {
            # both Pallas cost builders (the real r5 build: no XLA
            # transpose at all)
            "census_cost": (loop(lambda s8, a, b: sum(
                jnp.sum(v, dtype=jnp.float32)
                for v in cost_build(a + s8, b + s8))),
                (il, ir), 4 * vol),
            "agg_down": (loop(lambda s8, c, g: jnp.sum(
                sweep(salted(c, s8), g, down, None, True, w)
                .astype(jnp.float32))),
                (chlw0, img_p), fam_bytes),
            "agg_up": (loop(lambda s8, c, g, s: jnp.sum(
                sweep(salted(c, s8), g, up, s, False, w)
                .astype(jnp.float32))),
                (chlw0, img_p, s_v0), fam_bytes),
            # fwd fresh + bwd accumulate + the s_h transpose back to
            # row-major (the real pipeline's copy)
            "agg_cols": (loop(lambda s8, c, g: jnp.sum(jnp.transpose(
                sweep(salted(c, s8), g, bwd,
                      sweep(salted(c, s8), g, fwd, None, True), False),
                (2, 1, 0)).astype(jnp.float32))),
                (cwlh0, imgt0), 2 * fam_bytes + 4 * vol * s_item // 2),
            "extract": (loop(lambda s8, s_v, s2: jnp.sum(
                extract_disparity_kernel(
                    s_v + s8.astype(s_dtype), params, s_major2=s2,
                    h_true=h, w_true=w, lr_kernel=True))),
                (s_v0, s_h_t0), model["extract"]),
        }
    else:
        cost0 = cost_of(il, ir)
        s0 = agg_family(cost0, il, "down").astype(s_dtype)[:, :w]
        stages = {
            "census_cost": (loop(lambda s8, a, b:
                                 jnp.sum(cost_of(a + s8, b + s8),
                                         dtype=jnp.float32)),
                            (il, ir), model["cost"]),
            "agg_down": (loop(lambda s8, c, g: jnp.sum(
                agg_family(jnp.clip(c + s8 % 3, 0, 255).astype(jnp.uint8),
                           g, "down").astype(jnp.float32))),
                (cost0, il), fam_bytes),
            "agg_up": (loop(lambda s8, c, g: jnp.sum(
                agg_family(jnp.clip(c + s8 % 3, 0, 255).astype(jnp.uint8),
                           g, "up").astype(jnp.float32))),
                (cost0, il), fam_bytes),
            "agg_cols": (loop(lambda s8, c, g: jnp.sum(
                agg_family(jnp.clip(c + s8 % 3, 0, 255).astype(jnp.uint8),
                           g, "cols").astype(jnp.float32))),
                (cost0, il), 2 * fam_bytes),
            "extract": (loop(lambda s8, s_v: jnp.sum(
                extract_stage(s_v + s8.astype(s_dtype)))),
                (s0,), model["extract"]),
        }

    timer = StageTimer()
    for name, (run, args, nbytes) in stages.items():
        float(run(np.uint8(255), *args))          # compile + warm
        t0 = time.perf_counter()
        float(run(np.uint8(1), *args))
        timer.record(name, time.perf_counter() - t0,
                     bytes_moved=nbytes * iters)
    print("# stage roofline (modeled bytes, measured in-jit loop):",
          file=sys.stderr)
    timer.print_report(file=sys.stderr)


def _regression_guard(cfg: str, dt_s: float) -> None:
    """Throughput regression guard (SURVEY.md §4 metrics tier: "benchmark
    harness asserts Mpixel*disp/s within tolerance of recorded baseline").

    Compares ms/frame against the best recorded number for this config in
    bench_history.json (ms/frame, not Mpd/s, so metric redefinitions like
    the round-4 honest flow numerator don't invalidate history).  Always
    prints the verdict to stderr; exits non-zero on regression only when
    FSGM_BENCH_GUARD=1 so a relay hiccup can't fail the driver's record
    run.  One command catches a deliberate slowdown:
        FSGM_BENCH_GUARD=1 FSGM_BENCH_CONFIG=<cfg> python bench.py
    Tolerances are per-config (documented in the JSON): ±10% relay band
    for the big configs, wider for dispatch-floor-bound small ones."""
    hist_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "bench_history.json")
    try:
        with open(hist_path) as f:
            hist = json.load(f)
        entry = hist["configs"][cfg]
    except (OSError, KeyError, ValueError):
        print(f"# guard: no recorded baseline for cfg={cfg}",
              file=sys.stderr)
        return
    best_ms, tol = entry["best_ms_frame"], entry["tolerance"]
    cur_ms = dt_s * 1e3
    limit = best_ms * (1 + tol)
    verdict = "OK" if cur_ms <= limit else "REGRESSION"
    print(f"# guard: {verdict} cfg={cfg} {cur_ms:.2f} ms/frame vs best "
          f"{best_ms:.2f} (+{tol:.0%} tolerance = {limit:.2f})",
          file=sys.stderr)
    if verdict == "REGRESSION" and os.environ.get("FSGM_BENCH_GUARD") == "1":
        sys.exit(3)


def _wait_for_backend(jax, retries: int, delay_s: float) -> None:
    """Ride out transient relay outages ("Unable to initialize backend
    'axon': UNAVAILABLE", observed 2026-08-17): retry device discovery
    before letting the benchmark die on a backend-init error."""
    for attempt in range(retries):
        try:
            jax.devices()
            return
        except RuntimeError as e:
            if attempt == retries - 1:
                raise
            print(f"# backend unavailable (try {attempt + 1}/{retries}): "
                  f"{e}", file=sys.stderr)
            time.sleep(delay_s)


def main() -> None:
    import jax
    import jax.numpy as jnp
    from fsgm_tpu.models.flow import flow_fsgm_batch
    from fsgm_tpu.io.synthetic import random_dot_stereo, constant_flow_pair

    # note: when the relay is down, jax.devices() itself can BLOCK for
    # many minutes before raising, so a few retries already span a long
    # wall-clock window
    _wait_for_backend(jax,
                      int(os.environ.get("FSGM_BENCH_INIT_RETRIES", "3")),
                      float(os.environ.get("FSGM_BENCH_INIT_DELAY", "60")))
    cfg = os.environ.get("FSGM_BENCH_CONFIG", "kitti")
    h, w, d, batch_default, metric = CONFIGS[cfg][:5]
    batch = int(os.environ.get("FSGM_BENCH_BATCH", batch_default))
    backend = os.environ.get("FSGM_BENCH_BACKEND")
    if backend is None:
        backend = "pallas" if jax.devices()[0].platform == "tpu" else "xla"
        # The round-2 lane-major kernels lost batched flow to the XLA scan
        # (35.5 vs 51 ms/frame at batch 8: 128-lane pad waste).  The
        # transposed-layout default ('pallas' -> pallas_tr) pads 81 -> 88
        # labels and wins every batch size (27.9 ms at batch 8); only the
        # pinned lane-major backend keeps the XLA crossover.
        if (cfg in ("flow", "4kflow") and batch >= 4
                and backend == "pallas"
                and os.environ.get("FSGM_TR", "1") == "0"):
            backend = "xla"
    repeats = 6

    if cfg in ("flow", "4kflow"):
        # Params come from configs/kitti_flow.json (fb_backward="half":
        # backward pyramid at half resolution, full extraction at every
        # backward level — validity within ~5 points of the full backward
        # on synthetic GT, tools/fb_accuracy.py, at a quarter of the
        # backward aggregation work).  fb_grid='half' (each half-grid
        # verdict covers its 2x2 block): quarter-size FB gather, and
        # accuracy-neutral-or-better on synthetic GT (fb_accuracy.py
        # 2026-08-20: Fl 16.75 vs 17.01).  It measured SLOWER in r3
        # (28.7 vs 26.8 ms/frame) but the round-4 reduce_window pyramid
        # fix flipped it: 16.24 vs 18.56 — now the preset default;
        # FSGM_BENCH_FBGRID=full pins the old mode.
        fparams = bench_params(cfg)
        pairs = [constant_flow_pair(h, w, 3, -2, seed=s)
                 for s in range(batch)]
        a = jnp.asarray(np.stack([p[0] for p in pairs]))
        b = jnp.asarray(np.stack([p[1] for p in pairs]))

        @jax.jit
        def run(x, y, salt):
            # flow_fsgm_batch: one dispatch, chunked lax.map inside
            # (FSGM_FLOW_CHUNK; the unchunked batch-8 program crashes
            # the 2026-08-20 TPU worker — see the entry's docstring)
            flo, valid = flow_fsgm_batch(x + salt, y + salt, fparams,
                                         backend)
            return jnp.sum(flo) + jnp.sum(valid)

        # honest numerator: label-pixels actually aggregated per frame
        # (sum over pyramid levels, fwd + the configured backward)
        label_px = flow_label_pixels(h, w, fparams)
    else:
        params = bench_params(cfg)
        assert params.max_disp == d, (cfg, params.max_disp, d)
        pairs = [random_dot_stereo(h, w, d, seed=s) for s in range(batch)]
        a = jnp.asarray(np.stack([p[0] for p in pairs]))
        b = jnp.asarray(np.stack([p[1] for p in pairs]))

        from fsgm_tpu.models.stereo import stereo_sgm_batch

        @jax.jit
        def run(x, y, salt):
            # batched entry: horizontal-family sweeps lane-fold the batch
            # (bit-identical to vmapped stereo_sgm; test_batch_fold.py)
            out = stereo_sgm_batch(x + salt, y + salt, params, backend)
            return jnp.sum(out)

        label_px = h * w * d

    dt, compile_s = _timed(run, (a, b), batch, repeats, jnp.uint8)
    fps = 1.0 / dt
    mpds = label_px * fps / 1e6
    rec = {"metric": metric, "value": round(mpds, 1),
           "unit": "Mpixel*disp/s",
           "vs_baseline": round(mpds / BASELINE_MPDS, 3)}
    print(json.dumps(rec))
    # the SoL denominator is derived for 8-path STEREO byte traffic
    # (SURVEY.md §7.4); flow's label-pixel rate against it is only an
    # order-of-magnitude anchor, so the line says so (VERDICT r4 weak #5)
    sol_tag = (" (stereo-derived SoL)" if cfg in ("flow", "4kflow")
               else "")
    print(f"# cfg={cfg} backend={backend} "
          f"platform={jax.devices()[0].platform} batch={batch} "
          f"frame={dt*1e3:.2f}ms fps={fps:.1f} compile={compile_s:.1f}s "
          f"vs_SoL={mpds / SOL_MPDS:.1%}{sol_tag}", file=sys.stderr)
    _regression_guard(cfg, dt)

    sustained_k = int(os.environ.get("FSGM_BENCH_SUSTAINED", "0"))
    if sustained_k > 0:
        # Serving-throughput probe: enqueue K dispatches back-to-back
        # (async JAX dispatch, distinct salts so the relay cannot memoize)
        # and fetch only at the end.  The per-dispatch timing above pays
        # the full relay round trip every rep; a deployment (cli serve,
        # video mode) keeps the queue non-empty, so the dispatch floor
        # overlaps device execution.  This measures how much of that
        # floor the relay actually hides — the number the "pipelining
        # amortizes the floor" notes previously asserted without measuring.
        outs = []
        t0 = time.perf_counter()
        for k in range(sustained_k):
            outs.append(run(a, b, jnp.uint8(100 + k)))
        for o in outs:  # fetch everything (block_until_ready is
            float(o)    # unreliable through the relay; see module doc)
        sus_dt = (time.perf_counter() - t0) / (sustained_k * batch)
        sus_mpds = label_px / sus_dt / 1e6
        print(f"# sustained: {sustained_k} queued dispatches, "
              f"{sus_dt*1e3:.2f} ms/frame ({sus_mpds:.0f} Mpd/s, "
              f"vs_SoL={sus_mpds / SOL_MPDS:.1%}{sol_tag}); "
              f"blocking-mode {dt*1e3:.2f}", file=sys.stderr)

    trace_dir = os.environ.get("FSGM_BENCH_TRACE")
    if trace_dir:
        # One profiled dispatch of the exact timed computation (salted so
        # the relay can't serve a memoized result).  Produces an XProf/
        # Perfetto trace dir; failure modes are reported, not fatal —
        # the relay-tunneled backend may not support device profiling.
        from fsgm_tpu.utils.profiling import trace
        try:
            with trace(trace_dir):
                float(run(a, b, jnp.uint8(77)))
            print(f"# trace captured under {trace_dir}", file=sys.stderr)
        except Exception as e:  # document the relay failure mode precisely
            print(f"# trace FAILED: {type(e).__name__}: {e}",
                  file=sys.stderr)

    if os.environ.get("FSGM_BENCH_STAGES", "0") == "1" and cfg not in ("flow", "4kflow"):
        from fsgm_tpu.models.stereo import resolve_backend
        _stage_roofline(params, h, w, d, resolve_backend(backend))


if __name__ == "__main__":
    main()
