"""Benchmark harness (SURVEY.md P4, BASELINE.md).

Headline metric (driver contract, printed as ONE JSON line on stdout):
rays/sec/chip for fused forward+backward at 512^2 on the 4-sphere+plane
Phong+shadows scene (driver config 2 geometry at the BASELINE 512^2 size).

Two modes (round 5; rounds 3 AND 4 both ended rc=124/parsed=null because
the default run — ~20 TPU rows, each compiling 14-51 s — cannot fit any
plausible driver kill window, and budget enforcement only gated row
*starts*):

- DEFAULT (``python bench.py``): measure ONLY the headline. A jax-free
  parent launches the measurement in a bounded subprocess (attempt 1:
  RRT_BENCH_T1=360 s, retry: RRT_BENCH_T2=180 s — a killed attempt leaves
  the server-side compile cache warm for the retry, the documented cure
  for erratic server-side compile stalls), prints the driver JSON line
  FIRST and re-prints it as the FINAL stdout line (first-line and
  last-line parsers both find it), and exits 0. Worst case, wedged-tunnel
  included (the child's own timeout bounds a hung ``import jax``), is
  ~9.5 min; the typical warm-cache run is ~2-3 min. The child writes a
  PRELIMINARY payload (live fused value; vs_baseline against the
  committed full-sweep artifact, marked ``vs_baseline_source``) right
  after the fused measurement and BEFORE the stall-prone jnp-baseline
  compile; the parent salvages that scratch from a killed attempt, so
  even a double timeout reports the live headline instead of value 0
  (both paths TPU-verified). The committed bench_details.json is NOT
  touched in this mode.

- FULL (``RRT_BENCH_FULL=1 python bench.py``): the complete ~20-row sweep
  that regenerates bench_details.json. Run manually, commit the artifact.
  A wall-clock budget (RRT_BENCH_BUDGET_S, default 1500 s) is enforced
  BOTH between rows and between slope repeats inside a row; rows past the
  deadline are skipped and recorded in ``skipped_rows``. The artifact is
  written incrementally to bench_details.partial.json and renamed over
  bench_details.json only on completion, so a SIGKILLed run cannot
  truncate the committed file.

Methodology: per-step device time = two-point slope. We run the step inside
a lax.scan (true carry dependence) for N1 and N2 iterations, force a VALUE
fetch of a scalar reduction (on this environment's axon PJRT tunnel,
`block_until_ready` alone does not reliably wait for execution, and a value
fetch costs a fixed ~30 ms HTTP roundtrip), and report
(t(N2) - t(N1)) / (N2 - N1). This cancels both dispatch and fetch overheads
and measures pure device throughput. Dispatch-inclusive single-call numbers
are reported separately in bench_details.json.

``vs_baseline``: the reference (lebek/reversible-raytracer) publishes no
numbers (BASELINE.json: "published": {}), and Theano cannot run here, so the
baseline is the strongest same-hardware alternative: XLA autodiff of the
pure-jnp renderer (what you'd get WITHOUT the hand-fused Pallas kernels).
vs_baseline = pallas_rays_per_sec / jnp_rays_per_sec, same scan methodology.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

HEADLINE_METRIC = "rays_per_sec_per_chip_fwd_bwd_512"
_IS_CHILD = "--headline-child" in sys.argv
_IS_FULL = os.environ.get("RRT_BENCH_FULL") == "1"


def _fast_mode():
    """Driver default: capture the headline inside a hard wall-clock bound.

    The measurement runs in a subprocess so that (a) a wedged axon tunnel
    (where ``import jax`` hangs forever) and (b) an erratic server-side
    compile stall are both bounded by the subprocess timeout, and (c) the
    retry starts a FRESH process — killed clients do not cancel server-side
    compiles, so the retry typically finds the compile cache warm
    (CLAUDE.md). Prints the driver JSON line first AND as the final stdout
    line, then exits 0. On total failure, prints a parseable JSON line with
    value 0 and an ``error`` field — an honest failure record beats
    parsed=null.
    """
    t_start = time.perf_counter()
    here = os.path.dirname(os.path.abspath(__file__))
    scratch = os.path.join(here, "bench_headline.partial.json")
    timeouts = [
        float(os.environ.get("RRT_BENCH_T1", "360")),
        float(os.environ.get("RRT_BENCH_T2", "180")),
    ]
    err = "unknown"
    salvage = None

    def _read_scratch():
        try:
            with open(scratch) as fh:
                p = json.load(fh)
            return p if p.get("value") else None
        except (OSError, ValueError):
            return None

    for i, tmo in enumerate(timeouts, 1):
        try:
            os.remove(scratch)
        except OSError:
            pass
        print(f"bench: headline attempt {i}/{len(timeouts)} "
              f"(timeout {tmo:.0f}s)", file=sys.stderr, flush=True)
        try:
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 "--headline-child", scratch],
                timeout=tmo, capture_output=True,
            )
        except subprocess.TimeoutExpired as e:
            err = (f"attempt {i}: killed after {tmo:.0f}s (server-side "
                   f"compile stall or wedged axon tunnel)")
            tail = (e.stderr or b"").decode(errors="replace")[-400:]
            print(f"bench: {err}; child stderr tail: {tail}",
                  file=sys.stderr, flush=True)
            # The child writes a preliminary payload right after the
            # fused-step measurement (before the stall-prone jnp-baseline
            # compile) — salvage it rather than reporting value 0
            # (observed round 5: both attempts measured the headline in
            # <30s, then died in the baseline compile).
            salvage = _read_scratch() or salvage
            if salvage:
                print("bench: salvaged preliminary payload from the "
                      "killed attempt", file=sys.stderr, flush=True)
            continue
        sys.stderr.write(r.stderr.decode(errors="replace"))
        sys.stderr.flush()
        if r.returncode == 0 and os.path.exists(scratch):
            with open(scratch) as fh:
                payload = json.load(fh)
            os.remove(scratch)
            line = json.dumps(payload)
            print(line, flush=True)  # first stdout line (first-line parsers)
            print(f"bench: headline captured at "
                  f"+{time.perf_counter() - t_start:.0f}s; re-printing JSON "
                  f"as the final stdout line", file=sys.stderr, flush=True)
            print(line, flush=True)  # final stdout line (last-line parsers)
            sys.exit(0)
        err = (f"attempt {i}: child rc={r.returncode}; stderr tail: "
               f"{r.stderr.decode(errors='replace')[-400:]}")
        print(f"bench: {err}", file=sys.stderr, flush=True)
        salvage = _read_scratch() or salvage
    if salvage:
        salvage["error"] = err
        line = json.dumps(salvage)
        print(line, flush=True)
        print("bench: emitting salvaged headline (live fused measurement, "
              "stored jnp baseline); re-printing as the final stdout line",
              file=sys.stderr, flush=True)
        print(line, flush=True)
        sys.exit(0)
    print(json.dumps({
        "metric": HEADLINE_METRIC,
        "value": 0,
        "unit": "rays/s",
        "vs_baseline": 0.0,
        "error": err,
    }), flush=True)
    sys.exit(0)


if __name__ == "__main__" and not _IS_CHILD and not _IS_FULL:
    _fast_mode()

# Tunnel-wedge guard for FULL mode (must run BEFORE `import jax`): when the
# axon PJRT tunnel is wedged, `import jax` hangs indefinitely (the axon
# plugin probes the tunnel at import) — fail fast with a diagnostic instead
# of hanging forever. The probe is a subprocess so the hang (if any) is
# bounded by the timeout. The fast path above needs no probe: its child's
# own timeout bounds a hung import.
if __name__ == "__main__" and _IS_FULL \
        and os.environ.get("RRT_BENCH_NO_PROBE") != "1":
    try:
        subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=120,
            check=True,
            capture_output=True,
        )
    except subprocess.TimeoutExpired:
        print(
            "bench: axon tunnel appears wedged (import jax + jax.devices() "
            "did not complete in 120 s); aborting instead of hanging. "
            "Retry once the tunnel recovers.",
            file=sys.stderr,
            flush=True,
        )
        sys.exit(3)
    except subprocess.CalledProcessError as e:
        # Import worked but device init failed — let the real run proceed
        # only if it can (it may pick the CPU backend); log the probe error.
        print(f"bench: device probe failed (rc={e.returncode}); continuing "
              f"— stderr tail: {e.stderr.decode(errors='replace')[-500:]}",
              file=sys.stderr, flush=True)

import jax
import jax.numpy as jnp
import numpy as np


def _log(msg):
    print(msg, file=sys.stderr, flush=True)


def _fwd_total(render_fn, scene, iters):
    @jax.jit
    def run(s0, eps):
        def body(acc, _):
            s = jax.tree_util.tree_map(lambda x: x * (1.0 + acc), s0)
            img = render_fn(s)
            return acc + jnp.max(img) * eps, None

        acc, _ = jax.lax.scan(body, eps, None, length=iters)
        return acc

    eps = jnp.float32(1e-30)
    float(run(scene, eps))  # warm + fetch
    t0 = time.perf_counter()
    float(run(scene, eps))
    return time.perf_counter() - t0


class DegenerateSlope(RuntimeError):
    """The two-point delta fell below tunnel jitter — the slope is noise.

    Round-4 lesson (VERDICT r4 weak #1): the old ``max(slope, 1e-9)`` clamp
    silently converted a degenerate measurement (t(n2) ~= t(n1), the classic
    XLA-hoisting / unsynced-warm-run trap) into a plausible-looking
    1 ns/step that then got cited in README. Degenerate slopes must FAIL
    the row, loudly, never return the floor.
    """


# FULL-mode wall-clock deadline (perf_counter value), set by main();
# _median_slope stops starting new repeats past it (in-row budget
# enforcement — VERDICT r4 weak #2: between-row checks alone let a single
# row overrun the budget arbitrarily).
_ROW_DEADLINE = [None]


def _median_slope(total_fn, n1, n2, k=1, min_delta_s=2e-3):
    """Median of k two-point slopes, with spread.

    One (t(n2)-t(n1))/(n2-n1) sample cancels dispatch+fetch overheads but
    is exposed to tunnel jitter; round-1's headline showed a 2x run-to-run
    spread. k>=3 repeats (compile already warm, so each repeat costs only
    the scan executions) and the median make the figure reproducible; the
    (min, median, max) spread is recorded in bench_details.json.

    Raises DegenerateSlope if the median delta t(n2)-t(n1) is below
    ``min_delta_s`` (default 2 ms — the axon tunnel's observed jitter
    floor): such a sample measures noise, not device time. Callers sizing
    a row must pick (n1, n2) so the expected delta is >=10x this floor.
    """
    slopes = []
    for _ in range(k):
        ddl = _ROW_DEADLINE[0]
        if ddl is not None and slopes and time.perf_counter() > ddl:
            break  # budget: keep the repeats we have, stop starting more
        t1 = total_fn(n1)
        if ddl is not None and slopes and time.perf_counter() > ddl:
            break  # budget hit between the two slope points
        t2 = total_fn(n2)
        slopes.append((t2 - t1) / (n2 - n1))
    slopes.sort()
    med = slopes[len(slopes) // 2]
    if med * (n2 - n1) < min_delta_s:
        raise DegenerateSlope(
            f"two-point delta {med * (n2 - n1) * 1e3:.3f} ms over "
            f"({n1},{n2}) is below the {min_delta_s * 1e3:.0f} ms tunnel "
            f"jitter floor — slope would be noise (got {med * 1e3:.6f} "
            f"ms/step); widen the scan pair or fix the carry dependence"
        )
    return med, slopes[0], slopes[-1]


def _scan_steps_fwd(render_fn, scene, n1=50, n2=350, k=1):
    """Median-of-k two-point-slope per-step time of the forward render."""
    med, _, _ = _median_slope(lambda n: _fwd_total(render_fn, scene, n), n1, n2, k)
    return med


def _grad_total(render_fn, scene, target, iters):
    from reversible_raytracer_tpu.ops.render import mse_loss

    lossf = lambda s: mse_loss(render_fn(s), target)

    @jax.jit
    def run(s0, lr):
        def body(s, _):
            l, g = jax.value_and_grad(lossf)(s)
            s = jax.tree_util.tree_map(lambda x, gg: x - lr * gg, s, g)
            return s, l

        _, ls = jax.lax.scan(body, s0, None, length=iters)
        return jnp.sum(ls)

    lr = jnp.float32(0.0)
    float(run(scene, lr))
    t0 = time.perf_counter()
    float(run(scene, lr))
    return time.perf_counter() - t0


def _scan_steps_grad(render_fn, scene, target, n1=20, n2=120, k=1):
    """Median-of-k two-point-slope per-step time of fwd+bwd."""
    med, _, _ = _median_slope(
        lambda n: _grad_total(render_fn, scene, target, n), n1, n2, k
    )
    return med


def _vag_total(vag_fn, scene, target, iters):
    """Scan total for a fused value-and-grad step (loss+grads in one
    kernel): same carry dependence as _grad_total (params move by lr*grads
    with lr=0 so XLA cannot hoist the step out of the loop)."""

    @jax.jit
    def run(s0, lr):
        def body(s, _):
            l, g = vag_fn(s, target)
            s = jax.tree_util.tree_map(lambda x, gg: x - lr * gg, s, g)
            return s, l

        _, ls = jax.lax.scan(body, s0, None, length=iters)
        return jnp.sum(ls)

    lr = jnp.float32(0.0)
    float(run(scene, lr))
    t0 = time.perf_counter()
    float(run(scene, lr))
    return time.perf_counter() - t0


def _scan_steps_vag(vag_fn, scene, target, n1=20, n2=120, k=1):
    """Median-of-k two-point-slope per-step time of a fused (loss, grads)
    step fn (loss_grad_pallas[_vec])."""
    med, _, _ = _median_slope(
        lambda n: _vag_total(vag_fn, scene, target, n), n1, n2, k
    )
    return med


def headline_child(out_path):
    """Measure ONLY the headline metric and write the driver payload.

    Runs inside the fast-mode subprocess (bounded by the parent's timeout).
    Exactly two compiles: the fused training-step kernel
    (ops/kernels/fused.loss_grad_pallas — loss + scene grads in one launch)
    and the XLA-autodiff jnp baseline of the identical (loss, grads)
    contract. Same two-point-slope methodology as the full sweep.
    """
    from reversible_raytracer_tpu.models import configs
    from reversible_raytracer_tpu.ops.pipeline import RenderConfig
    from reversible_raytracer_tpu.ops.render import loss_and_grad_fn, render_jnp

    t_start = time.perf_counter()
    backend = jax.default_backend()
    on_tpu = backend == "tpu"
    _log(f"headline child: backend={backend} "
         f"device={jax.devices()[0].device_kind} "
         f"(+{time.perf_counter() - t_start:.0f}s)")

    H = W = 512
    rays = H * W
    scene, _, _ = configs.config2_four_spheres()
    cfg = RenderConfig(height=H, width=W, shadows=True)
    target = jnp.zeros((H, W, 3), jnp.float32)
    grad_pts = (50, 500) if on_tpu else (1, 6)
    k_rep = 5 if on_tpu else 1

    t0 = time.perf_counter()
    if on_tpu:
        vag = loss_and_grad_fn(scene, cfg)
        t_fast, g_lo, g_hi = _median_slope(
            lambda n: _vag_total(vag, scene, target, n), *grad_pts, k=k_rep
        )
        _log(f"pallas fwd+bwd (fused step): {t_fast*1e3:.3f} ms/step "
             f"[{g_lo*1e3:.3f}..{g_hi*1e3:.3f}] "
             f"({rays/t_fast/1e9:.3f} Grays/s) "
             f"[compile+bench {time.perf_counter()-t0:.0f}s]")
    else:
        t_fast, g_lo, g_hi = _median_slope(
            lambda n: _grad_total(lambda s: render_jnp(s, cfg), scene,
                                  target, n),
            *grad_pts, k=k_rep,
        )
        _log(f"jnp (non-TPU backend) fwd+bwd: {t_fast*1e3:.3f} ms/step")
    # Write a PRELIMINARY payload NOW, before the jnp-baseline compile:
    # the headline value above is the live measurement, and the jnp
    # 512^2 autodiff compile is the stall observed to kill BOTH watchdog
    # attempts after the fused row already succeeded (round 5). The
    # denominator for vs_baseline falls back to the committed full-sweep
    # artifact, explicitly marked; a completed live baseline below
    # overwrites this file with the live ratio.
    value = round(rays / t_fast)
    try:
        if not on_tpu:
            raise KeyError("stored TPU baseline not comparable off-TPU")
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "bench_details.json")) as fh:
            stored_jnp = float(json.load(fh)["fwdbwd_rays_per_s_jnp"])
        prelim = {
            "metric": HEADLINE_METRIC,
            "value": value,
            "unit": "rays/s",
            "vs_baseline": round(value / stored_jnp, 3),
            "vs_baseline_source": "stored jnp baseline "
                                  "(bench_details.json full sweep); live "
                                  "jnp measure did not finish in time",
        }
        with open(out_path, "w") as fh:
            json.dump(prelim, fh)
            fh.write("\n")
        _log(f"headline child: preliminary payload written at "
             f"+{time.perf_counter() - t_start:.0f}s "
             f"(vs_baseline from stored artifact)")
    except (OSError, KeyError, ValueError) as e:
        _log(f"headline child: no stored baseline available ({e}); "
             f"preliminary payload skipped")
    t0 = time.perf_counter()
    t_jnp, _, _ = _median_slope(
        lambda n: _grad_total(lambda s: render_jnp(s, cfg), scene, target, n),
        *grad_pts, k=k_rep,
    )
    _log(f"jnp    fwd+bwd: {t_jnp*1e3:.3f} ms/step "
         f"({rays/t_jnp/1e9:.3f} Grays/s) "
         f"[compile+bench {time.perf_counter()-t0:.0f}s]")
    payload = {
        "metric": HEADLINE_METRIC,
        "value": round(rays / t_fast),
        "unit": "rays/s",
        "vs_baseline": round(t_jnp / t_fast, 3),
    }
    with open(out_path, "w") as fh:
        json.dump(payload, fh)
        fh.write("\n")
    print(json.dumps(payload), flush=True)
    _log(f"headline child done at +{time.perf_counter() - t_start:.0f}s")


def _host_dispatch(fn, *args, n=30):
    jax.block_until_ready(fn(*args))
    jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    from reversible_raytracer_tpu.models import configs
    from reversible_raytracer_tpu.optim import OptConfig, optimize_scan, param_error
    from reversible_raytracer_tpu.ops.pipeline import RenderConfig
    from reversible_raytracer_tpu.ops.render import mse_loss, render_jnp

    t_start = time.perf_counter()
    budget_s = float(os.environ.get("RRT_BENCH_BUDGET_S", "1500"))
    deadline = t_start + budget_s
    _ROW_DEADLINE[0] = deadline  # in-row enforcement inside _median_slope

    backend = jax.default_backend()
    on_tpu = backend == "tpu"
    dev = jax.devices()[0]
    _log(f"backend={backend} device={dev.device_kind} n_devices={len(jax.devices())} "
         f"budget={budget_s:.0f}s")

    H = W = 512
    rays = H * W
    scene, spec, _ = configs.config2_four_spheres()
    cfg = RenderConfig(height=H, width=W, shadows=True)
    target = jnp.zeros((H, W, 3), jnp.float32)

    if on_tpu:
        from reversible_raytracer_tpu.ops.kernels.fused import render_pallas

        render_fast = lambda s: render_pallas(s, cfg)
        fast_name = "pallas"
    else:
        render_fast = lambda s: render_jnp(s, cfg)
        fast_name = "jnp"

    details = {"backend": backend, "device": dev.device_kind, "size": H,
               "fast_impl": fast_name, "skipped_rows": []}

    # Incremental saves go to a PARTIAL path; the committed artifact is
    # replaced only on completion (VERDICT r4 weak #3: the driver's killed
    # r4 run clobbered the committed bench_details.json with a truncated
    # file). The partial file doubles as crash evidence.
    partial_path = "bench_details.partial.json"

    def _save():
        with open(partial_path, "w") as fh:
            json.dump(details, fh, indent=2)
            fh.write("\n")

    def row(name, fn):
        """Run one best-effort bench row: skipped past the wall-clock
        budget (logged, never silent), and exceptions downgrade to a skip
        record instead of sinking the rest of the run."""
        now = time.perf_counter()
        if now > deadline:
            _log(f"row {name}: SKIPPED (wall-clock budget {budget_s:.0f}s "
                 f"exhausted at +{now - t_start:.0f}s)")
            details["skipped_rows"].append({"row": name, "reason": "budget"})
            _save()
            return
        try:
            fn()
        except Exception as e:  # noqa: BLE001 — bench row is best-effort
            _log(f"row {name}: skipped ({type(e).__name__}: {e})")
            details["skipped_rows"].append(
                {"row": name, "reason": f"{type(e).__name__}: {e}"}
            )
        _save()

    if on_tpu:
        # The two-point delta must dwarf the tunnel's few-ms fetch jitter:
        # fwd steps are ~60 us, so the pair spans 1900 steps (~115 ms of
        # device time); grad steps ~0.17 ms, pair spans 450 steps (~75 ms).
        # Observed with the old short pairs: fwd slope samples scattered
        # 9..87 us and grad 0..0.5 ms; with these, both tighten to a few %.
        fwd_pts, grad_pts = (100, 2000), (50, 500)
    else:  # CPU dev runs: fewer scan steps
        fwd_pts, grad_pts = (2, 12), (1, 6)

    k_rep = 5 if on_tpu else 1

    # ------------------------------------------------------------------
    # HEADLINE FIRST (driver metric of record; exactly two compiles).
    #
    # The per-step computation of record is value_and_grad of the render
    # loss (what the optimizer loop runs). On TPU the production path is
    # the FUSED training-step kernel (ops/kernels/fused.loss_grad_pallas:
    # loss + scene grads in one launch, no forward kernel, no image in
    # HBM). The jnp baseline computes the identical (loss, grads)
    # contract via XLA autodiff.
    # ------------------------------------------------------------------
    if on_tpu:
        from reversible_raytracer_tpu.ops.render import loss_and_grad_fn

        vag = loss_and_grad_fn(scene, cfg)
        t0 = time.perf_counter()
        t_fast, g_lo, g_hi = _median_slope(
            lambda n: _vag_total(vag, scene, target, n), *grad_pts, k=k_rep
        )
        _log(f"{fast_name} fwd+bwd (fused step): {t_fast*1e3:.3f} ms/step "
             f"[{g_lo*1e3:.3f}..{g_hi*1e3:.3f}] "
             f"({rays/t_fast/1e9:.3f} Grays/s) "
             f"[compile+bench {time.perf_counter()-t0:.0f}s]")
    else:
        vag = None
        t_fast, g_lo, g_hi = _median_slope(
            lambda n: _grad_total(render_fast, scene, target, n), *grad_pts, k=k_rep
        )
    t0 = time.perf_counter()
    t_jnp = _scan_steps_grad(lambda s: render_jnp(s, cfg), scene, target, *grad_pts, k=k_rep)
    _log(f"jnp    fwd+bwd: {t_jnp*1e3:.3f} ms/step ({rays/t_jnp/1e9:.3f} Grays/s) "
         f"[compile+bench {time.perf_counter()-t0:.0f}s]")
    value = rays / t_fast
    vs_baseline = t_jnp / t_fast
    details["fwdbwd_rays_per_s"] = value
    details["fwdbwd_ms_spread"] = [g_lo * 1e3, t_fast * 1e3, g_hi * 1e3]
    details["fwdbwd_rays_per_s_jnp"] = rays / t_jnp
    details["vs_xla_jnp_baseline"] = vs_baseline
    _save()

    headline_line = json.dumps({
        "metric": HEADLINE_METRIC,
        "value": round(value),
        "unit": "rays/s",
        "vs_baseline": round(vs_baseline, 3),
    })
    print(headline_line, flush=True)
    _log(f"headline JSON printed at +{time.perf_counter()-t_start:.0f}s; "
         f"remaining rows run best-effort under the budget")

    # ------------------------------------------------------------------
    # Everything below is best-effort detail behind the driver JSON.
    # ------------------------------------------------------------------
    state = {}

    def row_fwd():
        t0 = time.perf_counter()
        t_fast_fwd, fwd_lo, fwd_hi = _median_slope(
            lambda n: _fwd_total(render_fast, scene, n), *fwd_pts, k=k_rep
        )
        _log(f"{fast_name} fwd: {t_fast_fwd*1e6:.1f} us/step "
             f"[{fwd_lo*1e6:.1f}..{fwd_hi*1e6:.1f}] "
             f"({rays/t_fast_fwd/1e9:.2f} Grays/s) [compile+bench {time.perf_counter()-t0:.0f}s]")
        t_jnp_fwd = _scan_steps_fwd(lambda s: render_jnp(s, cfg), scene, *fwd_pts, k=k_rep)
        _log(f"jnp    fwd: {t_jnp_fwd*1e6:.1f} us/step ({rays/t_jnp_fwd/1e9:.2f} Grays/s)")
        details["fwd_rays_per_s"] = rays / t_fast_fwd
        details["fwd_ms_spread"] = [fwd_lo * 1e3, t_fast_fwd * 1e3, fwd_hi * 1e3]
        details["fwd_rays_per_s_jnp"] = rays / t_jnp_fwd
        state["t_fast_fwd"] = t_fast_fwd

    row("fwd", row_fwd)

    def row_two_kernel():
        # Two-kernel chain (fwd kernel + replaying bwd kernel) — the
        # kernel-level breakdown behind the fused step.
        t0 = time.perf_counter()
        t_two, g2_lo, g2_hi = _median_slope(
            lambda n: _grad_total(render_fast, scene, target, n), *grad_pts, k=k_rep
        )
        _log(f"{fast_name} fwd+bwd (two-kernel): {t_two*1e3:.3f} ms/step "
             f"[{g2_lo*1e3:.3f}..{g2_hi*1e3:.3f}] "
             f"({rays/t_two/1e9:.3f} Grays/s) [compile+bench {time.perf_counter()-t0:.0f}s]")
        if on_tpu:
            details["fwdbwd_ms_two_kernel"] = t_two * 1e3
        state["t_two"] = t_two

    if on_tpu:
        row("two_kernel", row_two_kernel)
    else:
        state["t_two"] = t_fast

    def row_sol():
        # --- per-kernel time + speed-of-light (SURVEY.md §5.1) ---
        # Per-kernel: the fused forward is one Pallas kernel (its scan
        # slope); the backward kernel's time is the two-kernel fwd+bwd
        # slope minus the forward's. SOL%: jaxpr-counted elementwise flops
        # (this workload is VPU-bound; no matmuls, MXU irrelevant) against
        # the v5e VPU peak.
        from reversible_raytracer_tpu.utils.profiling import (
            V5E_VPU_PEAK_FLOPS,
            flops_estimate,
        )

        small = RenderConfig(height=32, width=32, shadows=True)
        fl_fwd = flops_estimate(lambda s: render_jnp(s, small), scene) / (32 * 32)
        tgt_s = jnp.zeros((32, 32, 3), jnp.float32)
        fl_fb = flops_estimate(
            jax.grad(lambda s: mse_loss(render_jnp(s, small), tgt_s)), scene
        ) / (32 * 32)
        details["flops_per_ray"] = {"fwd": fl_fwd, "fwd_bwd": fl_fb}
        details["vpu_sol_pct"] = {
            "fwd_bwd": 100 * rays * fl_fb / t_fast / V5E_VPU_PEAK_FLOPS,
        }
        if "t_fast_fwd" in state:
            t_fast_fwd = state["t_fast_fwd"]
            details["per_kernel_ms"] = {
                "fwd_kernel": t_fast_fwd * 1e3,
                "bwd_kernel": max(state["t_two"] - t_fast_fwd, 0.0) * 1e3,
            }
            if on_tpu:
                details["per_kernel_ms"]["fused_step_kernel"] = t_fast * 1e3
            details["vpu_sol_pct"]["fwd"] = (
                100 * rays * fl_fwd / t_fast_fwd / V5E_VPU_PEAK_FLOPS
            )
            _log(f"SOL: fwd {details['vpu_sol_pct']['fwd']:.0f}% "
                 f"fwd+bwd {details['vpu_sol_pct']['fwd_bwd']:.0f}% of v5e VPU peak "
                 f"({fl_fwd:.0f}/{fl_fb:.0f} flops/ray)")

    row("sol", row_sol)

    def row_host_dispatch():
        # --- dispatch-inclusive single calls (secondary; tunnel-noisy) ---
        g_fast = jax.jit(jax.grad(lambda s: mse_loss(render_fast(s), target)))
        details["fwdbwd_ms_host_dispatch"] = _host_dispatch(g_fast, scene) * 1e3

    row("host_dispatch", row_host_dispatch)

    def row_convergence():
        # --- wall-clock to converge: 4-sphere 512^2 inverse render ---
        tgt_img = jax.jit(render_fast)(scene)
        start = configs.perturb(scene, spec, scale=0.05, seed=7)
        # lr: sweep-validated on v5e — above ~5e-3 the optimizer can pop out
        # of the basin after converging (stiff specular/visibility landscape).
        ocfg = OptConfig(iters=400, lr=5e-3, schedule="cosine")
        conv_kw = (
            dict(vag_fn=vag, cache_key=f"{fast_name}-step")
            if on_tpu
            else dict(render_fn=render_fast, cache_key=fast_name)
        )
        t0 = time.perf_counter()
        final, losses = optimize_scan(start, tgt_img, spec, cfg, ocfg, **conv_kw)
        float(np.asarray(losses)[-1])  # value fetch before reading the clock
        t_cold = time.perf_counter() - t0
        t0 = time.perf_counter()
        final, losses = optimize_scan(start, tgt_img, spec, cfg, ocfg, **conv_kw)
        float(np.asarray(losses)[-1])
        t_warm = time.perf_counter() - t0
        err = float(param_error(final, scene, spec))
        _log(f"convergence (400 Adam steps @512^2): {t_cold:.1f}s incl. compile, "
             f"{t_warm:.2f}s warm  final_loss={float(losses[-1]):.3e} param_rms={err:.4f}")
        details["converge_seconds_incl_compile"] = t_cold
        details["converge_seconds_warm"] = t_warm
        details["converge_param_rms"] = err
        details["converge_final_loss"] = float(losses[-1])

    row("convergence", row_convergence)

    def row_spp4():
        # --- spp=4 supersampling: fused step with in-kernel subsample loop
        import dataclasses

        from reversible_raytracer_tpu.ops.render import loss_and_grad_fn

        cfg4 = dataclasses.replace(cfg, spp=4)
        vag4 = loss_and_grad_fn(scene, cfg4)
        t0 = time.perf_counter()
        t_spp4, _, _ = _median_slope(
            lambda n: _vag_total(vag4, scene, target, n), 30, 180, k=3
        )
        _log(f"pallas spp=4 fwd+bwd: {t_spp4*1e3:.3f} ms/step "
             f"({t_spp4/t_fast:.2f}x the spp=1 step) "
             f"[compile+bench {time.perf_counter()-t0:.0f}s]")
        details["fwdbwd_ms_spp4"] = t_spp4 * 1e3

    if on_tpu:
        row("spp4", row_spp4)

    def row_config5():
        # --- config-5 scale: object-chunked kernels at 513 objects, 512^2,
        # and at the BASELINE config-5 driver shape (64 spheres + plane,
        # 1024^2)
        from reversible_raytracer_tpu.ops.render import loss_and_grad_fn

        scene5, _, _ = configs.config5_many_spheres(512, n_spheres=512)
        cfg5 = RenderConfig(height=512, width=512, shadows=True)
        tgt5 = jnp.zeros((512, 512, 3), jnp.float32)
        vag5 = loss_and_grad_fn(scene5, cfg5)
        t0 = time.perf_counter()
        t5, _, _ = _median_slope(
            lambda n: _vag_total(vag5, scene5, tgt5, n), 10, 60, k=3
        )
        _log(f"pallas_vec 513-obj 512^2 fused step: {t5*1e3:.2f} ms/step "
             f"[compile+bench {time.perf_counter()-t0:.0f}s]")
        details["config5_513obj_fwdbwd_ms"] = t5 * 1e3
        _save()

        scene5k, _, _ = configs.config5_many_spheres(1024, n_spheres=64)
        cfg5k = RenderConfig(height=1024, width=1024, shadows=True)
        tgt5k = jnp.zeros((1024, 1024, 3), jnp.float32)
        vag5k = loss_and_grad_fn(scene5k, cfg5k)
        t0 = time.perf_counter()
        t5k, _, _ = _median_slope(
            lambda n: _vag_total(vag5k, scene5k, tgt5k, n), 10, 60, k=3
        )
        _log(f"pallas_vec 65-obj 1024^2 fused step: {t5k*1e3:.2f} ms/step "
             f"({1024*1024/t5k/1e6:.0f} Mrays/s) "
             f"[compile+bench {time.perf_counter()-t0:.0f}s]")
        details["config5_65obj_1024_fwdbwd_ms"] = t5k * 1e3

    if on_tpu:
        row("config5", row_config5)

    def row_vec_capability():
        # --- vec-scale capability rows: textured/env/spp4/reflective
        # scenes through the object-chunked STEP kernel, each with a
        # VPU-SOL roofline field (VERDICT r3 #3: the vec family had no
        # flops/bandwidth context). flops/ray comes from jaxpr-counting
        # the jnp_vec twin of the SAME scene+config at 32^2 — both kernel
        # families trace the pipeline math, so the elementwise flop count
        # is representative (the vec kernels' extra work is the chunk
        # machinery + dense texel MACs, quantified separately below).
        import dataclasses as _dc9

        from reversible_raytracer_tpu.ops.kernels.fused_vec import (
            loss_grad_pallas_vec,
        )
        from reversible_raytracer_tpu.ops.pipeline_vec import render_jnp_vec
        from reversible_raytracer_tpu.utils.profiling import (
            V5E_VPU_PEAK_FLOPS,
            flops_estimate,
        )

        def vec_sol(tag, scene_v, cfg_v, t_step):
            small = _dc9.replace(cfg_v, height=32, width=32)
            tgt32 = jnp.zeros((32, 32, 3), jnp.float32)
            fl = flops_estimate(
                jax.grad(lambda s: mse_loss(render_jnp_vec(s, small), tgt32)),
                scene_v,
            ) / (32 * 32)
            sol = 100 * rays * fl / t_step / V5E_VPU_PEAK_FLOPS
            details.setdefault("vec_flops_per_ray", {})[tag] = fl
            details.setdefault("vec_vpu_sol_pct", {})[tag] = sol
            _log(f"  vec SOL[{tag}]: {fl:.0f} flops/ray -> {sol:.1f}% of "
                 f"v5e VPU peak")

        rngv = np.random.default_rng(7)
        basev, _, _ = configs.config5_many_spheres(512, n_spheres=64)
        cfgv = RenderConfig(height=512, width=512, shadows=True)
        tgtv = jnp.zeros((512, 512, 3), jnp.float32)

        # plain 65-obj step (SOL context for the config5 row)
        vagp = lambda s, t: loss_grad_pallas_vec(s, cfgv, t)
        t0 = time.perf_counter()
        tp, _, _ = _median_slope(
            lambda n: _vag_total(vagp, basev, tgtv, n), 20, 120, k=3
        )
        _log(f"vec step kernel, 65-obj plain 512^2: {tp*1e3:.2f} ms/step "
             f"[compile+bench {time.perf_counter()-t0:.0f}s]")
        details["vec_plain_65obj_fwdbwd_ms"] = tp * 1e3
        vec_sol("plain", basev, cfgv, tp)
        _save()

        texv = jnp.asarray(
            rngv.uniform(0.1, 0.9, (basev.spheres.count, 16, 16, 3)),
            jnp.float32,
        )
        globev = _dc9.replace(
            basev, spheres=_dc9.replace(basev.spheres, texture=texv)
        )
        vagv = lambda s, t: loss_grad_pallas_vec(s, cfgv, t)
        t0 = time.perf_counter()
        tv, _, _ = _median_slope(
            lambda n: _vag_total(vagv, globev, tgtv, n), 10, 60, k=3
        )
        _log(f"vec step kernel, 65-obj ALL-textured (K=16) 512^2: "
             f"{tv*1e3:.2f} ms/step "
             f"[compile+bench {time.perf_counter()-t0:.0f}s]")
        details["vec_textured_65obj_fwdbwd_ms"] = tv * 1e3
        vec_sol("textured", globev, cfgv, tv)
        _save()

        envv = jnp.asarray(
            rngv.uniform(0.1, 0.9, (16, 16, 3)), jnp.float32
        )
        skyv = _dc9.replace(basev, env=envv)
        vage = lambda s, t: loss_grad_pallas_vec(s, cfgv, t)
        t0 = time.perf_counter()
        te, _, _ = _median_slope(
            lambda n: _vag_total(vage, skyv, tgtv, n), 20, 120, k=3
        )
        _log(f"vec step kernel, 65-obj env-mapped (K=16) 512^2: "
             f"{te*1e3:.2f} ms/step "
             f"[compile+bench {time.perf_counter()-t0:.0f}s]")
        details["vec_env_65obj_fwdbwd_ms"] = te * 1e3
        vec_sol("env", skyv, cfgv, te)
        _save()

        # in-kernel spp=4 vec step (round 3): the 2x2 subsample loop
        # fused into one launch (validated interpret + TPU)
        cfgv4 = _dc9.replace(cfgv, spp=4)
        vagv4 = lambda s, t: loss_grad_pallas_vec(s, cfgv4, t)
        t0 = time.perf_counter()
        tv4, _, _ = _median_slope(
            lambda n: _vag_total(vagv4, basev, tgtv, n), 10, 60, k=3
        )
        _log(f"vec step kernel, 65-obj spp=4 512^2: {tv4*1e3:.2f} ms/step "
             f"[compile+bench {time.perf_counter()-t0:.0f}s]")
        details["vec_spp4_65obj_fwdbwd_ms"] = tv4 * 1e3
        _save()

        # reflective vec step (round 3): per-level loop replay
        matv = basev.spheres.material
        mirv = jnp.asarray(
            rngv.uniform(0.2, 0.8, (basev.spheres.count,)), jnp.float32
        )
        reflv = _dc9.replace(
            basev,
            spheres=_dc9.replace(
                basev.spheres,
                material=_dc9.replace(matv, mirror=mirv),
            ),
        )
        cfgr = _dc9.replace(cfgv, reflections=1)
        vagr = lambda s, t: loss_grad_pallas_vec(s, cfgr, t)
        t0 = time.perf_counter()
        tr_, _, _ = _median_slope(
            lambda n: _vag_total(vagr, reflv, tgtv, n), 10, 60, k=3
        )
        _log(f"vec step kernel, 65-obj reflections=1 512^2: "
             f"{tr_*1e3:.2f} ms/step "
             f"[compile+bench {time.perf_counter()-t0:.0f}s]")
        details["vec_reflect_65obj_fwdbwd_ms"] = tr_ * 1e3
        vec_sol("reflect", reflv, cfgr, tr_)

    if on_tpu:
        row("vec_capability", row_vec_capability)

    def row_sharded():
        # --- sharded machinery cost on one chip (BASELINE.md row 4) ---
        # mesh=1 shard_map step vs the unsharded scan step: the cost of the
        # distributed machinery itself (multi-chip speedup is unmeasurable
        # on one chip; the fake-mesh overhead curve lives in
        # docs/scaling_fakemesh.json via scripts/scaling_bench.py).
        # One ratio, from THIS run (VERDICT r3 weak #2 — the old single
        # ambiguous field mixed definitions across runs):
        #   sharded_mesh1_vs_bare_vag — vs the bare fused vag slope
        #     (no optimizer), bounding the total machinery cost; xprof
        #     cross-checks that the sharded and unsharded scan bodies
        #     are identical 128.7 us/step (docs/xprof_sharded.json).
        from reversible_raytracer_tpu.parallel import (
            make_ray_mesh,
            optimize_sharded_scan,
        )

        if "converge_seconds_warm" not in details:
            raise RuntimeError("needs the convergence row (skipped?)")
        mesh1 = make_ray_mesh(1)
        tgt_sh = jax.jit(render_fast)(scene)

        # Two-point slope over scan LENGTHS (60 vs 360 iters): a single
        # timed 60-iter dispatch buries ~0.5 ms/step of dispatch + tunnel
        # fetch in the figure (the round-3 "7x overhead" was mostly this
        # measurement artifact, not machinery).
        def sh_total(iters):
            ocfg_n = OptConfig(iters=iters, lr=0.0)
            _, lw = optimize_sharded_scan(scene, tgt_sh, mesh1, cfg, spec,
                                          ocfg_n, impl="pallas_step")
            # Force-fetch the WARM run before starting the clock: the
            # tunnel's dispatch is async, so an unsynced warm scan still
            # EXECUTING when the timed dispatch lands leaks length-
            # proportional device time into the timed window (survives
            # the slope — observed as a ~2x inflated sharded step).
            float(np.asarray(lw)[-1])
            t0 = time.perf_counter()
            _, losses_sh = optimize_sharded_scan(
                scene, tgt_sh, mesh1, cfg, spec, ocfg_n, impl="pallas_step"
            )
            float(np.asarray(losses_sh)[-1])  # value fetch before the clock
            return time.perf_counter() - t0

        # 200/1200-iter windows: at ~0.13 ms/step the 60/360 windows are
        # 8-47 ms — same order as tunnel jitter. 26/156 ms windows put
        # the slope safely above the noise floor (reads a stable 0.130
        # run-to-run, matching docs/xprof_sharded.json's 128.7 us/step
        # while-loop total).
        t_sh, _, _ = _median_slope(sh_total, 200, 1200, k=3)

        # The ratio of record is vs the bare fused-vag slope: xprof shows
        # the sharded AND unsharded scan bodies are the identical 128.7
        # us/step (117.9 us kernel + the flat update), so the bare vag
        # slope IS the per-step comparator — an independent slope of the
        # unsharded optimize_scan was tried and is bimodal run-to-run
        # (0.100/0.119/0.275 ms for the same code; an artifact of timing
        # LONG single tunnel executions, not a property of the scan).
        _log(f"sharded mesh=1 fused step @512^2: {t_sh*1e3:.3f} ms/step "
             f"(x{t_sh/t_fast:.2f} vs bare vag {t_fast*1e3:.3f} ms; "
             f"xprof scan-body cross-check 0.1287 ms both paths)")
        details["sharded_mesh1_step_ms"] = t_sh * 1e3
        details["sharded_mesh1_vs_bare_vag"] = t_sh / t_fast

    if on_tpu:
        row("sharded_mesh1", row_sharded)

    def row_soft():
        # --- soft-visibility kernels (annealed-inversion hot path) ---
        import dataclasses as _dc

        from reversible_raytracer_tpu.ops.kernels.fused_vec_soft import (
            loss_grad_pallas_vec_soft,
        )

        scene_s, _, _ = configs.config5_many_spheres(512, n_spheres=64)
        cfg_s = _dc.replace(cfg, soft_tau=0.05)
        tgt_s2 = jnp.zeros((H, W, 3), jnp.float32)
        vag_s = lambda s, t: loss_grad_pallas_vec_soft(s, cfg_s, t)
        t0 = time.perf_counter()
        ts, _, _ = _median_slope(
            lambda n: _vag_total(vag_s, scene_s, tgt_s2, n), 10, 60, k=3
        )
        _log(f"pallas soft 65-obj 512^2 fused step: {ts*1e3:.2f} ms/step "
             f"[compile+bench {time.perf_counter()-t0:.0f}s]")
        details["soft_65obj_512_fwdbwd_ms"] = ts * 1e3

    if on_tpu:
        row("soft", row_soft)

    def row_config4():
        # --- config-4 capability row: camera+checker annealed inversion ---
        # Full joint inversion at the native 512^2 (soft-checker anneal,
        # docs/OPTIMIZATION_NOTES.md).
        from reversible_raytracer_tpu.optim import optimize_annealed
        from reversible_raytracer_tpu.ops.kernels.fused_vec import (
            render_pallas_vec,
        )

        scene4, spec4, cfg4c = configs.config4_checker_camera(512)
        start4 = configs.perturb(scene4, spec4, scale=0.05, seed=0)
        tgt4 = jax.jit(lambda s: render_pallas_vec(s, cfg4c))(scene4)
        ocfg4 = OptConfig(iters=150, lr=5e-3, schedule="cosine")
        t0 = time.perf_counter()
        final4, losses4 = optimize_annealed(
            start4, tgt4, spec4, cfg4c, ocfg4,
            taus=(0.08, 0.03, 0.01, 0.0), target_scene=scene4,
            checker_ratio=12.5,
        )
        final_loss4 = float(losses4[-1])  # VALUE fetch: on the axon
        # tunnel block_until_ready does not reliably wait (CLAUDE.md);
        # the fetch must land before the clock is read.
        t4 = time.perf_counter() - t0
        eye_rms = float(np.sqrt(np.mean(
            (np.asarray(final4.camera.eye) - np.asarray(scene4.camera.eye)) ** 2
        )))
        _log(f"config-4 camera+checker anneal @512^2 (600 steps): "
             f"{t4:.1f}s incl. compile  final_loss={final_loss4:.3e} "
             f"eye_rms={eye_rms:.2e}")
        details["config4_anneal_seconds_incl_compile"] = t4
        details["config4_anneal_eye_rms"] = eye_rms
        details["config4_anneal_final_loss"] = final_loss4

    if on_tpu:
        row("config4", row_config4)

    def row_config6():
        # --- config-6 capability row: mirror-reflections training step ---
        from reversible_raytracer_tpu.ops.render import loss_and_grad_fn

        scene6, spec6, cfg6 = configs.config6_mirror(512)
        vag6 = loss_and_grad_fn(scene6, cfg6)
        tgt6 = jnp.zeros((512, 512, 3), jnp.float32)
        t0 = time.perf_counter()
        t6, _, _ = _median_slope(
            lambda n: _vag_total(vag6, scene6, tgt6, n), 100, 600, k=3
        )
        _log(f"pallas reflections=1 3-obj 512^2 fused step: {t6*1e3:.3f} "
             f"ms/step ({t6/t_fast:.2f}x the local-shading step) "
             f"[compile+bench {time.perf_counter()-t0:.0f}s]")
        details["config6_reflect_fwdbwd_ms"] = t6 * 1e3
        _save()

        from reversible_raytracer_tpu.ops.kernels.fused import render_pallas

        tgt6r = jax.jit(lambda s: render_pallas(s, cfg6))(scene6)
        start6 = configs.perturb(scene6, spec6, scale=0.3, seed=6)
        ocfg6 = OptConfig(iters=150, lr=2e-2, schedule="cosine")
        t0 = time.perf_counter()
        final6, losses6 = optimize_scan(
            start6, tgt6r, spec6, cfg6, ocfg6,
            vag_fn=vag6, cache_key="bench-config6",
        )
        l6 = float(losses6[-1])  # value fetch before reading the clock
        t6w = time.perf_counter() - t0
        rms6 = float(param_error(final6, scene6, spec6))
        _log(f"config-6 mirror inversion @512^2 (150 steps, 30% perturb): "
             f"{t6w:.1f}s  final_loss={l6:.3e} mirror_rms={rms6:.2e}")
        details["config6_invert_seconds"] = t6w
        details["config6_invert_param_rms"] = rms6
        details["config6_invert_final_loss"] = l6

    if on_tpu:
        row("config6", row_config6)

    def _texture_config_rows(tag, make_config, seed, label, tex_leaf):
        # Shared body for the config-7/8/9 rows: step-kernel cost, XLA
        # fallback cost, inversion wall-clock + recovery RMS — the texture
        # leaf's RMS split by OBSERVABILITY (config-10's round-4 lesson
        # generalized: an aggregate RMS mixes in texels no ray samples,
        # which carry zero gradient and CANNOT move; texel (i,j) is
        # observable iff |d sum(image)/d texel| > 0 at the truth scene).
        from reversible_raytracer_tpu.ops.render import loss_and_grad_fn

        scene_t, spec_t, cfg_t = make_config(512)
        vag_t = loss_and_grad_fn(scene_t, cfg_t)  # -> fused step kernel
        tgt_t = jnp.zeros((512, 512, 3), jnp.float32)
        t0 = time.perf_counter()
        tt, _, _ = _median_slope(
            lambda n: _vag_total(vag_t, scene_t, tgt_t, n), 40, 240, k=3
        )
        _log(f"{label} (fused step kernel) 512^2 fwd+bwd: "
             f"{tt*1e3:.3f} ms/step "
             f"[compile+bench {time.perf_counter()-t0:.0f}s]")
        details[f"{tag}_fwdbwd_ms"] = tt * 1e3
        vag_tj = loss_and_grad_fn(scene_t, cfg_t, impl="jnp")
        ttj, _, _ = _median_slope(
            lambda n: _vag_total(vag_tj, scene_t, tgt_t, n), 10, 60, k=3
        )
        _log(f"{label} (XLA jnp fallback) 512^2 fwd+bwd: {ttj*1e3:.3f} ms/step")
        details[f"{tag}_fwdbwd_ms_jnp"] = ttj * 1e3
        _save()

        tgt_tr = jax.jit(lambda s: render_jnp(s, cfg_t))(scene_t)
        start_t = configs.perturb(scene_t, spec_t, scale=0.4, seed=seed)
        ocfg_t = OptConfig(iters=200, lr=3e-2, schedule="cosine")
        t0 = time.perf_counter()
        final_t, losses_t = optimize_scan(
            start_t, tgt_tr, spec_t, cfg_t, ocfg_t,
            render_fn=lambda s: render_jnp(s, cfg_t),
            vag_fn=vag_t, cache_key=f"bench-{tag}-step",
        )
        lt = float(losses_t[-1])  # value fetch before reading the clock
        ttw = time.perf_counter() - t0
        rms_t = float(param_error(final_t, scene_t, spec_t))

        g_obs = jax.jit(
            jax.grad(lambda s: jnp.sum(render_jnp(s, cfg_t)))
        )(scene_t)
        gt = np.asarray(tex_leaf(g_obs))
        obs = np.abs(gt).max(-1) > 0.0  # any-channel, per texel
        d2 = np.asarray(
            (tex_leaf(final_t) - tex_leaf(scene_t)) ** 2
        ).mean(-1)
        obs_rms = float(np.sqrt(d2[obs].mean())) if obs.any() else 0.0
        unobs_rms = (
            float(np.sqrt(d2[~obs].mean())) if (~obs).any() else 0.0
        )
        _log(f"{label} recovery @512^2 (200 steps, 40% perturb): "
             f"{ttw:.1f}s  final_loss={lt:.3e} rms={rms_t:.3e}  "
             f"tex_rms obs={obs_rms:.3e} unobs={unobs_rms:.3e} "
             f"(obs frac {obs.mean():.2f})")
        details[f"{tag}_rms_observable"] = obs_rms
        details[f"{tag}_rms_unobservable"] = unobs_rms
        details[f"{tag}_observable_frac"] = float(obs.mean())
        return ttw, rms_t, lt

    def row_config7():
        t, r, l = _texture_config_rows(
            "config7_texture", configs.config7_texture, 11, "textured",
            lambda s: s.rects.texture)
        details["config7_invert_seconds"] = t
        details["config7_invert_texture_rms"] = r
        details["config7_invert_final_loss"] = l

    def row_config8():
        t, r, l = _texture_config_rows(
            "config8_globe", configs.config8_globe, 12, "globe",
            lambda s: s.spheres.texture)
        details["config8_invert_seconds"] = t
        details["config8_invert_texture_rms"] = r
        details["config8_invert_final_loss"] = l

    def row_config9():
        t, r, l = _texture_config_rows(
            "config9_sky", configs.config9_sky, 13, "sky",
            lambda s: s.env)
        details["config9_invert_seconds"] = t
        details["config9_invert_env_rms"] = r
        details["config9_invert_final_loss"] = l

    if on_tpu:
        row("config7", row_config7)
        row("config8", row_config8)
        row("config9", row_config9)

    def row_config10():
        # --- config-10 capability row (VERDICT r3 #2): chrome field —
        # 64 mirrored spheres + env map at vec scale. Records the fused
        # step cost (should land near the reflective vec row) and the
        # inversion wall-clock; recovery-quality evidence (observable-
        # masked env RMS, mirror RMS, PNGs) lives in
        # examples/make_artifacts.py + scripts/config10_check.py.
        from reversible_raytracer_tpu.ops.render import loss_and_grad_fn

        scene10, spec10, cfg10 = configs.config10_chrome_field(512)
        vag10 = loss_and_grad_fn(scene10, cfg10)
        tgt10 = jnp.zeros((512, 512, 3), jnp.float32)
        t0 = time.perf_counter()
        t10, _, _ = _median_slope(
            lambda n: _vag_total(vag10, scene10, tgt10, n), 10, 60, k=3
        )
        _log(f"config-10 chrome field (vec step, reflections=1, env) 512^2: "
             f"{t10*1e3:.2f} ms/step "
             f"[compile+bench {time.perf_counter()-t0:.0f}s]")
        details["config10_fwdbwd_ms"] = t10 * 1e3
        _save()

        from reversible_raytracer_tpu.ops.kernels.fused_vec import (
            render_pallas_vec,
        )

        tgt10r = jax.jit(lambda s: render_pallas_vec(s, cfg10))(scene10)
        start10 = configs.perturb(scene10, spec10, scale=0.2, seed=10)
        ocfg10 = OptConfig(iters=300, lr=2e-2, schedule="cosine")
        t0 = time.perf_counter()
        final10, losses10 = optimize_scan(
            start10, tgt10r, spec10, cfg10, ocfg10,
            vag_fn=vag10, cache_key="bench-config10-step",
        )
        l10 = float(losses10[-1])  # value fetch before reading the clock
        t10w = time.perf_counter() - t0
        rms10 = float(param_error(final10, scene10, spec10))

        # Observable split (VERDICT r4 weak #4): the aggregate param RMS is
        # dominated by UNOBSERVABLE sky texels (no ray samples them → zero
        # gradient → cannot move); without the split the bench artifact
        # reads as a recovery stall while docs/config10_tpu_check.json
        # shows mirror RMS ~3e-6. Same metric definitions as
        # scripts/config10_check.py: observability = |d sum(image)/d env|
        # > 0 at the truth scene (one vjp, all-ones cotangent).
        from reversible_raytracer_tpu.ops.pipeline_vec import render_jnp_vec

        g_env10 = jax.jit(
            jax.grad(lambda s: jnp.sum(render_jnp_vec(s, cfg10)))
        )(scene10).env
        obs10 = np.abs(np.asarray(g_env10)).max(-1) > 0.0
        d2_10 = np.asarray((final10.env - scene10.env) ** 2).mean(-1)
        env_obs10 = float(np.sqrt(d2_10[obs10].mean())) if obs10.any() else 0.0
        env_unobs10 = (
            float(np.sqrt(d2_10[~obs10].mean())) if (~obs10).any() else 0.0
        )
        mir10 = float(jnp.sqrt(jnp.mean(
            (final10.spheres.material.mirror
             - scene10.spheres.material.mirror) ** 2
        )))
        _log(f"config-10 chrome inversion @512^2 (300 steps, 20% perturb): "
             f"{t10w:.1f}s  final_loss={l10:.3e} param_rms={rms10:.3e}  "
             f"mirror_rms={mir10:.2e} env_rms obs={env_obs10:.3e} "
             f"unobs={env_unobs10:.3e} (obs frac {obs10.mean():.2f})")
        details["config10_invert_seconds"] = t10w
        details["config10_invert_param_rms"] = rms10
        details["config10_invert_final_loss"] = l10
        details["config10_mirror_rms"] = mir10
        details["config10_env_rms_observable"] = env_obs10
        details["config10_env_rms_unobservable"] = env_unobs10
        details["config10_env_observable_frac"] = float(obs10.mean())

    if on_tpu:
        row("config10", row_config10)

    details["complete"] = True
    _save()
    os.replace(partial_path, "bench_details.json")
    _log(f"bench complete at +{time.perf_counter()-t_start:.0f}s "
         f"({len(details['skipped_rows'])} rows skipped); "
         f"bench_details.json renamed into place")
    # Re-print the driver JSON as the FINAL stdout line so a last-line
    # parser finds it too (the full sweep logs everything else to stderr).
    print(headline_line, flush=True)


if __name__ == "__main__":
    if _IS_CHILD:
        headline_child(sys.argv[sys.argv.index("--headline-child") + 1])
    else:
        main()
