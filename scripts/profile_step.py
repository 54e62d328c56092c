"""xprof device-trace capture + parse for the fused step (SURVEY.md §5.1).

Captures a `jax.profiler.trace` around the compiled fwd+bwd step, parses
the xplane.pb protobuf (tensorflow is in the image), and reports per-kernel
device durations — the measured counterpart of bench.py's analytic SOL
accounting. NOTE on the overlap claim
(BASELINE "grads all-reduced over ICI, overlapped with the backward"):
this box has ONE chip, so a single-device trace contains no collectives —
overlap can only be *asserted* from XLA's latency-hiding scheduler until a
real pod slice is available, and we say so in the output instead of
pretending.

Usage: python scripts/profile_step.py [--outdir /tmp/rrt_trace]
"""

import argparse
import glob
import gzip
import json
import os
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp


def parse_xplane(logdir):
    """Top device ops by total self-duration from the newest xplane.pb."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = sorted(
        glob.glob(os.path.join(logdir, "**", "*.xplane.pb"), recursive=True),
        key=os.path.getmtime,
    )
    if not paths:
        return None, "no xplane.pb produced"
    xspace = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as fh:
        xspace.ParseFromString(fh.read())
    per_op = {}
    device_planes = [
        p for p in xspace.planes
        if "TPU" in p.name or "/device" in p.name.lower()
    ]
    for plane in device_planes:
        names = {k: v for k, v in plane.event_metadata.items()}
        for line in plane.lines:
            for ev in line.events:
                meta = names.get(ev.metadata_id)
                name = meta.name if meta else f"op{ev.metadata_id}"
                per_op[name] = per_op.get(name, 0) + ev.duration_ps / 1e6  # us
    if not per_op:
        return None, f"no device events (planes: {[p.name for p in xspace.planes]})"
    top = sorted(per_op.items(), key=lambda kv: -kv[1])[:15]
    return top, None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--outdir", default="/tmp/rrt_trace")
    args = ap.parse_args()

    from reversible_raytracer_tpu.models import configs
    from reversible_raytracer_tpu.ops.kernels.fused import render_pallas
    from reversible_raytracer_tpu.ops.pipeline import RenderConfig
    from reversible_raytracer_tpu.ops.render import mse_loss
    from reversible_raytracer_tpu.utils import profiling

    scene, spec, _ = configs.config2_four_spheres()
    cfg = RenderConfig(height=512, width=512, shadows=True)
    target = jnp.zeros((512, 512, 3), jnp.float32)
    step = jax.jit(jax.grad(lambda s: mse_loss(render_pallas(s, cfg), target)))
    # Warm up (compile outside the trace).
    g = step(scene)
    float(jax.tree_util.tree_leaves(g)[0].ravel()[0])

    with profiling.trace(args.outdir):
        for _ in range(5):
            g = step(scene)
        float(jax.tree_util.tree_leaves(g)[0].ravel()[0])

    # Second trace: the FUSED TRAINING-STEP kernel (loss+grads in one
    # launch — the production optimizer step since round 2).
    from reversible_raytracer_tpu.ops.render import loss_and_grad_fn

    vag = jax.jit(loss_and_grad_fn(scene, cfg))
    l, g = vag(scene, target)
    float(l)
    step_dir = args.outdir + "_fusedstep"
    with profiling.trace(step_dir):
        for _ in range(5):
            l, g = vag(scene, target)
        float(l)

    top, err = parse_xplane(args.outdir)
    n = 5
    out = {"n_steps_traced": n}
    if err:
        out["error"] = err
    else:
        # Friendly labels: the fwd kernel is the custom-call taking only the
        # (grid_params, scene_params) SMEM operands; the bwd kernel is the
        # transpose_jvp custom-call that also consumes the saved visibility
        # planes. Everything else (fusions, concats, reshapes) is glue.
        labeled = {"fwd_kernel_us_per_step": 0.0, "bwd_kernel_us_per_step": 0.0,
                   "whole_step_us": 0.0, "glue_us_per_step": 0.0}
        for name, us in top:
            if "transpose_jvp" in name and "custom-call" in name:
                labeled["bwd_kernel_us_per_step"] += us / n
            elif "jvp" in name and "custom-call" in name:
                labeled["fwd_kernel_us_per_step"] += us / n
            elif name.startswith("jit__"):
                labeled["whole_step_us"] += us / n
            elif "%" in name:
                labeled["glue_us_per_step"] += us / n
        out["measured"] = {k: round(v, 1) for k, v in labeled.items()}
        out["per_op_us_total_top15"] = {k[:80]: round(v, 1) for k, v in top}

    top_s, err_s = parse_xplane(step_dir)
    if err_s:
        out["fused_step_error"] = err_s
    else:
        step_us = sum(us for name, us in top_s if "custom-call" in name) / n
        out["fused_step_kernel_us_per_step"] = round(step_us, 1)
        out["fused_step_per_op_us_top15"] = {
            k[:80]: round(v, 1) for k, v in top_s
        }
    out["overlap_note"] = (
        "single-chip box: no collectives exist in this trace; the psum/"
        "backward overlap claim requires a real pod slice to measure"
    )
    txt = json.dumps(out, indent=2)
    print(txt)
    with open("docs/xprof_trace.json", "w") as fh:
        fh.write(txt + "\n")


if __name__ == "__main__":
    main()
