"""Profiling hooks (SURVEY.md §5.1).

The reference's equivalent was `THEANO_FLAGS=profile=1` per-op timing; the
TPU-native version is an xprof/XLA trace viewable in TensorBoard or Perfetto.
"""

from __future__ import annotations

import contextlib

import jax


@contextlib.contextmanager
def trace(logdir: str = "/tmp/rrt_trace"):
    """Capture a device trace (kernel timings, HBM traffic) around a block:

        with profiling.trace("/tmp/tr"):
            step(...); jax.block_until_ready(...)

    Open with TensorBoard's profile plugin or xprof."""
    with jax.profiler.trace(logdir):
        yield
    print(f"trace written to {logdir}")


def annotate(name: str):
    """Named region that shows up in traces (TraceAnnotation)."""
    return jax.profiler.TraceAnnotation(name)


# ---------------------------------------------------------------------------
# Analytic speed-of-light accounting (SURVEY.md §5.1 "report per-kernel time
# vs speed-of-light in the bench JSON")
# ---------------------------------------------------------------------------

# Elementwise flop weights per output element. Transcendentals are counted
# as 1 VPU op (they occupy one special-function slot); selects/compares as 1;
# pure layout ops as 0.
_FLOPS = {
    "add": 1, "sub": 1, "mul": 1, "div": 1, "neg": 1, "abs": 1, "sign": 1,
    "max": 1, "min": 1, "floor": 1, "ceil": 1, "round": 1, "rem": 1,
    "exp": 1, "log": 1, "sqrt": 1, "rsqrt": 1, "tan": 1, "tanh": 1,
    "logistic": 1, "pow": 1, "integer_pow": 2, "select_n": 1,
    "eq": 1, "ne": 1, "lt": 1, "le": 1, "gt": 1, "ge": 1,
    "and": 1, "or": 1, "not": 1, "xor": 1,
    "clamp": 2, "square": 1, "is_finite": 1,
}


def flops_estimate(fn, *args) -> int:
    """Count elementwise VPU flops of ``fn(*args)`` by walking its jaxpr
    (recursing into pjit/custom_vjp/cond sub-jaxprs; scans multiply by trip
    count). Gathers/scatters/reshapes count as zero — this is a VPU-compute
    estimate for roofline accounting, not a memory model."""
    from jax.extend import core as _core
    import numpy as _np

    closed = jax.make_jaxpr(fn)(*args)

    def walk(jaxpr) -> float:
        total = 0.0
        for eq in jaxpr.eqns:
            subs = []
            for v in eq.params.values():
                if isinstance(v, _core.ClosedJaxpr):
                    subs.append(v.jaxpr)
                elif isinstance(v, _core.Jaxpr):
                    subs.append(v)
                elif isinstance(v, (list, tuple)):
                    for w in v:
                        if isinstance(w, _core.ClosedJaxpr):
                            subs.append(w.jaxpr)
                        elif isinstance(w, _core.Jaxpr):
                            subs.append(w)
            if subs:
                inner = sum(walk(s) for s in subs)
                if eq.primitive.name == "scan":
                    inner *= eq.params.get("length", 1)
                elif eq.primitive.name == "cond":
                    inner /= max(len(subs), 1)  # one branch executes
                total += inner
                continue
            w = _FLOPS.get(eq.primitive.name)
            if w:
                n = max(
                    (int(_np.prod(ov.aval.shape)) for ov in eq.outvars),
                    default=0,
                )
                total += w * n
        return total

    return int(walk(closed.jaxpr))


# Peak v5e VPU throughput assumption for SOL%: (8, 128) vector shape x 4
# independent ALU slots per lane x ~0.94 GHz core clock ~= 3.85 Tflop/s
# (f32, elementwise). The MXU is irrelevant to this workload (no matmuls).
V5E_VPU_PEAK_FLOPS = 8 * 128 * 4 * 0.94e9
