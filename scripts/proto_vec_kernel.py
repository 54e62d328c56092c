"""Prototype: Mosaic lowering probes for the object-vectorized kernel.

Validates the two constructs the chunked-object kernel design depends on
(before committing to the full implementation):
  1. fori_loop over rows of an SMEM (N, P) input with DYNAMIC row index
     scalar reads, carrying (bh, bw) f32/i32 planes;
  2. dynamic-row scalar WRITES into an SMEM (N, P) output, accumulated
     across sequential grid steps.

Run on CPU (interpret + compiled-interpret) by default; pass --tpu to
compile for real on the axon chip.
"""

import sys

if "--tpu" not in sys.argv:
    import os

    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    )
    import jax

    jax.config.update("jax_platforms", "cpu")
else:
    import jax

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INTERPRET = "--tpu" not in sys.argv

N, P = 37, 16
H = W = 128
bh, bw = 64, 128


def fwd_kernel(obj_ref, out_ref):
    i = pl.program_id(0)
    row0 = (i * bh).astype(jnp.float32)
    ii = row0 + jax.lax.broadcasted_iota(jnp.int32, (bh, bw), 0).astype(jnp.float32)

    def body(k, carry):
        acc, kbest = carry
        a = obj_ref[k, 0]
        b = obj_ref[k, 1]
        val = a * ii + b
        closer = val > acc
        acc = jnp.where(closer, val, acc)
        kbest = jnp.where(closer, k, kbest)
        return acc, kbest

    acc0 = jnp.zeros((bh, bw), jnp.float32)
    kb0 = jnp.full((bh, bw), -1, jnp.int32)
    acc, kbest = jax.lax.fori_loop(0, N, body, (acc0, kb0))
    out_ref[:, :] = acc + kbest.astype(jnp.float32)


def bwd_kernel(obj_ref, g_ref, dobj_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        def init(k, _):
            for j in range(P):
                dobj_ref[k, j] = 0.0
            return 0

        jax.lax.fori_loop(0, N, init, 0)

    def body(k, _):
        a = obj_ref[k, 0]
        contrib = jnp.sum(g_ref[:, :]) * a
        dobj_ref[k, 0] = dobj_ref[k, 0] + contrib
        dobj_ref[k, 1] = dobj_ref[k, 1] + 1.0
        return 0

    jax.lax.fori_loop(0, N, body, 0)


def main():
    rng = np.random.default_rng(0)
    obj = jnp.asarray(rng.uniform(0.1, 1.0, size=(N, P)), jnp.float32)

    fwd = pl.pallas_call(
        fwd_kernel,
        grid=(H // bh,),
        in_specs=[pl.BlockSpec((N, P), lambda i: (0, 0), memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((bh, bw), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((H, W), jnp.float32),
        interpret=INTERPRET,
    )
    out = np.asarray(jax.jit(fwd)(obj))

    # Reference
    ii = np.arange(H, dtype=np.float32)[:, None] * np.ones((1, W), np.float32)
    vals = obj[:, 0].reshape(-1, 1, 1) * ii[None] + np.asarray(obj[:, 1]).reshape(-1, 1, 1)
    ref = vals.max(axis=0) + vals.argmax(axis=0)
    err = np.abs(out - ref).max()
    print("fwd dynamic-SMEM-read probe: max err", err)
    assert err < 1e-4

    g = jnp.ones((H, W), jnp.float32)
    bwd = pl.pallas_call(
        bwd_kernel,
        grid=(H // bh,),
        in_specs=[
            pl.BlockSpec((N, P), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((bh, bw), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((N, P), lambda i: (0, 0), memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((N, P), jnp.float32),
        interpret=INTERPRET,
    )
    dobj = np.asarray(jax.jit(bwd)(obj, g))
    expect0 = np.asarray(obj[:, 0]) * (H * W)
    err0 = np.abs(dobj[:, 0] - expect0).max()
    err1 = np.abs(dobj[:, 1] - (H // bh)).max()
    print("bwd dynamic-SMEM-write probe: err col0", err0, "col1", err1)
    assert err0 < 1e-1 and err1 == 0.0
    print("OK platform:", jax.default_backend())


if __name__ == "__main__":
    main()
