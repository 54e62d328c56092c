"""Isolate the MXU texel-backward's numeric deviation: run the SAME step
kernel with RRT_TEXBWD in {vjp,mxu} (two processes), dump grads, diff.
Usage: RRT_TEXBWD=vjp python scripts/texbwd_diff.py /tmp/g_vjp.npz
       RRT_TEXBWD=mxu python scripts/texbwd_diff.py /tmp/g_mxu.npz
       python scripts/texbwd_diff.py --diff /tmp/g_vjp.npz /tmp/g_mxu.npz
"""
import dataclasses, sys
sys.path.insert(0, ".")
import numpy as np

if sys.argv[1] == "--diff":
    a, b = np.load(sys.argv[2]), np.load(sys.argv[3])
    for k in a.files:
        x, y = a[k], b[k]
        if not x.size:
            continue
        s = max(np.abs(x).max(), 1e-10)
        print(f"{k}: worst rel {np.abs(x-y).max()/s:.3e} (scale {s:.3e})")
    sys.exit(0)

import jax, jax.numpy as jnp
from reversible_raytracer_tpu.models import configs
from reversible_raytracer_tpu.ops.kernels import fused_vec
from reversible_raytracer_tpu.ops.kernels.fused_vec import loss_grad_pallas_vec
from reversible_raytracer_tpu.ops.pipeline import RenderConfig
from reversible_raytracer_tpu.ops.pipeline_vec import render_jnp_vec

print(f"backend={jax.default_backend()} texel_bwd={fused_vec._TEXEL_BWD}",
      file=sys.stderr)
H, W = 64, 128
base, _, _ = configs.config5_many_spheres(512, n_spheres=64)
rng = np.random.default_rng(7)
tex = jnp.asarray(rng.uniform(0.1, 0.9, (base.spheres.count, 16, 16, 3)),
                  jnp.float32)
scene = dataclasses.replace(
    base, spheres=dataclasses.replace(base.spheres, texture=tex))
cfg = RenderConfig(height=H, width=W, shadows=True)
target = jnp.asarray(np.asarray(render_jnp_vec(scene, cfg))) * 0.92
l, g = jax.jit(lambda s, t: loss_grad_pallas_vec(s, cfg, t))(scene, target)
flat = {"loss": np.asarray(l)}
import jax.tree_util as jtu
for path, leaf in jtu.tree_flatten_with_path(g)[0]:
    flat[jtu.keystr(path)] = np.asarray(leaf)
np.savez(sys.argv[1], **flat)
print("saved", sys.argv[1], "loss", float(l), file=sys.stderr)
