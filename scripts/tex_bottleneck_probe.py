"""Where does the textured vec step's time go? (bench: 9.7% VPU SOL vs
plain 33%). Split fwd vs step and scale K: if cost ~ K^2 it's the dense
hat-basis MACs; if K-flat it's per-texel-row overhead (SMEM reads /
reduction partials)."""
import sys, time, dataclasses
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
from bench import _scan_steps_fwd, _scan_steps_vag
from reversible_raytracer_tpu.models import configs
from reversible_raytracer_tpu.ops.pipeline import RenderConfig
from reversible_raytracer_tpu.ops.kernels import fused_vec as FV

cfg = RenderConfig(height=512, width=512, shadows=True)
target = jnp.zeros((512, 512, 3), jnp.float32)

def textured_scene(K):
    rng = np.random.default_rng(0)
    scene, _, _ = configs.config5_many_spheres(512, n_spheres=64)
    tex = jnp.asarray(rng.uniform(0.1, 0.9,
                                  (scene.spheres.count, K, K, 3)), jnp.float32)
    return dataclasses.replace(
        scene, spheres=dataclasses.replace(scene.spheres, texture=tex))

for K in (8, 16):
    scene = textured_scene(K)
    tf = _scan_steps_fwd(lambda s: FV.render_pallas_vec(s, cfg), scene,
                         20, 120, k=3)
    print(f"K={K}: fwd {tf*1e3:.3f} ms", flush=True)
    ts = _scan_steps_vag(
        lambda s, t: FV.loss_grad_pallas_vec(s, cfg, t), scene, target,
        20, 120, k=3)
    print(f"K={K}: step {ts*1e3:.3f} ms (bwd-ish {(ts-tf)*1e3:.3f})",
          flush=True)
