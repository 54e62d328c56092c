"""VERDICT r3 #8: measure whether the spp=4 vec RENDER 4-launch wrapper
costs anything over 4x the spp=1 render (the step kernels already fuse
spp in-kernel; the render side would only be worth fusing if the wrapper
paid real overhead). Measured on v5e (round 4): spp=1 0.513 ms, spp=4
wrapper 1.992 ms = 3.88x = 3% UNDER ideal 4x — render-side in-kernel spp
fusion has nothing to win."""
import sys, time; sys.path.insert(0,"/root/repo")
import dataclasses
import jax, jax.numpy as jnp, numpy as np
sys.path.insert(0, "/root/repo")
from bench import _scan_steps_fwd
from reversible_raytracer_tpu.models import configs
from reversible_raytracer_tpu.ops.pipeline import RenderConfig
from reversible_raytracer_tpu.ops.kernels.fused_vec import render_pallas_vec

scene, _, _ = configs.config5_many_spheres(512, n_spheres=64)
cfg1 = RenderConfig(height=512, width=512, shadows=True)
cfg4 = dataclasses.replace(cfg1, spp=4)
t1 = _scan_steps_fwd(lambda s: render_pallas_vec(s, cfg1), scene, 20, 120, k=3)
print(f"spp=1 render: {t1*1e3:.3f} ms", flush=True)
t4 = _scan_steps_fwd(lambda s: render_pallas_vec(s, cfg4), scene, 20, 120, k=3)
print(f"spp=4 render (4-launch wrapper): {t4*1e3:.3f} ms = {t4/t1:.3f}x spp=1", flush=True)
print(f"wrapper overhead vs ideal 4x: {(t4/t1/4-1)*100:+.1f}%", flush=True)
