"""Worker process for the 2-process jax.distributed CPU test (SURVEY.md
§3.4, P3; VERDICT round-1 item #4 — exercising the multi-host runtime for
real, not just importing it).

Each process owns ONE fake CPU device; `jax.distributed.initialize` makes a
2-device global mesh over localhost (loopback only — no external network).
The worker renders its row band via the production shard_map path, runs one
sharded optimization step (psum'd gradients), gathers the full image with
`gather_image`, and process 0 writes results for the pytest harness to
compare against a single-process render.

Invoked by tests/test_distributed.py:
    python scripts/distributed_worker.py <coordinator> <num_procs> <pid> <outdir>
"""

import os
import sys

# One local CPU device per process, BEFORE importing jax (conftest recipe).
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=1"
)

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np


def main():
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    coordinator, num_procs, pid, outdir = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4]
    )

    from reversible_raytracer_tpu.parallel import initialize
    from reversible_raytracer_tpu.parallel.distributed import gather_image, is_primary

    initialize(coordinator, num_procs, pid)
    assert jax.process_count() == num_procs, jax.process_count()
    assert len(jax.devices()) == num_procs  # global device view

    from reversible_raytracer_tpu.models import configs
    from reversible_raytracer_tpu.optim import OptConfig
    from reversible_raytracer_tpu.ops.pipeline import RenderConfig
    from reversible_raytracer_tpu.parallel import make_ray_mesh, render_sharded
    from reversible_raytracer_tpu.parallel.shard import make_sharded_step

    scene, spec, _ = configs.config2_four_spheres()
    cfg = RenderConfig(height=32, width=32, shadows=True)
    mesh = make_ray_mesh()  # 2 devices, one per process

    # Cooperative render: this process computes only its band; the gather
    # crosses the process boundary (multihost_utils.process_allgather).
    img = render_sharded(scene, cfg, mesh, impl="jnp")
    full = gather_image(img)

    # One distributed optimization step (the psum'd-gradient path).
    step, init = make_sharded_step(mesh, cfg, spec, OptConfig(iters=1, lr=1e-2))
    start = configs.perturb(scene, spec, scale=0.05, seed=3)
    s0, opt_state, target = init(start, jax.numpy.asarray(full))
    s1, _, loss, gnorm = step(s0, opt_state, target)
    loss, gnorm = float(loss), float(gnorm)
    stepped = jax.tree_util.tree_map(lambda x: np.asarray(x), s1)

    if is_primary():
        np.savez(
            os.path.join(outdir, "result.npz"),
            image=full,
            loss=loss,
            gnorm=gnorm,
            **{
                f"leaf{i}": l
                for i, l in enumerate(jax.tree_util.tree_leaves(stepped))
            },
        )
    jax.distributed.shutdown()
    print(f"proc {pid}: ok loss={loss:.6e}", flush=True)


if __name__ == "__main__":
    main()
