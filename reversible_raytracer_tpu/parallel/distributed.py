"""Multi-host runtime (SURVEY.md P3, §3.4).

The reference has no multi-process anything; this is the new framework's
pod-slice entry. Responsibilities:

- process bring-up: `jax.distributed.initialize()` (coordination service
  over DCN — the TPU-native replacement for "NCCL init"),
- a global mesh over all chips of the slice,
- host-0 gather of the final image / metrics,
- graceful single-process fallback (this dev box has one chip).

The sharded step itself (parallel.shard) is topology-agnostic: the same
code runs on 1 chip, an 8-chip host, or an N-host pod, because the mesh is
built from `jax.devices()` at runtime (SURVEY.md §7 "zero code changes").
"""

from __future__ import annotations

import jax
import numpy as np


def initialize(coordinator_address: str | None = None, num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """Bring up the multi-host runtime. No-ops in single-process mode.

    On Cloud TPU pods the arguments are auto-detected from the metadata
    server; pass them explicitly elsewhere.
    """
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    elif coordinator_address is not None:
        jax.distributed.initialize(coordinator_address=coordinator_address)
    # else: single process — nothing to do.


def is_primary() -> bool:
    return jax.process_index() == 0


def gather_image(image) -> np.ndarray:
    """Materialize a (possibly row-sharded, possibly multi-host) rendered
    image as a full numpy array on every host."""
    if jax.process_count() == 1:
        return np.asarray(image)
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(image, tiled=True))
