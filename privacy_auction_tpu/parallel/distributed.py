"""Multi-host runtime initialization (jax.distributed) + mesh helpers.

The reference has no distributed backend at all (single process,
in-memory board -- SURVEY.md section 2); scaling past one host is a
TPU-build responsibility.  This module owns process-group bring-up so
drivers can go from "mpirun/k8s gave me N processes" to a global
bidder mesh in one call:

    from privacy_auction_tpu.parallel import distributed as D
    D.init()                       # env-driven (JAX_COORDINATOR etc.)
    mesh = D.global_mesh()         # 1-D mesh over every chip in the job
    seal.run_auction(..., mesh=mesh)

On a single host (or under tests) `init()` is a no-op and
`global_mesh()` degrades to the local-device mesh, so the same driver
code runs everywhere.  Sharding layout notes: the bidder axis rides the
mesh; per-step AV-net scans and veto sums lower to log-depth ppermute /
psum chains that stay on ICI within a slice and cross DCN only between
slices (mesh order = jax.devices() order, which enumerates ICI-adjacent
chips first).
"""

from __future__ import annotations

import os

import jax

from .mesh import make_mesh

_initialized = False


def init(coordinator_address: str | None = None,
         num_processes: int | None = None,
         process_id: int | None = None) -> bool:
    """Initialize jax.distributed for a multi-process/multi-host job.

    Arguments default from the environment (JAX_COORDINATOR_ADDRESS /
    JAX_NUM_PROCESSES / JAX_PROCESS_ID).  When none are configured,
    PA_TPU_DISTRIBUTED=1 opts into jax's own cluster auto-detection
    (`jax.distributed.initialize()` with no arguments -- the standard
    TPU-pod launch path); otherwise the call is a single-process no-op.
    The opt-in gate keeps plain single-host runs (and tests) from
    blocking on a coordinator that will never appear.

    Returns True if a process group was initialized, False for
    single-process operation.  Safe to call more than once; only the
    first call initializes.
    """
    global _initialized
    if _initialized:
        return True
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    env_np = os.environ.get("JAX_NUM_PROCESSES")
    env_pid = os.environ.get("JAX_PROCESS_ID")
    if num_processes is None and env_np is not None:
        num_processes = int(env_np)
    if process_id is None and env_pid is not None:
        process_id = int(env_pid)
    if coordinator_address is None and num_processes is None:
        if os.environ.get("PA_TPU_DISTRIBUTED") == "1":
            jax.distributed.initialize()  # pod/cluster auto-detection
            _initialized = True
            return True
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    _initialized = True
    return True


def global_mesh():
    """1-D bidder mesh over every addressable chip in the job.

    After `init()` on a multi-host job this spans all hosts'
    devices (jax.devices() is global post-initialization); without
    distributed init it is the local-device mesh.
    """
    return make_mesh(devices=jax.devices())


def process_info() -> dict:
    """Diagnostic summary for logs: process index/count, device counts."""
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
        "platform": jax.devices()[0].platform,
    }
