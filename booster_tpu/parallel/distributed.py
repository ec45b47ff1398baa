"""Multi-host bring-up: jax.distributed + a mesh spanning hosts.

Replaces the reference's RPC offload backend (/root/reference/cpp/ggml/src/
ggml-rpc.cpp — a star-topology TCP tensor server) with the JAX multi-host
runtime: every host runs the same program, weights/KV shard over the global
mesh, and GSPMD collectives ride ICI within a slice and DCN across slices.

Serving topology: host 0 runs the HTTP server + scheduler; all hosts enter
the same jit'd prefill/decode computations.  Requests are broadcast from
host 0 via `broadcast_one_to_all` on the token/slot arrays (every jitted
step's inputs), which is exactly the "one controller drives the mesh"
pattern; see docs/ARCHITECTURE.md.
"""

from __future__ import annotations

import os
from typing import Optional

import jax

from booster_tpu.parallel.mesh import make_mesh


def init_distributed(
    coordinator: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize the multi-host runtime (env-driven when args omitted:
    JAX_COORDINATOR, JAX_NUM_PROCESSES, JAX_PROCESS_ID — or cloud-TPU
    autodetection when none are set)."""
    coordinator = coordinator or os.environ.get("JAX_COORDINATOR")
    if num_processes is None and os.environ.get("JAX_NUM_PROCESSES"):
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and os.environ.get("JAX_PROCESS_ID"):
        process_id = int(os.environ["JAX_PROCESS_ID"])
    if coordinator:
        jax.distributed.initialize(coordinator, num_processes, process_id)
    else:
        jax.distributed.initialize()  # TPU pod autodetection


def make_global_mesh(tp: Optional[int] = None, dp: Optional[int] = None):
    """Mesh over all global devices.  Defaults: tp = devices per host
    (collectives stay on ICI), dp = number of hosts (batch over DCN)."""
    n_global = len(jax.devices())
    n_local = len(jax.local_devices())
    if tp is None and dp is None:
        tp = n_local
        dp = n_global // n_local
    return make_mesh(n_global, tp=tp, dp=dp)


def is_controller() -> bool:
    return jax.process_index() == 0
