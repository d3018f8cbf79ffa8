"""Multi-host (DCN) foundation: process group init + global mesh + admission.

The reference spans nodes by exposing remote devices over a TCP RPC protocol
(ggml/src/ggml-rpc/ggml-rpc.cpp:56-77 + tools/rpc) — sequential offload, not
collectives. The TPU-native replacement is a jax.distributed process group:
every host runs the same program, jax.devices() becomes the GLOBAL device
set, and the same NamedSharding rules that drive single-host TP/DP place
shards across hosts — XLA routes collectives over ICI within a slice and
DCN across slices. tpullm's layers above (engine, server) only see a Mesh.

Serving admission (SURVEY §2.12 "multi-host admission"): requests land on
one host (the coordinator, process_index 0) which runs the HTTP frontend;
every host executes the same jitted step on its device shards. Host-local
batches are formed with multihost_utils (broadcast of token ids from the
coordinator), so the control plane stays a thin HTTP layer instead of the
reference's rpc-server byte protocol.
"""
from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np


@dataclass
class DistContext:
    n_processes: int
    process_id: int
    coordinator: str | None

    @property
    def is_coordinator(self) -> bool:
        return self.process_id == 0


def init_distributed(coordinator: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> DistContext:
    """Initialize the JAX process group (no-op for single-process runs).

    Args default from the standard env vars (TPULLM_COORDINATOR,
    TPULLM_NUM_PROCESSES, TPULLM_PROCESS_ID) so multi-host launches are
    `TPULLM_COORDINATOR=host0:9911 TPULLM_NUM_PROCESSES=4
    TPULLM_PROCESS_ID=$i python -m tpullm.server ...` on each host —
    the role of `rpc-server -H host -p port` in the reference deployment
    (docs/build-s390x.md's multi-node story)."""
    import jax

    coordinator = coordinator or os.environ.get("TPULLM_COORDINATOR")
    if num_processes is None:
        num_processes = int(os.environ.get("TPULLM_NUM_PROCESSES", "1"))
    if process_id is None:
        process_id = int(os.environ.get("TPULLM_PROCESS_ID", "0"))
    if num_processes <= 1 or not coordinator:
        return DistContext(1, 0, None)
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )
    return DistContext(num_processes, jax.process_index(), coordinator)


def global_mesh(tp: int | None = None, dp: int | None = None):
    """Mesh over ALL processes' devices, tp innermost (ICI-adjacent) so
    tensor-parallel collectives stay on-chip-interconnect and only the dp
    axis crosses DCN — the scaling-book layout for multi-host serving."""
    import jax
    from jax.sharding import Mesh

    devs = np.asarray(jax.devices())
    n = devs.size
    if tp is None:
        tp = jax.local_device_count()
    if dp is None:
        dp = n // tp
    assert dp * tp == n, (dp, tp, n)
    return Mesh(devs.reshape(dp, tp), ("dp", "tp"))


def broadcast_from_coordinator(arr):
    """Replicate a host-local array from process 0 to all hosts (admission:
    the coordinator tokenizes/batches; workers receive the same step
    inputs). Single-process: identity."""
    import jax

    if jax.process_count() == 1:
        return arr
    from jax.experimental import multihost_utils

    return multihost_utils.broadcast_one_to_all(arr)


def sync_hosts(name: str = "step"):
    """Barrier across hosts (pre-shutdown / checkpoint coordination)."""
    import jax

    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)
