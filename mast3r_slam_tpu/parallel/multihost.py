"""Multi-host execution: process group + global meshes + batch fan-out.

The reference is a single process on one device — its "communication
backend" is Apple unified memory (SURVEY.md §2.9; /root/reference
src/mlx_mast3r_slam/slam.py:31 "Single-threaded implementation").
`parallel/mesh.py` covers multi-chip-per-host scaling over ICI; this module
adds the multi-HOST layer on top:

* `initialize()` — join the jax.distributed process group (one coordinator,
  N processes). After it returns, `jax.devices()` is the GLOBAL device
  list and every jitted computation over a global mesh runs SPMD across
  hosts, with XLA routing collectives over ICI within a host and DCN
  between hosts.
* `make_global_mesh()` — a (dp, tp) mesh over all global devices where the
  tp axis NEVER crosses a host boundary (tensor-parallel collectives are
  latency-bound and must ride ICI; dp gradient/stat reductions tolerate
  DCN). Layout: hosts stack along dp.
* `host_local_batch_to_global()` / `global_array_to_host_local()` — lift
  each host's locally-ingested batch shard (its own camera streams / its
  own dataset shard) into one global array for the sharded serving or
  train step, and bring per-sequence results back.

Design note: nothing else in the package needs to know about processes —
serving's `BatchTracker(mesh=...)` and `make_train_step(mesh=...)` already
accept any mesh, and GSPMD treats a multi-host mesh identically to a
single-host one. That is the point of doing scale-out at the sharding
layer instead of hand-written NCCL/MPI ranks: the SLAM/serving code is
byte-identical from 1 chip to N hosts.

Validated end-to-end by `tests/test_multihost.py`, which spawns real
separate processes (CPU backend, forced host devices) and checks that a
dp-spanning psum and a dp-sharded serving-style reduction agree with the
single-process oracle.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize(
    coordinator_address: str,
    num_processes: int,
    process_id: int,
    local_device_ids: Optional[Sequence[int]] = None,
) -> None:
    """Join the distributed process group.

    Call ONCE per process, before any other JAX API touches the backend.
    `coordinator_address` is "host:port" of process 0; every process
    (including 0) calls with its own `process_id`. Blocks until all
    `num_processes` have joined.
    """
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )


def make_global_mesh(
    tp: Optional[int] = None,
    axis_names: tuple[str, str] = ("dp", "tp"),
) -> Mesh:
    """(dp, tp) mesh over ALL global devices; tp stays within one host.

    `jax.devices()` orders devices by process, so reshaping [n_global] ->
    [n_global/tp, tp] keeps each tp row inside one process as long as tp
    divides the per-host device count — enforced here. Hosts therefore
    stack along dp, and only dp collectives (gradient psums, batch stats)
    cross DCN.
    """
    devices = np.asarray(jax.devices())
    local = jax.local_device_count()
    if tp is None:
        tp = 1
        for cand in (4, 2):
            if local % cand == 0 and len(devices) % cand == 0:
                tp = cand
                break
    if local % tp != 0:
        raise ValueError(
            f"tp={tp} must divide the per-host device count {local} so "
            "tensor-parallel collectives never cross DCN"
        )
    dp = len(devices) // tp
    return Mesh(devices.reshape(dp, tp), axis_names)


def host_local_batch_to_global(
    x,
    mesh: Mesh,
    spec: P = P("dp"),
):
    """Assemble per-host batch shards into one global array (pytree-ok).

    Each process passes ITS OWN local shard (e.g. the B/num_hosts
    sequences this host ingests); the result is a global array whose
    leading axis is the concatenation across hosts in process order —
    exactly what a dp-sharded serving/train step consumes. No data moves:
    each shard stays on its host's devices.
    """
    from jax.experimental import multihost_utils

    return multihost_utils.host_local_array_to_global_array(x, mesh, spec)


def global_array_to_host_local(
    x,
    mesh: Mesh,
    spec: P = P("dp"),
):
    """Inverse of `host_local_batch_to_global`: this host's slice, fully
    addressable (e.g. per-sequence tracking stats for the sequences this
    host owns)."""
    from jax.experimental import multihost_utils

    return multihost_utils.global_array_to_host_local_array(x, mesh, spec)


def broadcast_from_host0(tree):
    """Replicate host-0's pytree to every process (model params loaded
    from disk once, config blobs). Scalars/arrays only."""
    from jax.experimental import multihost_utils

    return multihost_utils.broadcast_one_to_all(tree)


def sync(tag: str = "barrier") -> None:
    """Cross-host barrier (orders host-side phases: arena rewrites,
    snapshot writes)."""
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(tag)


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for params replicated across the whole mesh (the dp-only
    serving fan-out case where every host holds full weights)."""
    return NamedSharding(mesh, P())
