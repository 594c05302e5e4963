"""Multi-host orchestration (jax.distributed + per-host ingest).

The reference is single-process (SURVEY.md §2.3).  For pod-slice serving the
framework-level story is:

  * ``initialize()`` wires ``jax.distributed`` (coordinator address / process
    id / process count from env or args) so all hosts share one global mesh;
  * each host ingests its own audio shard; ``host_local_batch_to_global``
    assembles a globally-sharded batch from per-host arrays
    (jax.make_array_from_process_local_data) — DP over the ``data`` axis
    rides ICI/DCN via GSPMD;
  * stream migration across hosts uses OnlineRecognizer.snapshot_stream /
    restore_stream (runtime/online.py).

Single-host environments no-op cleanly; the multi-chip program itself is
validated by __graft_entry__.dryrun_multichip on a virtual device mesh.
"""

from __future__ import annotations

import os

import jax


def initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> bool:
    """Initialize jax.distributed from args or JAX_COORDINATOR_ADDRESS /
    JAX_NUM_PROCESSES / JAX_PROCESS_ID env vars.  Returns True if a
    multi-process runtime was initialized, False for single-host no-op."""
    addr = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if not addr:
        return False
    n = num_processes if num_processes is not None else int(os.environ.get("JAX_NUM_PROCESSES", "1"))
    pid = process_id if process_id is not None else int(os.environ.get("JAX_PROCESS_ID", "0"))
    if n <= 1:
        return False
    jax.distributed.initialize(
        coordinator_address=addr, num_processes=n, process_id=pid
    )
    return True


def host_local_batch_to_global(mesh, local_batch):
    """Assemble per-host numpy batches into one globally-sharded array over
    the mesh's ``data`` axis."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P("data"))
    return jax.make_array_from_process_local_data(sharding, local_batch)
