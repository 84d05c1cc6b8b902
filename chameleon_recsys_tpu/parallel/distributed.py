"""Multi-host initialization and cross-host collective helpers.

The reference has no distributed backend at all (single ML Engine worker
mandated, README.md:252; GCS files are the only cross-machine channel).  On
TPU pods the runtime is ``jax.distributed`` over all hosts: each host feeds
its shard of the session stream, the mesh spans every chip, and the
temporal-hour boundary is a global synchronization point — all hosts step the
same hour, so the streaming-state update (an all-gather of the global batch's
clicks, inserted by XLA from the replicated-output sharding) is identical on
every shard and nothing leaks.
"""
from __future__ import annotations

import logging
from typing import Optional, Sequence

import jax

from .mesh import MeshPlan, make_mesh

log = logging.getLogger("chameleon_tpu.distributed")


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """jax.distributed.initialize with env-based autodetection on TPU pods.

    On Cloud TPU, calling with no arguments autodetects everything; explicit
    arguments support other clusters."""
    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    jax.distributed.initialize(**kwargs)
    log.info(
        "distributed initialized: process %d/%d, %d local / %d global devices",
        jax.process_index(),
        jax.process_count(),
        jax.local_device_count(),
        jax.device_count(),
    )


def make_pod_mesh(model_parallelism: int = 1) -> MeshPlan:
    """Global (data × model) mesh over every chip in the slice.  Lay the
    model axis within hosts so row-sharded table collectives ride ICI."""
    return make_mesh(
        data_parallelism=jax.device_count() // model_parallelism,
        model_parallelism=model_parallelism,
        devices=jax.devices(),
    )


def hours_for_process(hours: Sequence[int]) -> Sequence[int]:
    """The temporal protocol is order-sensitive: every process walks the SAME
    hour sequence (data parallelism shards sessions WITHIN an hour, not
    across hours)."""
    return hours


def shard_sessions_for_process(sessions, process_index=None, process_count=None):
    """Round-robin split of one hour's sessions across hosts; each host
    collates its own shard into the per-host slice of the global batch."""
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    return list(sessions)[pi::pc]
