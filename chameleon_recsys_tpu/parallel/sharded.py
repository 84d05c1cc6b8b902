"""Sharded execution of the NAR programs — the multi-chip production path.

The reference is locked to a single worker (its asynchronous-training fear,
/root/reference/README.md:252).  Here the SAME pure step functions that run
single-chip are jitted with explicit shardings over a ``(data × model)``
mesh (parallel/mesh.py):

  * batches data-parallel on the session axis;
  * large row-indexed tables (trainable item embeddings, frozen ACE matrix,
    their Adam moments) row-sharded over ``model`` — XLA inserts the
    all-to-all / all-gather collectives for the row gathers over ICI;
  * streaming state, RNN/MLP weights and scalar metrics replicated — the
    stream update consumes the full batch's clicks (an all-gather of the
    data-sharded click columns), so every shard deterministically computes
    the same new state: the synchronous hour-stepped loop the temporal
    protocol needs, with nothing leaking between hours.

``TemporalHarness(mesh_plan=...)`` routes every train/eval step through
these programs; multi-host processes feed their session shard via
``jax.make_array_from_process_local_data`` (parallel/distributed.py).
"""
from __future__ import annotations

from typing import Any, NamedTuple

import jax
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from .mesh import (
    MeshPlan,
    batch_sharding,
    params_sharding,
    replicated,
    state_sharding,
)


class ShardedNARPrograms(NamedTuple):
    train_step: Any  # jitted with explicit in/out shardings
    eval_step: Any
    state_sharding: Any
    batch_sharding: Any
    ace_sharding: Any
    metadata_sharding: Any
    plan: MeshPlan


def _data_leading_sharding(plan: MeshPlan, tree_of_shapes):
    """Shard dim 0 (the session axis) over data; used for eval fetches."""

    def rule(leaf):
        spec = [None] * len(leaf.shape)
        if spec:
            spec[0] = plan.data_axis
        return NamedSharding(plan.mesh, P(*spec))

    return jax.tree_util.tree_map(rule, tree_of_shapes)


def shard_nar_programs(
    programs,
    plan: MeshPlan,
    state,
    example_batch,
    ace_matrix,
    metadata,
    min_rows: int = 4096,
) -> ShardedNARPrograms:
    """Re-jit the pure step bodies (NARPrograms.train_step_fn/eval_step_fn)
    with the mesh shardings derived from the live pytrees."""
    state_sh = state_sharding(plan, state, min_rows=min_rows)
    batch_sh = batch_sharding(plan, example_batch)
    ace_sh = params_sharding(plan, ace_matrix, min_rows=min_rows)
    meta_sh = {k: replicated(plan) for k in metadata}

    _, train_metrics_shape = jax.eval_shape(
        programs.train_step_fn, state, example_batch, ace_matrix, metadata
    )
    train_metrics_sh = jax.tree_util.tree_map(
        lambda _: replicated(plan), train_metrics_shape
    )
    _, eval_metrics_shape, fetches_shape = jax.eval_shape(
        programs.eval_step_fn, state, example_batch, ace_matrix, metadata
    )
    eval_metrics_sh = jax.tree_util.tree_map(
        lambda _: replicated(plan), eval_metrics_shape
    )
    fetches_sh = _data_leading_sharding(plan, fetches_shape)

    train_step = jax.jit(
        programs.train_step_fn,
        in_shardings=(state_sh, batch_sh, ace_sh, meta_sh),
        out_shardings=(state_sh, train_metrics_sh),
        donate_argnums=(0,),
    )
    eval_step = jax.jit(
        programs.eval_step_fn,
        in_shardings=(state_sh, batch_sh, ace_sh, meta_sh),
        out_shardings=(state_sh, eval_metrics_sh, fetches_sh),
        donate_argnums=(0,),
    )
    return ShardedNARPrograms(
        train_step, eval_step, state_sh, batch_sh, ace_sh, meta_sh, plan
    )


def put_batch(sharded: ShardedNARPrograms, np_batch) -> dict:
    """Place one host-local numpy batch onto the mesh.

    Single-process: a plain sharded device_put of the global batch.
    Multi-host: each process contributes its rows of the global batch
    (``jax.make_array_from_process_local_data`` assembles the global array
    from per-process shards without any cross-host transfer)."""
    if jax.process_count() > 1:
        return {
            k: jax.make_array_from_process_local_data(
                sharded.batch_sharding[k], np.asarray(v)
            )
            for k, v in np_batch.items()
        }
    return {
        k: jax.device_put(np.asarray(v), sharded.batch_sharding[k])
        for k, v in np_batch.items()
    }
