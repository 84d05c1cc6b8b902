"""Device mesh and sharding layout.

The reference is deliberately single-process/single-GPU (README.md:252) and
keeps its big embedding matrices pinned to host memory
(nar_model.py:170-191).  The TPU design replaces both decisions:

  * a 2-D ``(data, model)`` mesh: sessions are data-parallel over ``data``;
    the large row-indexed tables (trainable item embeddings, frozen ACE
    matrix and their Adam moments) are row-sharded over ``model`` so no
    single chip holds the full catalog.  XLA inserts the all-to-all /
    all-gather collectives for sharded-row gathers over ICI.
  * the streaming state (buffer, popularity) is replicated; its update
    consumes the full batch's clicks, which XLA realises as an all-gather of
    the data-sharded click columns — every shard deterministically computes
    the same new state, which is exactly the "synchronous hour-stepped loop"
    the temporal protocol needs.

Sharding decisions are structural (by leaf shape/path), so the same rules
cover params, Adam moments, and aux arrays without per-model annotations.
"""
from __future__ import annotations

from typing import Any, NamedTuple, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


class MeshPlan(NamedTuple):
    mesh: Mesh
    data_axis: str
    model_axis: str

    @property
    def data_parallelism(self) -> int:
        return self.mesh.shape[self.data_axis]

    @property
    def model_parallelism(self) -> int:
        return self.mesh.shape[self.model_axis]


def make_mesh(
    data_parallelism: Optional[int] = None,
    model_parallelism: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
    data_axis: str = "data",
    model_axis: str = "model",
) -> MeshPlan:
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data_parallelism is None:
        data_parallelism = n // model_parallelism
    if data_parallelism * model_parallelism != n:
        raise ValueError(
            f"{data_parallelism}x{model_parallelism} mesh needs "
            f"{data_parallelism * model_parallelism} devices, got {n}"
        )
    dev_array = np.asarray(devices).reshape(data_parallelism, model_parallelism)
    mesh = Mesh(dev_array, (data_axis, model_axis))
    return MeshPlan(mesh, data_axis, model_axis)


def replicated(plan: MeshPlan) -> NamedSharding:
    return NamedSharding(plan.mesh, P())


def _row_shardable(leaf, model_par: int, min_rows: int) -> bool:
    return (
        hasattr(leaf, "ndim")
        and leaf.ndim == 2
        and leaf.shape[0] >= min_rows
        and leaf.shape[0] % model_par == 0
    )


def params_sharding(plan: MeshPlan, params: Any, min_rows: int = 4096):
    """Row-shard every large [rows, dim] table over the model axis; replicate
    everything else.  With Adam, the moment pytrees mirror params and get the
    same treatment by shape, so sparse-row updates stay local to the shard
    owning the rows."""
    model_par = plan.model_parallelism

    def rule(leaf):
        if model_par > 1 and _row_shardable(leaf, model_par, min_rows):
            return NamedSharding(plan.mesh, P(plan.model_axis, None))
        return replicated(plan)

    return jax.tree_util.tree_map(rule, params)


def batch_sharding(plan: MeshPlan, batch: Any):
    """Shard every batch array on its leading (session) axis."""

    def rule(leaf):
        spec = [None] * leaf.ndim
        if leaf.ndim >= 1:
            spec[0] = plan.data_axis
        return NamedSharding(plan.mesh, P(*spec))

    return jax.tree_util.tree_map(rule, batch)


def state_sharding(plan: MeshPlan, state: Any, min_rows: int = 4096):
    """NARTrainState sharding: params/opt moments by params_sharding rules,
    stream state and rng replicated."""
    return params_sharding(plan, state, min_rows=min_rows)
