"""Embedding/table gather ops tuned for the TPU backward path.

``pool_gather`` is a row gather whose VJP accumulates gradients with a
one-hot matmul on the MXU instead of XLA's serialized scatter-add: profiling
the G1-scale train step showed the default scatter into the ~1k-row
candidate pool costing ~6 ms/step (a kCustom scatter over 243k update rows),
while the equivalent ``one_hotᵀ · g`` contraction runs at matmul throughput.
Only sensible for SMALL tables (the one-hot is [N, rows]); large tables
(item embeddings over the full catalog) keep XLA's scatter.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.custom_vjp
def pool_gather(table: jax.Array, idx: jax.Array) -> jax.Array:
    """table [R, C], idx [...] int → [..., C]."""
    return table[idx]


def _pool_gather_fwd(table, idx):
    return table[idx], (table, idx)


def _pool_gather_bwd(res, g):
    table, idx = res
    # contract ALL leading dims of (one_hot(idx), g) in one dot_general —
    # an explicit reshape(-1, C) here forces a [N, C]{1,0} relayout of the
    # [B, T, K, C] cotangent (~3 ms/step of pure copies at G1 scale); the
    # multi-dim contraction lets XLA keep the incoming tiled layout
    onehot = jax.nn.one_hot(idx, table.shape[0], dtype=g.dtype)
    lead = tuple(range(g.ndim - 1))
    d_table = jax.lax.dot_general(
        onehot, g, dimension_numbers=((lead, lead), ((), ()))
    ).astype(table.dtype)
    return d_table, None


pool_gather.defvjp(_pool_gather_fwd, _pool_gather_bwd)
