"""Device-resident streaming click state, threaded through the jitted step.

The reference keeps this state on the host as mutable numpy
(``ClickedItemsState``, nar_module/nar/clicked_items_state.py:10-256) and
round-trips it through placeholders/fetches on EVERY batch
(nar_model.py:1434-1470, 1636-1650).  Here it is an immutable pytree of
fixed-shape device arrays updated functionally inside the train step, so the
whole hot loop stays on the TPU.  "Checkpointing" the state around an eval
pass (clicked_items_state.py:49-79) is simply keeping the old pytree value.

Semantics preserved exactly (clicked_items_state.py:187-250):
  * buffer is newest-first (article_id, ts), compacted, zero-padded at the end;
  * entries older than ``recent_clicks_buffer_hours`` before the batch's
    minimum click timestamp are dropped, then the buffer is truncated to
    ``recent_clicks_buffer_max_size``;
  * recent popularity is recounted from the whole buffer each update and
    normalized as ``max(count / (total + 1), 1/recent_clicks_for_normalization)``;
  * global popularity accumulates per batch.

Timestamps are int32 seconds since the dataset epoch (see config.TIME_UNIT_MS).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import NARConfig, SECONDS_PER_HOUR


class StreamState(NamedTuple):
    """Immutable streaming-state pytree."""

    buffer_ids: jax.Array  # [buffer_size] int32, newest-first, 0-padded
    buffer_ts: jax.Array  # [buffer_size] int32 seconds
    recent_pop: jax.Array  # [num_items] int32 recent click counts
    recent_pop_norm: jax.Array  # [num_items] f32 normalized recent popularity
    global_pop: jax.Array  # [num_items] int32 all-time click counts
    current_step: jax.Array  # [] int32


def init_stream_state(cfg: NARConfig, num_items: int) -> StreamState:
    size = cfg.recent_clicks_buffer_max_size
    min_norm_pop = 1.0 / cfg.recent_clicks_for_normalization
    return StreamState(
        buffer_ids=jnp.zeros((size,), jnp.int32),
        buffer_ts=jnp.zeros((size,), jnp.int32),
        recent_pop=jnp.zeros((num_items,), jnp.int32),
        recent_pop_norm=jnp.full((num_items,), min_norm_pop, jnp.float32),
        global_pop=jnp.zeros((num_items,), jnp.int32),
        current_step=jnp.zeros((), jnp.int32),
    )


def _compact_front(ids: jax.Array, ts: jax.Array, valid: jax.Array):
    """Stably move valid entries to the front, zeroing the rest.

    A stable argsort on the boolean key works but lowers to a ~1 ms/step
    variadic sort of 25k elements at the G1 config; a stable partition is
    just a cumsum (each valid entry's destination = its rank among valids)
    plus a unique-index scatter of the valid entries into a zero buffer —
    invalid slots never need writing at all (device-trace: sort.3 1.0 ms →
    ~0.05 ms)."""
    n = ids.shape[0]
    dest = jnp.where(valid, jnp.cumsum(valid.astype(jnp.int32)) - 1, n)
    out_ids = jnp.zeros_like(ids).at[dest].set(
        ids, mode="drop", unique_indices=True)
    out_ts = jnp.zeros_like(ts).at[dest].set(
        ts, mode="drop", unique_indices=True)
    return out_ids, out_ts


def update_stream_state(
    state: StreamState,
    clicked_ids: jax.Array,
    clicked_ts: jax.Array,
    cfg: NARConfig,
) -> StreamState:
    """Functional twin of ClickedItemsState.update_items_state
    (clicked_items_state.py:187-250) with static shapes.

    Args:
      state: current StreamState.
      clicked_ids: int32 [B, L] all clicked item ids of the batch in click
        order, INCLUDING the final label column and padding zeros (the hook
        concatenates inputs with the last label, nar_model.py:1636-1646).
      clicked_ts: int32 [B, L] click timestamps (seconds); for the final label
        column the caller repeats the session's max timestamp.
    """
    ids_flat = clicked_ids.reshape(-1).astype(jnp.int32)
    ts_flat = clicked_ts.reshape(-1).astype(jnp.int32)
    valid = ids_flat != 0

    # Newest-first: the reference reverses the flattened batch so later clicks
    # come first (clicked_items_state.py:210-211).
    ids_rev = ids_flat[::-1]
    ts_rev = ts_flat[::-1]
    valid_rev = valid[::-1]

    # Minimum valid batch timestamp (host code filters zeros before np.min).
    big = jnp.iinfo(jnp.int32).max
    min_ts_batch = jnp.min(jnp.where(valid_rev, ts_rev, big))
    window = jnp.int32(round(cfg.recent_clicks_buffer_hours * SECONDS_PER_HOUR))
    threshold = min_ts_batch - window

    # Truncate old buffer entries outside the wall-clock window
    # (clicked_items_state.py:225-228).
    keep_old = (state.buffer_ids != 0) & (state.buffer_ts >= threshold)

    cat_ids = jnp.concatenate([ids_rev, state.buffer_ids])
    cat_ts = jnp.concatenate([ts_rev, state.buffer_ts])
    cat_valid = jnp.concatenate([valid_rev, keep_old])
    cat_ids, cat_ts = _compact_front(cat_ids, cat_ts, cat_valid)

    size = cfg.recent_clicks_buffer_max_size
    new_buffer_ids = cat_ids[:size]
    new_buffer_ts = cat_ts[:size]

    # Recount recent popularity from the whole buffer
    # (clicked_items_state.py:231-240): scatter-add of ones over item ids.
    num_items = state.recent_pop.shape[0]
    ones = (new_buffer_ids != 0).astype(jnp.int32)
    recent_pop = jnp.zeros((num_items,), jnp.int32).at[new_buffer_ids].add(
        ones, mode="drop"
    )
    # id 0 is padding: ensure its count never leaks into normalization totals.
    recent_pop = recent_pop.at[0].set(0)

    min_norm_pop = jnp.float32(1.0 / cfg.recent_clicks_for_normalization)
    total = jnp.sum(recent_pop).astype(jnp.float32)
    recent_pop_norm = jnp.maximum(
        recent_pop.astype(jnp.float32) / (total + 1.0), min_norm_pop
    )

    # Global popularity accumulates batch counts (clicked_items_state.py:248-250).
    batch_counts = jnp.zeros((num_items,), jnp.int32).at[ids_flat].add(
        valid.astype(jnp.int32), mode="drop"
    )
    batch_counts = batch_counts.at[0].set(0)
    global_pop = state.global_pop + batch_counts

    return StreamState(
        buffer_ids=new_buffer_ids,
        buffer_ts=new_buffer_ts,
        recent_pop=recent_pop,
        recent_pop_norm=recent_pop_norm,
        global_pop=global_pop,
        current_step=state.current_step + 1,
    )
