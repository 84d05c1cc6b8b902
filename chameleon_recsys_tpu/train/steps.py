"""Jitted NAR train / eval steps.

The reference crosses the Python↔runtime boundary twice per batch to inject
and harvest the streaming state (nar_model.py:1434-1470).  Here ONE pure
function owns the whole step — negative sampling, forward, loss, Adam update,
and the streaming-state transition — so XLA sees a single fused program and
the state never leaves the device:

    (state, batch) → (state', metrics)

Eval uses the same skeleton in a second jitted program (different sampling
sizes, ranking enabled, no parameter update) and additionally returns the
ranked candidate lists for the host-side streaming metric suite.
"""
from __future__ import annotations

from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from ..config import ArticleFeaturesSchema, NARConfig, SessionFeaturesSchema
from ..models.nar import NARAux, NARModel, NAROutputs, l2_regularization
from ..ops.sampling import sample_negatives_pooled, sample_negatives_pooled_rows
from ..state.stream_state import StreamState, init_stream_state, update_stream_state


class NARTrainState(NamedTuple):
    params: Any
    opt_state: Any
    stream: StreamState
    rng: jax.Array
    step: jax.Array


def valid_click_mask(session_size, t, xp=jnp):
    """[B] session sizes → [B, t] bool: step s is a (click → label) pair iff
    ``s < session_size - 1``.  THE loss-mask definition (models/nar.py) —
    the valid-row compaction (below) and any capacity sizing
    (bench.py, CLI users) must share it, or capacities silently drop
    clicks.  ``xp=np`` for host-side sizing."""
    seq_len = xp.asarray(session_size).astype(xp.int32) - 1
    return xp.arange(t)[None, :] < seq_len[:, None]


def round_up_to_scorer_tile(n: int, tile: int = 8) -> int:
    """Capacities must be a multiple of the fused scorer's row tile."""
    return -(-int(n) // tile) * tile


def _batch_all_clicks(batch) -> Tuple[jax.Array, jax.Array]:
    """All clicked ids/timestamps incl. the final label column.

    The final label's timestamp is unknown; the reference reuses the session's
    max click timestamp (nar_model.py:1641-1643).
    """
    all_clicked = jnp.concatenate(
        [batch["item_clicked"], batch["label_last_item"]], axis=1
    )
    ts = batch["event_timestamp"]
    last_ts = jnp.max(ts, axis=1, keepdims=True)
    all_ts = jnp.concatenate([ts, last_ts], axis=1)
    all_ts = jnp.where(all_clicked != 0, all_ts, 0)
    return all_clicked, all_ts


def device_ranking_metrics(
    predicted_ids: jax.Array,  # [B, T, 1+K] ranked desc
    labels: jax.Array,  # [B, T]
    loss_mask: jax.Array,  # [B, T]
    top_n: int,
) -> Dict[str, jax.Array]:
    """In-graph HR@N / MRR@N sums (reference nar_model.py:797-885), returned
    as (numerator, count) pairs for streaming accumulation."""
    topn_ids = predicted_ids[..., :top_n]
    hits = topn_ids == labels[..., None]  # [B, T, topn]
    hit = jnp.any(hits, axis=-1).astype(jnp.float32) * loss_mask
    first_pos = jnp.argmax(hits, axis=-1)
    rr = jnp.where(
        jnp.any(hits, axis=-1), 1.0 / (1.0 + first_pos.astype(jnp.float32)), 0.0
    )
    rr = rr * loss_mask
    count = jnp.sum(loss_mask)
    return {
        "hit_sum": jnp.sum(hit),
        "rr_sum": jnp.sum(rr),
        "label_count": count,
    }


class NARPrograms(NamedTuple):
    """Compiled step programs plus their un-jitted bodies (the raw functions
    are re-jitted with explicit shardings for multi-chip execution — see
    parallel/mesh.py and __graft_entry__.dryrun_multichip)."""

    model: Any
    optimizer: Any
    train_step: Any  # jitted
    eval_step: Any  # jitted
    train_step_fn: Any  # pure
    eval_step_fn: Any  # pure


def build_nar_train(
    cfg: NARConfig,
    session_schema: SessionFeaturesSchema,
    article_schema: ArticleFeaturesSchema,
    fetch_full_ranking: bool = True,
) -> NARPrograms:
    """``fetch_full_ranking=False`` slims the eval fetches to what the
    host metric tier consumes — ``predicted_ids[..., :metrics_top_n]`` and
    no ``predicted_probs`` — cutting device→host transfer ~2 MB/batch at the
    G1 config.  The full [B, T, 1+K] ranking (+ probs) is only needed for
    per-session recommendation logs (reference nar_model.py:1529-1581)."""
    model = NARModel(cfg, session_schema, article_schema)
    optimizer = optax.adam(cfg.learning_rate, b1=0.9, b2=0.999, eps=1e-8)

    def _forward_and_negatives(params, stream, batch, aux_consts, rng, *,
                               train, rank, k, m):
        ace_matrix, metadata = aux_consts
        aux = NARAux(
            ace_matrix=ace_matrix,
            metadata=metadata,
            recent_pop_norm=stream.recent_pop_norm,
            buffer_ids=stream.buffer_ids,
        )
        rng_neg, rng_drop = jax.random.split(rng)
        all_clicked, all_ts = _batch_all_clicks(batch)
        cap = cfg.train_valid_row_capacity if (train and not rank) else None
        if cap is not None:
            # Valid-row compaction (cfg.train_valid_row_capacity): partition
            # the flattened (session, step) grid valid-rows-first with a
            # cumsum (stable — no sort), take the first `cap` rows, and run
            # the sampler + scoring chain over those only.  Padded steps
            # (40-80%+ of the grid at real session-length distributions)
            # cost nothing in the K-fanned chain.
            item_clicked = batch["item_clicked"]
            b, t = item_clicked.shape
            groups = max(cfg.train_compaction_groups, 1)
            mask = valid_click_mask(batch["session_size"], t).reshape(-1)
            n_valid = jnp.sum(mask.astype(jnp.int32))
            if groups > 1:
                # per-group partition: every op stays within its group's
                # contiguous session block, so under a mesh (groups =
                # data_parallelism) the whole chain is shard-local
                if (b * t) % groups or cap % groups or b % groups:
                    raise ValueError(
                        "train_compaction_groups must divide batch_size "
                        "and train_valid_row_capacity"
                    )
                r = (b * t) // groups
                mask2 = mask.reshape(groups, r)
                mi = mask2.astype(jnp.int32)
                nv = jnp.sum(mi, axis=1, keepdims=True)
                dest = jnp.where(
                    mask2,
                    jnp.cumsum(mi, axis=1) - 1,
                    nv + jnp.cumsum(1 - mi, axis=1) - 1,
                )
                perm = jnp.zeros((groups, r), jnp.int32).at[
                    jnp.arange(groups)[:, None], dest
                ].set(
                    jnp.broadcast_to(
                        jnp.arange(r, dtype=jnp.int32)[None, :], (groups, r)
                    ),
                    unique_indices=True,
                )
                rows_local = perm[:, : cap // groups]
                row_mask = jnp.take_along_axis(
                    mask2, rows_local, axis=1
                ).reshape(-1).astype(jnp.float32)
                row_click = jnp.take_along_axis(
                    item_clicked.reshape(groups, r), rows_local, axis=1
                ).reshape(-1)
                rows_sel = (
                    rows_local
                    + jnp.arange(groups, dtype=jnp.int32)[:, None] * r
                ).reshape(-1)
            else:
                mi = mask.astype(jnp.int32)
                dest = jnp.where(
                    mask, jnp.cumsum(mi) - 1, n_valid + jnp.cumsum(1 - mi) - 1
                )
                perm = jnp.zeros((b * t,), jnp.int32).at[dest].set(
                    jnp.arange(b * t, dtype=jnp.int32), unique_indices=True
                )
                rows_sel = perm[:cap]
                row_mask = mask[rows_sel].astype(jnp.float32)
                row_click = item_clicked.reshape(-1)[rows_sel]
            pool, neg_idx, neg_ids = sample_negatives_pooled_rows(
                rng_neg,
                all_clicked,
                stream.buffer_ids,
                rows_sel // t,
                row_click,
                num_negatives=k,
                buffer_sample_size=m,
                mult=cfg.neg_sampling_multiplying_factor,
                approx_topk=cfg.approx_negative_topk,
                groups=groups,
            )
            out = model.apply(
                {"params": params},
                batch,
                aux,
                neg_ids,
                train=train,
                rank=rank,
                neg_pool=pool,
                neg_pool_idx=neg_idx,
                scoring_rows=(rows_sel, row_mask),
                scoring_groups=groups,
                rngs={"dropout": rng_drop} if train else {},
            )
            # overflow accounting: valid clicks that did not fit in `cap`
            # are excluded from this step's gradient — surface them
            dropped = (n_valid - jnp.sum(row_mask)).astype(jnp.float32)
            return out, (all_clicked, all_ts), dropped
        pool, neg_idx, neg_ids = sample_negatives_pooled(
            rng_neg,
            all_clicked,
            stream.buffer_ids,
            num_negatives=k,
            buffer_sample_size=m,
            mult=cfg.neg_sampling_multiplying_factor,
            approx_topk=cfg.approx_negative_topk,
        )
        neg_idx = neg_idx[:, :-1, :]
        neg_ids = neg_ids[:, :-1, :]
        out = model.apply(
            {"params": params},
            batch,
            aux,
            neg_ids,
            train=train,
            rank=rank,
            neg_pool=pool,
            neg_pool_idx=neg_idx,
            rngs={"dropout": rng_drop} if train else {},
        )
        return out, (all_clicked, all_ts), jnp.zeros(())

    def _split_state_rng(raw):
        """NARTrainState.rng is raw key DATA (a plain uint32 array — keeps
        checkpoints/donation/shardings dtype-simple); wrap it as a typed key
        of cfg.rng_impl so every downstream split/uniform uses that PRNG."""
        key = jax.random.wrap_key_data(raw, impl=cfg.rng_impl)
        rng, step_rng = jax.random.split(key)
        return jax.random.key_data(rng), step_rng

    def train_step_fn(state: NARTrainState, batch, ace_matrix, metadata):
        rng, step_rng = _split_state_rng(state.rng)

        def loss_fn(params):
            out, clicks, dropped = _forward_and_negatives(
                params, state.stream, batch, (ace_matrix, metadata), step_rng,
                train=True, rank=False,
                k=cfg.negative_samples, m=cfg.negative_sample_from_buffer,
            )
            reg = l2_regularization(params, cfg.reg_weight_decay)
            total = out.ce_loss + reg - out.nov_reg_loss
            return total, (out, clicks, reg, dropped)

        (total_loss, (out, (all_clicked, all_ts), reg, dropped)), grads = (
            jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        )
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        stream = update_stream_state(state.stream, all_clicked, all_ts, cfg)

        metrics = {
            "loss": total_loss,
            "ce_loss": out.ce_loss,
            "reg_loss": reg,
            "sessions": jnp.sum(batch["session_size"] > 0),
            "clicks": jnp.sum(out.loss_mask),
        }
        if cfg.train_valid_row_capacity is not None:
            metrics["dropped_clicks"] = dropped
        return (
            NARTrainState(params, opt_state, stream, rng, state.step + 1),
            metrics,
        )

    def eval_step_fn(state: NARTrainState, batch, ace_matrix, metadata):
        """Eval updates the stream state too (the temporal protocol trains
        baselines/popularity through the eval hour, then the harness restores
        the pre-eval snapshot — reference nar_model.py:1410-1415, 1691-1693)."""
        rng, step_rng = _split_state_rng(state.rng)
        out, (all_clicked, all_ts), _ = _forward_and_negatives(
            state.params, state.stream, batch, (ace_matrix, metadata), step_rng,
            train=False, rank=True,
            k=cfg.eval_negative_samples, m=cfg.eval_negative_sample_from_buffer,
        )
        dev_metrics = device_ranking_metrics(
            out.predicted_ids, batch["label_next_item"], out.loss_mask,
            cfg.metrics_top_n,
        )
        dev_metrics["ce_loss"] = out.ce_loss
        dev_metrics["clicks"] = jnp.sum(out.loss_mask)
        dev_metrics["sessions"] = jnp.sum(batch["session_size"] > 0)
        fetches = {
            "labels": batch["label_next_item"],
            "neg_items": out.candidate_ids[..., 1:],
            "clicked_items": batch["item_clicked"],
        }
        if fetch_full_ranking:
            fetches["predicted_ids"] = out.predicted_ids
            fetches["predicted_probs"] = out.predicted_probs
        else:
            fetches["predicted_ids"] = (
                out.predicted_ids[..., : cfg.metrics_top_n]
            )
        new_state = NARTrainState(
            state.params,
            state.opt_state,
            update_stream_state(state.stream, all_clicked, all_ts, cfg),
            rng,
            state.step + 1,
        )
        return new_state, dev_metrics, fetches

    train_step = jax.jit(train_step_fn, donate_argnums=(0,))
    eval_step = jax.jit(eval_step_fn, donate_argnums=(0,))
    return NARPrograms(
        model, optimizer, train_step, eval_step, train_step_fn, eval_step_fn
    )


def nar_init_state(
    cfg: NARConfig,
    session_schema: SessionFeaturesSchema,
    article_schema: ArticleFeaturesSchema,
    example_batch,
    ace_matrix,
    metadata,
    seed: int = 42,
) -> Tuple[NARModel, Any, NARTrainState]:
    programs = build_nar_train(cfg, session_schema, article_schema)
    model, optimizer = programs.model, programs.optimizer
    # typed key of cfg.rng_impl; the state carries raw key DATA (see
    # _split_state_rng in build_nar_train)
    rng = jax.random.key(seed, impl=cfg.rng_impl)
    rng, init_rng = jax.random.split(rng)
    stream = init_stream_state(cfg, article_schema.num_items)
    aux = NARAux(
        ace_matrix=ace_matrix,
        metadata=metadata,
        recent_pop_norm=stream.recent_pop_norm,
        buffer_ids=stream.buffer_ids,
    )
    t = cfg.max_inputs_length
    neg = jnp.zeros(
        (example_batch["item_clicked"].shape[0], t, cfg.negative_samples),
        jnp.int32,
    )
    variables = model.init(
        {"params": init_rng, "dropout": init_rng},
        example_batch,
        aux,
        neg,
        train=False,
    )
    params = variables["params"]
    opt_state = optimizer.init(params)
    state = NARTrainState(
        params,
        opt_state,
        stream,
        jax.random.key_data(rng),
        jnp.zeros((), jnp.int32),
    )
    return model, optimizer, state
