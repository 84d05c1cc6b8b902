"""NAR — Next-Article Recommendation model, TPU-native.

Functional re-design of the reference's ``NARModuleModel`` TF1 graph
(nar_module/nar/nar_model.py:100-728).  One forward pass:

  user-context towers ‖ item features (metadata towers + frozen ACE + trainable
  item embedding + dynamic recency/novelty vs buffer stats)
    → learned elementwise scale/center (γ·x+β) → dropout
    → shared PreCAR Dense(leaky_relu) → CAR Dense(tanh)    [input/pos/neg]
    → stacked UGRNN over the session → FC1(512, leaky_relu) → FC2(CAR, tanh)
    → matching MLP 128→64→32→1 on (predicted ⊙ candidate)
    → temperature softmax over [1 positive ‖ K negatives]
    → masked XE loss (+ L2 reg, + optional novelty regularization)

Differences from the reference are architectural, not semantic: the frozen
ACE matrix, article metadata, and popularity/buffer state arrive as device
arrays threaded through the step (not feed_dict placeholders), all shapes are
static, and the candidate-scoring tensor [B, T, 1+K, D] is laid out for MXU
matmuls in the configured compute dtype.
"""
from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config import (
    ArticleFeaturesSchema,
    NARConfig,
    SECONDS_PER_DAY,
    SessionFeaturesSchema,
    embedding_dim_for_cardinality,
)
from ..ops.embedding import pool_gather
from ..ops.pallas.cand_scorer import _BT_TILE as _SCORER_BT_TILE
from ..ops.pallas.cand_scorer import cand_score_pallas
from ..ops.normalization import log1p_base, log_base, normalize_values
from ..ops.rnn import StackedUGRNN
from .towers import FeatureTowers

_he_init = nn.initializers.variance_scaling(2.0, "fan_in", "truncated_normal")
# tf.nn.leaky_relu's default alpha (the reference never overrides it); JAX's
# nn.leaky_relu defaults to 0.01, which would silently change the activation
_LEAKY_ALPHA = 0.2
_lecun_uniform = nn.initializers.variance_scaling(1.0, "fan_in", "uniform")


class NARAux(NamedTuple):
    """Non-trainable device inputs to the forward pass (the reference feeds
    these via placeholders every batch, nar_model.py:1458-1467)."""

    ace_matrix: jax.Array  # [num_items, ace_dim] frozen content embeddings
    metadata: Dict[str, jax.Array]  # per-article metadata columns [num_items]
    recent_pop_norm: jax.Array  # [num_items] f32
    buffer_ids: jax.Array  # [buffer_size] int32 newest-first


class NAROutputs(NamedTuple):
    items_prob: jax.Array  # [B, T, 1+K]
    candidate_ids: jax.Array  # [B, T, 1+K] (positive first)
    loss_mask: jax.Array  # [B, T] f32
    ce_loss: jax.Array  # scalar
    nov_reg_loss: jax.Array  # scalar (0 when disabled)
    predicted_ids: Optional[jax.Array]  # [B, T, 1+K] ranked by prob desc
    predicted_probs: Optional[jax.Array]  # [B, T, 1+K] sorted probs


class NARModel(nn.Module):
    cfg: NARConfig
    session_schema: SessionFeaturesSchema
    article_schema: ArticleFeaturesSchema

    def _dtype(self):
        return jnp.bfloat16 if self.cfg.compute_dtype == "bfloat16" else jnp.float32

    # -- dynamic features ---------------------------------------------------
    def _buffer_stat_ids(self, aux: NARAux) -> Tuple[jax.Array, jax.Array]:
        """First ``recent_clicks_for_normalization`` buffer entries + mask
        (reference get_last_items_from_recent_clicks_buffer,
        nar_model.py:1041-1044; the buffer is compacted so a prefix slice
        equals 'first N non-zero')."""
        n = self.cfg.recent_clicks_for_normalization
        ids = aux.buffer_ids[:n]
        return ids, ids != 0

    def _recency_feature(self, item_ids, ref_ts, aux: NARAux):
        """Normalized elapsed-days-since-publishing
        (reference nar_model.py:1055-1131).  ``ref_ts`` broadcasts against
        ``item_ids``; output gains a trailing channel axis."""
        cfg = self.cfg
        created = aux.metadata["created_at_ts"][item_ids]
        elapsed_days = jax.nn.relu(
            (ref_ts.astype(jnp.float32) - created.astype(jnp.float32))
            / SECONDS_PER_DAY
        )
        smoothed = log1p_base(elapsed_days, cfg.elapsed_days_smooth_log_base)

        stat_ids, stat_mask = self._buffer_stat_ids(aux)
        stat_created = aux.metadata["created_at_ts"][stat_ids]
        max_batch_ts = jnp.max(ref_ts).astype(jnp.float32)
        stat_elapsed = jax.nn.relu(
            (max_batch_ts - stat_created.astype(jnp.float32)) / SECONDS_PER_DAY
        )
        stat_smoothed = log1p_base(stat_elapsed, cfg.elapsed_days_smooth_log_base)

        # First-batch fallback: when the buffer is empty, stats come from the
        # batch itself (reference tf.cond, nar_model.py:1080-1084).  Encoded
        # with fixed shapes by concatenating both candidate stat sources and
        # masking exactly one of them in.
        buffer_empty = ~jnp.any(stat_mask)
        batch_vals = smoothed.reshape(-1)
        batch_mask = (item_ids != 0).reshape(-1) & buffer_empty
        stats_values = jnp.concatenate([stat_smoothed, batch_vals])
        stats_mask = jnp.concatenate([stat_mask, batch_mask])

        normed = normalize_values(smoothed, stats_values, stats_mask)
        return normed[..., None]

    def _novelty_feature(self, item_ids, aux: NARAux):
        """Standardized popularity novelty −log₂(pop_norm)
        (reference nar_model.py:1147-1193)."""
        cfg = self.cfg
        norm_pop = aux.recent_pop_norm[item_ids]
        novelty = -log_base(norm_pop, cfg.popularity_smooth_log_base)

        stat_ids, stat_mask = self._buffer_stat_ids(aux)
        stat_novelty = -log_base(
            aux.recent_pop_norm[stat_ids], cfg.popularity_smooth_log_base
        )

        buffer_empty = ~jnp.any(stat_mask)
        batch_vals = novelty.reshape(-1)
        batch_mask = (item_ids != 0).reshape(-1) & buffer_empty
        stats_values = jnp.concatenate([stat_novelty, batch_vals])
        stats_mask = jnp.concatenate([stat_mask, batch_mask])

        normed = normalize_values(novelty, stats_values, stats_mask)
        return normed[..., None]

    # -- item feature assembly ---------------------------------------------
    def _make_item_features_fn(self, aux: NARAux):
        """Build the shared get_item_features closure
        (reference nar_model.py:921-994).  The metadata towers and trainable
        item-embedding table are created ONCE and shared across the
        input / positive / negative calls, matching the reference's
        AUTO_REUSE variable scoping (nar_model.py:913, 1199)."""
        cfg = self.cfg
        dtype = self._dtype()

        metadata_specs = self.article_schema.metadata_features()
        metadata_towers = (
            FeatureTowers(
                metadata_specs,
                cfg.max_cardinality_for_ohe,
                dtype=dtype,
                name="article_metadata_towers",
            )
            if metadata_specs
            else None
        )
        item_embed = None
        if cfg.internal_features.item_clicked_embeddings:
            num_items = self.article_schema.num_items
            item_embed = nn.Embed(
                num_embeddings=num_items,
                features=embedding_dim_for_cardinality(
                    num_items, cfg.item_embedding_const_mult
                ),
                embedding_init=nn.initializers.glorot_uniform(),
                dtype=dtype,
                name="item_clicked_embedding",
            )

        def shared_item_feats(item_ids):
            """Param-bearing, element-wise features (metadata towers, ACE,
            trainable id embedding).  Callable ONCE on the concatenation of
            every id set used in a step: each shared parameter then has a
            single partial-gradient producer, so GSPMD emits ONE data-axis
            all-reduce per parameter instead of one per use (round-4
            COLLECTIVES.json showed the fused gradient tuple carrying ~2x
            the parameter bytes for exactly this reason)."""
            feats = []
            if metadata_towers is not None:
                gathered = {
                    spec.name: aux.metadata[spec.name][item_ids]
                    for spec in metadata_specs
                }
                feats.append(metadata_towers(gathered))
            if cfg.internal_features.article_content_embeddings:
                feats.append(aux.ace_matrix[item_ids].astype(dtype))
            if item_embed is not None:
                feats.append(item_embed(item_ids))
            return feats

        def dynamic_item_feats(item_ids, ref_ts):
            """Param-free per-use features (recency/novelty) — keeping these
            per call preserves the reference's buffer-empty fallback stats,
            which are computed over each call's own id multiset."""
            feats = []
            if cfg.internal_features.recency:
                feats.append(
                    self._recency_feature(item_ids, ref_ts, aux).astype(dtype)
                )
            if cfg.internal_features.novelty:
                feats.append(self._novelty_feature(item_ids, aux).astype(dtype))
            return feats

        def item_features(item_ids, ref_ts):
            feats = shared_item_feats(item_ids) + dynamic_item_feats(
                item_ids, ref_ts
            )
            return jnp.concatenate(feats, axis=-1)

        return item_features, shared_item_feats, dynamic_item_feats

    # -- forward ------------------------------------------------------------
    @nn.compact
    def __call__(
        self,
        batch: Dict[str, jax.Array],
        aux: NARAux,
        neg_items: jax.Array,  # [B, T, K] (or [B, 1, K] w/ candidate_positions)
        *,
        train: bool,
        rank: bool = False,
        neg_pool: Optional[jax.Array] = None,  # [NC+1] shared candidate pool
        neg_pool_idx: Optional[jax.Array] = None,  # [B, T, K] into neg_pool
        candidate_positions: Optional[jax.Array] = None,  # [B] serve: score
        # candidates at ONE position per session instead of every timestep
        scoring_rows: Optional[Tuple[jax.Array, jax.Array]] = None,
        # Train-time valid-row compaction: (row_sel int32 [M] flat indices
        # into B*T, row_mask f32 [M]).  The candidate-scoring chain — the
        # sampler's per-click work, pool gather, CAR/matching scoring and
        # the loss — runs over the M selected (session, step) rows instead
        # of the full B*T grid; padded steps (40-80%+ of the grid at real
        # session-length distributions) cost nothing.  neg_items /
        # neg_pool_idx must then be [M, K] (sample_negatives_pooled_rows).
        # Towers/RNN still run [B, T] (they are ~B*T-row matmuls, two
        # orders of magnitude cheaper than the K-fanned chain).  Requires
        # rank=False and no candidate_positions.
        scoring_groups: int = 1,
        # >1: row_sel is grouped — rows_sel.reshape(groups, M/groups)[g]
        # selects only from group g's contiguous slice of the flat grid
        # (one group per data shard).  Row gathers then run as BATCHED
        # take_along_axis over [groups, B*T/groups, ...], which the SPMD
        # partitioner keeps local to each shard (train/steps.py builds the
        # grouped partition when a mesh is active).
    ) -> NAROutputs:
        cfg = self.cfg
        dtype = self._dtype()

        item_clicked = batch["item_clicked"]  # [B, T]
        next_item_label = batch["label_next_item"]  # [B, T]
        b, t = item_clicked.shape
        k = neg_items.shape[-1]

        seq_lengths = batch["session_size"].astype(jnp.int32) - 1
        mask = jnp.arange(t)[None, :] < seq_lengths[:, None]  # [B, T]
        loss_mask = mask.astype(jnp.float32)

        event_ts = batch["event_timestamp"]  # [B, T] int32 seconds
        max_event_ts = jnp.max(event_ts)

        # ---- user context towers (nar_model.py:314-325) ----
        ctx_specs = self.session_schema.context_sequence_features()
        if ctx_specs:
            user_ctx = FeatureTowers(
                ctx_specs,
                cfg.max_cardinality_for_ohe,
                dtype=dtype,
                name="user_context_towers",
            )({s.name: batch[s.name] for s in ctx_specs})
        else:
            user_ctx = jnp.zeros((b, t, 1), dtype)

        # ---- shared scale/center + dropout (nar_model.py:887-907, 332-370) ----
        # γ/β are created on first use and shared across the input / positive /
        # negative calls (reference AUTO_REUSE scope, nar_model.py:890).
        _sc_params = {}

        def scale_center(x):
            if not _sc_params:
                feat_dim = x.shape[-1]
                _sc_params["gamma"] = self.param(
                    "gamma_scale", nn.initializers.ones, (feat_dim,), jnp.float32
                )
                _sc_params["beta"] = self.param(
                    "beta_center", nn.initializers.zeros, (feat_dim,), jnp.float32
                )
            gamma = _sc_params["gamma"].astype(x.dtype)
            beta = _sc_params["beta"].astype(x.dtype)
            return x * gamma + beta

        dropout = nn.Dropout(rate=1.0 - cfg.keep_prob)
        item_features, shared_item_feats, dynamic_item_feats = (
            self._make_item_features_fn(aux)
        )

        # Pooled scoring is decided here (used again below): every negative
        # comes from the shared candidate pool, exact when feature dropout
        # is inactive (the reproduction configs run keep_prob=1.0).
        pooled = neg_pool is not None and (not train or cfg.keep_prob >= 1.0)

        # ---- item features, ONE shared-parameter pass ----
        # The step uses item features at three places (clicked sequence,
        # positive labels, candidate pool).  Computing the param-bearing
        # features over the concatenated id vector gives every shared
        # parameter a single partial-gradient producer, which under a data
        # mesh halves the gradient all-reduce payload (PERFORMANCE.md
        # §collectives; round-4 accounting measured 70.5 MB vs 34.6 MB of
        # parameters because each use produced its own all-reduce).
        flat_in = item_clicked.reshape(-1)
        flat_pos = next_item_label.reshape(-1)
        bt = flat_in.shape[0]
        # The candidate POOL gather stays a separate call: merging its ids
        # into this one entangles the pool-row chain's sharding with the
        # batch chain under a (data x model) mesh and GSPMD then reduces
        # [rows, K, CAR]-sized activation gradients across the model axis
        # (measured: 52 MB/step at the G1 4x2 config vs 5 MB for the
        # separate-call layout).
        ids_all = jnp.concatenate([flat_in, flat_pos])
        shared_all = shared_item_feats(ids_all)
        shared_all = (
            jnp.concatenate(shared_all, axis=-1) if shared_all else None
        )

        def shared_slice(lo, hi, shape):
            if shared_all is None:
                return []
            return [shared_all[lo:hi].reshape(shape + (shared_all.shape[-1],))]

        input_item_feats = jnp.concatenate(
            shared_slice(0, bt, (b, t))
            + dynamic_item_feats(item_clicked, event_ts),
            axis=-1,
        )
        pos_item_feats = jnp.concatenate(
            shared_slice(bt, 2 * bt, (b, t))
            + dynamic_item_feats(next_item_label, max_event_ts),
            axis=-1,
        )

        # ---- input/positive towers in ONE stacked pass (same motivation:
        # one partial gradient per γ/β, PreCAR and CAR parameter) ----
        stacked_feats = scale_center(
            jnp.stack(
                [
                    jnp.concatenate([user_ctx, input_item_feats], -1),
                    jnp.concatenate([user_ctx, pos_item_feats], -1),
                ]
            )
        )
        stacked_feats = dropout(stacked_feats, deterministic=not train)
        input_feats, pos_feats = stacked_feats[0], stacked_feats[1]

        # ---- shared CAR towers (nar_model.py:374-405) ----
        # Explicit kernels (not nn.Dense) so the pooled negative path below
        # can split the PreCAR projection into user/item halves.
        feat_dim = input_feats.shape[-1]
        user_dim = user_ctx.shape[-1]
        c = cfg.car_embedding_size
        pre_kernel = self.param(
            "PreCAR_kernel", _he_init, (feat_dim, c), jnp.float32
        ).astype(dtype)
        pre_bias = self.param(
            "PreCAR_bias", nn.initializers.zeros, (c,), jnp.float32
        ).astype(dtype)
        car_kernel = self.param(
            "CAR_kernel", nn.initializers.glorot_uniform(), (c, c), jnp.float32
        ).astype(dtype)
        car_bias = self.param(
            "CAR_bias", nn.initializers.zeros, (c,), jnp.float32
        ).astype(dtype)

        def car_tower(x):
            pre = nn.leaky_relu(x @ pre_kernel + pre_bias,
                                negative_slope=_LEAKY_ALPHA)
            return jnp.tanh(pre @ car_kernel + car_bias)

        stacked_car = car_tower(stacked_feats)  # [2, B, T, C]
        input_car, pos_car = stacked_car[0], stacked_car[1]

        # Serving fast path: score candidates at ONE position per session
        # (the next-click prediction point) instead of broadcasting the same
        # candidate set across every timestep and discarding T−1 of the work.
        flat_rows = scoring_rows is not None
        if flat_rows:
            if rank or candidate_positions is not None:
                raise ValueError(
                    "scoring_rows supports the train path only "
                    "(rank=False, no candidate_positions)"
                )
            rows_sel, row_mask = scoring_rows
            m_rows = rows_sel.shape[0]
            if scoring_groups > 1:
                # group-local indices for batched (shard-local) gathers
                rows_per_group = (b * t) // scoring_groups
                _rows_local = (
                    rows_sel.reshape(scoring_groups, -1)
                    - jnp.arange(scoring_groups, dtype=rows_sel.dtype)[:, None]
                    * rows_per_group
                )

            def gather_rows(x):
                """[B, T, ...] → [M, ...] rows of the flattened grid."""
                feat = x.shape[2:]
                if scoring_groups == 1:
                    return x.reshape((b * t,) + feat)[rows_sel]
                xg = x.reshape((scoring_groups, rows_per_group) + feat)
                idx = _rows_local.reshape(
                    (scoring_groups, -1) + (1,) * len(feat)
                )
                out = jnp.take_along_axis(xg, idx, axis=1)
                return out.reshape((m_rows,) + feat)
        if candidate_positions is not None:
            pos_idx = candidate_positions.astype(jnp.int32)[:, None]  # [B,1]
            ctx_for_neg = jnp.take_along_axis(
                user_ctx, pos_idx[..., None], axis=1
            )  # [B, 1, F_u]
            t_neg = 1
        elif flat_rows:
            # compacted: [M, F_u] rows of the flattened (B*T) grid
            ctx_for_neg = gather_rows(user_ctx)
            t_neg = None
        else:
            ctx_for_neg = user_ctx
            t_neg = t

        if pooled:
            # Pooled scoring: every negative comes from the shared candidate
            # pool, so per-item features and the item half of the PreCAR
            # projection run once per POOL row ([NC+1, ...]) instead of per
            # (session, click, k) ([B, T, K, ...]).  Exact whenever feature
            # dropout is inactive (the G1 reproduction config has
            # keep_prob=1.0); with dropout the dense path below is used.
            pool_feats = item_features(neg_pool, max_event_ts)  # [NC+1, F_i]
            gamma = _sc_params["gamma"].astype(dtype)
            beta = _sc_params["beta"].astype(dtype)
            u_pre = (ctx_for_neg * gamma[:user_dim]) @ pre_kernel[:user_dim]
            i_pre = (pool_feats * gamma[user_dim:]) @ pre_kernel[user_dim:]
            const = beta @ pre_kernel + pre_bias
            # pool_gather's VJP turns the gradient scatter into an MXU
            # matmul (profiled: 6 ms scatter → 1.4 ms contraction).
            # Exactness caveat: on buffer-EMPTY steps (the very first batch)
            # the recency/novelty fallback stats are computed over the pool's
            # 1000 sampled slots rather than the [B,T,K] per-click multiset
            # the dense path sees — both popularity-weighted, slightly
            # different weighting for that one cold-start step.
            n_score_rows = m_rows if flat_rows else b * t_neg
            fused_scorer = (
                cfg.use_pallas_scorer
                and len(cfg.matching_layer_sizes) == 3
                and n_score_rows % _SCORER_BT_TILE == 0
            )
            if fused_scorer:
                neg_car = None  # scored after predicted_emb, in one kernel
            elif flat_rows:
                i_rows = pool_gather(i_pre, neg_pool_idx)  # [M, K, C]
                pre_neg = nn.leaky_relu(
                    u_pre[:, None, :] + i_rows + const,
                    negative_slope=_LEAKY_ALPHA,
                )
                neg_car = jnp.tanh(pre_neg @ car_kernel + car_bias)
            else:
                i_rows = pool_gather(i_pre, neg_pool_idx)  # [B, T_neg, K, C]
                pre_neg = nn.leaky_relu(
                    u_pre[:, :, None, :] + i_rows + const,
                    negative_slope=_LEAKY_ALPHA,
                )
                neg_car = jnp.tanh(pre_neg @ car_kernel + car_bias)
        else:
            fused_scorer = False
            neg_item_feats = item_features(neg_items, max_event_ts)
            if flat_rows:
                user_ctx_tiled = jnp.broadcast_to(
                    ctx_for_neg[:, None, :],
                    (m_rows, k, ctx_for_neg.shape[-1]),
                )
            else:
                user_ctx_tiled = jnp.broadcast_to(
                    ctx_for_neg[:, :, None, :],
                    (b, t_neg, k, ctx_for_neg.shape[-1]),
                )
            neg_feats = scale_center(
                jnp.concatenate([user_ctx_tiled, neg_item_feats], -1)
            )
            neg_feats = dropout(neg_feats, deterministic=not train)
            neg_car = car_tower(neg_feats)  # [B, T_neg, K, C] / [M, K, C]

        # ---- session encoder (nar_model.py:407-438) ----
        rnn_out = StackedUGRNN(
            cfg.rnn_units,
            cfg.rnn_num_layers,
            keep_prob=cfg.keep_prob,
            dtype=dtype,
            use_pallas=cfg.use_pallas_rnn,
            name="rnn",
        )(input_car, mask, deterministic=not train)

        fc1 = nn.Dense(512, kernel_init=_he_init, dtype=dtype, name="session_FC1")
        fc2 = nn.Dense(
            cfg.car_embedding_size,
            kernel_init=nn.initializers.glorot_uniform(),
            dtype=dtype,
            name="session_FC2",
        )
        h = nn.leaky_relu(fc1(rnn_out), negative_slope=_LEAKY_ALPHA)
        h = dropout(h, deterministic=not train)
        predicted_emb = jnp.tanh(fc2(h))  # [B, T, C]

        # ---- matching MLP over elementwise products (nar_model.py:444-505) ----
        # Explicit kernels (not nn.Dense) so the fused Pallas scorer below can
        # consume the same weight arrays as the positive-score closure.
        m_kernels, m_biases = [], []
        m_in = c
        for i, u in enumerate(cfg.matching_layer_sizes):
            m_kernels.append(self.param(
                f"matching_{i+1}_kernel", _he_init, (m_in, u), jnp.float32
            ).astype(dtype))
            m_biases.append(self.param(
                f"matching_{i+1}_bias", nn.initializers.zeros, (u,), jnp.float32
            ).astype(dtype))
            m_in = u
        mo_kernel = self.param(
            "matching_out_kernel", _lecun_uniform, (m_in, 1), jnp.float32
        ).astype(dtype)
        mo_bias = self.param(
            "matching_out_bias", nn.initializers.zeros, (1,), jnp.float32
        ).astype(dtype)

        def match_score(x):
            for kern, bias in zip(m_kernels, m_biases):
                x = nn.leaky_relu(x @ kern + bias,
                                  negative_slope=_LEAKY_ALPHA)
            return (x @ mo_kernel + mo_bias)[..., 0]

        if candidate_positions is not None:
            pred_for_neg = jnp.take_along_axis(
                predicted_emb, pos_idx[..., None], axis=1
            )  # [B, 1, C]
            pos_for_neg = jnp.take_along_axis(
                pos_car, pos_idx[..., None], axis=1
            )
        elif flat_rows:
            pred_for_neg = gather_rows(predicted_emb)  # [M, C]
            pos_for_neg = gather_rows(pos_car)
        else:
            pred_for_neg = predicted_emb
            pos_for_neg = pos_car

        # [B, T_neg] (grid) / [M] (compacted).  In the non-fused paths the
        # positive rides the candidate axis so the matching MLP runs (and
        # back-propagates) ONCE — one partial gradient per matching kernel.
        if fused_scorer:
            pos_score = match_score(pos_for_neg * pred_for_neg)
        if fused_scorer:
            # One Pallas program for gatherd-row PreCAR + CAR + matching MLP:
            # nothing [rows, K, C]-shaped ever reaches HBM
            # (ops/pallas/cand_scorer.py).
            i_rows_flat = pool_gather(
                i_pre, neg_pool_idx.reshape(-1)
            )  # [rows*K, C]
            neg_score = cand_score_pallas(
                i_rows_flat,
                (u_pre + const).reshape(n_score_rows, c),
                pred_for_neg.reshape(n_score_rows, c),
                car_kernel, car_bias,
                m_kernels[0], m_biases[0],
                m_kernels[1], m_biases[1],
                m_kernels[2], m_biases[2],
                mo_kernel[:, 0],
                _LEAKY_ALPHA,
                jax.default_backend() != "tpu",  # interpret off-TPU
            ) + mo_bias[0].astype(jnp.float32)
            neg_score = (
                neg_score if flat_rows else neg_score.reshape(b, t_neg, k)
            )
        elif flat_rows:
            cand_car = jnp.concatenate(
                [pos_for_neg[:, None, :], neg_car], axis=1
            )  # [M, 1+K, C]
            all_scores = match_score(
                cand_car * pred_for_neg[:, None, :]
            )  # [M, 1+K]
            pos_score, neg_score = all_scores[..., 0], all_scores[..., 1:]
        else:
            cand_car = jnp.concatenate(
                [pos_for_neg[:, :, None, :], neg_car], axis=2
            )  # [B, T_neg, 1+K, C]
            all_scores = match_score(
                cand_car * pred_for_neg[:, :, None, :]
            )  # [B, T_neg, 1+K]
            pos_score, neg_score = all_scores[..., 0], all_scores[..., 1:]

        scores = jnp.concatenate([pos_score[..., None], neg_score], axis=-1)
        scores = scores.astype(jnp.float32) / cfg.softmax_temperature
        items_prob = jax.nn.softmax(scores, axis=-1)  # [.., 1+K]

        # ---- masked XE loss (nar_model.py:639-667) ----
        # Compacted: the sum runs over the selected rows' mask; the denom is
        # the full batch's valid-click count, so with capacity >= n_valid the
        # loss is EXACTLY the reference masked mean (and under capacity
        # overflow the dropped rows are visible as loss shrinkage, plus the
        # dropped_clicks metric in train/steps.py).
        ce_mask = row_mask if flat_rows else loss_mask
        positive_prob = items_prob[..., 0]
        denom = jnp.maximum(jnp.sum(loss_mask), 1.0)
        if candidate_positions is None:
            ce_loss = (
                -jnp.sum(jnp.log(positive_prob + 1e-24) * ce_mask) / denom
            )
        else:  # serving: no labels, no loss
            ce_loss = jnp.zeros(())

        # ---- optional novelty regularization (nar_model.py:673-683) ----
        if cfg.novelty_reg_factor > 0.0 and candidate_positions is None:
            neg_prob = jax.nn.softmax(
                neg_score.astype(jnp.float32) / cfg.softmax_temperature, axis=-1
            )
            neg_norm_pop = aux.recent_pop_norm[neg_items]
            neg_novelty = -log_base(neg_norm_pop, cfg.popularity_smooth_log_base)
            masked_nov = cfg.novelty_reg_factor * jnp.sum(
                neg_prob * neg_novelty * ce_mask[..., None], axis=-1
            )
            nov_reg_loss = jnp.sum(masked_nov) / denom
        else:
            nov_reg_loss = jnp.zeros(())

        if candidate_positions is not None:
            label_for_cand = jnp.take_along_axis(next_item_label, pos_idx, axis=1)
        elif flat_rows:
            label_for_cand = gather_rows(next_item_label)  # [M]
        else:
            label_for_cand = next_item_label
        candidate_ids = jnp.concatenate(
            [label_for_cand[..., None], neg_items], axis=-1
        )

        predicted_ids = predicted_probs = None
        if rank:
            # rank_items_by_predicted_prob (nar_model.py:777-794)
            predicted_probs, order = jax.lax.top_k(items_prob, items_prob.shape[-1])
            predicted_ids = jnp.take_along_axis(candidate_ids, order, axis=-1)

        return NAROutputs(
            items_prob=items_prob,
            candidate_ids=candidate_ids,
            loss_mask=loss_mask,
            ce_loss=ce_loss,
            nov_reg_loss=nov_reg_loss,
            predicted_ids=predicted_ids,
            predicted_probs=predicted_probs,
        )


# ---------------------------------------------------------------------------
# L2 regularization
# ---------------------------------------------------------------------------

_UNREGULARIZED_LEAVES = ("bias", "recurrent_bias", "PreCAR_bias", "CAR_bias")
_UNREGULARIZED_MODULES = ("rnn",)  # UGRNN cell vars carry no regularizer in the
# reference (nar_model.py:1308-1338); Dense kernels, embeddings and γ/β do
# (kernel_regularizer / get_variable(regularizer=...), e.g. :375-388, :739-740,
# :891-898).


def l2_regularization(params, weight_decay: float) -> jax.Array:
    """Σ λ·‖w‖²/2 over regularized parameters, matching
    tf.losses.get_regularization_loss in the reference graph."""
    total = 0.0
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    for path, leaf in flat:
        keys = [getattr(p, "key", getattr(p, "name", str(p))) for p in path]
        if any(k in _UNREGULARIZED_LEAVES or k.endswith("_bias")
               for k in keys):
            continue
        if any(k in _UNREGULARIZED_MODULES for k in keys):
            continue
        total = total + jnp.sum(jnp.square(leaf.astype(jnp.float32))) / 2.0
    return weight_decay * total
