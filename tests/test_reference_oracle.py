"""Forward-math parity oracle against the reference TF1 graphs.

Pure-numpy transliterations of the reference forward passes — written
independently from the TF1 source, NOT from this repo's JAX code — receive
the exact weights of ``NARModel`` / ``ACRClassifierModel`` and must produce
identical probabilities and losses (dropout off).  Any deviation in a cell
formula, activation, concat order, normalization constant, or loss reduction
fails these tests.

Transliterated reference pieces (file:line under /root/reference/):
  * UGRNN cell exactly as ``tf.contrib.rnn.UGRNNCell``
    (nar_module/nar/nar_model.py:1317, cell math from TF 1.12
    contrib/rnn/python/ops/rnn_cell.py: one linear over [x ‖ h] → split 2 →
    g = sigmoid(g_act + forget_bias(=1.0)), c = tanh(c_act),
    h' = g·h + (1−g)·c), stacked + dynamic_rnn zero-output/copy-state
    masking (nar_model.py:1308-1361).
  * Feature towers / get_features (nar_model.py:730-773): OHE for
    cardinality ≤ 10, else embedding of dim floor(8·card^0.25).
  * get_item_features concat order: metadata ‖ ACE ‖ trainable item-emb ‖
    dynamic recency/novelty (nar_model.py:921-994).
  * Recency + novelty buffer-stat normalization incl. the empty-buffer
    batch fallback (nar_model.py:996-1218): log1p smoothing → z-norm
    (ε=1e-24 inside sqrt) → min-max to (−1,1) with the reference's exact
    ε placement (nar_model.py:1007).
  * scale_center γ·x+β (nar_model.py:887-907), shared PreCAR(leaky_relu) →
    CAR(tanh) towers (:374-405), session FC1(512,leaky_relu)+FC2(tanh)
    (:410-438), matching MLP on elementwise products (:444-505),
    temperature softmax (:508-517), masked XE + novelty regularization
    (:639-683).  tf.nn.leaky_relu default alpha = 0.2.
  * ACR CNN bank + classifier heads (acr_module/acr/acr_model.py:103-289)
    with tf.losses' SUM_BY_NONZERO_WEIGHTS reduction for the weighted
    multiclass loss (:196-198), and the CudnnGRU text encoder on the
    reversed sequence (:114-124, 356-399).

The time unit is this repo's documented deviation (seconds, config.py:15-19)
— the reference divides millisecond timestamps by 1000·60·60·24
(nar_model.py:1055-1060); the day-fraction result is identical.
"""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from chameleon_recsys_tpu.config import (
    ACRConfig,
    ARTICLE_REQ_FEATURES,
    SECONDS_PER_DAY,
    SESSION_REQ_SEQ_FEATURES,
)
from chameleon_recsys_tpu.data.collate import batches_from_sessions
from chameleon_recsys_tpu.data.synthetic import (
    make_synthetic_corpus,
    synthetic_hour_sessions,
)
from chameleon_recsys_tpu.models.acr import ACRClassifierModel, ACRLabelSpec
from chameleon_recsys_tpu.models.nar import NARAux, NARModel

from conftest import tiny_article_schema, tiny_nar_config, tiny_session_schema

# ---------------------------------------------------------------------------
# numpy transliteration of the reference NAR forward pass
# ---------------------------------------------------------------------------

_ALPHA = 0.2  # tf.nn.leaky_relu default (nar_model.py:376 never overrides it)


def _leaky_relu(x):
    return np.where(x >= 0.0, x, _ALPHA * x)


def _sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def _log_base(x, base):  # nar_model.py:28-31
    return np.log(x) / np.log(base)


def _log_1p(x, base):  # nar_model.py:33-34
    return _log_base(x + 1.0, base)


def _min_max_normalization(tensor, stats, rng=(-1.0, 1.0)):
    """nar_model.py:996-1009 (note ε added to the numerator only)."""
    eps = 1e-24
    mn, mx = stats.min(), stats.max()
    scaled = (tensor - mn + eps) / max(mx - mn, 2 * eps)
    return scaled * (rng[1] - rng[0]) + rng[0]


def _normalize_values(tensor, stats):
    """nar_model.py:1011-1039: z-norm vs stats, then min-max of the z-normed
    stats (biased variance, ε=1e-24 inside the sqrt)."""
    mean = stats.mean()
    var = ((stats - mean) ** 2).mean()
    std = np.sqrt(var + 1e-24)
    normed = (tensor - mean) / std
    stats_normed = (stats - mean) / std
    return _min_max_normalization(normed, stats_normed)


def _last_buffer_items(buffer_ids, n):
    """get_last_items_from_recent_clicks_buffer (nar_model.py:1041-1044)."""
    return buffer_ids[buffer_ids != 0][:n]


def _ref_recency(item_ids, ref_ts, metadata, buffer_ids, cfg):
    """get_items_recency_feature + normalize_recency_feature
    (nar_model.py:1055-1131)."""
    created = metadata["created_at_ts"][item_ids].astype(np.float64)
    elapsed = np.maximum(
        (np.asarray(ref_ts, np.float64) - created) / SECONDS_PER_DAY, 0.0
    )
    smoothed = _log_1p(elapsed, cfg.elapsed_days_smooth_log_base)

    last = _last_buffer_items(buffer_ids, cfg.recent_clicks_for_normalization)
    if last.size == 0:  # first-batch fallback (nar_model.py:1080-1084)
        stats = smoothed[item_ids != 0].reshape(-1)
    else:
        s_created = metadata["created_at_ts"][last].astype(np.float64)
        s_elapsed = np.maximum(
            (np.max(np.asarray(ref_ts, np.float64)) - s_created)
            / SECONDS_PER_DAY,
            0.0,
        )
        stats = _log_1p(s_elapsed, cfg.elapsed_days_smooth_log_base)
    return _normalize_values(smoothed, stats)[..., None]


def _ref_novelty(item_ids, pop_norm, buffer_ids, cfg):
    """get_items_pop_novelty_feature_standardized (nar_model.py:1147-1193)."""
    base = cfg.popularity_smooth_log_base
    novelty = -_log_base(pop_norm[item_ids], base)
    last = _last_buffer_items(buffer_ids, cfg.recent_clicks_for_normalization)
    if last.size == 0:  # nar_model.py:1177-1181
        stats = novelty[item_ids != 0].reshape(-1)
    else:
        stats = -_log_base(pop_norm[last], base)
    return _normalize_values(novelty, stats)[..., None]


def _ref_towers(inputs, specs, tower_params, ignore):
    """get_features (nar_model.py:730-773): OHE / embed / numeric channels
    concatenated in schema order."""
    channels = []
    for spec in specs:
        if spec.name in ignore:
            continue
        x = inputs[spec.name]
        if spec.kind == "categorical":
            if spec.cardinality <= 10:  # max_cardinality_for_ohe
                feat = np.eye(spec.cardinality)[x]
            else:
                feat = tower_params[f"{spec.name}_embedding"]["embedding"][x]
        else:
            feat = np.asarray(x, np.float64)[..., None]
        channels.append(feat.astype(np.float64))
    return np.concatenate(channels, axis=-1)


def _ref_ugrnn_stack(x, mask, rnn_params, num_layers, forget_bias=1.0):
    """Stacked tf.contrib.rnn.UGRNNCell under tf.nn.dynamic_rnn
    (nar_model.py:1308-1361).  Cell: ONE linear over [inputs ‖ state] →
    split in two → g = sigmoid(g_act + forget_bias), c = tanh(c_act),
    new_state = g·state + (1−g)·c.  dynamic_rnn zeroes outputs past
    sequence_length and copies state through."""
    h_in = x
    for layer in range(num_layers):
        p = rnn_params[f"layer_{layer}"]
        w_in = np.asarray(p["input_proj"]["kernel"], np.float64)
        b = np.asarray(p["input_proj"]["bias"], np.float64)
        w_hh = np.asarray(p["recurrent_kernel"], np.float64)
        w_full = np.concatenate([w_in, w_hh], axis=0)  # _linear([x, h])
        bsz, t, _ = h_in.shape
        units = w_hh.shape[0]
        h = np.zeros((bsz, units))
        outs = np.zeros((bsz, t, units))
        for step in range(t):
            cell_inputs = np.concatenate([h_in[:, step], h], axis=-1)
            rnn_matrix = cell_inputs @ w_full + b
            g_act, c_act = np.split(rnn_matrix, 2, axis=-1)
            c = np.tanh(c_act)
            g = _sigmoid(g_act + forget_bias)
            new_state = g * h + (1.0 - g) * c
            m = mask[:, step][:, None]
            outs[:, step] = np.where(m, new_state, 0.0)
            h = np.where(m, new_state, h)
        h_in = outs
    return h_in


def _dense(x, p):
    return x @ np.asarray(p["kernel"], np.float64) + np.asarray(
        p["bias"], np.float64
    )


def reference_nar_forward(
    params, batch, metadata, ace, pop_norm, buffer_ids, neg_items, cfg,
    session_schema, article_schema,
):
    """The full reference forward pass (nar_model.py:313-683) in numpy."""
    item_clicked = np.asarray(batch["item_clicked"])
    next_label = np.asarray(batch["label_next_item"])
    event_ts = np.asarray(batch["event_timestamp"])
    b, t = item_clicked.shape
    seq_len = np.asarray(batch["session_size"]).astype(np.int64) - 1
    mask = np.arange(t)[None, :] < seq_len[:, None]  # tf.sequence_mask
    max_event_ts = event_ts.max()

    # --- user context features (nar_model.py:314-325) ---
    user_ctx = _ref_towers(
        {k: np.asarray(v) for k, v in batch.items()},
        session_schema.sequence,
        params.get("user_context_towers", {}),
        SESSION_REQ_SEQ_FEATURES,
    )  # [B, T, F_u]

    # --- item features closure (nar_model.py:921-994) ---
    def item_features(ids, ref_ts):
        feats = []
        meta_specs = [
            s for s in article_schema.features
            if s.name not in ARTICLE_REQ_FEATURES
        ]
        if meta_specs:
            gathered = {s.name: metadata[s.name][ids] for s in meta_specs}
            feats.append(_ref_towers(
                gathered, meta_specs,
                params.get("article_metadata_towers", {}), (),
            ))
        feats.append(ace[ids].astype(np.float64))  # ACE lookup (:948)
        feats.append(  # trainable item embedding (:911-919)
            np.asarray(
                params["item_clicked_embedding"]["embedding"], np.float64
            )[ids]
        )
        feats.append(_ref_recency(ids, ref_ts, metadata, buffer_ids, cfg))
        feats.append(_ref_novelty(ids, pop_norm, buffer_ids, cfg))
        return np.concatenate(feats, axis=-1)

    gamma = np.asarray(params["gamma_scale"], np.float64)
    beta = np.asarray(params["beta_center"], np.float64)

    def scale_center(x):  # nar_model.py:887-907
        return x * gamma + beta

    # the reference carries event_timestamp as [B,T,1] (nar_model.py:233) and
    # gathers created_at as [B,T,1]; the oracle keeps [B,T] and appends the
    # channel axis once at the end of _ref_recency — same values
    input_feats = scale_center(np.concatenate(
        [user_ctx, item_features(item_clicked, event_ts)], -1
    ))
    pos_feats = scale_center(np.concatenate(
        [user_ctx, item_features(next_label, max_event_ts)], -1
    ))
    k = neg_items.shape[-1]
    user_ctx_tiled = np.broadcast_to(
        user_ctx[:, :, None, :], (b, t, k, user_ctx.shape[-1])
    )
    neg_feats = scale_center(np.concatenate(
        [user_ctx_tiled, item_features(neg_items, max_event_ts)], -1
    ))

    # --- shared PreCAR → CAR towers (nar_model.py:374-405) ---
    pre_k = np.asarray(params["PreCAR_kernel"], np.float64)
    pre_b = np.asarray(params["PreCAR_bias"], np.float64)
    car_k = np.asarray(params["CAR_kernel"], np.float64)
    car_b = np.asarray(params["CAR_bias"], np.float64)

    def car(x):
        return np.tanh(_leaky_relu(x @ pre_k + pre_b) @ car_k + car_b)

    input_car = car(input_feats)
    pos_car = car(pos_feats)
    neg_car = car(neg_feats)

    # --- RNN + session representation (nar_model.py:407-438) ---
    rnn_out = _ref_ugrnn_stack(
        input_car, mask, params["rnn"], cfg.rnn_num_layers
    )
    fc1 = _leaky_relu(_dense(rnn_out, params["session_FC1"]))
    predicted = np.tanh(_dense(fc1, params["session_FC2"]))

    # --- matching MLP over elementwise products (nar_model.py:444-505) ---
    def match(x):
        for i in range(len(cfg.matching_layer_sizes)):
            x = _leaky_relu(
                x @ np.asarray(params[f"matching_{i+1}_kernel"], np.float64)
                + np.asarray(params[f"matching_{i+1}_bias"], np.float64)
            )
        return (
            x @ np.asarray(params["matching_out_kernel"], np.float64)
            + np.asarray(params["matching_out_bias"], np.float64)
        )[..., 0]

    cos_sim_positive = match(pos_car * predicted)  # [B, T]
    cos_sim_negative = match(neg_car * predicted[:, :, None, :])  # [B, T, K]

    # --- temperature softmax (nar_model.py:508-517) ---
    concat = np.concatenate(
        [cos_sim_positive[..., None], cos_sim_negative], axis=-1
    ) / cfg.softmax_temperature
    e = np.exp(concat - concat.max(-1, keepdims=True))
    items_prob = e / e.sum(-1, keepdims=True)
    neg_scaled = cos_sim_negative / cfg.softmax_temperature
    en = np.exp(neg_scaled - neg_scaled.max(-1, keepdims=True))
    neg_items_prob = en / en.sum(-1, keepdims=True)

    # --- masked XE loss (nar_model.py:639-667) ---
    loss_mask = mask.astype(np.float64)
    xe = np.log(items_prob[..., 0]) * loss_mask
    ce_loss = -xe.sum() / loss_mask.sum()

    # --- novelty regularization (nar_model.py:673-683) ---
    neg_norm_pop = pop_norm[neg_items]
    neg_novelty = -_log_base(neg_norm_pop, cfg.popularity_smooth_log_base)
    masked_nov = cfg.novelty_reg_factor * (
        neg_items_prob * neg_novelty * loss_mask[..., None]
    ).sum(-1)
    nov_reg = masked_nov.sum() / loss_mask.sum()

    return items_prob, ce_loss, nov_reg


# ---------------------------------------------------------------------------
# fixtures
# ---------------------------------------------------------------------------


def _nar_setup(buffer_fill=48, **cfg_overrides):
    cfg = tiny_nar_config(
        matching_layer_sizes=(16, 8, 8),
        novelty_reg_factor=0.1,
        use_pallas_rnn=False,
        use_pallas_scorer=False,
        **cfg_overrides,
    )
    art = tiny_article_schema(200)
    sess = tiny_session_schema(200)
    corpus = make_synthetic_corpus(art, ace_dim=16)
    sessions = synthetic_hour_sessions(
        corpus, sess, 0, cfg.batch_size, cfg.max_session_length
    )
    batch = next(iter(batches_from_sessions(
        sessions, sess, cfg.batch_size, cfg.max_session_length
    )))

    rng = np.random.RandomState(7)
    pop_norm = rng.uniform(1e-4, 0.05, size=200).astype(np.float32)
    buffer_ids = np.zeros(cfg.recent_clicks_buffer_max_size, np.int32)
    buffer_ids[:buffer_fill] = rng.randint(1, 200, size=buffer_fill)
    b, t = batch["item_clicked"].shape
    k = cfg.negative_samples
    neg_items = rng.randint(1, 200, size=(b, t, k)).astype(np.int32)

    metadata_np = {k2: np.asarray(v) for k2, v in corpus.metadata.items()}
    return (cfg, art, sess, corpus.ace_matrix.astype(np.float32),
            metadata_np, batch, pop_norm, buffer_ids, neg_items)


def _nar_model_outputs(cfg, art, sess, ace, metadata, batch, pop_norm,
                       buffer_ids, neg_items):
    model = NARModel(cfg, sess, art)
    aux = NARAux(
        jnp.asarray(ace),
        {k: jnp.asarray(v) for k, v in metadata.items()},
        jnp.asarray(pop_norm),
        jnp.asarray(buffer_ids),
    )
    jbatch = {k: jnp.asarray(v) for k, v in batch.items()}
    variables = model.init(
        jax.random.PRNGKey(11), jbatch, aux, jnp.asarray(neg_items),
        train=False,
    )
    out = model.apply(
        variables, jbatch, aux, jnp.asarray(neg_items), train=False
    )
    return variables["params"], out


class TestNAROracle:
    def test_forward_matches_reference_transliteration(self):
        setup = _nar_setup()
        (cfg, art, sess, ace, metadata, batch, pop_norm, buffer_ids,
         neg_items) = setup
        params, out = _nar_model_outputs(*setup)

        ref_prob, ref_ce, ref_nov = reference_nar_forward(
            jax.tree_util.tree_map(np.asarray, params),
            batch, metadata, np.asarray(ace, np.float64), pop_norm.astype(
                np.float64), buffer_ids, neg_items, cfg, sess, art,
        )
        np.testing.assert_allclose(
            np.asarray(out.items_prob, np.float64), ref_prob,
            rtol=2e-4, atol=2e-5,
        )
        assert float(out.ce_loss) == pytest.approx(ref_ce, rel=2e-4)
        assert float(out.nov_reg_loss) == pytest.approx(ref_nov, rel=2e-4)

    def test_empty_buffer_fallback_matches(self):
        """First-batch branch: stats from the batch items themselves
        (nar_model.py:1080-1084, 1177-1181)."""
        setup = _nar_setup(buffer_fill=0)
        (cfg, art, sess, ace, metadata, batch, pop_norm, buffer_ids,
         neg_items) = setup
        params, out = _nar_model_outputs(*setup)
        ref_prob, ref_ce, _ = reference_nar_forward(
            jax.tree_util.tree_map(np.asarray, params),
            batch, metadata, np.asarray(ace, np.float64),
            pop_norm.astype(np.float64), buffer_ids, neg_items, cfg, sess,
            art,
        )
        np.testing.assert_allclose(
            np.asarray(out.items_prob, np.float64), ref_prob,
            rtol=2e-4, atol=2e-5,
        )
        assert float(out.ce_loss) == pytest.approx(ref_ce, rel=2e-4)

    def test_oracle_has_teeth(self):
        """A deliberately wrong cell (forget_bias=0, i.e. a plain-GRU-style
        gate bias) must NOT match — proves the oracle can falsify."""
        setup = _nar_setup()
        (cfg, art, sess, ace, metadata, batch, pop_norm, buffer_ids,
         neg_items) = setup
        params, out = _nar_model_outputs(*setup)
        params_np = jax.tree_util.tree_map(np.asarray, params)

        # recompute with the wrong forget bias through the full graph
        def wrong_forward():
            import unittest.mock as mock
            orig = _ref_ugrnn_stack
            with mock.patch(
                f"{__name__}._ref_ugrnn_stack",
                lambda x, m, p, n, forget_bias=1.0: orig(
                    x, m, p, n, forget_bias=0.0
                ),
            ):
                return reference_nar_forward(
                    params_np, batch, metadata, np.asarray(ace, np.float64),
                    pop_norm.astype(np.float64), buffer_ids, neg_items, cfg,
                    sess, art,
                )

        _, wrong_ce, _ = wrong_forward()
        assert abs(float(out.ce_loss) - wrong_ce) > 1e-4


# ---------------------------------------------------------------------------
# ACR classifier oracle (acr_model.py:103-289, 356-399)
# ---------------------------------------------------------------------------


def _ref_conv1d_valid(x, kernel, bias):
    """tf.layers.conv1d(padding='valid'): kernel [W, D, F]."""
    bsz, length, _ = x.shape
    w, _, f = kernel.shape
    out = np.zeros((bsz, length - w + 1, f))
    for off in range(w):
        out += x[:, off:length - w + 1 + off, :] @ kernel[off]
    return out + bias


def _ref_cudnn_gru(x, w_in, b_in, r_hh, b_hh):
    """CudnnGRU cell math (linear-before-reset / double-bias variant, the
    cuDNN default wrapped by tf.contrib.cudnn_rnn — acr_model.py:356-399):
      r = σ(W_r·x + b_Wr + R_r·h + b_Rr)
      z = σ(W_z·x + b_Wz + R_z·h + b_Rz)
      n = tanh(W_n·x + b_Wn + r·(R_n·h + b_Rn))
      h' = (1−z)·n + z·h
    Gate order in the fused kernels: r, z, n."""
    bsz, t, _ = x.shape
    units = r_hh.shape[0]
    h = np.zeros((bsz, units))
    outs = np.zeros((bsz, t, units))
    for step in range(t):
        xp = x[:, step] @ w_in + b_in
        rec = h @ r_hh + b_hh
        xr, xz, xn = np.split(xp, 3, axis=-1)
        hr, hz, hn = np.split(rec, 3, axis=-1)
        r = _sigmoid(xr + hr)
        z = _sigmoid(xz + hz)
        n = np.tanh(xn + r * hn)
        h = (1.0 - z) * n + z * h
        outs[:, step] = h
    return outs


def reference_acr_forward(params, tokens, word_emb, labels, class_weights,
                          cfg, label_specs):
    """ACR metadata-classification forward (acr_model.py:103-228)."""
    x = word_emb[tokens].astype(np.float64)

    if cfg.text_feature_extractor.upper() == "CNN":
        pooled = []
        for width in cfg.cnn_filter_sizes:  # acr_model.py:272-289
            p = params["cnn"][f"conv_{width}"]
            conv = np.maximum(
                _ref_conv1d_valid(
                    x, np.asarray(p["kernel"], np.float64),
                    np.asarray(p["bias"], np.float64),
                ),
                0.0,
            )
            pooled.append(conv.max(axis=1))
        content = np.concatenate(pooled, axis=-1)
    else:  # GRU on the reversed sequence, max-pool over outputs (:114-124)
        xr = x[:, ::-1, :]
        p = params["rnn"]["layer_0"]
        outs = _ref_cudnn_gru(
            xr,
            np.asarray(p["input_proj"]["kernel"], np.float64),
            np.asarray(p["input_proj"]["bias"], np.float64),
            np.asarray(p["recurrent_kernel"], np.float64),
            np.asarray(p["recurrent_bias"], np.float64),
        )
        content = outs.max(axis=1)

    fc2 = np.maximum(_dense(content, params["fc2"]), 0.0)  # :141-143
    ace = np.tanh(_dense(fc2, params["article_content_embedding"]))  # :145-150

    total = 0.0
    logits_out = {}
    for spec in label_specs:
        logits = _dense(ace, params[f"output_{spec.name}"])
        logits_out[spec.name] = logits
        y = labels[spec.name]
        if spec.classification_type == "multiclass":
            # tf.losses.sparse_softmax_cross_entropy with weights, default
            # Reduction.SUM_BY_NONZERO_WEIGHTS (acr_model.py:196-198):
            # Σ w·xe / #(w≠0)
            lse = np.log(np.exp(logits - logits.max(-1, keepdims=True))
                         .sum(-1)) + logits.max(-1)
            xe = lse - logits[np.arange(len(y)), y]
            w = (class_weights[spec.name][y]
                 if spec.name in class_weights else np.ones(len(y)))
            loss = (w * xe).sum() / np.count_nonzero(w)
        else:  # multilabel sigmoid XE, mean over classes then batch (:202-215)
            multi_hot = np.zeros((len(y), spec.cardinality))
            multi_hot[np.arange(len(y))[:, None], y] = 1.0
            multi_hot[:, 0] = 0.0  # padding class forced to 0 (:208-210)
            sig_xe = (np.maximum(logits, 0) - logits * multi_hot
                      + np.log1p(np.exp(-np.abs(logits))))
            loss = sig_xe.mean(axis=1).mean()
        total += spec.feature_weight_on_loss * loss
    return ace, logits_out, total


def _acr_setup(extractor):
    cfg = ACRConfig(
        text_feature_extractor=extractor,
        word_embedding_size=12,
        vocab_size=60,
        acr_embeddings_size=10,
        cnn_filter_sizes=(2, 3),
        cnn_num_filters=6,
        rnn_units=9,
        rnn_layers=1,
        dropout_keep_prob=1.0,
    )
    specs = (
        ACRLabelSpec("category", 7, "multiclass"),
        ACRLabelSpec("keywords", 9, "multilabel"),
    )
    rng = np.random.RandomState(3)
    bsz, length = 5, 14
    tokens = rng.randint(1, 60, size=(bsz, length)).astype(np.int32)
    tokens[0, 10:] = 0  # padded tail
    word_emb = rng.uniform(-0.2, 0.2, size=(60, 12)).astype(np.float32)
    labels = {
        "category": rng.randint(0, 7, size=bsz).astype(np.int32),
        "keywords": rng.randint(1, 9, size=(bsz, 3)).astype(np.int32),
    }
    class_weights = {
        "category": rng.uniform(0.5, 2.0, size=7).astype(np.float32)
    }
    return cfg, specs, tokens, word_emb, labels, class_weights


@pytest.mark.parametrize("extractor", ["CNN", "GRU"])
@pytest.mark.slow
def test_acr_classifier_matches_reference(extractor):
    cfg, specs, tokens, word_emb, labels, class_weights = _acr_setup(
        extractor
    )
    model = ACRClassifierModel(cfg, specs)
    text_len = (tokens != 0).sum(axis=1).astype(np.int32)
    variables = model.init(
        jax.random.PRNGKey(5), jnp.asarray(tokens), jnp.asarray(text_len),
        jnp.asarray(word_emb),
        labels={k: jnp.asarray(v) for k, v in labels.items()},
        label_class_weights={
            k: jnp.asarray(v) for k, v in class_weights.items()
        },
        train=False,
    )
    out = model.apply(
        variables, jnp.asarray(tokens), jnp.asarray(text_len),
        jnp.asarray(word_emb),
        labels={k: jnp.asarray(v) for k, v in labels.items()},
        label_class_weights={
            k: jnp.asarray(v) for k, v in class_weights.items()
        },
        train=False,
    )
    ref_ace, ref_logits, ref_loss = reference_acr_forward(
        jax.tree_util.tree_map(np.asarray, variables["params"]),
        tokens, word_emb.astype(np.float64), labels,
        {k: v.astype(np.float64) for k, v in class_weights.items()},
        cfg, specs,
    )
    np.testing.assert_allclose(
        np.asarray(out.ace, np.float64), ref_ace, rtol=2e-4, atol=2e-5
    )
    for name in ref_logits:
        np.testing.assert_allclose(
            np.asarray(out.label_logits[name], np.float64),
            ref_logits[name], rtol=2e-4, atol=2e-5,
        )
    assert float(out.loss) == pytest.approx(ref_loss, rel=2e-4)
