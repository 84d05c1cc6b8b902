"""Pooled negative scoring: sampler equivalence and model-path parity."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from chameleon_recsys_tpu.data.collate import batches_from_sessions
from chameleon_recsys_tpu.data.synthetic import (
    make_synthetic_corpus,
    synthetic_hour_sessions,
)
from chameleon_recsys_tpu.models.nar import NARAux
from chameleon_recsys_tpu.ops.sampling import (
    sample_negatives,
    sample_negatives_pooled,
)
from chameleon_recsys_tpu.train.steps import nar_init_state

from conftest import tiny_article_schema, tiny_nar_config, tiny_session_schema


def test_pooled_sampler_matches_plain():
    clicked = jnp.array(
        [[1, 2, 3, 4, 5], [6, 7, 0, 0, 0], [0, 0, 0, 0, 0]], jnp.int32
    )
    buffer = jnp.arange(0, 64, dtype=jnp.int32)
    rng = jax.random.PRNGKey(7)
    plain = np.asarray(
        sample_negatives(rng, clicked, buffer, num_negatives=4,
                         buffer_sample_size=16)
    )
    pool, idx, ids = sample_negatives_pooled(
        rng, clicked, buffer, num_negatives=4, buffer_sample_size=16
    )
    np.testing.assert_array_equal(np.asarray(ids), plain)
    np.testing.assert_array_equal(
        np.asarray(pool)[np.asarray(idx)], plain
    )
    assert int(np.asarray(pool)[-1]) == 0  # sentinel row


@pytest.mark.slow
def test_pooled_model_path_matches_dense():
    cfg = tiny_nar_config()
    art = tiny_article_schema(200)
    sess = tiny_session_schema(200)
    corpus = make_synthetic_corpus(art, ace_dim=16)
    metadata = {k: jnp.asarray(v) for k, v in corpus.metadata.items()}
    ace = jnp.asarray(corpus.ace_matrix)
    sessions = synthetic_hour_sessions(
        corpus, sess, 0, cfg.batch_size, cfg.max_session_length
    )
    batch = next(
        iter(
            batches_from_sessions(
                sessions, sess, cfg.batch_size, cfg.max_session_length
            )
        )
    )
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    model, _, state = nar_init_state(cfg, sess, art, batch, ace, metadata)
    aux = NARAux(ace, metadata, state.stream.recent_pop_norm,
                 state.stream.buffer_ids)

    all_clicked = jnp.concatenate(
        [batch["item_clicked"], batch["label_last_item"]], axis=1
    )
    pool, idx, ids = sample_negatives_pooled(
        jax.random.PRNGKey(3), all_clicked, state.stream.buffer_ids,
        num_negatives=cfg.negative_samples,
        buffer_sample_size=cfg.negative_sample_from_buffer,
    )
    idx, ids = idx[:, :-1], ids[:, :-1]

    dense = model.apply({"params": state.params}, batch, aux, ids, train=False)
    pooled = model.apply(
        {"params": state.params}, batch, aux, ids, train=False,
        neg_pool=pool, neg_pool_idx=idx,
    )
    np.testing.assert_allclose(
        np.asarray(pooled.items_prob), np.asarray(dense.items_prob),
        rtol=2e-4, atol=2e-5,
    )
    assert float(pooled.ce_loss) == pytest.approx(float(dense.ce_loss), rel=1e-4)


@pytest.mark.slow
def test_pooled_path_with_novelty_reg_trains():
    """Novelty regularization reads negative ids; it must work on the pooled
    path (train + keep_prob=1.0)."""
    cfg = tiny_nar_config(novelty_reg_factor=0.1)
    art = tiny_article_schema(150)
    sess = tiny_session_schema(150)
    corpus = make_synthetic_corpus(art, ace_dim=8)
    metadata = {k: jnp.asarray(v) for k, v in corpus.metadata.items()}
    ace = jnp.asarray(corpus.ace_matrix)
    sessions = synthetic_hour_sessions(
        corpus, sess, 0, cfg.batch_size, cfg.max_session_length
    )
    batch = next(
        iter(
            batches_from_sessions(
                sessions, sess, cfg.batch_size, cfg.max_session_length
            )
        )
    )
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    from chameleon_recsys_tpu.train.steps import build_nar_train

    _, _, state = nar_init_state(cfg, sess, art, batch, ace, metadata)
    step = build_nar_train(cfg, sess, art).train_step
    state, metrics = step(state, batch, ace, metadata)
    assert np.isfinite(float(metrics["loss"]))


def test_fused_scorer_matches_pooled_path():
    """use_pallas_scorer (interpret mode on CPU) must reproduce the pooled
    XLA path bit-for-bit up to f32 noise — same params, same pool."""
    cfg = tiny_nar_config(matching_layer_sizes=(16, 8, 8))
    cfg_fused = tiny_nar_config(
        matching_layer_sizes=(16, 8, 8), use_pallas_scorer=True
    )
    art = tiny_article_schema(200)
    sess = tiny_session_schema(200)
    corpus = make_synthetic_corpus(art, ace_dim=16)
    metadata = {k: jnp.asarray(v) for k, v in corpus.metadata.items()}
    ace = jnp.asarray(corpus.ace_matrix)
    sessions = synthetic_hour_sessions(
        corpus, sess, 0, cfg.batch_size, cfg.max_session_length
    )
    batch = next(
        iter(
            batches_from_sessions(
                sessions, sess, cfg.batch_size, cfg.max_session_length
            )
        )
    )
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    model, _, state = nar_init_state(cfg, sess, art, batch, ace, metadata)
    model_fused, _, _ = nar_init_state(
        cfg_fused, sess, art, batch, ace, metadata
    )
    aux = NARAux(ace, metadata, state.stream.recent_pop_norm,
                 state.stream.buffer_ids)
    all_clicked = jnp.concatenate(
        [batch["item_clicked"], batch["label_last_item"]], axis=1
    )
    pool, idx, ids = sample_negatives_pooled(
        jax.random.PRNGKey(3), all_clicked, state.stream.buffer_ids,
        num_negatives=cfg.negative_samples,
        buffer_sample_size=cfg.negative_sample_from_buffer,
    )
    idx, ids = idx[:, :-1], ids[:, :-1]
    assert (batch["item_clicked"].shape[0]
            * batch["item_clicked"].shape[1]) % 8 == 0

    base = model.apply(
        {"params": state.params}, batch, aux, ids, train=False,
        neg_pool=pool, neg_pool_idx=idx,
    )
    fused = model_fused.apply(
        {"params": state.params}, batch, aux, ids, train=False,
        neg_pool=pool, neg_pool_idx=idx,
    )
    np.testing.assert_allclose(
        np.asarray(fused.items_prob), np.asarray(base.items_prob),
        rtol=2e-4, atol=2e-5,
    )
    assert float(fused.ce_loss) == pytest.approx(float(base.ce_loss), rel=1e-4)


@pytest.mark.slow
def test_fused_scorer_gradients_match():
    """Full train-step gradient parity: fused scorer vs pooled XLA path."""
    from chameleon_recsys_tpu.train.steps import build_nar_train

    art = tiny_article_schema(150)
    sess = tiny_session_schema(150)
    corpus = make_synthetic_corpus(art, ace_dim=8)
    metadata = {k: jnp.asarray(v) for k, v in corpus.metadata.items()}
    ace = jnp.asarray(corpus.ace_matrix)
    losses = {}
    for name, flag in (("xla", False), ("fused", True)):
        cfg = tiny_nar_config(
            matching_layer_sizes=(16, 8, 8), use_pallas_scorer=flag
        )
        sessions = synthetic_hour_sessions(
            corpus, sess, 0, cfg.batch_size, cfg.max_session_length
        )
        batch = next(
            iter(
                batches_from_sessions(
                    sessions, sess, cfg.batch_size, cfg.max_session_length
                )
            )
        )
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        _, _, state = nar_init_state(cfg, sess, art, batch, ace, metadata)
        step = build_nar_train(cfg, sess, art).train_step
        for _ in range(3):
            state, metrics = step(state, batch, ace, metadata)
        losses[name] = float(metrics["loss"])
    assert losses["fused"] == pytest.approx(losses["xla"], rel=5e-3)


def _setup_paths(num_items=200, seed_hours=0):
    """(model, state, aux, batch, pool, idx, ids) with `seed_hours` hours of
    stream-state warmup applied before comparing the scoring paths."""
    cfg = tiny_nar_config()
    art = tiny_article_schema(num_items)
    sess = tiny_session_schema(num_items)
    corpus = make_synthetic_corpus(art, ace_dim=16)
    metadata = {k: jnp.asarray(v) for k, v in corpus.metadata.items()}
    ace = jnp.asarray(corpus.ace_matrix)

    def batch_for_hour(h):
        sessions = synthetic_hour_sessions(
            corpus, sess, h, cfg.batch_size, cfg.max_session_length
        )
        b = next(iter(batches_from_sessions(
            sessions, sess, cfg.batch_size, cfg.max_session_length
        )))
        return {k: jnp.asarray(v) for k, v in b.items()}

    batch = batch_for_hour(seed_hours)
    model, _, state = nar_init_state(cfg, sess, art, batch, ace, metadata)

    if seed_hours:
        from chameleon_recsys_tpu.state.stream_state import update_stream_state

        for h in range(seed_hours):
            wb = batch_for_hour(h)
            all_clicked = jnp.concatenate(
                [wb["item_clicked"], wb["label_last_item"]], axis=1
            )
            ts = wb["event_timestamp"]
            last = jnp.max(ts, axis=1, keepdims=True)
            all_ts = jnp.where(
                all_clicked != 0, jnp.concatenate([ts, last], axis=1), 0
            )
            state = state._replace(
                stream=update_stream_state(state.stream, all_clicked, all_ts, cfg)
            )

    aux = NARAux(ace, metadata, state.stream.recent_pop_norm,
                 state.stream.buffer_ids)
    all_clicked = jnp.concatenate(
        [batch["item_clicked"], batch["label_last_item"]], axis=1
    )
    pool, idx, ids = sample_negatives_pooled(
        jax.random.PRNGKey(3), all_clicked, state.stream.buffer_ids,
        num_negatives=cfg.negative_samples,
        buffer_sample_size=cfg.negative_sample_from_buffer,
    )
    return model, state, aux, batch, pool, idx[:, :-1], ids[:, :-1]


def test_pooled_matches_dense_cold_start_step():
    """Step-1 parity from an EMPTY buffer: the documented pooled-path
    deviation (models/nar.py:325-329 — buffer-empty recency/novelty fallback
    stats weighted over the pool's sampled slots instead of the dense path's
    [B,T,K] multiset) must stay within this pinned tolerance."""
    model, state, aux, batch, pool, idx, ids = _setup_paths()
    assert not np.any(np.asarray(state.stream.buffer_ids))  # genuinely cold

    dense = model.apply({"params": state.params}, batch, aux, ids, train=False)
    pooled = model.apply(
        {"params": state.params}, batch, aux, ids, train=False,
        neg_pool=pool, neg_pool_idx=idx,
    )
    diff = np.abs(np.asarray(pooled.items_prob) - np.asarray(dense.items_prob))
    assert diff.max() < 5e-4, diff.max()
    assert float(pooled.ce_loss) == pytest.approx(float(dense.ce_loss), rel=1e-3)


def test_pooled_matches_dense_warm_buffer():
    """With a warm buffer the fallback never triggers and the paths agree to
    f32 accumulation noise."""
    model, state, aux, batch, pool, idx, ids = _setup_paths(seed_hours=2)
    assert np.any(np.asarray(state.stream.buffer_ids))

    dense = model.apply({"params": state.params}, batch, aux, ids, train=False)
    pooled = model.apply(
        {"params": state.params}, batch, aux, ids, train=False,
        neg_pool=pool, neg_pool_idx=idx,
    )
    np.testing.assert_allclose(
        np.asarray(pooled.items_prob), np.asarray(dense.items_prob),
        rtol=2e-4, atol=2e-5,
    )
