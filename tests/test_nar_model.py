"""NAR model: init, forward shapes, gradient flow, and loss descent."""
import pytest
import numpy as np
import jax
import jax.numpy as jnp

from chameleon_recsys_tpu.data.collate import batches_from_sessions
from chameleon_recsys_tpu.data.synthetic import (
    make_synthetic_corpus,
    synthetic_hour_sessions,
)
from chameleon_recsys_tpu.train.steps import build_nar_train, nar_init_state

from conftest import tiny_article_schema, tiny_nar_config, tiny_session_schema


def _setup(num_items=200, **cfg_overrides):
    cfg = tiny_nar_config(**cfg_overrides)
    article_schema = tiny_article_schema(num_items)
    session_schema = tiny_session_schema(num_items)
    corpus = make_synthetic_corpus(article_schema, ace_dim=16)
    metadata = {k: jnp.asarray(v) for k, v in corpus.metadata.items()}
    ace = jnp.asarray(corpus.ace_matrix)
    sessions = synthetic_hour_sessions(
        corpus, session_schema, hour_index=0, num_sessions=cfg.batch_size,
        max_session_length=cfg.max_session_length,
    )
    batch = next(
        batches_from_sessions(
            sessions, session_schema, cfg.batch_size, cfg.max_session_length
        )
    )
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    return cfg, article_schema, session_schema, ace, metadata, batch


@pytest.mark.slow
def test_train_step_shapes_and_finite():
    cfg, art, sess, ace, metadata, batch = _setup()
    model, opt, state = nar_init_state(cfg, sess, art, batch, ace, metadata)
    programs = build_nar_train(cfg, sess, art); train_step, eval_step = programs.train_step, programs.eval_step

    state, metrics = train_step(state, batch, ace, metadata)
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["clicks"]) > 0
    # stream state advanced
    assert int(state.stream.current_step) == 1
    assert int((np.asarray(state.stream.buffer_ids) != 0).sum()) > 0

    state, dev_metrics, fetches = eval_step(state, batch, ace, metadata)
    b, t = np.asarray(batch["item_clicked"]).shape
    k = cfg.eval_negative_samples
    assert fetches["predicted_ids"].shape == (b, t, 1 + k)
    assert np.isfinite(float(dev_metrics["rr_sum"]))
    # ranked probs are sorted descending
    probs = np.asarray(fetches["predicted_probs"])
    assert (np.diff(probs, axis=-1) <= 1e-6).all()


def test_positive_always_in_candidates_and_ranking_consistent():
    cfg, art, sess, ace, metadata, batch = _setup()
    model, opt, state = nar_init_state(cfg, sess, art, batch, ace, metadata)
    programs = build_nar_train(cfg, sess, art); train_step, eval_step = programs.train_step, programs.eval_step
    state, _, fetches = eval_step(state, batch, ace, metadata)
    labels = np.asarray(batch["label_next_item"])
    pred = np.asarray(fetches["predicted_ids"])
    mask = labels != 0
    # every valid label appears somewhere in its ranked candidate list
    for b, t in zip(*np.nonzero(mask)):
        assert labels[b, t] in pred[b, t]


@pytest.mark.slow
def test_loss_decreases_on_fixed_batch():
    cfg, art, sess, ace, metadata, batch = _setup(learning_rate=3e-3)
    model, opt, state = nar_init_state(cfg, sess, art, batch, ace, metadata)
    train_step = build_nar_train(cfg, sess, art).train_step
    losses = []
    for _ in range(30):
        state, metrics = train_step(state, batch, ace, metadata)
        losses.append(float(metrics["ce_loss"]))
    assert losses[-1] < losses[0] * 0.7, losses[::10]


@pytest.mark.slow
def test_padded_sessions_do_not_contribute():
    cfg, art, sess, ace, metadata, batch = _setup()
    # zero out half of the batch
    batch = dict(batch)
    b = int(np.asarray(batch["session_size"]).shape[0])
    half = b // 2
    for key, arr in batch.items():
        arr = np.asarray(arr).copy()
        arr[half:] = 0
        batch[key] = jnp.asarray(arr)
    model, opt, state = nar_init_state(cfg, sess, art, batch, ace, metadata)
    train_step = build_nar_train(cfg, sess, art).train_step
    state, metrics = train_step(state, batch, ace, metadata)
    assert np.isfinite(float(metrics["loss"]))
    assert int(metrics["sessions"]) == half


@pytest.mark.slow
def test_rbg_prng_full_step_and_raw_key_checkpoint():
    """cfg.rng_impl='rbg' (XLA RngBitGenerator — the fast TPU PRNG) must run
    the full train/eval step; the state carries raw key DATA so a plain
    numpy checkpoint round-trip of the rng works for any impl."""
    cfg, art, sess, ace, metadata, batch = _setup(rng_impl="rbg")
    _, _, state = nar_init_state(cfg, sess, art, batch, ace, metadata)
    programs = build_nar_train(cfg, sess, art)
    assert state.rng.shape == (4,) and state.rng.dtype == jnp.uint32
    state, m = programs.train_step(state, batch, ace, metadata)
    assert np.isfinite(float(m["loss"]))
    raw = np.asarray(state.rng)  # snapshot BEFORE the donating eval call
    state, dm, _ = programs.eval_step(state, batch, ace, metadata)
    assert np.isfinite(float(dm["ce_loss"]))
    resumed = state._replace(rng=jnp.asarray(raw))
    _, m2 = programs.train_step(resumed, batch, ace, metadata)
    assert np.isfinite(float(m2["loss"]))
