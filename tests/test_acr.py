"""ACR models: CNN/GRU classifiers and the GRU-SDAE autoencoder."""
import numpy as np
import pytest

from chameleon_recsys_tpu.acr.trainer import (
    ACRTrainer,
    export_ace_pickle,
    load_ace_for_nar,
)
from chameleon_recsys_tpu.config import ACRConfig
from chameleon_recsys_tpu.models.acr import ACRLabelSpec

VOCAB, WORD_DIM, TEXT_LEN, N_ARTICLES = 200, 16, 12, 40


def _corpus(seed=0, num_categories=6):
    rng = np.random.RandomState(seed)
    word_emb = rng.randn(VOCAB, WORD_DIM).astype(np.float32) * 0.1
    word_emb[0] = 0.0
    categories = rng.randint(1, num_categories, size=N_ARTICLES)
    # texts correlated with category so the side task is learnable
    text = np.zeros((N_ARTICLES, TEXT_LEN), np.int32)
    lengths = rng.randint(5, TEXT_LEN + 1, size=N_ARTICLES)
    for i in range(N_ARTICLES):
        vocab_lo = categories[i] * 30
        text[i, : lengths[i]] = rng.randint(vocab_lo, vocab_lo + 30, lengths[i]) % (
            VOCAB - 2
        ) + 2
    articles = {
        "article_id": np.arange(1, N_ARTICLES + 1),
        "text": text,
        "text_length": lengths.astype(np.int32),
        "category_id": categories.astype(np.int32),
    }
    return word_emb, articles, num_categories


def _cfg(**kw):
    base = dict(
        word_embedding_size=WORD_DIM,
        vocab_size=VOCAB,
        truncate_tokens_length=TEXT_LEN,
        acr_embeddings_size=10,
        cnn_filter_sizes=(2, 3),
        cnn_num_filters=8,
        rnn_units=12,
        learning_rate=3e-3,
        batch_size=8,
        training_epochs=4,
    )
    base.update(kw)
    return ACRConfig(**base)


@pytest.mark.parametrize("extractor", ["CNN", "GRU", "LSTM"])
@pytest.mark.slow
def test_classifier_trains_and_exports(extractor, tmp_path):
    word_emb, articles, n_cats = _corpus()
    cfg = _cfg(text_feature_extractor=extractor)
    specs = (ACRLabelSpec("category_id", n_cats, "multiclass"),)
    weights = {"category_id": np.ones(n_cats, np.float32)}
    trainer = ACRTrainer(cfg, word_emb, specs, weights)
    losses = trainer.fit(articles)
    assert losses[-1] < losses[0], losses

    matrix = trainer.build_ace_matrix(articles)
    assert matrix.shape == (N_ARTICLES + 1, cfg.acr_embeddings_size)
    np.testing.assert_allclose(matrix[0], matrix[1:].mean(axis=0), atol=1e-5)
    assert np.isfinite(matrix).all()

    # handoff pickle + NAR-side load with L2 norm and scaling
    path = export_ace_pickle(
        tmp_path / "ace.pickle", {"category_id": {}}, {"ids": articles["article_id"]},
        matrix,
    )
    _, _, ace = load_ace_for_nar(path, scale_factor=6.0)
    norms = np.linalg.norm(ace[1:], axis=1)
    np.testing.assert_allclose(norms, 6.0, rtol=1e-4)


def test_autoencoder_reconstruction_improves():
    word_emb, articles, _ = _corpus()
    cfg = _cfg(training_task="autoencoder", text_feature_extractor="GRU",
               autoencoder_noise=0.01, training_epochs=6)
    trainer = ACRTrainer(cfg, word_emb)
    losses = trainer.fit(articles)
    assert losses[-1] < losses[0], losses
    ace = trainer.predict_all_ace(articles)
    assert ace.shape == (N_ARTICLES, cfg.acr_embeddings_size)
    assert np.abs(ace).max() <= 1.0 + 1e-5  # tanh bottleneck


def test_noncontiguous_ids_rejected():
    word_emb, articles, n_cats = _corpus()
    articles["article_id"][3] = 999
    cfg = _cfg()
    trainer = ACRTrainer(
        cfg, word_emb, (ACRLabelSpec("category_id", n_cats, "multiclass"),)
    )
    trainer.fit(articles)
    with pytest.raises(AssertionError):
        trainer.build_ace_matrix(articles)


def test_acr_evaluate_on_train():
    word_emb, articles, n_cats = _corpus()
    cfg = _cfg(training_epochs=8, learning_rate=5e-3)
    specs = (ACRLabelSpec("category_id", n_cats, "multiclass"),)
    trainer = ACRTrainer(cfg, word_emb, specs)
    trainer.fit(articles)
    metrics = trainer.evaluate(articles)
    # the objective is to overfit: train accuracy well above chance
    assert metrics["accuracy-category_id"] > 1.5 / n_cats, metrics


# ---------------------------------------------------------------------------
# Bidirectional RNN option (reference acr_model.py:316-399,
# rnn_direction='bidirectional')
# ---------------------------------------------------------------------------

def test_stacked_gru_bidirectional_shapes_and_fwd_parity():
    """[fwd ‖ bwd] concat doubles the feature width, and the forward half is
    bit-identical to the unidirectional stack (same flax param paths ⇒ same
    init for the shared forward layers)."""
    import jax
    import jax.numpy as jnp
    from chameleon_recsys_tpu.ops.rnn import StackedGRU

    b, t, d, u, layers = 3, 7, 5, 6, 2
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(b, t, d).astype(np.float32))
    mask = jnp.asarray(np.tril(np.ones((b, t)), k=3).astype(bool))

    uni = StackedGRU(u, layers)
    bi = StackedGRU(u, layers, direction="bidirectional")
    key = jax.random.PRNGKey(0)
    p_uni = uni.init(key, x, mask)
    p_bi = bi.init(key, x, mask)

    out_uni, fin_uni = uni.apply(p_uni, x, mask)
    out_bi, fin_bi = bi.apply(p_bi, x, mask)
    assert out_bi.shape == (b, t, 2 * u)
    assert fin_bi.shape == (layers, b, 2 * u)

    # layer 0's forward params share the path "layer_0" in both models
    np.testing.assert_allclose(
        np.asarray(p_bi["params"]["layer_0"]["input_proj"]["kernel"]),
        np.asarray(p_uni["params"]["layer_0"]["input_proj"]["kernel"]),
    )
    # single-layer forward half == unidirectional layer on the same input
    uni1 = StackedGRU(u, 1)
    bi1 = StackedGRU(u, 1, direction="bidirectional")
    p_uni1 = uni1.init(key, x, mask)
    p_bi1 = bi1.init(key, x, mask)
    out_uni1, _ = uni1.apply(p_uni1, x, mask)
    out_bi1, _ = bi1.apply(p_bi1, x, mask)
    np.testing.assert_allclose(
        np.asarray(out_bi1[..., :u]), np.asarray(out_uni1), rtol=1e-6, atol=1e-6
    )


def test_stacked_gru_bidirectional_backward_is_reversed_scan():
    """The backward half at step t must equal a forward scan over the
    reversed sequence, read back in reverse (cuDNN bidirectional semantics)."""
    import jax
    import jax.numpy as jnp
    from chameleon_recsys_tpu.ops.rnn import StackedGRU

    b, t, d, u = 2, 5, 4, 3
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(b, t, d).astype(np.float32))
    mask = jnp.ones((b, t), bool)

    bi = StackedGRU(u, 1, direction="bidirectional")
    p = bi.init(jax.random.PRNGKey(2), x, mask)
    out, _ = bi.apply(p, x, mask)

    # rebuild the bwd half with a unidirectional stack using the bwd params
    uni = StackedGRU(u, 1)
    p_bwd = {"params": {"layer_0": p["params"]["layer_0_bwd"]}}
    out_rev, _ = uni.apply(p_bwd, jnp.flip(x, axis=1), mask)
    np.testing.assert_allclose(
        np.asarray(out[..., u:]),
        np.asarray(jnp.flip(out_rev, axis=1)),
        rtol=1e-6, atol=1e-6,
    )


@pytest.mark.parametrize("extractor", ["GRU", "LSTM"])
def test_classifier_bidirectional_trains(extractor, tmp_path):
    word_emb, articles, n_cats = _corpus()
    cfg = _cfg(text_feature_extractor=extractor, rnn_direction="bidirectional",
               training_epochs=2)
    specs = (ACRLabelSpec("category_id", n_cats, "multiclass"),)
    weights = {"category_id": np.ones(n_cats, np.float32)}
    trainer = ACRTrainer(cfg, word_emb, specs, weights)
    losses = trainer.fit(articles)
    assert np.isfinite(losses[-1])
    ace = trainer.predict_all_ace(articles)
    assert ace.shape == (N_ARTICLES, cfg.acr_embeddings_size)
    assert np.isfinite(ace).all()


def test_autoencoder_bidirectional_encoder():
    word_emb, articles, _ = _corpus(seed=3)
    cfg = _cfg(training_task="autoencoder", text_feature_extractor="GRU",
               rnn_direction="bidirectional", training_epochs=2)
    trainer = ACRTrainer(cfg, word_emb)
    losses = trainer.fit(articles)
    assert np.isfinite(losses[-1])
    ace = trainer.predict_all_ace(articles)
    assert ace.shape == (N_ARTICLES, cfg.acr_embeddings_size)
