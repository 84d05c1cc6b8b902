"""Unsupervised ACE baselines: shapes, padding row, and semantic sanity —
similar documents get closer embeddings than dissimilar ones."""
import numpy as np
import pytest

from chameleon_recsys_tpu.acr.ace_baselines import (
    doc2vec_ace,
    lsa_ace,
    w2v_tfidf_ace,
)


def _cos(a, b):
    return float(
        np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12)
    )


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.RandomState(0)
    # two topic clusters of token ids
    vocab_size = 100
    n, l = 12, 15
    token_ids = np.zeros((n, l), np.int32)
    topics = []
    for i in range(n):
        topic = i % 2
        topics.append(topic)
        lo = 10 + topic * 40
        token_ids[i, :12] = rng.randint(lo, lo + 25, 12)
    texts = [
        " ".join(f"tok{t}" for t in row[row != 0]) for row in token_ids
    ]
    word_emb = rng.randn(vocab_size, 16).astype(np.float32)
    return token_ids, texts, word_emb, np.array(topics), vocab_size


def _topic_separation(matrix, topics):
    emb = matrix[1:]
    same, diff = [], []
    for i in range(len(emb)):
        for j in range(i + 1, len(emb)):
            (same if topics[i] == topics[j] else diff).append(
                _cos(emb[i], emb[j])
            )
    return np.mean(same), np.mean(diff)


@pytest.mark.slow
def test_lsa_ace(corpus):
    token_ids, texts, word_emb, topics, _ = corpus
    matrix = lsa_ace(texts, dim=8)
    assert matrix.shape == (len(texts) + 1, 8)
    np.testing.assert_allclose(matrix[0], matrix[1:].mean(axis=0), atol=1e-6)
    same, diff = _topic_separation(matrix, topics)
    assert same > diff


def test_w2v_tfidf_ace(corpus):
    token_ids, texts, word_emb, topics, _ = corpus
    matrix = w2v_tfidf_ace(token_ids, word_emb)
    assert matrix.shape == (len(token_ids) + 1, word_emb.shape[1])
    same, diff = _topic_separation(matrix, topics)
    assert same > diff


def test_doc2vec_ace(corpus):
    token_ids, texts, word_emb, topics, vocab_size = corpus
    matrix = doc2vec_ace(
        token_ids, vocab_size, dim=16, epochs=30, n_negative=16,
        learning_rate=5e-2, batch_size=12,
    )
    assert matrix.shape == (len(token_ids) + 1, 16)
    same, diff = _topic_separation(matrix, topics)
    assert same > diff, (same, diff)
