"""Unsupervised ACE baselines: LSA, W2V·TF-IDF, doc2vec.

Re-creation of the reference's content-embedding baselines
(acr_module/acr/preprocessing/lsa_gcom.py:141-200,
w2v_tfidf_gcom.py:203-220, doc2vec_gcom.py:211-234).  Each produces the same
artifact the ACR trainer does: a [num_articles+1, dim] float matrix with
padding row 0, ready for the NAR handoff pickle.

The reference's doc2vec uses gensim (not available here); it is re-expressed
as a compact PV-DBOW trainer in JAX — a trainable document-embedding table
whose rows predict their articles' words through a sampled softmax, trained
with Adam on the TPU.
"""
from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np


def _l2_normalize_rows(x: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(x, axis=1, keepdims=True)
    return np.divide(x, norms, out=np.zeros_like(x), where=norms > 0)


def _with_padding_row(embeddings: np.ndarray) -> np.ndarray:
    matrix = np.zeros((embeddings.shape[0] + 1, embeddings.shape[1]), np.float32)
    matrix[1:] = embeddings
    matrix[0] = embeddings.mean(axis=0)
    return matrix


def lsa_ace(
    texts: Sequence[str],
    dim: int = 250,
    max_features: int = 50000,
    ngram_range=(1, 3),
    seed: int = 42,
) -> np.ndarray:
    """TF-IDF (1-3 grams) → TruncatedSVD → L2 norm
    (reference lsa_gcom.py:141-200)."""
    from sklearn.decomposition import TruncatedSVD
    from sklearn.feature_extraction.text import TfidfVectorizer

    tfidf = TfidfVectorizer(
        max_features=max_features, ngram_range=ngram_range, sublinear_tf=True
    )
    x = tfidf.fit_transform(texts)
    svd = TruncatedSVD(n_components=min(dim, x.shape[1] - 1), random_state=seed)
    reduced = svd.fit_transform(x)
    if reduced.shape[1] < dim:  # tiny corpora: pad to requested dim
        reduced = np.pad(reduced, ((0, 0), (0, dim - reduced.shape[1])))
    return _with_padding_row(_l2_normalize_rows(reduced).astype(np.float32))


def w2v_tfidf_ace(
    token_ids: np.ndarray,  # [N, L] int token matrix, 0 = padding
    word_embeddings: np.ndarray,  # [vocab, D]
) -> np.ndarray:
    """TF-IDF-weighted average of word vectors
    (reference w2v_tfidf_gcom.py:203-220), vectorized over the token matrix."""
    n, l = token_ids.shape
    vocab = word_embeddings.shape[0]
    # document frequency per token id
    df = np.zeros(vocab, np.float64)
    for i in range(n):
        df[np.unique(token_ids[i][token_ids[i] != 0])] += 1.0
    idf = np.log((1.0 + n) / (1.0 + df)) + 1.0

    docs = np.zeros((n, word_embeddings.shape[1]), np.float64)
    for i in range(n):
        toks = token_ids[i][token_ids[i] != 0]
        if len(toks) == 0:
            continue
        # one tf·idf weight per UNIQUE word (like TfidfVectorizer) — weighting
        # every occurrence would count repeated words quadratically
        uniq, counts = np.unique(toks, return_counts=True)
        tf = counts.astype(np.float64) / len(toks)
        weights = tf * idf[uniq]
        weights /= max(weights.sum(), 1e-12)
        docs[i] = weights @ word_embeddings[uniq]
    return _with_padding_row(_l2_normalize_rows(docs).astype(np.float32))


def doc2vec_ace(
    token_ids: np.ndarray,  # [N, L]
    vocab_size: int,
    dim: int = 250,
    epochs: int = 30,
    n_negative: int = 64,
    learning_rate: float = 1e-2,
    batch_size: int = 256,
    seed: int = 42,
) -> np.ndarray:
    """PV-DBOW document embeddings trained in JAX: each document vector
    predicts its words against sampled negatives (replaces the reference's
    gensim Doc2Vec, doc2vec_gcom.py:211-234; vec 250, 30 epochs)."""
    import jax
    import jax.numpy as jnp
    import optax

    n, l = token_ids.shape
    rng = jax.random.PRNGKey(seed)
    rng, k1, k2 = jax.random.split(rng, 3)
    doc_emb = jax.random.normal(k1, (n, dim)) * 0.01
    word_out = jax.random.normal(k2, (vocab_size, dim)) * 0.01
    params = {"doc": doc_emb, "word": word_out}
    optimizer = optax.adam(learning_rate)
    opt_state = optimizer.init(params)
    tokens = jnp.asarray(token_ids)

    def loss_fn(p, doc_idx, neg_words, key):
        docs = p["doc"][doc_idx]  # [B, dim]
        words = tokens[doc_idx]  # [B, L]
        mask = (words != 0).astype(jnp.float32)
        pos_scores = jnp.einsum("bd,bld->bl", docs, p["word"][words])
        neg_scores = jnp.einsum("bd,kd->bk", docs, p["word"][neg_words])
        pos_loss = jnp.sum(jax.nn.softplus(-pos_scores) * mask) / jnp.maximum(
            jnp.sum(mask), 1.0
        )
        neg_loss = jnp.mean(jax.nn.softplus(neg_scores))
        return pos_loss + neg_loss

    @jax.jit
    def step(p, opt_state, doc_idx, neg_words, key):
        loss, grads = jax.value_and_grad(loss_fn)(p, doc_idx, neg_words, key)
        updates, opt_state = optimizer.update(grads, opt_state, p)
        return optax.apply_updates(p, updates), opt_state, loss

    np_rng = np.random.RandomState(seed)
    nonzero_tokens = token_ids[token_ids != 0]
    if len(nonzero_tokens) == 0:
        nonzero_tokens = np.array([1])
    for _ in range(epochs):
        order = np_rng.permutation(n)
        for start in range(0, n, batch_size):
            idx = order[start : start + batch_size]
            if len(idx) < batch_size:
                idx = np.concatenate([idx, idx[: batch_size - len(idx)]])
            neg = np_rng.choice(nonzero_tokens, size=n_negative)
            rng, key = jax.random.split(rng)
            params, opt_state, _ = step(
                params, opt_state, jnp.asarray(idx), jnp.asarray(neg), key
            )

    docs = np.asarray(params["doc"])
    return _with_padding_row(_l2_normalize_rows(docs).astype(np.float32))
