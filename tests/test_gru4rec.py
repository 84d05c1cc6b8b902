"""GRU4Rec JAX baseline: loss math vs numpy oracle, training descent, ranking."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from chameleon_recsys_tpu.baselines.gru4rec import (
    GRU4RecJax,
    bpr_max_loss,
    cross_entropy_loss,
)


def test_bpr_max_matches_oracle():
    rng = np.random.RandomState(0)
    n, n_sample = 4, 3
    scores = rng.randn(n, n + n_sample).astype(np.float32)
    valid_row = np.array([True, True, True, False])
    valid_col = np.concatenate([valid_row, np.ones(n_sample, bool)])
    bpreg = 0.5

    got = float(
        bpr_max_loss(jnp.asarray(scores), jnp.asarray(valid_row),
                     jnp.asarray(valid_col), bpreg)
    )

    # oracle: per valid row, softmax over valid non-diagonal columns
    losses = []
    for i in range(n):
        if not valid_row[i]:
            continue
        cols = [j for j in range(n + n_sample) if valid_col[j] and j != i]
        s = np.exp(scores[i, cols] - scores[i, cols].max())
        s = s / s.sum()
        sig = 1.0 / (1.0 + np.exp(-(scores[i, i] - scores[i, cols])))
        loss = -np.log((sig * s).sum() + 1e-24) + bpreg * (
            (scores[i, cols] ** 2) * s
        ).sum()
        losses.append(loss)
    assert got == pytest.approx(np.mean(losses), rel=1e-5)


def test_cross_entropy_matches_oracle():
    rng = np.random.RandomState(1)
    n, n_sample = 3, 2
    scores = rng.randn(n, n + n_sample).astype(np.float32)
    valid = np.ones(n, bool)
    valid_col = np.ones(n + n_sample, bool)
    got = float(
        cross_entropy_loss(jnp.asarray(scores), jnp.asarray(valid),
                           jnp.asarray(valid_col))
    )
    expected = []
    for i in range(n):
        logits = scores[i]
        p = np.exp(logits - logits.max())
        p /= p.sum()
        expected.append(-np.log(p[i]))
    assert got == pytest.approx(np.mean(expected), rel=1e-5)


def test_gru4rec_learns_transitions():
    """Deterministic item chains must become predictable."""
    n_items = 30
    model = GRU4RecJax(n_items, layers=(16,), n_sample=8, learning_rate=0.5, seed=0)
    rng = np.random.RandomState(0)
    b, t = 8, 5
    buffer_ids = np.arange(1, n_items)

    def make_batch():
        starts = rng.randint(1, n_items - t - 1, size=b)
        items = np.stack([np.arange(s, s + t) for s in starts])  # chains i→i+1
        labels = items + 1
        return items.astype(np.int32), labels.astype(np.int32)

    losses = []
    for _ in range(150):
        items, labels = make_batch()
        losses.append(model.fit_batch(items, labels, buffer_ids))
    assert losses[-1] < losses[0] * 0.8, (losses[0], losses[-1])

    items, labels = make_batch()
    neg = rng.randint(1, n_items, size=(b, t, 5)).astype(np.int32)
    ranked = model.rank_candidates(items, labels, neg)
    # the true next item should usually be ranked first
    hits = (ranked[:, :, 0] == labels).mean()
    assert hits > 0.5, hits


def test_rank_candidates_padding_last():
    model = GRU4RecJax(20, layers=(8,), n_sample=4, seed=1)
    items = np.array([[1, 2, 0]], np.int32)
    labels = np.array([[2, 3, 0]], np.int32)
    neg = np.array([[[4, 0], [5, 0], [0, 0]]], np.int32)
    ranked = model.rank_candidates(items, labels, neg)
    # padding id 0 ranks last on valid clicks
    assert ranked[0, 0, -1] == 0
    assert set(ranked[0, 0, :2].tolist()) == {2, 4}
