"""The batched baseline predicts must reproduce their per-click scalar
transliterations (kept in-class as ``_predict_scalar`` oracles) on random
streaming state — including padding clicks, zero-padded valid rows, and
score-tie ordering."""
import numpy as np
import pytest

from chameleon_recsys_tpu.baselines.benchmarks import StreamStateView
from chameleon_recsys_tpu.baselines.content_based import ContentBasedRecommender
from chameleon_recsys_tpu.baselines.item_cooccurrence import (
    ItemCooccurrenceRecommender,
)
from chameleon_recsys_tpu.baselines.item_knn import ItemKNNRecommender
from chameleon_recsys_tpu.baselines.recently_popular import (
    RecentlyPopularRecommender,
)
from chameleon_recsys_tpu.baselines.sequential_rules import (
    SequentialRulesRecommender,
)
from chameleon_recsys_tpu.state.host_state import HostState

NUM_ITEMS = 60
B, T, K = 6, 5, 4   # sessions, steps, negatives per click


def _make_view(rng):
    host = HostState(NUM_ITEMS)
    # co-occurrence counts from a few random batches
    for _ in range(5):
        clicked = rng.randint(0, NUM_ITEMS, size=(B, T + 1)).astype(np.int64)
        host.update_items_coocurrences(clicked)
    buffer_ids = rng.randint(0, NUM_ITEMS, size=128).astype(np.int32)
    pop = np.bincount(buffer_ids[buffer_ids != 0], minlength=NUM_ITEMS).astype(
        np.int64
    )
    return StreamStateView(
        host, buffer_ids, rng.rand(NUM_ITEMS).astype(np.float32), pop
    )


def _batch(rng, pad_prob=0.3):
    items = rng.randint(1, NUM_ITEMS, size=(B, T)).astype(np.int64)
    items[rng.rand(B, T) < pad_prob] = 0
    items[-1] = 0  # a fully padded session
    valid = rng.randint(0, NUM_ITEMS, size=(B, T, K + 1)).astype(np.int64)
    valid[rng.rand(B, T, K + 1) < 0.15] = 0  # scarce-negative padding
    return items, valid


def _assert_predicts_match(clf, rng, trials=8, **predict_kw):
    for trial in range(trials):
        items, valid = _batch(rng)
        got = clf.predict(None, items, topk=5, valid_items=valid, **predict_kw)
        want = clf._predict_scalar(
            None, items, topk=5, valid_items=valid, **predict_kw
        )
        np.testing.assert_array_equal(got, want, err_msg=f"trial {trial}")


def test_recently_popular_matches_scalar():
    rng = np.random.RandomState(0)
    clf = RecentlyPopularRecommender(_make_view(rng), {}, [])
    _assert_predicts_match(clf, rng)


def test_content_based_matches_scalar():
    rng = np.random.RandomState(1)
    # duplicate embedding rows force exact similarity ties
    ace = rng.randn(NUM_ITEMS, 16).astype(np.float32)
    ace[7] = ace[11]
    ace[20] = 0.0  # zero-vector row
    clf = ContentBasedRecommender(
        _make_view(rng), {"content_article_embeddings_matrix": ace}, []
    )
    _assert_predicts_match(clf, rng)


def test_item_cooccurrence_matches_scalar():
    rng = np.random.RandomState(2)
    clf = ItemCooccurrenceRecommender(_make_view(rng), {}, [])
    _assert_predicts_match(clf, rng)


@pytest.mark.parametrize("alpha", [0.75, 0.5])
def test_item_knn_matches_scalar(alpha):
    rng = np.random.RandomState(3)
    clf = ItemKNNRecommender(
        _make_view(rng), {"reg_lambda": 20, "alpha": alpha}, []
    )
    _assert_predicts_match(clf, rng)


@pytest.mark.parametrize("decay", ["div", "linear", "same"])
def test_sequential_rules_matches_scalar(decay):
    """SR tie order is arbitrary in the scalar path (dict insertion order);
    compare as score-consistent rankings instead of exact arrays: the sets
    at every score level must match.  With "linear" decay zero-scored rules
    must still be included (presence = membership, not score > 0)."""
    rng = np.random.RandomState(4)
    clf = SequentialRulesRecommender(
        _make_view(rng),
        {"max_clicks_dist": 10, "dist_between_clicks_decay": decay},
        [],
    )
    for _ in range(4):
        items, _ = _batch(rng, pad_prob=0.1)
        nxt = rng.randint(1, NUM_ITEMS, size=(B, 1)).astype(np.int64)
        clf.train(None, np.arange(B), items, nxt)

    rules = clf.rules
    for trial in range(8):
        items, valid = _batch(rng)
        got = clf.predict(None, items, topk=5, valid_items=valid)
        want = clf._predict_scalar(None, items, topk=5, valid_items=valid)
        rows, cols = np.nonzero(items)
        for r, c in zip(rows, cols):
            g, w = got[r, c], want[r, c]
            targets = rules.get(int(items[r, c]), {})
            row_valid = set(int(x) for x in valid[r, c])
            # identical score sequence (ties may place different members,
            # both orders are valid under the arbitrary scalar tie order)
            g_scores = [targets[int(x)] for x in g if x != 0]
            w_scores = [targets[int(x)] for x in w if x != 0]
            assert g_scores == w_scores, f"trial {trial} ({r},{c})"
            # every batched pick is a legal one
            assert all(int(x) in row_valid and int(x) in targets
                       for x in g if x != 0)
        np.testing.assert_array_equal(got[items == 0], 0)
