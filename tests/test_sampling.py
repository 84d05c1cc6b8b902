"""Negative-sampling invariants (reference semantics,
nar_module/nar/nar_model.py:1220-1304 and the numpy twin
benchmarks/candidate_sampling.py + its tests)."""
import numpy as np
import jax
import jax.numpy as jnp

from chameleon_recsys_tpu.ops.sampling import sample_from_buffer, sample_negatives


def _session_batch():
    # 3 sessions: normal, short (padded), fully padded
    return jnp.array(
        [
            [1, 2, 3, 4, 5],
            [6, 7, 0, 0, 0],
            [0, 0, 0, 0, 0],
        ],
        jnp.int32,
    )


def test_sample_from_buffer_only_nonzero():
    buffer = jnp.array([3, 5, 7, 0, 0, 0, 0, 0], jnp.int32)
    out = np.asarray(sample_from_buffer(jax.random.PRNGKey(0), buffer, 5))
    assert set(out[:3].tolist()) == {3, 5, 7}
    assert (out[3:] == 0).all()


def test_negatives_exclude_session_and_padding():
    clicked = _session_batch()
    buffer = jnp.arange(0, 64, dtype=jnp.int32)  # ids 0..63
    neg = sample_negatives(
        jax.random.PRNGKey(1),
        clicked,
        buffer,
        num_negatives=4,
        buffer_sample_size=16,
    )
    neg = np.asarray(neg)
    assert neg.shape == (3, 5, 4)
    clicked_np = np.asarray(clicked)
    for b in range(3):
        session_items = set(clicked_np[b].tolist()) - {0}
        for t in range(5):
            row = neg[b, t]
            if clicked_np[b, t] == 0:
                assert (row == 0).all()
                continue
            nonzero = row[row != 0]
            # no in-session items, no duplicates
            assert not (set(nonzero.tolist()) & session_items)
            assert len(set(nonzero.tolist())) == len(nonzero)


def test_negatives_full_when_candidates_abound():
    clicked = _session_batch()
    buffer = jnp.arange(0, 512, dtype=jnp.int32) % 200
    neg = np.asarray(
        sample_negatives(
            jax.random.PRNGKey(2),
            clicked,
            buffer,
            num_negatives=8,
            buffer_sample_size=128,
        )
    )
    # valid clicks get a full complement of 8 distinct negatives
    for b, t in [(0, 0), (0, 4), (1, 1)]:
        row = neg[b, t]
        assert (row != 0).all()
        assert len(set(row.tolist())) == 8


def test_negatives_zero_padded_when_candidates_scarce():
    # only 3 candidate values exist outside the session
    clicked = jnp.array([[1, 2, 0, 0]], jnp.int32)
    buffer = jnp.array([5, 6, 7, 0, 0, 0, 0, 0], jnp.int32)
    neg = np.asarray(
        sample_negatives(
            jax.random.PRNGKey(3),
            clicked,
            buffer,
            num_negatives=6,
            buffer_sample_size=8,
        )
    )
    row = neg[0, 0]
    nonzero = row[row != 0]
    assert set(nonzero.tolist()) <= {5, 6, 7}
    assert len(nonzero) == 3  # padded with zeros beyond available candidates


def test_popularity_bias():
    """A value repeated heavily in the pool must be sampled more often."""
    b_sessions = jnp.tile(jnp.array([[100, 101, 0, 0]], jnp.int32), (1, 1))
    # buffer dominated by item 7
    buffer = jnp.array([7] * 120 + [8, 9, 10, 11, 12, 13, 14, 15], jnp.int32)
    hits_7 = hits_15 = 0
    for seed in range(200):
        neg = np.asarray(
            sample_negatives(
                jax.random.PRNGKey(seed),
                b_sessions,
                buffer,
                num_negatives=2,
                buffer_sample_size=32,
            )
        )[0, 0]
        hits_7 += int(7 in neg)
        hits_15 += int(15 in neg)
    assert hits_7 > hits_15 * 2


def test_min_key_dedup_matches_shuffle_unique_distribution():
    """First-of-shuffle selection: uniform over distinct values when each
    value appears once."""
    clicked = jnp.array([[50, 51, 0]], jnp.int32)
    buffer = jnp.array([1, 2, 3, 4, 0, 0, 0, 0], jnp.int32)
    counts = {1: 0, 2: 0, 3: 0, 4: 0}
    n_trials = 600
    for seed in range(n_trials):
        neg = np.asarray(
            sample_negatives(
                jax.random.PRNGKey(10_000 + seed),
                clicked,
                buffer,
                num_negatives=1,
                buffer_sample_size=8,
            )
        )[0, 0, 0]
        if int(neg) in counts:
            counts[int(neg)] += 1
    freqs = np.array(list(counts.values())) / n_trials
    # each of the 4 values picked ~25% of the time
    assert (np.abs(freqs - 0.25) < 0.08).all()


def test_approx_topk_keeps_sampler_invariants():
    """The bench config's `approx_negative_topk` path (lax.approx_max_k
    instead of the full sort, ops/sampling.py::_make_per_click_idx) must satisfy the
    same exclusion / dedup / padding contract as the exact path."""
    from chameleon_recsys_tpu.ops.sampling import sample_negatives_pooled

    clicked = _session_batch()
    buffer = jnp.arange(0, 512, dtype=jnp.int32) % 200
    pool_ext, neg_idx, neg = sample_negatives_pooled(
        jax.random.PRNGKey(3),
        clicked,
        buffer,
        num_negatives=8,
        buffer_sample_size=128,
        approx_topk=True,
    )
    neg = np.asarray(neg)
    clicked_np = np.asarray(clicked)
    assert neg.shape == (3, 5, 8)
    # ids are consistent with the returned pool indices
    assert (np.asarray(pool_ext)[np.asarray(neg_idx)] == neg).all()
    for b in range(3):
        session_items = set(clicked_np[b].tolist()) - {0}
        for t in range(5):
            row = neg[b, t]
            if clicked_np[b, t] == 0:
                assert (row == 0).all()
                continue
            nonzero = row[row != 0]
            assert not (set(nonzero.tolist()) & session_items)
            assert len(set(nonzero.tolist())) == len(nonzero)
            # candidates abound here: the approximate selection must still
            # fill the full complement
            assert len(nonzero) == 8


def test_first_pick_probability_proportional_to_duplicates():
    """Exact shuffle law: with K=1, P(picked = v) = dup_count(v) / total.

    Falsifies the segment-length weighting of the exponential-key scheme
    (ops/sampling.py): a wrong segment length or a key mixing valid and
    invalid occurrences shifts these ratios far beyond the test band.
    """
    clicked = jnp.array([[900, 901, 0]], jnp.int32)
    # pool duplicates: item 1 ×4, item 2 ×2, item 3 ×1, item 4 ×1 (total 8)
    buffer = jnp.array([1, 1, 1, 1, 2, 2, 3, 4] + [0] * 8, jnp.int32)
    expected = {1: 4 / 8, 2: 2 / 8, 3: 1 / 8, 4: 1 / 8}
    counts = {1: 0, 2: 0, 3: 0, 4: 0}
    n_trials = 1500
    for seed in range(n_trials):
        neg = int(
            np.asarray(
                sample_negatives(
                    jax.random.PRNGKey(77_000 + seed),
                    clicked,
                    buffer,
                    num_negatives=1,
                    buffer_sample_size=16,
                )
            )[0, 0, 0]
        )
        counts[neg] += 1
    for v, p in expected.items():
        freq = counts[v] / n_trials
        # 4-sigma band on a Bernoulli(p) mean over n_trials
        band = 4 * (p * (1 - p) / n_trials) ** 0.5
        assert abs(freq - p) < band + 0.01, (v, freq, p)
