"""CandidateSamplingManager unit tests — the same 8 behavioral contracts the
reference's only test file checks
(nar_module/nar/benchmarks/candidate_sampling_tests.py:10-103), against our
numpy twin with an injected fake buffer."""
import numpy as np
import pytest

from chameleon_recsys_tpu.baselines.candidate_sampling import (
    CandidateSamplingManager,
)

FAKE_BUFFER = np.array([5, 6, 7, 8, 9, 10, 5, 5, 6, 0, 0, 0], np.int64)


@pytest.fixture
def manager():
    return CandidateSamplingManager(
        lambda: FAKE_BUFFER, rng=np.random.RandomState(7)
    )


def test_buffer_sample_size_and_values(manager):
    sample = manager.get_sample_from_recently_clicked_items_buffer(5)
    assert len(sample) == 5
    assert set(sample.tolist()) <= {5, 6, 7, 8, 9, 10}


def test_buffer_sample_caps_at_available(manager):
    sample = manager.get_sample_from_recently_clicked_items_buffer(100)
    assert len(sample) == 9  # non-zero entries only


def test_candidate_samples_shape_and_uniqueness(manager):
    out = manager.get_candidate_samples(
        4, [1, 2], np.array([5, 6, 7, 8, 9, 5, 6])
    )
    assert out.shape == (4,)
    nonzero = out[out != 0]
    assert len(set(nonzero.tolist())) == len(nonzero)


def test_candidate_samples_zero_padding(manager):
    out = manager.get_candidate_samples(6, [1], np.array([5, 6]))
    assert (out[2:] == 0).all()
    assert set(out[:2].tolist()) == {5, 6}


def test_in_session_items_excluded(manager):
    out = manager.get_candidate_samples(
        5, [5, 6], np.array([5, 6, 7, 8, 9])
    )
    assert not ({5, 6} & set(out.tolist()))


def test_samples_per_click_padded_rows(manager):
    out = manager.get_samples_per_click(
        np.array([3, 4, 0, 0]), np.array([5, 6, 7, 8]), 3
    )
    assert out.shape == (4, 3)
    assert (out[2:] == 0).all()
    assert (out[:2] != 0).any()


def test_batch_negative_samples_shape(manager):
    batch = np.array([[1, 2, 0], [3, 4, 5]], np.int64)
    out = manager.get_batch_negative_samples(
        batch, num_negatives=4, negative_sample_from_buffer=6
    )
    assert out.shape == (2, 3, 4)


def test_batch_negative_samples_exclusion(manager):
    batch = np.array([[5, 6, 7]], np.int64)
    out = manager.get_batch_negative_samples(
        batch, num_negatives=4, negative_sample_from_buffer=9
    )
    sampled = set(out.reshape(-1).tolist()) - {0}
    assert not (sampled & {5, 6, 7})
