"""Temporal runner for GRU4Rec / SR-GNN over synthetic hours."""
import numpy as np
import pytest

from chameleon_recsys_tpu.baselines.gru4rec import GRU4RecJax
from chameleon_recsys_tpu.baselines.neural_runner import NeuralBaselineRunner
from chameleon_recsys_tpu.baselines.sr_gnn import SRGNNJax, SRGNNSessionAdapter
from chameleon_recsys_tpu.data.synthetic import (
    make_synthetic_corpus,
    synthetic_hour_sessions,
)
from chameleon_recsys_tpu.metrics.evaluation import create_eval_metrics

from conftest import tiny_article_schema, tiny_nar_config, tiny_session_schema


@pytest.fixture(scope="module")
def stream_setup():
    cfg = tiny_nar_config(batch_size=8, max_session_length=6)
    art = tiny_article_schema(100)
    sess = tiny_session_schema(100)
    corpus = make_synthetic_corpus(art, ace_dim=8)

    def hour_source(h):
        return synthetic_hour_sessions(corpus, sess, h, 16, cfg.max_session_length)

    def create_metrics():
        return create_eval_metrics(
            cfg.metrics_top_n, 0.02, False, corpus.ace_matrix,
            np.zeros(10, np.int64),
        )

    return cfg, art, sess, corpus, hour_source, create_metrics


def test_gru4rec_temporal_run(stream_setup):
    cfg, art, sess, corpus, hour_source, create_metrics = stream_setup
    model = GRU4RecJax(art.num_items, layers=(16,), n_sample=16, seed=0)
    runner = NeuralBaselineRunner(
        model, cfg, sess, art.num_items, create_metrics
    )
    rows = runner.run(hour_source, hours=range(3), training_hours_for_each_eval=2)
    assert len(rows) == 1
    name = runner.recommender_name()
    assert f"hitrate_at_n_{name}" in rows[0]
    assert 0.0 <= rows[0][f"hitrate_at_n_{name}"] <= 1.0


def test_srgnn_temporal_run(stream_setup):
    cfg, art, sess, corpus, hour_source, create_metrics = stream_setup
    model = SRGNNSessionAdapter(
        SRGNNJax(art.num_items, hidden_size=12, seed=0), n_sample=16
    )
    runner = NeuralBaselineRunner(
        model, cfg, sess, art.num_items, create_metrics
    )
    rows = runner.run(hour_source, hours=range(3), training_hours_for_each_eval=2)
    assert len(rows) == 1
    name = runner.recommender_name()
    assert f"mrr_at_n_{name}" in rows[0]
