"""Hyperparameter sweep runner over the temporal harness."""
import json
import os

from chameleon_recsys_tpu.config import RunConfig
from chameleon_recsys_tpu.data.synthetic import (
    make_synthetic_corpus,
    synthetic_hour_sessions,
)
from chameleon_recsys_tpu.train.sweep import grid, run_sweep
from chameleon_recsys_tpu.train.temporal import TemporalHarness

from conftest import tiny_article_schema, tiny_nar_config, tiny_session_schema


def test_grid_combinations():
    combos = grid({"learning_rate": [1e-3, 1e-4], "rnn_units": [8, 16, 24]})
    assert len(combos) == 6
    assert {"learning_rate": 1e-3, "rnn_units": 24} in combos


def test_run_sweep_orders_by_objective(tmp_path):
    cfg = tiny_nar_config(batch_size=8, max_session_length=6)
    art = tiny_article_schema(120)
    sess = tiny_session_schema(120)
    corpus = make_synthetic_corpus(art, ace_dim=8)
    run_cfg = RunConfig(model_dir=str(tmp_path), training_hours_for_each_eval=1)

    def harness_factory(trial_cfg, trial_run_cfg):
        return TemporalHarness(
            trial_cfg, trial_run_cfg, sess, art, corpus.ace_matrix,
            corpus.metadata,
        )

    def hour_source(h):
        return synthetic_hour_sessions(corpus, sess, h, 8, cfg.max_session_length)

    results = run_sweep(
        cfg,
        run_cfg,
        {"rnn_units": [8, 16]},
        harness_factory,
        hour_source,
        hours=range(2),
        objective="mrr_at_n",
    )
    assert len(results) == 2
    assert results[0].objective >= results[1].objective
    assert os.path.exists(tmp_path / "sweep_results.json")
    with open(tmp_path / "sweep_results.json") as f:
        payload = json.load(f)
    assert len(payload) == 2
