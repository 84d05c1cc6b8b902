"""Hyperparameter sweep runner over the temporal harness."""
import pytest
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


@pytest.mark.slow
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


@pytest.mark.slow
def test_run_sweep_parallel_matches_serial(tmp_path):
    """max_parallel=2 (the reference's maxParallelTrials,
    nar_mlengine_hypertuning.yaml:8) must produce the same results file as
    the serial order — trials are fully independent."""
    cfg = tiny_nar_config(batch_size=8, max_session_length=6)
    art = tiny_article_schema(120)
    sess = tiny_session_schema(120)
    corpus = make_synthetic_corpus(art, ace_dim=8)

    def harness_factory(trial_cfg, trial_run_cfg):
        return TemporalHarness(
            trial_cfg, trial_run_cfg, sess, art, corpus.ace_matrix,
            corpus.metadata,
        )

    def hour_source(h):
        return synthetic_hour_sessions(corpus, sess, h, 8, cfg.max_session_length)

    def run(mode_dir, max_parallel):
        run_cfg = RunConfig(
            model_dir=str(tmp_path / mode_dir), training_hours_for_each_eval=1
        )
        return run_sweep(
            cfg, run_cfg, {"rnn_units": [8, 16]}, harness_factory,
            hour_source, hours=range(2), objective="mrr_at_n",
            max_parallel=max_parallel,
        )

    serial = run("serial", 1)
    parallel = run("parallel", 2)
    assert [r.trial_id for r in serial] == [r.trial_id for r in parallel]
    assert [r.overrides for r in serial] == [r.overrides for r in parallel]
    assert [r.objective for r in serial] == [r.objective for r in parallel]
    def load(mode_dir):
        with open(tmp_path / mode_dir / "sweep_results.json") as f:
            rows = json.load(f)
        # wall-clock throughput fields legitimately differ when trials
        # share the host; every quality metric must be identical
        for r in rows:
            for k in list(r["metrics"]):
                if k.startswith("train_") and k != "train_steps":
                    r["metrics"].pop(k)
        return rows

    assert load("serial") == load("parallel")


def test_load_sweep_spec_mlengine_yaml(tmp_path):
    """The reference ML Engine layout (nar_mlengine_hypertuning.yaml:1-51)
    translates parameterName -> NARConfig fields."""
    from chameleon_recsys_tpu.train.sweep import load_sweep_spec

    spec_path = tmp_path / "spec.yaml"
    spec_path.write_text(
        "trainingInput:\n"
        "  hyperparameters:\n"
        "    goal: MAXIMIZE\n"
        "    hyperparameterMetricTag: mrr_at_n\n"
        "    maxTrials: 30\n"
        "    maxParallelTrials: 2\n"
        "    params:\n"
        "      - parameterName: batch_size\n"
        "        type: DISCRETE\n"
        "        discreteValues: [64, 256]\n"
        "      - parameterName: train_total_negative_samples\n"
        "        type: DISCRETE\n"
        "        discreteValues: [5, 10]\n"
        "      - parameterName: dropout_keep_prob\n"
        "        type: DISCRETE\n"
        "        discreteValues: [0.8, 1.0]\n"
        "      - parameterName: reg_l2\n"
        "        type: DISCRETE\n"
        "        discreteValues: [0.00001]\n"
    )
    spec = load_sweep_spec(str(spec_path))
    assert spec.param_grid == {
        "batch_size": [64, 256],
        "negative_samples": [5, 10],
        "keep_prob": [0.8, 1.0],
        "reg_weight_decay": [0.00001],
    }
    assert spec.objective == "mrr_at_n"
    assert spec.goal == "MAXIMIZE"
    assert spec.max_trials == 30
    assert spec.max_parallel == 2
    # every NARConfig field named in the grid must exist
    import dataclasses as dc

    from chameleon_recsys_tpu.config import NARConfig

    fields = {f.name for f in dc.fields(NARConfig)}
    assert set(spec.param_grid) <= fields


def test_load_sweep_spec_flat_json(tmp_path):
    from chameleon_recsys_tpu.train.sweep import load_sweep_spec

    spec_path = tmp_path / "spec.json"
    spec_path.write_text(
        json.dumps({
            "params": {"rnn_units": [8, 16]},
            "objective": "hitrate_at_n",
            "max_trials": 4,
        })
    )
    spec = load_sweep_spec(str(spec_path))
    assert spec.param_grid == {"rnn_units": [8, 16]}
    assert spec.objective == "hitrate_at_n"
    assert spec.max_trials == 4
    assert spec.max_parallel == 1


def test_shipped_mlengine_spec_parses():
    """The example spec mirroring the reference YAML must load and map every
    parameter to a real NARConfig field."""
    import dataclasses as dc
    from pathlib import Path

    from chameleon_recsys_tpu.config import NARConfig
    from chameleon_recsys_tpu.train.sweep import load_sweep_spec

    path = Path(__file__).parent.parent / "examples" / "nar_hypertuning_gcom.yaml"
    spec = load_sweep_spec(str(path))
    fields = {f.name for f in dc.fields(NARConfig)}
    assert set(spec.param_grid) <= fields
    assert spec.max_trials == 30 and spec.max_parallel == 2


def test_failed_trials_sort_last_under_minimize(tmp_path):
    """A trial with no eval rows (or a missing objective column) must rank
    LAST under goal=MINIMIZE — the sentinel is goal-aware (a float('-inf')
    sentinel would rank failures as the best minimization results)."""
    cfg = tiny_nar_config(batch_size=8, max_session_length=6)
    run_cfg = RunConfig(model_dir=str(tmp_path), training_hours_for_each_eval=1)

    class StubHarness:
        def __init__(self, rows):
            self._rows = rows

        def run(self, hour_source, hours):
            return self._rows

    outcomes = {
        8: [{"avg_ce_loss": 1.5}, {"avg_ce_loss": 2.5}],  # healthy: mean 2.0
        16: [],                                           # died before eval
        32: [{"other_metric": 0.0}],                      # objective absent
    }

    def harness_factory(trial_cfg, trial_run_cfg):
        return StubHarness(outcomes[trial_cfg.rnn_units])

    results = run_sweep(
        cfg,
        run_cfg,
        {"rnn_units": [8, 16, 32]},
        harness_factory,
        lambda h: [],
        hours=range(1),
        objective="avg_ce_loss",
        goal="MINIMIZE",
    )
    assert results[0].overrides == {"rnn_units": 8}
    assert results[0].objective == 2.0
    assert all(r.objective == float("inf") for r in results[1:])
