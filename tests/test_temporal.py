"""Temporal harness integration: train/eval loop, baselines, state snapshot
semantics, checkpoint/resume."""
import numpy as np
import pytest

from chameleon_recsys_tpu.baselines import (
    RecentlyPopularRecommender,
    SequentialRulesRecommender,
)
from chameleon_recsys_tpu.config import RunConfig
from chameleon_recsys_tpu.data.synthetic import (
    make_synthetic_corpus,
    synthetic_hour_sessions,
)
from chameleon_recsys_tpu.train.temporal import BenchmarkSpec, TemporalHarness

from conftest import tiny_article_schema, tiny_nar_config, tiny_session_schema


@pytest.fixture(scope="module")
def harness_setup(tmp_path_factory):
    cfg = tiny_nar_config(batch_size=8, max_session_length=6)
    art = tiny_article_schema(150)
    sess = tiny_session_schema(150)
    corpus = make_synthetic_corpus(art, ace_dim=8)
    run_cfg = RunConfig(
        model_dir=str(tmp_path_factory.mktemp("model")),
        training_hours_for_each_eval=2,
    )

    def hour_source(h):
        return synthetic_hour_sessions(
            corpus, sess, h, num_sessions=12,
            max_session_length=cfg.max_session_length,
        )

    return cfg, run_cfg, art, sess, corpus, hour_source


def _make_harness(cfg, run_cfg, art, sess, corpus, **kw):
    return TemporalHarness(
        cfg,
        run_cfg,
        sess,
        art,
        corpus.ace_matrix,
        corpus.metadata,
        benchmarks=[
            BenchmarkSpec(RecentlyPopularRecommender, {}),
            BenchmarkSpec(
                SequentialRulesRecommender,
                {"max_clicks_dist": 10, "dist_between_clicks_decay": "div"},
            ),
        ],
        **kw,
    )


@pytest.mark.slow
def test_temporal_loop_produces_metric_rows(harness_setup):
    cfg, run_cfg, art, sess, corpus, hour_source = harness_setup
    h = _make_harness(
        cfg, run_cfg, art, sess, corpus,
        log_negative_samples=True, log_recommendations=True,
    )
    rows = h.run(hour_source, hours=range(3))  # train h0,h1 → eval h2
    assert len(rows) == 1
    row = rows[0]
    # chameleon + both baselines present in the row
    assert "hitrate_at_n_chameleon" in row
    assert "mrr_at_n_pop_recent" in row
    assert "hitrate_at_n_sr" in row
    assert row["clicks_count"] > 0
    # device and streaming implementations agree (reference cross-check)
    assert row["hitrate_at_n"] == pytest.approx(row["hitrate_at_n_chameleon"])
    assert row["mrr_at_n"] == pytest.approx(row["mrr_at_n_chameleon"])
    # artifacts exported
    h.export_artifacts()
    import os
    assert os.path.exists(os.path.join(run_cfg.model_dir, "eval_stats_benchmarks.csv"))


@pytest.mark.slow
def test_eval_restores_stream_state(harness_setup):
    cfg, run_cfg, art, sess, corpus, hour_source = harness_setup
    h = _make_harness(cfg, run_cfg, art, sess, corpus)
    h.train_hour(hour_source(0))
    buffer_before = np.asarray(h.state.stream.buffer_ids).copy()
    step_before = int(h.state.stream.current_step)
    h.evaluate_hour(hour_source(1))
    np.testing.assert_array_equal(np.asarray(h.state.stream.buffer_ids), buffer_before)
    assert int(h.state.stream.current_step) == step_before


@pytest.mark.slow
def test_checkpoint_roundtrip(harness_setup, tmp_path):
    cfg, run_cfg, art, sess, corpus, hour_source = harness_setup
    h1 = _make_harness(cfg, run_cfg, art, sess, corpus)
    h1.train_hour(hour_source(0))
    ckpt = h1.save_checkpoint(tmp_path / "ckpt.pkl")

    h2 = _make_harness(cfg, run_cfg, art, sess, corpus)
    h2.load_checkpoint(ckpt)
    assert h2.hours_trained == 1
    np.testing.assert_array_equal(
        np.asarray(h2.state.stream.buffer_ids), np.asarray(h1.state.stream.buffer_ids)
    )
    # both resume identically on the next hour
    s1 = h1.train_hour(hour_source(1))
    s2 = h2.train_hour(hour_source(1))
    assert s1["avg_ce_loss"] == pytest.approx(s2["avg_ce_loss"], rel=1e-5)


@pytest.mark.slow
def test_resume_skips_trained_hours(harness_setup, tmp_path):
    """run() after load_checkpoint continues from the hour cursor instead of
    re-training from hour 0."""
    cfg, run_cfg, art, sess, corpus, hour_source = harness_setup
    h1 = _make_harness(cfg, run_cfg, art, sess, corpus)
    h1.run(hour_source, hours=range(3))  # trains h0,h1, evals h2, trains h2
    assert h1.hours_trained == 3
    ckpt = h1.save_checkpoint(tmp_path / "resume.pkl")
    rows_before = len(h1.artifacts.eval_sessions_metrics_log)

    h2 = _make_harness(cfg, run_cfg, art, sess, corpus)
    h2.load_checkpoint(ckpt)
    called = []

    original = h2.train_hour

    def spy(sessions):
        called.append(1)
        return original(sessions)

    h2.train_hour = spy
    h2.run(hour_source, hours=range(5))  # only hours 3,4 should train
    assert len(called) == 2, called
    assert h2.hours_trained == 5
    # no duplicated eval rows for already-evaluated chunks
    assert len(h2.artifacts.eval_sessions_metrics_log) >= rows_before


@pytest.mark.slow
def test_orbax_checkpoint_roundtrip(harness_setup, tmp_path):
    cfg, run_cfg, art, sess, corpus, hour_source = harness_setup
    h1 = _make_harness(cfg, run_cfg, art, sess, corpus)
    h1.train_hour(hour_source(0))
    ckpt_dir = h1.save_checkpoint_orbax(tmp_path / "orbax")

    h2 = _make_harness(cfg, run_cfg, art, sess, corpus)
    h2.train_hour(hour_source(1))  # initialize with DIFFERENT state
    h2.load_checkpoint_orbax(ckpt_dir)
    assert h2.hours_trained == 1
    np.testing.assert_array_equal(
        np.asarray(h2.state.stream.buffer_ids),
        np.asarray(h1.state.stream.buffer_ids),
    )
    s1 = h1.train_hour(hour_source(2))
    s2 = h2.train_hour(hour_source(2))
    assert s1["avg_ce_loss"] == pytest.approx(s2["avg_ce_loss"], rel=1e-5)


@pytest.mark.slow
def test_first_click_tracking_always_on(harness_setup):
    """items_first_click_step must be updated even with eval_cold_start off
    (reference hook order, nar_model.py:1481-1494): enabling cold-start
    analysis mid-run sees correct elapsed-step stats."""
    cfg, run_cfg, art, sess, corpus, hour_source = harness_setup
    h = _make_harness(cfg, run_cfg, art, sess, corpus)  # eval_cold_start=False
    h.train_hour(hour_source(0))
    assert len(h.host_state.items_first_click_step) > 0
    assert h.host_state.current_step > 0


@pytest.mark.slow
def test_resume_reruns_pending_eval(harness_setup, tmp_path):
    """A checkpoint taken after a chunk's training but BEFORE its eval must
    re-run that eval on resume — no silently dropped eval CSV row."""
    cfg, run_cfg, art, sess, corpus, hour_source = harness_setup
    h1 = _make_harness(cfg, run_cfg, art, sess, corpus)
    # chunk = 2: train h0, h1 — then checkpoint WITHOUT running the h2 eval
    h1.train_hour(hour_source(0))
    h1.train_hour(hour_source(1))
    assert h1.evals_done == 0
    ckpt = h1.save_checkpoint(tmp_path / "pending.pkl")

    h2 = _make_harness(cfg, run_cfg, art, sess, corpus)
    h2.load_checkpoint(ckpt)
    assert h2.evals_done == 0
    evals = []
    original = h2.evaluate_hour

    def spy(sessions):
        evals.append(1)
        return original(sessions)

    h2.evaluate_hour = spy
    h2.run(hour_source, hours=range(3))
    # exactly one eval (the pending h2 eval), zero re-trained hours
    assert len(evals) == 1
    assert len(h2.artifacts.eval_sessions_metrics_log) == 1
    assert h2.evals_done == 1


@pytest.mark.slow
def test_parallel_benchmark_tier_matches_serial(harness_setup):
    """The thread-pool benchmark tier must be observably identical to the
    serial loop: each classifier is independent (own metric set, own
    benchmarks_states slot), so the eval row — metrics for every
    recommender, cold-start stats included — must match exactly."""
    cfg, run_cfg, art, sess, corpus, hour_source = harness_setup
    from chameleon_recsys_tpu.baselines import (
        ContentBasedRecommender,
        ItemCooccurrenceRecommender,
        ItemKNNRecommender,
        SessionBasedKNNRecommender,
    )

    extra = [
        BenchmarkSpec(ItemCooccurrenceRecommender, {}),
        BenchmarkSpec(ItemKNNRecommender, {"reg_lambda": 20, "alpha": 0.75}),
        BenchmarkSpec(
            ContentBasedRecommender,
            {"content_article_embeddings_matrix": corpus.ace_matrix},
        ),
        BenchmarkSpec(
            SessionBasedKNNRecommender,
            {
                "sessions_buffer_size": 100,
                "candidate_sessions_sample_size": 50,
                "sampling_strategy": "recent",
                "nearest_neighbor_session_for_scoring": 20,
                "similarity": "cosine",
                "first_session_clicks_decay": "div",
            },
        ),
    ]

    def run_with(workers):
        h = TemporalHarness(
            cfg,
            run_cfg,
            sess,
            art,
            corpus.ace_matrix,
            corpus.metadata,
            benchmarks=[
                BenchmarkSpec(RecentlyPopularRecommender, {}),
                BenchmarkSpec(
                    SequentialRulesRecommender,
                    {"max_clicks_dist": 10, "dist_between_clicks_decay": "div"},
                ),
            ]
            + extra,
            eval_cold_start=True,
            benchmark_workers=workers,
        )
        return h.run(hour_source, hours=range(3))[0]

    row_serial = run_with(0)
    row_parallel = run_with(4)
    assert set(row_serial) == set(row_parallel)
    for key, v in row_serial.items():
        if "elapsed" in key or "per_s" in key:  # wall-clock counters differ
            continue
        assert row_parallel[key] == v, key


def test_parallel_tier_auto_serial_with_global_rng_baseline(harness_setup):
    """A classifier drawing from the process-global Python RNG (SkNN
    sampling_strategy='random') is order-sensitive across threads, so the
    auto benchmark_workers setting must fall back to serial."""
    cfg, run_cfg, art, sess, corpus, hour_source = harness_setup
    from chameleon_recsys_tpu.baselines import SessionBasedKNNRecommender

    h = TemporalHarness(
        cfg, run_cfg, sess, art, corpus.ace_matrix, corpus.metadata,
        benchmarks=[
            BenchmarkSpec(RecentlyPopularRecommender, {}),
            BenchmarkSpec(
                SessionBasedKNNRecommender,
                {
                    "sessions_buffer_size": 100,
                    "candidate_sessions_sample_size": 50,
                    "sampling_strategy": "random",
                    "nearest_neighbor_session_for_scoring": 20,
                    "similarity": "cosine",
                    "first_session_clicks_decay": "div",
                },
            ),
        ],
    )
    assert h._bench_pool is None


@pytest.mark.slow
def test_cold_start_prediction_reuse_matches_recompute(harness_setup, monkeypatch):
    """The cold-start pass reuses the eval predictions stashed by
    clf.evaluate (deterministic classifiers; reference nar_model.py:
    1496-1501 recomputes them).  Forcing recompute via is_stochastic must
    produce the identical eval row, cold-start stats included."""
    cfg, run_cfg, art, sess, corpus, hour_source = harness_setup
    from chameleon_recsys_tpu.baselines.benchmarks import BenchmarkRecommender
    from chameleon_recsys_tpu.baselines.session_knn import (
        SessionBasedKNNRecommender,
    )

    def run(force_recompute):
        if force_recompute:
            # patch the SUBCLASS override too — SessionBasedKNNRecommender
            # defines its own is_stochastic, so patching only the base would
            # leave sknn/v-sknn on the cached-preds branch
            monkeypatch.setattr(
                BenchmarkRecommender, "is_stochastic", lambda self: True
            )
            monkeypatch.setattr(
                SessionBasedKNNRecommender, "is_stochastic", lambda self: True
            )
        else:
            monkeypatch.undo()
        h = TemporalHarness(
            cfg, run_cfg, sess, art, corpus.ace_matrix, corpus.metadata,
            eval_cold_start=True,
        )
        return h.run(hour_source, hours=range(3))[0]

    row_reuse = run(False)
    row_recompute = run(True)
    assert set(row_reuse) == set(row_recompute)
    for key, v in row_reuse.items():
        if "elapsed" in key or "per_s" in key:
            continue
        assert row_recompute[key] == v, key
