"""Per-step observability channel (utils/summary.py): JSONL scalars per
train step and parameter histograms per hour — the twin of the reference's
TensorBoard scalars + --save_histograms (nar_trainer_gcom.py:54)."""
import numpy as np

from chameleon_recsys_tpu.config import RunConfig
from chameleon_recsys_tpu.data.synthetic import (
    make_synthetic_corpus,
    synthetic_hour_sessions,
)
from chameleon_recsys_tpu.train.temporal import TemporalHarness
from chameleon_recsys_tpu.utils.summary import (
    HistogramWriter,
    ScalarWriter,
    read_jsonl,
)

from conftest import tiny_article_schema, tiny_nar_config, tiny_session_schema


def test_scalar_writer_roundtrip(tmp_path):
    w = ScalarWriter(str(tmp_path), buffer_rows=2)
    w.write(1, {"loss": 3.2, "clicks": 40})
    w.write(2, {"loss": np.float32(3.1), "clicks": 41})
    w.write(3, {"loss": 3.0, "clicks": 42})
    w.flush()
    rows = list(read_jsonl(tmp_path / "train_scalars.jsonl"))
    assert [r["step"] for r in rows] == [1, 2, 3]
    assert rows[1]["loss"] == np.float32(3.1)
    assert all("wall_time" in r for r in rows)


def test_histogram_writer_tree(tmp_path):
    w = HistogramWriter(str(tmp_path), bins=10)
    tree = {"layer": {"kernel": np.random.RandomState(0).randn(50, 4)}}
    w.write_tree(7, tree, prefix="params/")
    rows = list(read_jsonl(tmp_path / "train_histograms.jsonl"))
    assert len(rows) == 1
    r = rows[0]
    assert r["name"] == "params/layer/kernel"
    assert sum(r["counts"]) == 200
    assert len(r["bin_edges"]) == 11
    assert r["step"] == 7


def test_harness_emits_scalars_and_histograms(tmp_path):
    cfg = tiny_nar_config()
    art = tiny_article_schema(200)
    sess = tiny_session_schema(200)
    corpus = make_synthetic_corpus(art, ace_dim=16)
    run_cfg = RunConfig(model_dir=str(tmp_path), training_hours_for_each_eval=1)
    harness = TemporalHarness(
        cfg, run_cfg, sess, art, corpus.ace_matrix, corpus.metadata,
        benchmarks=(), save_scalars=True, save_histograms=True,
    )
    for h in range(2):
        harness.train_hour(
            synthetic_hour_sessions(corpus, sess, h, 16, cfg.max_session_length)
        )
    scalars = list(read_jsonl(tmp_path / "train_scalars.jsonl"))
    assert len(scalars) >= 2
    assert all(np.isfinite(r["ce_loss"]) for r in scalars)
    # steps strictly increase — one row per train step
    steps = [r["step"] for r in scalars]
    assert steps == sorted(steps) and len(set(steps)) == len(steps)

    hists = list(read_jsonl(tmp_path / "train_histograms.jsonl"))
    names = {r["name"] for r in hists}
    assert any("PreCAR_kernel" in n for n in names)
    assert any("rnn" in n for n in names)
