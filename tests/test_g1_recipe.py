"""Pseudo-G1 end-to-end: the Kaggle-artifact recipe, exercised for real.

Generates a miniature dataset bundle in the EXACT schema of the Kaggle
"News Portal User Interactions by Globo.com" release the reference trains
on (/root/reference/nar_module/nar/nar_trainer_gcom.py:131-139, README
data layout): hourly ``clicks/clicks_hour_*.csv`` files,
``articles_metadata.csv``, and ``articles_embeddings.pickle``.  Then:

  1. runs ``scripts/run_nar_preprocessing_gcom.sh`` UNMODIFIED (DATA_DIR
     env only) → per-hour session TFRecords;
  2. runs the ``cli.nar_trainer_gcom`` CLI as a subprocess with the local
     shell script's flag pattern (scripts/run_nar_train_gcom_local.sh) on
     tiny model dims + the CPU platform so the test is hardware-free;
  3. golden-checks the produced ``eval_stats_benchmarks.csv``: the
     reference's derived hour/day columns, the chameleon + benchmark
     metric columns, one row per completed eval, finite values in range.

This is the in-environment proxy for "the real dataset drops in and
works" (docs/G1_RECIPE.md): any drift in the CSV schema expectations,
TFRecord layout, artifact loading, or eval CSV contract fails here.
"""
import csv
import os
import pickle
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # module fixture is compile-heavy

REPO = Path(__file__).resolve().parent.parent

NUM_ITEMS = 300
ACE_DIM = 48
HOURS = 9
SESSIONS_PER_HOUR = 24
HOUR_MS = 3600 * 1000
T0_MS = 1_506_826_800_000  # 2017-10-01 00:00 America/Sao_Paulo-ish epoch


def _write_bundle(data_dir: Path):
    rng = np.random.RandomState(0)
    (data_dir / "clicks").mkdir(parents=True)

    # articles_metadata.csv — the Kaggle column set the loader reads
    # (article_id / created_at_ts / category_id; extra columns ignored)
    with open(data_dir / "articles_metadata.csv", "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(
            ["article_id", "category_id", "created_at_ts",
             "publisher_id", "words_count"]
        )
        for i in range(NUM_ITEMS):
            w.writerow([i, rng.randint(0, 12), T0_MS - rng.randint(0, 30) *
                        24 * HOUR_MS, 0, rng.randint(100, 900)])

    # articles_embeddings.pickle — [num_items, dim] float matrix
    ace = rng.randn(NUM_ITEMS, ACE_DIM).astype(np.float32)
    with open(data_dir / "articles_embeddings.pickle", "wb") as f:
        pickle.dump(ace, f)

    # hourly click CSVs (Kaggle schema); a mild Markov stream so the model
    # has something learnable and every context column is present
    cols = [
        "user_id", "session_id", "session_start", "session_size",
        "click_article_id", "click_timestamp", "click_environment",
        "click_deviceGroup", "click_os", "click_country", "click_region",
        "click_referrer_type",
    ]
    next_hop = rng.permutation(NUM_ITEMS)
    sid = 10_000
    for h in range(HOURS):
        with open(data_dir / "clicks" / f"clicks_hour_{h:03d}.csv", "w",
                  newline="") as f:
            w = csv.DictWriter(f, fieldnames=cols)
            w.writeheader()
            for s in range(SESSIONS_PER_HOUR):
                sid += 1
                start = T0_MS + h * HOUR_MS + s * 1000
                size = rng.randint(2, 7)
                item = rng.zipf(1.3) % NUM_ITEMS
                for c in range(size):
                    w.writerow({
                        "user_id": rng.randint(1, 5000),
                        "session_id": sid,
                        "session_start": start,
                        "session_size": size,
                        "click_article_id": int(item),
                        "click_timestamp": start + c * 10_000,
                        "click_environment": rng.randint(1, 5),
                        "click_deviceGroup": rng.randint(1, 6),
                        "click_os": rng.randint(1, 23),
                        "click_country": rng.randint(1, 12),
                        "click_region": rng.randint(1, 29),
                        "click_referrer_type": rng.randint(1, 8),
                    })
                    item = int(next_hop[item]) if rng.rand() < 0.7 \
                        else rng.zipf(1.3) % NUM_ITEMS


@pytest.fixture(scope="module")
def g1_run(tmp_path_factory):
    data_dir = tmp_path_factory.mktemp("g1_data")
    model_dir = tmp_path_factory.mktemp("g1_model")
    _write_bundle(data_dir)

    env = dict(os.environ, DATA_DIR=str(data_dir), MODEL_DIR=str(model_dir),
               PYTHONPATH=str(REPO))
    pre = subprocess.run(
        ["bash", str(REPO / "scripts" / "run_nar_preprocessing_gcom.sh")],
        cwd=str(REPO), env=env, capture_output=True, text=True, timeout=300,
    )
    assert pre.returncode == 0, pre.stderr[-3000:]
    tfrecords = sorted((data_dir / "sessions_tfrecords").glob("*.tfrecord.gz"))
    assert len(tfrecords) == HOURS

    # the local shell script's flag pattern (run_nar_train_gcom_local.sh)
    # at test-sized model dims, pinned to the CPU platform
    train = subprocess.run(
        [sys.executable, "-m", "chameleon_recsys_tpu.cli.nar_trainer_gcom",
         "--train_set_path_regex",
         f"{data_dir}/sessions_tfrecords/sessions_hour_*.tfrecord.gz",
         "--acr_module_articles_metadata_csv_path",
         f"{data_dir}/articles_metadata.csv",
         "--acr_module_articles_content_embeddings_pickle_path",
         f"{data_dir}/articles_embeddings.pickle",
         "--model_dir", str(model_dir),
         "--train_files_from", "0",
         "--train_files_up_to", str(HOURS - 1),
         "--training_hours_for_each_eval", "3",
         "--batch_size", "8",
         "--learning_rate", "3e-4",
         "--rnn_units", "16",
         "--rnn_num_layers", "1",
         "--train_total_negative_samples", "6",
         "--eval_total_negative_samples", "6",
         "--eval_metrics_top_n", "4",
         "--recent_clicks_buffer_max_size", "512",
         "--recent_clicks_for_normalization", "128",
         "--train_negative_samples_from_buffer", "64",
         "--eval_negative_samples_from_buffer", "64",
         "--CAR_embedding_size", "32",
         "--platform", "cpu",
         ],
        cwd=str(REPO), env=env, capture_output=True, text=True, timeout=1200,
    )
    return data_dir, model_dir, train


def test_trainer_completes(g1_run):
    _, _, train = g1_run
    assert train.returncode == 0, (train.stdout[-2000:], train.stderr[-4000:])


def test_eval_csv_golden(g1_run):
    _, model_dir, train = g1_run
    assert train.returncode == 0, train.stderr[-4000:]
    csv_path = model_dir / "eval_stats_benchmarks.csv"
    assert csv_path.exists(), list(model_dir.iterdir())
    with open(csv_path) as f:
        rows = list(csv.DictReader(f))

    # 8 training hours stepped with an eval every 3 → at least 2 eval rows
    assert len(rows) >= 2, rows

    required = {
        "eval_hour", "eval_day", "hitrate_at_n", "mrr_at_n",
        "hitrate_at_n_chameleon", "mrr_at_n_chameleon",
        "ndcg_at_n_chameleon", "clicks_count", "sessions_count",
    }
    assert required <= set(rows[0].keys()), sorted(rows[0].keys())
    # every configured benchmark contributes its metric columns
    for suffix in ("pop_recent", "coocurrent", "item_knn", "cb",
                   "sr", "sknn"):
        assert any(suffix in c for c in rows[0]), (suffix, sorted(rows[0]))

    for i, r in enumerate(rows):
        hr = float(r["hitrate_at_n"])
        mrr = float(r["mrr_at_n"])
        assert 0.0 <= hr <= 1.0 and 0.0 <= mrr <= 1.0, (i, hr, mrr)
        assert mrr <= hr + 1e-9  # MRR@N is bounded by HR@N by definition
        assert int(r["clicks_count"]) > 0
        # the reference's derived time columns (nar_utils.py:31-40)
        assert int(r["eval_hour"]) == ((i + 1) * 3) % 24
        assert int(r["eval_day"]) == ((i + 1) * 3) // 24
    # device vs host metric duplicate-implementation guard, per row
    for r in rows:
        assert float(r["hitrate_at_n"]) == pytest.approx(
            float(r["hitrate_at_n_chameleon"]), abs=1e-6
        )


def test_parallel_preprocessing_byte_identical(g1_run, tmp_path):
    """--num_workers N processes hour files on a process pool (the
    reference's Spark/Dataproc analogue); outputs must be byte-identical
    to the serial run the fixture produced."""
    data_dir, _, _ = g1_run
    from chameleon_recsys_tpu.cli import nar_preprocess_gcom

    out_dir = tmp_path / "par_tfrecords"
    out_dir.mkdir()
    nar_preprocess_gcom.main([
        "--input_clicks_csv_path_regex", f"{data_dir}/clicks/clicks_hour_*.csv",
        "--output_sessions_tfrecords_path",
        f"{out_dir}/sessions_hour_*.tfrecord.gz",
        "--num_workers", "3",
    ])
    serial = sorted((data_dir / "sessions_tfrecords").glob("*.tfrecord.gz"))
    parallel = sorted(out_dir.glob("*.tfrecord.gz"))
    assert len(serial) == len(parallel) == HOURS
    import gzip

    for s, p in zip(serial, parallel):
        assert gzip.open(s).read() == gzip.open(p).read(), (s.name, p.name)
