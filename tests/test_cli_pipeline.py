"""Full CLI chain on tiny synthetic raw data:
acr_preprocess_gcom → acr_trainer_gcom → nar_preprocess_gcom →
nar_trainer_gcom, exercising the file-based module handoff contracts."""
import csv
import os
import pickle

import numpy as np
import pytest

N_ARTICLES = 30
N_CATEGORIES = 5
WORD_DIM = 8


@pytest.fixture(scope="module")
def raw_data(tmp_path_factory):
    root = tmp_path_factory.mktemp("raw")
    rng = np.random.RandomState(0)

    # word2vec text file
    words = [f"word{i}" for i in range(60)]
    with open(root / "w2v.txt", "w") as f:
        f.write(f"{len(words)} {WORD_DIM}\n")
        for w in words:
            vec = " ".join(f"{x:.4f}" for x in rng.randn(WORD_DIM))
            f.write(f"{w} {vec}\n")

    # articles CSV
    with open(root / "articles.csv", "w", newline="") as f:
        writer = csv.DictWriter(
            f, fieldnames=["article_id", "category_id", "created_at_ts", "text"]
        )
        writer.writeheader()
        for i in range(N_ARTICLES):
            cat = rng.randint(0, N_CATEGORIES)
            text = " ".join(
                rng.choice(words[cat * 10 : cat * 10 + 15], size=20)
            )
            writer.writerow(
                {
                    "article_id": f"raw-{1000 + i}",
                    "category_id": f"cat-{cat}",
                    "created_at_ts": 1_500_000_000_000 + i * 3_600_000,
                    "text": text + ".",
                }
            )

    # hourly click CSVs (2 hours); article ids are the ENCODED ids 1..N
    base_ms = 1_500_100_000_000
    for hour in range(3):
        with open(root / f"clicks_hour_{hour:03d}.csv", "w", newline="") as f:
            writer = csv.DictWriter(
                f,
                fieldnames=[
                    "session_id", "user_id", "session_start", "click_timestamp",
                    "click_article_id", "click_environment", "click_deviceGroup",
                    "click_os", "click_country", "click_region",
                    "click_referrer_type",
                ],
            )
            writer.writeheader()
            for s in range(12):
                start = base_ms + hour * 3_600_000 + s * 120_000
                n_clicks = rng.randint(2, 6)
                items = rng.choice(np.arange(1, N_ARTICLES + 1), n_clicks,
                                   replace=False)
                for c in range(n_clicks):
                    writer.writerow(
                        {
                            "session_id": start * 100 + s,
                            "user_id": rng.randint(1, 50),
                            "session_start": start,
                            "click_timestamp": start + c * 20_000,
                            "click_article_id": items[c],
                            "click_environment": rng.randint(1, 5),
                            "click_deviceGroup": rng.randint(1, 6),
                            "click_os": rng.randint(1, 23),
                            "click_country": rng.randint(1, 12),
                            "click_region": rng.randint(1, 29),
                            "click_referrer_type": rng.randint(1, 8),
                        }
                    )
    return root


@pytest.mark.slow
def test_full_cli_chain(raw_data, tmp_path):
    from chameleon_recsys_tpu.cli import (
        acr_preprocess_gcom,
        acr_trainer_gcom,
        nar_preprocess_gcom,
        nar_trainer_gcom,
    )

    acr_out = tmp_path / "acr_pre"
    acr_preprocess_gcom.main(
        [
            "--input_articles_csv_path", str(raw_data / "articles.csv"),
            "--input_word_embeddings_path", str(raw_data / "w2v.txt"),
            "--output_dir", str(acr_out),
            "--truncate_tokens_length", "16",
            "--first_sentences", "4",
        ]
    )
    assert (acr_out / "acr_word_vocab_embeddings.pickle").exists()

    ace_pickle = tmp_path / "acr_articles_metadata_embeddings.pickle"
    acr_trainer_gcom.main(
        [
            "--train_set_path_regex", str(acr_out / "articles_tokenized_*.tfrecord.gz"),
            "--input_word_vocab_embeddings_path",
            str(acr_out / "acr_word_vocab_embeddings.pickle"),
            "--input_label_encoders_path", str(acr_out / "acr_label_encoders.pickle"),
            "--output_acr_metadata_embeddings_path", str(ace_pickle),
            "--acr_embeddings_size", "8",
            "--cnn_filter_sizes", "2,3",
            "--cnn_num_filters", "4",
            "--batch_size", "8",
            "--training_epochs", "1",
            "--truncate_tokens_length", "16",
        ]
    )
    with open(ace_pickle, "rb") as f:
        _, metadata, ace_matrix = pickle.load(f)
    assert ace_matrix.shape == (N_ARTICLES + 1, 8)

    sess_out = tmp_path / "sessions"
    sess_out.mkdir()
    nar_preprocess_gcom.main(
        [
            "--input_clicks_csv_path_regex", str(raw_data / "clicks_hour_*.csv"),
            "--output_sessions_tfrecords_path",
            str(sess_out / "sessions_hour_*.tfrecord.gz"),
        ]
    )
    assert (sess_out / "sessions_hour_000.tfrecord.gz").exists()

    # NAR trainer needs the G1-style metadata CSV + raw embeddings pickle
    meta_csv = tmp_path / "articles_metadata.csv"
    with open(meta_csv, "w", newline="") as f:
        writer = csv.DictWriter(
            f, fieldnames=["article_id", "category_id", "created_at_ts"]
        )
        writer.writeheader()
        for i in range(1, N_ARTICLES + 1):
            writer.writerow(
                {
                    "article_id": i,
                    "category_id": int(metadata["category_id"][i]),
                    "created_at_ts": int(metadata["created_at_ts"][i]) or 1,
                }
            )
    emb_pickle = tmp_path / "articles_embeddings.pickle"
    with open(emb_pickle, "wb") as f:
        pickle.dump(ace_matrix, f)

    model_dir = tmp_path / "nar_model"
    nar_trainer_gcom.main(
        [
            "--train_set_path_regex", str(sess_out / "sessions_hour_*.tfrecord.gz"),
            "--acr_module_articles_metadata_csv_path", str(meta_csv),
            "--acr_module_articles_content_embeddings_pickle_path", str(emb_pickle),
            "--model_dir", str(model_dir),
            "--training_hours_for_each_eval", "2",
            "--batch_size", "8",
            "--truncate_session_length", "6",
            "--CAR_embedding_size", "16",
            "--rnn_units", "12",
            "--rnn_num_layers", "1",
            "--train_total_negative_samples", "4",
            "--train_negative_samples_from_buffer", "20",
            "--eval_total_negative_samples", "4",
            "--eval_negative_samples_from_buffer", "20",
            "--eval_metrics_top_n", "3",
            "--recent_clicks_buffer_max_size", "128",
            "--recent_clicks_for_normalization", "64",
            "--compute_dtype", "float32",
            "--disable_eval_benchmarks",
        ]
    )
    assert (model_dir / "eval_stats_benchmarks.csv").exists()
    assert (model_dir / "checkpoint.pkl").exists()
    with open(model_dir / "eval_stats_benchmarks.csv") as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == 1
    assert 0.0 <= float(rows[0]["hitrate_at_n_chameleon"]) <= 1.0

    # hyperparameter sweep CLI over the same artifacts (2 tiny trials)
    from chameleon_recsys_tpu.cli import nar_hypertuning_gcom

    sweep_dir = tmp_path / "sweep"
    nar_hypertuning_gcom.main(
        [
            "--train_set_path_regex", str(sess_out / "sessions_hour_*.tfrecord.gz"),
            "--acr_module_articles_metadata_csv_path", str(meta_csv),
            "--acr_module_articles_content_embeddings_pickle_path", str(emb_pickle),
            "--model_dir", str(sweep_dir),
            "--training_hours_for_each_eval", "2",
            "--batch_size", "8",
            "--truncate_session_length", "6",
            "--CAR_embedding_size", "16",
            "--rnn_units", "12",
            "--rnn_num_layers", "1",
            "--train_total_negative_samples", "4",
            "--train_negative_samples_from_buffer", "20",
            "--eval_total_negative_samples", "4",
            "--eval_negative_samples_from_buffer", "20",
            "--eval_metrics_top_n", "3",
            "--recent_clicks_buffer_max_size", "128",
            "--recent_clicks_for_normalization", "64",
            "--compute_dtype", "float32",
            "--max_trials", "2",
            "--param_grid", '{"rnn_units": [8, 12]}',
        ]
    )
    assert (sweep_dir / "sweep_results.json").exists()
    import json as _json

    payload = _json.loads((sweep_dir / "sweep_results.json").read_text())
    assert len(payload) == 2


@pytest.mark.parametrize("method,dim", [
    ("lsa", 10), ("w2v_tfidf", None), ("doc2vec", 8),
])
def test_ace_baselines_cli(raw_data, tmp_path, method, dim):
    """The unified ACE-baselines CLI must export the same handoff-pickle
    contract as the neural ACR trainer for every method (the reference's
    six per-dataset scripts, lsa/doc2vec/w2v_tfidf × gcom/adressa)."""
    from chameleon_recsys_tpu.cli import ace_baselines_cli, acr_preprocess_gcom

    acr_out = tmp_path / "acr_pre"
    acr_preprocess_gcom.main(
        [
            "--input_articles_csv_path", str(raw_data / "articles.csv"),
            "--input_word_embeddings_path", str(raw_data / "w2v.txt"),
            "--output_dir", str(acr_out),
            "--truncate_tokens_length", "16",
            "--first_sentences", "4",
        ]
    )
    out_pickle = tmp_path / f"ace_{method}.pickle"
    argv = [
        "--method", method,
        "--train_set_path_regex", str(acr_out / "articles_tokenized_*.tfrecord.gz"),
        "--input_word_vocab_embeddings_path",
        str(acr_out / "acr_word_vocab_embeddings.pickle"),
        "--input_label_encoders_path", str(acr_out / "acr_label_encoders.pickle"),
        "--output_acr_metadata_embeddings_path", str(out_pickle),
        "--truncate_tokens_length", "16",
        "--training_epochs", "2",
        "--platform", "cpu",
    ]
    if dim is not None:
        argv += ["--acr_embeddings_size", str(dim)]
    ace_baselines_cli.main(argv)

    with open(out_pickle, "rb") as f:
        label_encoders, metadata, ace_matrix = pickle.load(f)
    assert ace_matrix.shape[0] == N_ARTICLES + 1
    if dim is not None:
        assert ace_matrix.shape[1] == dim
    assert np.all(np.isfinite(ace_matrix))
    # padding row 0 = mean embedding (reference invariant)
    np.testing.assert_allclose(
        ace_matrix[0], ace_matrix[1:].mean(axis=0), rtol=1e-5, atol=1e-6
    )
    assert list(metadata["article_id"][:3]) == [0, 1, 2]
    assert "category_id" in label_encoders
    # the handoff must carry the FLAT per-feature encoder dict, never the
    # preprocessing {encoders, class_weights} wrapper — the NAR trainer
    # derives article-feature cardinalities from these keys and wrapper
    # keys yield undersized (NaN-producing) embedding tables
    assert "encoders" not in label_encoders
