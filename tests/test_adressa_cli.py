"""Adressa CLI chain on tiny synthetic raw JSON data:
acr_preprocess_adressa → nar_preprocess_adressa → nar_trainer_adressa."""
import json
import pickle

import numpy as np
import pytest


@pytest.fixture(scope="module")
def raw(tmp_path_factory):
    root = tmp_path_factory.mktemp("adressa")
    rng = np.random.RandomState(0)
    words = [f"ord{i}" for i in range(50)]

    with open(root / "w2v.txt", "w") as f:
        f.write(f"{len(words)} 6\n")
        for w in words:
            f.write(w + " " + " ".join(f"{x:.3f}" for x in rng.randn(6)) + "\n")

    n_articles = 25
    with open(root / "articles.jsonl", "w") as f:
        for i in range(n_articles):
            cat = int(rng.randint(0, 4))
            f.write(
                json.dumps(
                    {
                        "id": f"art-{i}",
                        "title": " ".join(rng.choice(words[cat * 10 : cat * 10 + 12], 6)),
                        "body": " ".join(rng.choice(words[cat * 10 : cat * 10 + 12], 20)) + ".",
                        "category0": f"c{cat}",
                        "category1": f"sub{cat * 2}",
                        "author": f"a{int(rng.randint(0, 5))}",
                        "createtime": 1_500_000_000 + i * 3600,
                        "keywords": [f"kw{cat}", f"kw{cat + 1}"],
                    }
                )
                + "\n"
            )

    base_s = 1_500_100_000
    with open(root / "clicks.jsonl", "w") as f:
        for u in range(30):
            # spread sessions over 3 distinct hours so the temporal loop
            # has train AND eval hours
            t = base_s + (u % 3) * 3600 + int(rng.randint(0, 1800))
            for c in range(int(rng.randint(2, 7))):
                t += int(rng.randint(10, 120))
                f.write(
                    json.dumps(
                        {
                            "userId": f"user{u}",
                            "id": int(rng.randint(1, n_articles + 1)),
                            "time": t,
                            "city": int(rng.randint(1, 10)),
                            "region": int(rng.randint(1, 5)),
                            "country": int(rng.randint(1, 3)),
                            "deviceType": int(rng.randint(1, 5)),
                            "os": int(rng.randint(1, 8)),
                            "referrerClass": int(rng.randint(1, 6)),
                            "activeTime": int(rng.randint(5, 300)),
                        }
                    )
                    + "\n"
                )
    return root, n_articles


@pytest.mark.slow
def test_adressa_chain(raw, tmp_path):
    from chameleon_recsys_tpu.cli import (
        acr_preprocess_adressa,
        nar_preprocess_adressa,
        nar_trainer_adressa,
    )

    root, n_articles = raw
    acr_out = tmp_path / "acr"
    acr_preprocess_adressa.main(
        [
            "--input_articles_json_path", str(root / "articles.jsonl"),
            "--input_word_embeddings_path", str(root / "w2v.txt"),
            "--output_dir", str(acr_out),
            "--truncate_tokens_length", "12",
            "--min_label_freq", "1",
        ]
    )
    with open(acr_out / "acr_label_encoders.pickle", "rb") as f:
        enc_payload = pickle.load(f)
    assert "category0" in enc_payload["encoders"]
    assert "category0" in enc_payload["class_weights"]

    # multi-head ACR trainer (category0 multiclass + keywords multilabel)
    from chameleon_recsys_tpu.cli import acr_trainer_adressa

    ace_path = tmp_path / "acr_articles_metadata_embeddings.pickle"
    acr_trainer_adressa.main(
        [
            "--train_set_path_regex", str(acr_out / "articles_tokenized_*.tfrecord.gz"),
            "--input_word_vocab_embeddings_path",
            str(acr_out / "acr_word_vocab_embeddings.pickle"),
            "--input_label_encoders_path",
            str(acr_out / "acr_label_encoders.pickle"),
            "--output_acr_metadata_embeddings_path", str(ace_path),
            "--acr_embeddings_size", "8",
            "--rnn_units", "8",
            "--batch_size", "8",
            "--training_epochs", "1",
            "--truncate_tokens_length", "12",
        ]
    )
    with open(ace_path, "rb") as f:
        _, acr_metadata, acr_ace = pickle.load(f)
    assert acr_ace.shape[1] == 8
    assert "category0" in acr_metadata

    sess_dir = tmp_path / "sessions"
    sess_dir.mkdir()
    nar_preprocess_adressa.main(
        [
            "--input_clicks_json_path", str(root / "clicks.jsonl"),
            "--output_sessions_tfrecords_path",
            str(sess_dir / "sessions_hour_*.tfrecord.gz"),
            "--output_nar_preprocessing_resources_path",
            str(tmp_path / "nar_resources.pickle"),
        ]
    )
    files = sorted(sess_dir.glob("*.tfrecord.gz"))
    assert files

    # tiny ACE pickle (Adressa trainer loads the 3-tuple)
    with open(tmp_path / "nar_resources.pickle", "rb") as f:
        resources = pickle.load(f)
    num_items = resources["cardinalities"]["item_clicked"]
    rng = np.random.RandomState(0)
    ace = rng.randn(num_items, 8).astype(np.float32)
    # category0 ids EXCEED the schema's default cardinality (41): the
    # trainer must size the article towers from the ACR label encoders
    # (first pickle element) or flax's Embed fills the out-of-range rows
    # with NaN (mode="fill") and the whole run trains on NaN loss — the
    # full-scale pseudo-Adressa campaign caught exactly this.
    metadata = {
        "category0": rng.randint(0, 60, num_items),
        "category1": rng.randint(0, 8, num_items),
        "author": rng.randint(0, 5, num_items),
        "created_at_ts": np.zeros(num_items, np.int64),
    }
    label_encoders = {
        "category0": {f"c{i}": i for i in range(60)},
        "category1": {f"s{i}": i for i in range(8)},
        "author": {f"a{i}": i for i in range(5)},
    }
    with open(tmp_path / "ace.pickle", "wb") as f:
        pickle.dump((label_encoders, metadata, ace), f)

    model_dir = tmp_path / "model"
    nar_trainer_adressa.main(
        [
            "--train_set_path_regex", str(sess_dir / "sessions_hour_*.tfrecord.gz"),
            "--acr_module_resources_path", str(tmp_path / "ace.pickle"),
            "--nar_module_preprocessing_resources_path",
            str(tmp_path / "nar_resources.pickle"),
            "--model_dir", str(model_dir),
            "--training_hours_for_each_eval", "1",
            "--batch_size", "8",
            "--truncate_session_length", "6",
            "--CAR_embedding_size", "16",
            "--rnn_units", "10",
            "--train_total_negative_samples", "3",
            "--train_negative_samples_from_buffer", "16",
            "--eval_total_negative_samples", "3",
            "--eval_negative_samples_from_buffer", "16",
            "--eval_metrics_top_n", "3",
            "--recent_clicks_buffer_max_size", "64",
            "--recent_clicks_for_normalization", "32",
            "--compute_dtype", "float32",
            "--disable_eval_benchmarks",
            # exercise the (data × model) mesh path on the virtual devices
            "--data_parallelism", "4",
            "--model_parallelism", "2",
        ]
    )
    assert (model_dir / "eval_stats_benchmarks.csv").exists()
    # NaN regression guard: with an undersized article cardinality every
    # parameter goes NaN within one optimizer step — assert the saved
    # checkpoint is finite.
    with open(model_dir / "checkpoint.pkl", "rb") as f:
        ckpt = pickle.load(f)
    import jax as _jax
    leaves = _jax.tree_util.tree_leaves(ckpt["state"])
    assert leaves
    for leaf in leaves:
        arr = np.asarray(leaf)
        if arr.dtype.kind == "f":
            assert np.isfinite(arr).all(), "NaN params - cardinality regression"



def test_adressa_trainer_resume_and_export_flags(raw, tmp_path):
    """Round-5 flags: --save_eval_sessions_negative_samples /
    --save_eval_sessions_recommendations / --eval_cold_start produce their
    artifacts, and --resume_checkpoint restores the full unit (the second
    run continues from the checkpoint instead of re-initializing)."""
    from chameleon_recsys_tpu.cli import (
        acr_preprocess_adressa,
        nar_preprocess_adressa,
        nar_trainer_adressa,
    )

    root, _ = raw
    acr_out = tmp_path / "acr"
    acr_preprocess_adressa.main(
        [
            "--input_articles_json_path", str(root / "articles.jsonl"),
            "--input_word_embeddings_path", str(root / "w2v.txt"),
            "--output_dir", str(acr_out),
            "--truncate_tokens_length", "12",
            "--min_label_freq", "1",
        ]
    )
    sess_dir = tmp_path / "sessions"
    nar_preprocess_adressa.main(
        [
            "--input_clicks_json_path", str(root / "clicks.jsonl"),
            "--output_sessions_tfrecords_path",
            str(sess_dir / "sessions_hour_*.tfrecord.gz"),
            "--output_nar_preprocessing_resources_path",
            str(tmp_path / "nar_resources.pickle"),
        ]
    )
    import pickle as pkl

    import numpy as np

    with open(tmp_path / "nar_resources.pickle", "rb") as f:
        num_items = pkl.load(f)["cardinalities"]["item_clicked"]
    rng = np.random.RandomState(1)
    ace = rng.randn(num_items, 8).astype(np.float32)
    metadata = {
        "category0": rng.randint(0, 60, num_items),
        "category1": rng.randint(0, 8, num_items),
        "author": rng.randint(0, 5, num_items),
        "created_at_ts": np.zeros(num_items, np.int64),
    }
    encoders = {
        "category0": {f"c{i}": i for i in range(60)},
        "category1": {f"s{i}": i for i in range(8)},
        "author": {f"a{i}": i for i in range(5)},
    }
    with open(tmp_path / "ace.pickle", "wb") as f:
        pkl.dump((encoders, metadata, ace), f)

    common = [
        "--acr_module_resources_path", str(tmp_path / "ace.pickle"),
        "--nar_module_preprocessing_resources_path",
        str(tmp_path / "nar_resources.pickle"),
        "--training_hours_for_each_eval", "1",
        "--batch_size", "8", "--truncate_session_length", "6",
        "--CAR_embedding_size", "16", "--rnn_units", "10",
        "--train_total_negative_samples", "3",
        "--train_negative_samples_from_buffer", "16",
        "--eval_total_negative_samples", "3",
        "--eval_negative_samples_from_buffer", "16",
        "--eval_metrics_top_n", "3",
        "--recent_clicks_buffer_max_size", "64",
        "--recent_clicks_for_normalization", "32",
        "--compute_dtype", "float32",
    ]
    import glob as _glob
    import os as _os

    all_files = sorted(_glob.glob(str(sess_dir / "sessions_hour_*.tfrecord.gz")))
    assert len(all_files) >= 3
    part = tmp_path / "sessions_part"
    part.mkdir()
    for f in all_files[:-1]:  # hold the last hour back for the resume leg
        _os.symlink(f, part / _os.path.basename(f))
    m1 = tmp_path / "m1"
    nar_trainer_adressa.main(
        ["--train_set_path_regex", str(part / "sessions_hour_*.tfrecord.gz"),
         "--model_dir", str(m1),
         "--eval_cold_start",
         "--save_eval_sessions_negative_samples",
         "--save_eval_sessions_recommendations"] + common
    )
    assert (m1 / "eval_sessions_negative_samples.json").exists()
    assert (m1 / "eval_chameleon_recommendations_log.json").exists()
    import csv

    rows = list(csv.DictReader(open(m1 / "eval_stats_benchmarks.csv")))
    assert any(k.startswith("coldstart_") for k in rows[0])

    # resume: restored unit keeps the hour cursor + stream state
    m2 = tmp_path / "m2"
    nar_trainer_adressa.main(
        ["--train_set_path_regex", str(sess_dir / "sessions_hour_*.tfrecord.gz"),
         "--model_dir", str(m2),
         "--resume_checkpoint", str(m1 / "checkpoint.pkl")] + common
    )
    with open(m2 / "checkpoint.pkl", "rb") as f:
        c2 = pkl.load(f)
    with open(m1 / "checkpoint.pkl", "rb") as f:
        c1 = pkl.load(f)
    # the resumed run continued training: its optimizer step counter
    # advanced past the checkpoint's
    assert int(np.asarray(c2["state"].step)) > int(np.asarray(c1["state"].step))
