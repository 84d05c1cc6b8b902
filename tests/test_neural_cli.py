"""GRU4Rec / SR-GNN standalone CLI runners over session TFRecord files."""
import csv

import numpy as np
import pytest

from chameleon_recsys_tpu.config import gcom_session_schema
from chameleon_recsys_tpu.data.collate import Session
from chameleon_recsys_tpu.data.sessions import write_sessions_tfrecord


@pytest.fixture(scope="module")
def hour_files(tmp_path_factory):
    root = tmp_path_factory.mktemp("hours")
    num_items = 60
    schema = gcom_session_schema(num_items=num_items)
    rng = np.random.RandomState(0)
    for h in range(3):
        sessions = []
        for i in range(10):
            n = int(rng.randint(2, 6))
            start = 1000 + h * 3600 + i * 60
            items = rng.randint(1, num_items, n)
            sessions.append(
                Session(
                    session_id=start * 100 + i,
                    user_id=int(rng.randint(1, 30)),
                    session_start=start,
                    item_ids=items.tolist(),
                    timestamps=(start + np.arange(n) * 10).tolist(),
                    context={
                        s.name: rng.randint(1, max(s.cardinality, 2), n).tolist()
                        if s.kind == "categorical"
                        else rng.uniform(-1, 1, n).tolist()
                        for s in schema.context_sequence_features()
                    },
                )
            )
        write_sessions_tfrecord(sessions, schema, root / f"h_{h:03d}.tfrecord.gz")
    return root, num_items


def test_run_gru4rec_cli(hour_files, tmp_path):
    from chameleon_recsys_tpu.cli import run_gru4rec

    root, num_items = hour_files
    out_csv = tmp_path / "gru4rec.csv"
    run_gru4rec.main(
        [
            "--train_set_path_regex", str(root / "h_*.tfrecord.gz"),
            "--num_items", str(num_items),
            "--output_csv", str(out_csv),
            "--training_hours_for_each_eval", "2",
            "--batch_size", "8",
            "--truncate_session_length", "6",
            "--layers", "12",
            "--n_sample", "16",
            "--eval_total_negative_samples", "5",
            "--eval_metrics_top_n", "3",
        ]
    )
    with open(out_csv) as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == 1
    assert any(k.startswith("hitrate_at_n") for k in rows[0])


def test_run_sr_gnn_cli(hour_files, tmp_path):
    from chameleon_recsys_tpu.cli import run_sr_gnn

    root, num_items = hour_files
    out_csv = tmp_path / "srgnn.csv"
    run_sr_gnn.main(
        [
            "--train_set_path_regex", str(root / "h_*.tfrecord.gz"),
            "--num_items", str(num_items),
            "--output_csv", str(out_csv),
            "--training_hours_for_each_eval", "2",
            "--batch_size", "8",
            "--truncate_session_length", "6",
            "--n_sample", "16",
            "--eval_total_negative_samples", "5",
            "--eval_metrics_top_n", "3",
            "--hidden_size", "12",
        ]
    )
    with open(out_csv) as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == 1
