"""Native C++ session loader vs the pure-Python path: identical batches."""
import numpy as np
import pytest

from chameleon_recsys_tpu.data.collate import Session, collate_sessions
from chameleon_recsys_tpu.data.sessions import write_sessions_tfrecord
from chameleon_recsys_tpu.native import NativeSessionLoader, native_available

from conftest import tiny_session_schema

pytestmark = pytest.mark.skipif(
    not native_available(), reason="g++/zlib unavailable"
)


@pytest.fixture
def session_file(tmp_path):
    schema = tiny_session_schema()
    rng = np.random.RandomState(0)
    sessions = []
    for i in range(10):
        n = int(rng.randint(2, 7))
        sessions.append(
            Session(
                session_id=10_000 + i,
                user_id=100 + i,
                session_start=5_000 + 100 * i,
                item_ids=rng.randint(1, 99, n).tolist(),
                timestamps=(5_000 + 100 * i + np.arange(n) * 10).tolist(),
                context={
                    "device": rng.randint(1, 5, n).tolist(),
                    "os": rng.randint(1, 23, n).tolist(),
                    "hour_sin": rng.uniform(-1, 1, n).round(3).tolist(),
                },
            )
        )
    path = tmp_path / "hour.tfrecord.gz"
    epoch_ms = 1_500_000_000_000
    write_sessions_tfrecord(sessions, schema, path, epoch_ms=epoch_ms)
    return path, schema, sessions, epoch_ms


def test_native_matches_python_collation(session_file):
    path, schema, sessions, epoch_ms = session_file
    max_len, batch_size = 6, 10
    loader = NativeSessionLoader(path, schema, epoch_ms=epoch_ms)
    assert len(loader) == len(sessions)
    native_batch = loader.batch(0, batch_size, max_len)
    python_batch = collate_sessions(sessions, schema, batch_size, max_len)

    for key in python_batch:
        np.testing.assert_allclose(
            native_batch[key].astype(np.float64),
            python_batch[key].astype(np.float64),
            rtol=1e-6,
            err_msg=key,
        )


def test_native_batching_covers_all(session_file):
    path, schema, sessions, epoch_ms = session_file
    loader = NativeSessionLoader(path, schema, epoch_ms=epoch_ms)
    batches = list(loader.batches(4, 6))
    assert len(batches) == 3
    total_sessions = sum(int((b["session_size"] > 0).sum()) for b in batches)
    assert total_sessions == len(sessions)
