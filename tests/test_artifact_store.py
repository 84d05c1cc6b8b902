"""ArtifactStore seam: local round-trip, harness sync, warm-start flow
(reference GCS workflow shape, gcs_utils.py:22-109, nar_trainer_gcom.py:450-459)."""
import os

import pytest

import numpy as np

from chameleon_recsys_tpu.config import RunConfig
from chameleon_recsys_tpu.data.synthetic import (
    make_synthetic_corpus,
    synthetic_hour_sessions,
)
from chameleon_recsys_tpu.train.temporal import TemporalHarness
from chameleon_recsys_tpu.utils.artifact_store import (
    ArtifactStore,
    LocalArtifactStore,
    warm_start_model_dir,
)

from conftest import tiny_article_schema, tiny_nar_config, tiny_session_schema


def test_local_store_roundtrip(tmp_path):
    store = LocalArtifactStore(tmp_path / "remote")
    assert isinstance(store, ArtifactStore)

    src = tmp_path / "src"
    (src / "sub").mkdir(parents=True)
    (src / "metrics.csv").write_text("a,b\n1,2\n")
    (src / "sub" / "log.json").write_text("{}")
    (src / "model.ckpt").write_text("weights")

    uploaded = store.upload_dir(src, "jobs/run1")
    assert len(uploaded) == 3
    assert store.exists("jobs/run1")
    assert not store.exists("jobs/other")

    dst = tmp_path / "dst"
    downloaded = store.download_dir("jobs/run1", dst)
    assert len(downloaded) == 3
    assert (dst / "metrics.csv").read_text() == "a,b\n1,2\n"
    assert (dst / "sub" / "log.json").exists()

    # filename_pattern filter like the reference's GCS helpers
    dst2 = tmp_path / "dst2"
    only_csv = store.download_dir("jobs/run1", dst2, filename_pattern=".csv")
    assert len(only_csv) == 1
    assert not (dst2 / "model.ckpt").exists()


@pytest.mark.slow
def test_harness_sync_and_warm_start(tmp_path):
    cfg = tiny_nar_config(batch_size=8, max_session_length=6)
    art = tiny_article_schema(120)
    sess = tiny_session_schema(120)
    corpus = make_synthetic_corpus(art, ace_dim=8)
    store = LocalArtifactStore(tmp_path / "remote")

    def hour_source(h):
        return synthetic_hour_sessions(
            corpus, sess, h, num_sessions=10,
            max_session_length=cfg.max_session_length,
        )

    run_cfg = RunConfig(
        model_dir=str(tmp_path / "run1"), training_hours_for_each_eval=1
    )
    h1 = TemporalHarness(
        cfg, run_cfg, sess, art, corpus.ace_matrix, corpus.metadata,
        artifact_store=store, artifact_remote_path="jobs/run1",
    )
    h1.run(hour_source, hours=range(2))
    h1.export_artifacts()
    h1.save_checkpoint()
    store.upload_dir(run_cfg.model_dir, "jobs/run1")

    # export_artifacts uploaded the CSV through the seam
    assert store.exists("jobs/run1/eval_stats_benchmarks.csv")

    # warm-start a new model_dir from the store and resume
    model_dir2 = tmp_path / "run2"
    fetched = warm_start_model_dir(store, "jobs/run1", model_dir2)
    assert any(f.endswith("checkpoint.pkl") for f in fetched)

    run_cfg2 = RunConfig(
        model_dir=str(model_dir2), training_hours_for_each_eval=1
    )
    h2 = TemporalHarness(
        cfg, run_cfg2, sess, art, corpus.ace_matrix, corpus.metadata
    )
    h2.load_checkpoint(os.path.join(model_dir2, "checkpoint.pkl"))
    assert h2.hours_trained == h1.hours_trained
    np.testing.assert_array_equal(
        np.asarray(h2.state.stream.buffer_ids),
        np.asarray(h1.state.stream.buffer_ids),
    )

    # warm-start from a missing path is a clean no-op
    assert warm_start_model_dir(store, "jobs/nope", tmp_path / "empty") == []


# ---------------------------------------------------------------------------
# GCS backend against an in-memory fake client (the protocol twin of the
# local store; reference gcs_utils.py:22-109).
# ---------------------------------------------------------------------------

class _FakeBlob:
    def __init__(self, store, name):
        self._store, self.name = store, name

    def upload_from_filename(self, path):
        with open(path, "rb") as f:
            self._store[self.name] = f.read()

    def download_to_filename(self, path):
        with open(path, "wb") as f:
            f.write(self._store[self.name])

    def exists(self):
        return self.name in self._store


class _FakeBucket:
    def __init__(self, store):
        self._store = store

    def blob(self, name):
        return _FakeBlob(self._store, name)

    def list_blobs(self, prefix=""):
        return [
            _FakeBlob(self._store, n)
            for n in sorted(self._store)
            if n.startswith(prefix)
        ]


class _FakeGCSClient:
    def __init__(self):
        self.blobs = {}

    def bucket(self, name):
        return _FakeBucket(self.blobs)


def _tree(tmp_path):
    src = tmp_path / "src"
    (src / "sub").mkdir(parents=True)
    (src / "metrics.csv").write_text("a,b\n1,2\n")
    (src / "sub" / "log.json").write_text("{}")
    (src / "model.ckpt").write_text("weights")
    return src


def test_gcs_store_roundtrip(tmp_path):
    from chameleon_recsys_tpu.utils.artifact_store import GCSArtifactStore

    client = _FakeGCSClient()
    store = GCSArtifactStore("gs://bucket/exp", client=client)
    assert isinstance(store, ArtifactStore)
    src = _tree(tmp_path)

    uploaded = store.upload_dir(src, "jobs/run1")
    assert uploaded == [
        "gs://bucket/exp/jobs/run1/metrics.csv",
        "gs://bucket/exp/jobs/run1/model.ckpt",
        "gs://bucket/exp/jobs/run1/sub/log.json",
    ]
    assert store.exists("jobs/run1")
    assert not store.exists("jobs/other")

    dst = tmp_path / "dst"
    downloaded = store.download_dir("jobs/run1", dst)
    assert len(downloaded) == 3
    assert (dst / "metrics.csv").read_text() == "a,b\n1,2\n"
    assert (dst / "sub" / "log.json").read_text() == "{}"


def test_gcs_store_pattern_filter(tmp_path):
    from chameleon_recsys_tpu.utils.artifact_store import GCSArtifactStore

    store = GCSArtifactStore("gs://bucket", client=_FakeGCSClient())
    src = _tree(tmp_path)
    up = store.upload_dir(src, "r", filename_pattern="ckpt")
    assert up == ["gs://bucket/r/model.ckpt"]
    store.upload_dir(src, "r")
    down = store.download_dir("r", tmp_path / "out", filename_pattern=".csv")
    assert [os.path.basename(p) for p in down] == ["metrics.csv"]


def test_gcs_warm_start_and_factory(tmp_path):
    from chameleon_recsys_tpu.utils.artifact_store import (
        GCSArtifactStore,
        LocalArtifactStore,
        open_artifact_store,
    )

    client = _FakeGCSClient()
    assert isinstance(
        open_artifact_store("gs://b/x", client=client), GCSArtifactStore
    )
    assert isinstance(open_artifact_store(str(tmp_path)), LocalArtifactStore)

    store = open_artifact_store("gs://bucket/root", client=client)
    src = _tree(tmp_path)
    store.upload_dir(src, "prev_job/model")
    fetched = warm_start_model_dir(store, "prev_job/model", tmp_path / "md")
    assert len(fetched) == 3
    assert (tmp_path / "md" / "model.ckpt").read_text() == "weights"
    # missing remote → empty, no error
    assert warm_start_model_dir(store, "nope", tmp_path / "md2") == []


def test_gcs_download_rejects_path_traversal(tmp_path):
    """A blob key with '..' segments must not write outside the download
    directory."""
    from chameleon_recsys_tpu.utils.artifact_store import GCSArtifactStore
    import pytest

    client = _FakeGCSClient()
    store = GCSArtifactStore("gs://bucket", client=client)
    client.blobs["r/../../evil.txt"] = b"pwned"
    with pytest.raises(ValueError, match="escapes"):
        store.download_dir("r", tmp_path / "out")
    assert not (tmp_path / "evil.txt").exists()
