"""Serving path: checkpoint load, candidate scoring, live-state observation."""
import numpy as np
import jax.numpy as jnp
import pytest

from chameleon_recsys_tpu.config import RunConfig
from chameleon_recsys_tpu.data.collate import Session
from chameleon_recsys_tpu.data.synthetic import (
    make_synthetic_corpus,
    make_transition_graph,
    synthetic_markov_hour_sessions,
)
from chameleon_recsys_tpu.serve import NARServer
from chameleon_recsys_tpu.train.temporal import TemporalHarness

from conftest import tiny_article_schema, tiny_nar_config, tiny_session_schema

pytestmark = pytest.mark.slow  # module fixture is compile-heavy


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    cfg = tiny_nar_config(batch_size=8, max_session_length=8)
    art = tiny_article_schema(150)
    sess = tiny_session_schema(150)
    corpus = make_synthetic_corpus(art, ace_dim=8)
    graph = make_transition_graph(150)
    run_cfg = RunConfig(
        model_dir=str(tmp_path_factory.mktemp("serve")),
        training_hours_for_each_eval=2,
    )
    harness = TemporalHarness(
        cfg, run_cfg, sess, art, corpus.ace_matrix, corpus.metadata
    )

    def hour_source(h):
        return synthetic_markov_hour_sessions(
            corpus, sess, graph, h, 24, cfg.max_session_length
        )

    harness.run(hour_source, hours=range(3))
    ckpt = harness.save_checkpoint()
    return cfg, art, sess, corpus, harness, ckpt


def _live_sessions(sess_schema, n=3):
    rng = np.random.RandomState(5)
    out = []
    for i in range(n):
        k = int(rng.randint(2, 6))
        out.append(
            Session(
                session_id=900 + i,
                user_id=10 + i,
                session_start=400000,
                item_ids=rng.randint(1, 150, k).tolist(),
                timestamps=(400000 + np.arange(k) * 20).tolist(),
                context={
                    s.name: rng.randint(1, max(s.cardinality, 2), k).tolist()
                    if s.kind == "categorical"
                    else rng.uniform(-1, 1, k).tolist()
                    for s in sess_schema.context_sequence_features()
                },
            )
        )
    return out


def test_recommend_from_checkpoint(trained):
    cfg, art, sess, corpus, harness, ckpt = trained
    server = NARServer.from_checkpoint(
        ckpt, cfg, sess, art, corpus.ace_matrix, corpus.metadata
    )
    sessions = _live_sessions(sess)
    ids, scores = server.recommend(sessions, top_k=5, num_candidates=64)
    assert ids.shape == (3, 5)
    assert (ids > 0).all()  # real items, no padding
    # scores sorted descending per session
    assert (np.diff(scores, axis=1) <= 1e-7).all()
    # recommendations come from the candidate pool
    pool = set(server.default_candidates(64).tolist())
    assert set(ids.reshape(-1).tolist()) <= pool


def test_recommend_with_explicit_candidates(trained):
    cfg, art, sess, corpus, harness, ckpt = trained
    server = NARServer.from_checkpoint(
        ckpt, cfg, sess, art, corpus.ace_matrix, corpus.metadata
    )
    sessions = _live_sessions(sess, n=2)
    candidates = np.array([[5, 9, 17, 23, 0, 0], [8, 11, 29, 31, 0, 0]], np.int32)
    ids, scores = server.recommend(sessions, candidates=candidates, top_k=3)
    for b in range(2):
        assert set(ids[b].tolist()) <= set(candidates[b].tolist()) - {0}


def test_observe_updates_stream(trained):
    cfg, art, sess, corpus, harness, ckpt = trained
    server = NARServer.from_checkpoint(
        ckpt, cfg, sess, art, corpus.ace_matrix, corpus.metadata
    )
    step_before = int(server.stream.current_step)
    sessions = _live_sessions(sess)
    server.observe(sessions)
    assert int(server.stream.current_step) == step_before + 1
    buffer = np.asarray(server.stream.buffer_ids)
    assert sessions[0].item_ids[-1] in buffer.tolist()
