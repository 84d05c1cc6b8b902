"""Feature-group and internal-feature ablation toggles (the paper's
Input-Configuration axes)."""
import numpy as np
import jax.numpy as jnp
import pytest

from chameleon_recsys_tpu.config import (
    InternalFeaturesConfig,
    filter_article_schema,
    filter_session_schema,
    gcom_article_schema,
    gcom_session_schema,
)
from chameleon_recsys_tpu.data.collate import batches_from_sessions
from chameleon_recsys_tpu.data.synthetic import (
    make_synthetic_corpus,
    synthetic_hour_sessions,
)
from chameleon_recsys_tpu.train.steps import build_nar_train, nar_init_state

from conftest import tiny_article_schema, tiny_nar_config, tiny_session_schema


def test_filter_session_schema_groups():
    schema = gcom_session_schema()
    names = lambda s: [f.name for f in s.sequence]
    assert "local_hour_sin" in names(schema)

    only_time = filter_session_schema(schema, "time")
    assert "local_hour_sin" in names(only_time)
    assert "os" not in names(only_time)
    assert "country" not in names(only_time)
    # structural features always survive
    assert "item_clicked" in names(only_time)
    assert "event_timestamp" in names(only_time)

    none = filter_session_schema(schema, "NONE")
    assert names(none) == ["event_timestamp", "item_clicked"]

    assert filter_session_schema(schema, "ALL") is schema


def test_filter_article_schema_groups():
    schema = gcom_article_schema()
    none = filter_article_schema(schema, "NONE")
    assert [f.name for f in none.features] == ["article_id", "created_at_ts"]


@pytest.mark.parametrize(
    "internal",
    [
        InternalFeaturesConfig(False, False, False, True),
        InternalFeaturesConfig(True, True, False, False),
    ],
)
@pytest.mark.slow
def test_model_trains_with_ablated_features(internal):
    cfg = tiny_nar_config()
    import dataclasses

    cfg = dataclasses.replace(cfg, internal_features=internal)
    art = tiny_article_schema(120)
    # drop ALL context features: only structural sequence features remain
    sess = filter_session_schema(
        tiny_session_schema(120), "NONE",
        groups_map={"ctx": ["device", "os", "hour_sin"]},
    )
    corpus = make_synthetic_corpus(art, ace_dim=8)
    metadata = {k: jnp.asarray(v) for k, v in corpus.metadata.items()}
    ace = jnp.asarray(corpus.ace_matrix)
    sessions = synthetic_hour_sessions(
        corpus, sess, 0, cfg.batch_size, cfg.max_session_length
    )
    batch = next(
        iter(
            batches_from_sessions(
                sessions, sess, cfg.batch_size, cfg.max_session_length
            )
        )
    )
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    _, _, state = nar_init_state(cfg, sess, art, batch, ace, metadata)
    step = build_nar_train(cfg, sess, art).train_step
    state, metrics = step(state, batch, ace, metadata)
    assert np.isfinite(float(metrics["loss"]))


def test_unknown_group_rejected():
    schema = gcom_session_schema()
    with pytest.raises(ValueError, match="unknown feature groups"):
        filter_session_schema(schema, "time,locaton")


def test_list_form_all_none():
    schema = gcom_session_schema()
    assert filter_session_schema(schema, ["ALL"]) is schema
    none = filter_session_schema(schema, ["NONE"])
    assert [f.name for f in none.sequence] == ["event_timestamp", "item_clicked"]


def test_structural_features_protected_with_custom_map():
    schema = gcom_session_schema()
    # even a malicious custom map cannot drop structural features
    filtered = filter_session_schema(
        schema, "NONE", groups_map={"g": ["item_clicked", "event_timestamp", "os"]}
    )
    names = [f.name for f in filtered.sequence]
    assert "item_clicked" in names and "event_timestamp" in names
    assert "os" not in names
