"""Test config: force the CPU platform with 8 virtual devices so sharding
tests run without TPU hardware, with the same pjit code paths."""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The environment's sitecustomize registers a tunneled TPU platform and
# overrides JAX_PLATFORMS; an explicit config update after import wins.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

from chameleon_recsys_tpu.config import (
    ArticleFeaturesSchema,
    FeatureSpec,
    NARConfig,
    InternalFeaturesConfig,
    SessionFeaturesSchema,
)


def tiny_article_schema(num_items: int = 200) -> ArticleFeaturesSchema:
    return ArticleFeaturesSchema(
        features=(
            FeatureSpec("article_id", "categorical", num_items),
            FeatureSpec("created_at_ts", "numerical", dtype="int"),
            FeatureSpec("category_id", "categorical", 12),
        )
    )


def tiny_session_schema(num_items: int = 200) -> SessionFeaturesSchema:
    return SessionFeaturesSchema(
        single=(
            FeatureSpec("user_id", "categorical", 1000),
            FeatureSpec("session_id", "numerical", dtype="int"),
            FeatureSpec("session_start", "numerical", dtype="int"),
            FeatureSpec("session_size", "numerical", dtype="int"),
        ),
        sequence=(
            FeatureSpec("event_timestamp", "numerical", dtype="int"),
            FeatureSpec("item_clicked", "categorical", num_items),
            FeatureSpec("device", "categorical", 5),
            FeatureSpec("os", "categorical", 23),
            FeatureSpec("hour_sin", "numerical", dtype="float"),
        ),
    )


def tiny_nar_config(**overrides) -> NARConfig:
    defaults = dict(
        car_embedding_size=32,
        rnn_units=24,
        rnn_num_layers=2,
        matching_layer_sizes=(16, 8),
        learning_rate=1e-3,
        negative_samples=5,
        negative_sample_from_buffer=30,
        eval_negative_samples=5,
        eval_negative_sample_from_buffer=30,
        recent_clicks_buffer_max_size=128,
        recent_clicks_for_normalization=64,
        batch_size=8,
        max_session_length=8,
        metrics_top_n=4,
    )
    defaults.update(overrides)
    return NARConfig(**defaults)


@pytest.fixture
def article_schema():
    return tiny_article_schema()


@pytest.fixture
def session_schema():
    return tiny_session_schema()


@pytest.fixture
def nar_cfg():
    return tiny_nar_config()
