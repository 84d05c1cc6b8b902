"""Buffer-statistic normalization used by the dynamic item features.

Twin of the reference's normalize_values / min_max_normalization
(nar_module/nar/nar_model.py:996-1039) with one structural change: the
reference boolean-masks dynamic-shape stat vectors; here stats are computed
with fixed shapes and an explicit validity mask (weighted moments / masked
min-max), which is what XLA wants.
"""
from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp

_EPS = 1e-24


def log_base(x: jax.Array, base: float) -> jax.Array:
    """log_base (reference nar_model.py:28-31)."""
    return jnp.log(x) / math.log(base)


def log1p_base(x: jax.Array, base: float) -> jax.Array:
    """log_1p (reference nar_model.py:33-34)."""
    return log_base(x + 1.0, base)


def masked_moments(values: jax.Array, mask: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Mean/variance over entries where mask is True (biased variance, like
    tf.nn.moments)."""
    w = mask.astype(values.dtype)
    count = jnp.maximum(jnp.sum(w), 1.0)
    mean = jnp.sum(values * w) / count
    var = jnp.sum(jnp.square(values - mean) * w) / count
    return mean, var


def masked_min_max(values: jax.Array, mask: jax.Array) -> Tuple[jax.Array, jax.Array]:
    big = jnp.asarray(jnp.finfo(values.dtype).max, values.dtype)
    vmin = jnp.min(jnp.where(mask, values, big))
    vmax = jnp.max(jnp.where(mask, values, -big))
    return vmin, vmax


def min_max_normalization(
    tensor: jax.Array,
    stats_values: jax.Array,
    stats_mask: jax.Array,
    min_max_range: Tuple[float, float] = (-1.0, 1.0),
) -> jax.Array:
    """min_max_normalization (reference nar_model.py:996-1009)."""
    min_value, max_value = masked_min_max(stats_values, stats_mask)
    scaled = (tensor - min_value + _EPS) / jnp.maximum(max_value - min_value, 2 * _EPS)
    lo, hi = min_max_range
    return scaled * (hi - lo) + lo


def normalize_values(
    tensor_to_normalize: jax.Array,
    stats_values: jax.Array,
    stats_mask: jax.Array,
    min_max_scaling_after_znorm: bool = True,
    min_max_range: Tuple[float, float] = (-1.0, 1.0),
) -> jax.Array:
    """Standardize against masked stats, then min-max rescale
    (reference normalize_values, nar_model.py:1011-1039)."""
    mean, var = masked_moments(stats_values, stats_mask)
    stddev = jnp.sqrt(var + _EPS)
    normed = (tensor_to_normalize - mean) / stddev
    if min_max_scaling_after_znorm:
        stats_normed = (stats_values - mean) / stddev
        normed = min_max_normalization(
            normed, stats_normed, stats_mask, min_max_range=min_max_range
        )
    return normed
