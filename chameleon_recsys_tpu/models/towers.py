"""Schema-driven feature towers.

Twin of the reference's get_features (nar_module/nar/nar_model.py:730-773):
categorical features with cardinality ≤ ``max_cardinality_for_ohe`` are
one-hot encoded, larger ones get a trainable embedding of dimension
``floor(8·cardinality^0.25)``; numerical features pass through with an added
channel axis.  All feature channels concatenate on the last axis.
"""
from __future__ import annotations

from typing import Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config import FeatureSpec, embedding_dim_for_cardinality


class FeatureTowers(nn.Module):
    features: Tuple[FeatureSpec, ...]
    max_cardinality_for_ohe: int = 10
    const_mult: int = 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, inputs: Dict[str, jax.Array]) -> jax.Array:
        """inputs[name] has shape [...]; returns [..., F] concatenated channels."""
        channels = []
        for spec in self.features:
            x = inputs[spec.name]
            if spec.kind == "categorical":
                if spec.cardinality <= self.max_cardinality_for_ohe:
                    feat = jax.nn.one_hot(x, spec.cardinality, dtype=self.dtype)
                else:
                    feat = nn.Embed(
                        num_embeddings=spec.cardinality,
                        features=embedding_dim_for_cardinality(
                            spec.cardinality, self.const_mult
                        ),
                        embedding_init=nn.initializers.glorot_uniform(),
                        dtype=self.dtype,
                        name=f"{spec.name}_embedding",
                    )(x)
            else:
                feat = x.astype(self.dtype)[..., None]
            channels.append(feat)
        if not channels:
            raise ValueError("FeatureTowers called with an empty schema")
        return jnp.concatenate(channels, axis=-1)


def towers_output_dim(
    features: Tuple[FeatureSpec, ...], max_cardinality_for_ohe: int = 10,
    const_mult: int = 8,
) -> int:
    dim = 0
    for spec in features:
        if spec.kind == "categorical":
            if spec.cardinality <= max_cardinality_for_ohe:
                dim += spec.cardinality
            else:
                dim += embedding_dim_for_cardinality(spec.cardinality, const_mult)
        else:
            dim += 1
    return dim
