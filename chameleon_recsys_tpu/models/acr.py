"""ACR — Article Content Representation models, TPU-native.

Re-design of the reference ``ACR_Model`` TF1 graph
(acr_module/acr/acr_model.py:33-531).  Two training tasks produce the
Article Content Embedding (ACE):

* ``metadata_classification`` — supervised side task: text encoder (CNN over
  word embeddings with max-pool-over-time, or a GRU stack on the reversed
  token sequence with max-pool over outputs) → Dense(relu) → Dense(tanh) =
  ACE → per-label softmax/sigmoid heads with class weights
  (acr_model.py:103-268).
* ``autoencoder`` — unsupervised GRU sequence-denoising autoencoder:
  optional Gaussian input noise → GRU encoder (reversed input) → tanh
  bottleneck(=ACE) → state re-expansion → GRU decoder seeded with a special
  token, masked MSE reconstruction of the word-embedding sequence
  (acr_model.py:403-531).

The cuDNN-bound pieces of the reference (CudnnGRU pinned to /gpu:0,
acr_model.py:306-399) become `lax.scan` GRU layers with the input projection
hoisted into one MXU matmul (ops/rnn.py); the CNN becomes `lax` 1-D convs
which XLA maps onto the MXU.
"""
from __future__ import annotations

from typing import Dict, NamedTuple, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config import ACRConfig
from ..ops.rnn import StackedGRU, StackedLSTM


class ACRLabelSpec(NamedTuple):
    name: str
    cardinality: int
    classification_type: str  # 'multiclass' | 'multilabel'
    feature_weight_on_loss: float = 1.0


class ACROutputs(NamedTuple):
    ace: jax.Array  # [B, acr_dim] article content embedding
    label_logits: Dict[str, jax.Array]
    loss: jax.Array
    per_label_loss: Dict[str, jax.Array]


class TextCNN(nn.Module):
    """Multi-width conv1d bank with max-pool-over-time
    (reference cnn_feature_extractor, acr_model.py:272-289)."""

    filter_sizes: tuple
    num_filters: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:  # [B, L, D]
        pooled = []
        for width in self.filter_sizes:
            conv = nn.Conv(
                features=self.num_filters,
                kernel_size=(width,),
                padding="VALID",
                dtype=self.dtype,
                name=f"conv_{width}",
            )(x)
            pooled.append(jnp.max(nn.relu(conv), axis=1))
        return jnp.concatenate(pooled, axis=-1)


class ACRClassifierModel(nn.Module):
    """Metadata-classification instantiation (acr_model.py:103-268)."""

    cfg: ACRConfig
    label_specs: tuple  # Tuple[ACRLabelSpec, ...]

    def _dtype(self):
        return jnp.bfloat16 if self.cfg.compute_dtype == "bfloat16" else jnp.float32

    @nn.compact
    def __call__(
        self,
        text_tokens: jax.Array,  # [B, L] int32
        text_length: jax.Array,  # [B]
        word_embeddings: jax.Array,  # [vocab, word_dim] frozen
        labels: Optional[Dict[str, jax.Array]] = None,
        label_class_weights: Optional[Dict[str, jax.Array]] = None,
        example_weights: Optional[jax.Array] = None,  # [B] 0 = padded row
        *,
        train: bool = False,
    ) -> ACROutputs:
        cfg = self.cfg
        dtype = self._dtype()
        emb = word_embeddings[text_tokens].astype(dtype)  # [B, L, D]
        mask = text_tokens != 0

        if cfg.text_feature_extractor.upper() == "CNN":
            content = TextCNN(
                cfg.cnn_filter_sizes, cfg.cnn_num_filters, dtype=dtype, name="cnn"
            )(emb)
        elif cfg.text_feature_extractor.upper() in ("GRU", "LSTM"):
            # Reversed input: most relevant words lead the document
            # (acr_model.py:116-117); max-pool over outputs (:124).
            emb_rev = jnp.flip(emb, axis=1)
            mask_rev = jnp.ones_like(mask)  # cuDNN ignores lengths (:397)
            rnn_cls = (
                StackedLSTM
                if cfg.text_feature_extractor.upper() == "LSTM"
                else StackedGRU
            )
            rnn_out, _ = rnn_cls(
                cfg.rnn_units,
                cfg.rnn_layers,
                keep_prob=cfg.dropout_keep_prob,
                dtype=dtype,
                direction=cfg.rnn_direction,
                name="rnn",
            )(emb_rev, mask_rev, deterministic=not train)
            content = jnp.max(rnn_out, axis=1)
        else:
            raise ValueError(
                f"invalid text_feature_extractor {cfg.text_feature_extractor}"
            )

        dropout = nn.Dropout(rate=1.0 - cfg.dropout_keep_prob)
        content = dropout(content, deterministic=not train)
        fc2 = nn.relu(
            nn.Dense(cfg.acr_embeddings_size, dtype=dtype, name="fc2")(content)
        )
        ace = jnp.tanh(
            nn.Dense(
                cfg.acr_embeddings_size,
                kernel_init=nn.initializers.glorot_uniform(),
                dtype=dtype,
                name="article_content_embedding",
            )(fc2)
        )

        hidden = dropout(ace, deterministic=not train)
        label_logits = {}
        per_label_loss = {}
        total_loss = jnp.zeros((), jnp.float32)
        for spec in self.label_specs:
            logits = nn.Dense(
                spec.cardinality, dtype=dtype, name=f"output_{spec.name}"
            )(hidden).astype(jnp.float32)
            label_logits[spec.name] = logits
            if labels is None:
                continue
            y = labels[spec.name]
            ew = (
                jnp.ones(y.shape[0])
                if example_weights is None
                else example_weights.astype(jnp.float32)
            )
            if spec.classification_type == "multiclass":
                log_probs = jax.nn.log_softmax(logits)
                xe = -jnp.take_along_axis(log_probs, y[:, None], axis=1)[:, 0]
                if label_class_weights and spec.name in label_class_weights:
                    w = label_class_weights[spec.name][y] * ew
                else:
                    w = ew
                # tf.losses.sparse_softmax_cross_entropy default reduction is
                # SUM_BY_NONZERO_WEIGHTS (acr_model.py:196-198): the weighted
                # sum divides by the COUNT of nonzero weights, not Σw.
                n_present = jnp.sum((w != 0).astype(jnp.float32))
                loss = jnp.sum(xe * w) / jnp.maximum(n_present, 1.0)
            elif spec.classification_type == "multilabel":
                # labels y: [B, num_ids] padded id lists → multi-hot with the
                # padding class zeroed (acr_model.py:202-210)
                multi_hot = jnp.zeros((y.shape[0], spec.cardinality))
                multi_hot = multi_hot.at[jnp.arange(y.shape[0])[:, None], y].set(1.0)
                multi_hot = multi_hot.at[:, 0].set(0.0)
                xe = optax_sigmoid_xe(logits, multi_hot)
                per_example = jnp.mean(xe, axis=1)
                loss = jnp.sum(per_example * ew) / jnp.maximum(jnp.sum(ew), 1e-9)
            else:
                raise ValueError(spec.classification_type)
            per_label_loss[spec.name] = loss
            total_loss = total_loss + spec.feature_weight_on_loss * loss

        return ACROutputs(ace, label_logits, total_loss, per_label_loss)


def optax_sigmoid_xe(logits, targets):
    """Numerically-stable sigmoid cross-entropy (tf.nn.sigmoid_cross_entropy
    semantics)."""
    return jnp.maximum(logits, 0) - logits * targets + jnp.log1p(
        jnp.exp(-jnp.abs(logits))
    )


class ACRAutoencoderModel(nn.Module):
    """GRU sequence-denoising autoencoder (acr_model.py:403-531)."""

    cfg: ACRConfig

    def _dtype(self):
        return jnp.bfloat16 if self.cfg.compute_dtype == "bfloat16" else jnp.float32

    @nn.compact
    def __call__(
        self,
        text_tokens: jax.Array,  # [B, L]
        text_length: jax.Array,  # [B]
        word_embeddings: jax.Array,  # [vocab, word_dim]
        special_token_embedding: jax.Array,  # [1, word_dim]
        example_weights: Optional[jax.Array] = None,  # [B] 0 = padded row
        *,
        train: bool = False,
    ):
        cfg = self.cfg
        dtype = self._dtype()
        emb = word_embeddings[text_tokens].astype(dtype)  # [B, L, D]
        b, l, d = emb.shape

        # Denoising noise only while training (the reference injects it in
        # every mode, acr_model.py:414-417; gating on train makes ACE
        # extraction deterministic without changing the learned objective).
        noisy = emb
        if cfg.autoencoder_noise > 0.0 and train:
            noise = cfg.autoencoder_noise * jax.random.normal(
                self.make_rng("noise"), emb.shape, dtype
            )
            noisy = emb + noise

        full_mask = jnp.ones((b, l), bool)
        # The encoder honors rnn_direction (the reference routes both
        # autoencoder RNNs through build_cudnn_rnn with the shared direction,
        # acr_model.py:428, 462); the DECODER stays unidirectional here — its
        # layers are seeded from the re-expanded bottleneck states and decode
        # left-to-right, where a backward pass has no seed to decode from.
        _, enc_finals = StackedGRU(
            cfg.rnn_units, cfg.rnn_layers, keep_prob=cfg.dropout_keep_prob,
            dtype=dtype, direction=cfg.rnn_direction, name="encoder",
        )(jnp.flip(noisy, axis=1), full_mask, deterministic=not train)
        # enc_finals: [layers, B, U] (2U when bidirectional)

        compressed = jnp.tanh(
            nn.Dense(cfg.acr_embeddings_size, dtype=dtype, name="bottleneck")(
                enc_finals
            )
        )  # [layers, B, acr]
        ace = compressed[-1]  # last layer's state = ACE (acr_model.py:452)

        reexpanded = jnp.tanh(
            nn.Dense(cfg.rnn_units, dtype=dtype, name="state_reconstruction")(
                compressed
            )
        )  # [layers, B, U] → decoder initial state per layer

        special = jnp.broadcast_to(
            special_token_embedding.astype(dtype)[None], (b, 1, d)
        )
        decoder_input = jnp.concatenate([special, emb[:, :-1, :]], axis=1)
        dec_out, _ = StackedGRU(
            cfg.rnn_units, cfg.rnn_layers, keep_prob=cfg.dropout_keep_prob,
            dtype=dtype, name="decoder",
        )(
            decoder_input,
            full_mask,
            h0=[reexpanded[i] for i in range(reexpanded.shape[0])],
            deterministic=not train,
        )
        reconstructed = nn.Dense(
            cfg.word_embedding_size, dtype=dtype, name="output_projection"
        )(dec_out).astype(jnp.float32)

        mask = (text_tokens != 0).astype(jnp.float32)[..., None]
        if example_weights is not None:
            mask = mask * example_weights.astype(jnp.float32)[:, None, None]
        mask = jnp.broadcast_to(mask, emb.shape)
        target = emb.astype(jnp.float32)
        sq_err = jnp.square(target * mask - reconstructed * mask)
        loss = jnp.sum(sq_err) / jnp.maximum(jnp.sum(mask), 1.0)
        return ace.astype(jnp.float32), reconstructed, loss
