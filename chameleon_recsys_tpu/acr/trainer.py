"""ACR training driver: train the ACE side task, export the ACE matrix.

Re-creation of the reference ACR trainers
(acr_module/acr/acr_trainer_gcom.py:1-352, acr_trainer_adressa.py:1-408):

  * train N epochs on the article corpus (classification or autoencoder);
  * evaluate on the TRAIN set — "the objective is to overfit"
    (acr_trainer_adressa.py:368-375);
  * predict an ACE for every article, sorted by article id;
  * assemble the [num_articles, acr_dim] matrix with the padding row 0 set
    to the mean embedding (acr_trainer_adressa.py:264-297) and export the
    ``(label_encoders, metadata, ace_matrix)`` pickle — the NAR handoff
    artifact (acr_trainer_adressa.py:250-254).
"""
from __future__ import annotations

import logging
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import ACRConfig
from ..models.acr import (
    ACRAutoencoderModel,
    ACRClassifierModel,
    ACRLabelSpec,
)
from ..utils.io import serialize

log = logging.getLogger("chameleon_tpu.acr")


def _batched(arrays: Dict[str, np.ndarray], batch_size: int, shuffle_rng=None):
    n = len(next(iter(arrays.values())))
    idx = np.arange(n)
    if shuffle_rng is not None:
        shuffle_rng.shuffle(idx)
    for start in range(0, n, batch_size):
        sel = idx[start : start + batch_size]
        if len(sel) < batch_size:  # static shapes: pad the tail batch
            pad = np.zeros(batch_size - len(sel), np.int64)
            sel = np.concatenate([sel, pad])
            weight = np.concatenate(
                [np.ones(len(idx[start:]), np.float32),
                 np.zeros(batch_size - len(idx[start:]), np.float32)]
            )
        else:
            weight = np.ones(batch_size, np.float32)
        yield {k: v[sel] for k, v in arrays.items()}, weight


class ACRTrainer:
    """Task-agnostic ACR driver over in-memory article arrays.

    ``articles`` columns: 'article_id' [N], 'text' [N, L] int32 token ids,
    'text_length' [N], plus one column per label head.
    """

    def __init__(
        self,
        cfg: ACRConfig,
        word_embeddings: np.ndarray,
        label_specs: Tuple[ACRLabelSpec, ...] = (),
        label_class_weights: Optional[Dict[str, np.ndarray]] = None,
        seed: int = 42,
    ):
        self.cfg = cfg
        self.word_embeddings = jnp.asarray(word_embeddings, jnp.float32)
        self.label_specs = tuple(label_specs)
        self.label_class_weights = (
            {k: jnp.asarray(v, jnp.float32) for k, v in label_class_weights.items()}
            if label_class_weights
            else None
        )
        self.rng = jax.random.PRNGKey(seed)
        self.autoencoder = cfg.training_task == "autoencoder"
        if self.autoencoder:
            self.model = ACRAutoencoderModel(cfg)
            # decoder seed token ~ U(-0.04, 0.04) (acr_trainer_adressa.py:338-339)
            np_rng = np.random.RandomState(seed)
            self.special_token_embedding = jnp.asarray(
                np_rng.uniform(-0.04, 0.04, size=(1, cfg.word_embedding_size)),
                jnp.float32,
            )
        else:
            self.model = ACRClassifierModel(cfg, self.label_specs)
        self.optimizer = optax.adam(cfg.learning_rate)
        if self.autoencoder:
            # reference clips the SDAE gradients (acr_model.py:519)
            self.optimizer = optax.chain(
                optax.clip_by_global_norm(5.0), self.optimizer
            )
        self.params = None
        self.opt_state = None
        self._train_step = jax.jit(self._train_step_fn)
        self._predict_ace = jax.jit(self._predict_fn)

    # -- forward/step -------------------------------------------------------
    def _apply(self, params, batch, rngs, train, example_weights=None):
        if self.autoencoder:
            ace, _, loss = self.model.apply(
                {"params": params},
                batch["text"],
                batch["text_length"],
                self.word_embeddings,
                self.special_token_embedding,
                example_weights,
                train=train,
                rngs=rngs,
            )
            return ace, loss
        labels = {s.name: batch[s.name] for s in self.label_specs}
        out = self.model.apply(
            {"params": params},
            batch["text"],
            batch["text_length"],
            self.word_embeddings,
            labels=labels,
            label_class_weights=self.label_class_weights,
            example_weights=example_weights,
            train=train,
            rngs=rngs,
        )
        return out.ace, out.loss

    def _l2(self, params):
        total = 0.0
        for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
            keys = [getattr(p, "key", getattr(p, "name", "")) for p in path]
            if any("bias" in str(k) for k in keys):
                continue
            total = total + jnp.sum(jnp.square(leaf.astype(jnp.float32))) / 2.0
        return self.cfg.l2_reg_lambda * total

    def _train_step_fn(self, params, opt_state, batch, rng, weights):
        rngs = {"dropout": rng, "noise": jax.random.fold_in(rng, 1)}

        def loss_fn(p):
            _, task_loss = self._apply(
                p, batch, rngs, train=True, example_weights=weights
            )
            return task_loss + self._l2(p), task_loss

        (loss, task_loss), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = self.optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, task_loss

    def _predict_fn(self, params, batch):
        ace, _ = self._apply(params, batch, {}, train=False)
        return ace

    # -- public API ---------------------------------------------------------
    def init(self, example_batch: Dict[str, np.ndarray]):
        self.rng, init_rng = jax.random.split(self.rng)
        batch = {k: jnp.asarray(v) for k, v in example_batch.items()}
        rngs = {
            "params": init_rng,
            "dropout": init_rng,
            "noise": init_rng,
        }
        if self.autoencoder:
            variables = self.model.init(
                rngs,
                batch["text"],
                batch["text_length"],
                self.word_embeddings,
                self.special_token_embedding,
                train=False,
            )
        else:
            variables = self.model.init(
                rngs,
                batch["text"],
                batch["text_length"],
                self.word_embeddings,
                labels=None,
                train=False,
            )
        self.params = variables["params"]
        self.opt_state = self.optimizer.init(self.params)

    def fit(self, articles: Dict[str, np.ndarray]) -> List[float]:
        cfg = self.cfg
        shuffle_rng = np.random.RandomState(0)
        if self.params is None:
            example, _ = next(_batched(articles, cfg.batch_size))
            self.init(example)
        epoch_losses = []
        for epoch in range(cfg.training_epochs):
            losses = []
            for batch, weight in _batched(articles, cfg.batch_size, shuffle_rng):
                self.rng, step_rng = jax.random.split(self.rng)
                jbatch = {k: jnp.asarray(v) for k, v in batch.items()}
                self.params, self.opt_state, loss, task_loss = self._train_step(
                    self.params, self.opt_state, jbatch, step_rng,
                    jnp.asarray(weight),
                )
                losses.append(task_loss)
            epoch_loss = float(np.mean([float(x) for x in losses]))
            epoch_losses.append(epoch_loss)
            log.info("ACR epoch %d: task loss %.5f", epoch, epoch_loss)
        return epoch_losses

    def evaluate(self, articles: Dict[str, np.ndarray]) -> Dict[str, float]:
        """Evaluate the classification heads on the TRAIN set — the
        reference's deliberate-overfit check (acr_trainer_adressa.py:368-375):
        accuracy for multiclass heads, precision/recall for multilabel
        (acr_model.py:240-268)."""
        if self.autoencoder or not self.label_specs:
            return {}
        import jax.numpy as jnp

        @jax.jit
        def predict_logits(params, batch):
            labels = {s.name: batch[s.name] for s in self.label_specs}
            out = self.model.apply(
                {"params": params},
                batch["text"],
                batch["text_length"],
                self.word_embeddings,
                labels=None,
                train=False,
            )
            return out.label_logits

        stats = {
            s.name: {"correct": 0, "total": 0, "tp": 0, "pred_pos": 0,
                     "actual_pos": 0}
            for s in self.label_specs
        }
        for batch, weight in _batched(articles, self.cfg.batch_size):
            jbatch = {k: jnp.asarray(v) for k, v in batch.items()}
            logits = jax.tree_util.tree_map(
                np.asarray, predict_logits(self.params, jbatch)
            )
            valid = weight > 0
            for spec in self.label_specs:
                lg = logits[spec.name][valid]
                if spec.classification_type == "multiclass":
                    preds = lg.argmax(axis=1)
                    y = np.asarray(batch[spec.name])[valid]
                    stats[spec.name]["correct"] += int((preds == y).sum())
                    stats[spec.name]["total"] += len(y)
                else:  # multilabel: sigmoid > 0.5 vs multi-hot of id lists
                    pred_hot = (1.0 / (1.0 + np.exp(-lg))) > 0.5
                    y_ids = np.asarray(batch[spec.name])[valid]
                    true_hot = np.zeros_like(pred_hot)
                    rows = np.repeat(np.arange(len(y_ids)), y_ids.shape[1])
                    true_hot[rows, y_ids.reshape(-1)] = True
                    true_hot[:, 0] = False  # padding class never positive
                    st = stats[spec.name]
                    st["tp"] += int((pred_hot & true_hot).sum())
                    st["pred_pos"] += int(pred_hot.sum())
                    st["actual_pos"] += int(true_hot.sum())
        results: Dict[str, float] = {}
        for spec in self.label_specs:
            st = stats[spec.name]
            if spec.classification_type == "multiclass":
                results[f"accuracy-{spec.name}"] = (
                    st["correct"] / max(st["total"], 1)
                )
            else:
                results[f"precision-{spec.name}"] = (
                    st["tp"] / max(st["pred_pos"], 1)
                )
                results[f"recall-{spec.name}"] = (
                    st["tp"] / max(st["actual_pos"], 1)
                )
        return results

    def predict_all_ace(self, articles: Dict[str, np.ndarray]) -> np.ndarray:
        """ACE for every article row, in input order."""
        out = []
        for batch, weight in _batched(articles, self.cfg.batch_size):
            jbatch = {k: jnp.asarray(v) for k, v in batch.items()}
            ace = np.asarray(self._predict_ace(self.params, jbatch))
            out.append(ace[weight > 0])
        return np.concatenate(out, axis=0)

    def build_ace_matrix(self, articles: Dict[str, np.ndarray]) -> np.ndarray:
        """[num_articles, acr_dim] matrix indexed by article id; row 0
        (padding) = mean embedding (acr_trainer_adressa.py:264-297)."""
        ids = np.asarray(articles["article_id"])
        order = np.argsort(ids)
        sorted_ids = ids[order]
        if not np.array_equal(sorted_ids, np.arange(1, len(ids) + 1)):
            raise AssertionError(
                "article ids must be contiguous starting from 1 "
                "(reference invariant, acr_trainer_adressa.py:264-275)"
            )
        ace = self.predict_all_ace(articles)[order]
        matrix = np.zeros((len(ids) + 1, ace.shape[1]), np.float32)
        matrix[1:] = ace
        matrix[0] = ace.mean(axis=0)
        return matrix


def export_ace_pickle(path, label_encoders, articles_metadata, ace_matrix):
    """The ACR→NAR handoff artifact
    (acr_articles_metadata_embeddings.pickle, acr_trainer_adressa.py:250-254)."""
    serialize(path, (label_encoders, articles_metadata, ace_matrix))
    return path


def load_ace_for_nar(path, scale_factor: float = 1.0):
    """NAR-side load: L2-normalize rows and rescale
    (nar_trainer_gcom.py:461-474)."""
    from ..utils.io import deserialize

    label_encoders, metadata, ace = deserialize(path)
    norms = np.linalg.norm(ace, axis=1, keepdims=True)
    ace_normed = np.divide(ace, norms, out=np.zeros_like(ace), where=norms > 0)
    return label_encoders, metadata, ace_normed * scale_factor
