"""GRU4Rec re-expressed in JAX (the reference bundles Hidasi's Theano
implementation, nar_module/nar/benchmarks/gru4rec/gru4rec2.py).

Semantics preserved:
  * GRU cell in GRU4Rec's formulation — candidate uses r-gated state, update
    gate weighs the candidate: ``h' = (1−z)·h + z·tanh(Wh·(r⊙h) + Wx·x)``
    (gru4rec2.py:392-431);
  * first layer indexes the input weight matrix directly by item id
    (one-hot matmul as a row gather, embedding=0 mode);
  * scores = h · Wy[Y]ᵀ + By[Y] over [batch positives ‖ n_sample shared
    negatives], own positive on the diagonal;
  * losses: cross-entropy, bpr, bpr-max (softmax-weighted sigmoid ranking
    with score regularization), top1, top1-max (gru4rec2.py:188-213);
  * negatives sampled from the recent-clicks buffer with popularity bias via
    repetition (run_gru4rec.py integration with ClickedItemsState).

TPU re-design: instead of Theano's session-parallel minibatches with
in-place hidden-state resets, sessions arrive as the framework's padded
[B, T] batches and the recurrence is a ``lax.scan``; each time step's
positives form the in-batch candidate block, padded steps are masked out.
The optimizer is dense Adagrad (optax) rather than Theano's sparse-row
updates — XLA scatters handle the sparsity.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax


class GRU4RecParams(NamedTuple):
    wx: Tuple[jax.Array, ...]  # layer 0: [n_items, 3U]; others: [U, 3U]
    wh: Tuple[jax.Array, ...]  # [U, U] candidate recurrent
    wrz: Tuple[jax.Array, ...]  # [U, 2U] reset/update recurrent
    bh: Tuple[jax.Array, ...]  # [3U]
    wy: jax.Array  # [n_items, U]
    by: jax.Array  # [n_items]


def _init_matrix(rng, shape, sigma=0.0):
    # reference init: U(±sqrt(6/(fan_in+fan_out))) (gru4rec2.py init_weights)
    bound = np.sqrt(6.0 / (shape[0] + shape[1]))
    return jax.random.uniform(rng, shape, jnp.float32, -bound, bound)


def init_gru4rec_params(rng, n_items: int, layers: Tuple[int, ...]) -> GRU4RecParams:
    wx, wh, wrz, bh = [], [], [], []
    in_dim = n_items
    for i, units in enumerate(layers):
        rng, k1, k2, k3 = jax.random.split(rng, 4)
        wx.append(_init_matrix(k1, (in_dim, 3 * units)))
        wh.append(_init_matrix(k2, (units, units)))
        wrz.append(_init_matrix(k3, (units, 2 * units)))
        bh.append(jnp.zeros((3 * units,), jnp.float32))
        in_dim = units
    rng, k = jax.random.split(rng)
    wy = _init_matrix(k, (n_items, layers[-1]))
    by = jnp.zeros((n_items,), jnp.float32)
    return GRU4RecParams(tuple(wx), tuple(wh), tuple(wrz), tuple(bh), wy, by)


def _forward_states(params: GRU4RecParams, items: jax.Array, mask: jax.Array,
                    layers: Tuple[int, ...], dropout_p_hidden: float = 0.0,
                    dropout_rng=None):
    """Hidden states for every step: items [B, T] → h [B, T, U_last];
    inter-layer dropout like the reference's drop_p_hidden
    (gru4rec2.py model(), applied to each layer's output during training)."""
    b, t = items.shape

    def layer_scan(layer_idx, inputs_bt):
        units = layers[layer_idx]
        wh = params.wh[layer_idx]
        wrz = params.wrz[layer_idx]
        if layer_idx == 0:
            vec = params.wx[0][items] + params.bh[0]  # [B, T, 3U] row gather
        else:
            vec = inputs_bt @ params.wx[layer_idx] + params.bh[layer_idx]

        def step(h, xs):
            vec_t, m_t = xs
            rz = jax.nn.sigmoid(vec_t[:, units:] + h @ wrz)
            r, z = rz[:, :units], rz[:, units:]
            cand = jnp.tanh((h * r) @ wh + vec_t[:, :units])
            h_new = (1.0 - z) * h + z * cand
            h = jnp.where(m_t[:, None], h_new, h)
            return h, h

        h0 = jnp.zeros((b, units), jnp.float32)
        _, hs = jax.lax.scan(
            step, h0,
            (jnp.swapaxes(vec, 0, 1), jnp.swapaxes(mask, 0, 1)),
        )
        return jnp.swapaxes(hs, 0, 1)  # [B, T, U]

    h = None
    for i in range(len(layers)):
        h = layer_scan(i, h)
        if dropout_p_hidden > 0.0 and dropout_rng is not None:
            dropout_rng, key = jax.random.split(dropout_rng)
            keep = jax.random.bernoulli(key, 1.0 - dropout_p_hidden, h.shape)
            h = jnp.where(keep, h / (1.0 - dropout_p_hidden), 0.0)
    return h


def _softmax_neg(scores, diag_mask):
    """Row softmax over candidates with each row's own positive masked out
    (gru4rec2.py softmax_neg)."""
    masked = jnp.where(diag_mask, -jnp.inf, scores)
    return jax.nn.softmax(masked, axis=-1)


def bpr_max_loss(scores, valid_row, valid_col, bpreg):
    """scores [N, C]: diagonal = own positive (C = N + n_sample).
    loss_i = −log Σ_j σ(r_ii − r_ij)·s_ij + bpreg·Σ_j r_ij²·s_ij
    (gru4rec2.py:203-205)."""
    n = scores.shape[0]
    diag = jnp.take_along_axis(scores, jnp.arange(n)[:, None], axis=1)
    diag_mask = jnp.zeros(scores.shape, bool).at[jnp.arange(n), jnp.arange(n)].set(True)
    col_invalid = ~valid_col[None, :] & ~diag_mask
    masked_scores = jnp.where(col_invalid, -jnp.inf, scores)
    s = _softmax_neg(masked_scores, diag_mask | col_invalid)
    sig = jax.nn.sigmoid(diag - scores)
    per_row = -jnp.log(jnp.sum(sig * s, axis=1) + 1e-24) + bpreg * jnp.sum(
        jnp.square(scores) * s, axis=1
    )
    w = valid_row.astype(jnp.float32)
    return jnp.sum(per_row * w) / jnp.maximum(jnp.sum(w), 1.0)


def cross_entropy_loss(scores, valid_row, valid_col, _bpreg=0.0):
    n = scores.shape[0]
    masked = jnp.where(valid_col[None, :], scores, -jnp.inf)
    masked = masked.at[jnp.arange(n), jnp.arange(n)].set(
        jnp.take_along_axis(scores, jnp.arange(n)[:, None], axis=1)[:, 0]
    )
    log_probs = jax.nn.log_softmax(masked, axis=1)
    diag = jnp.take_along_axis(log_probs, jnp.arange(n)[:, None], axis=1)[:, 0]
    w = valid_row.astype(jnp.float32)
    return jnp.sum(-diag * w) / jnp.maximum(jnp.sum(w), 1.0)


def bpr_loss(scores, valid_row, valid_col, _bpreg=0.0):
    """Plain BPR: mean over (valid) pairs of −log σ(r_ii − r_ij).

    The reference averages over EVERY column including the diagonal itself
    (gru4rec2.py ``bpr``: ``T.mean(-T.log(sigmoid(T.diag(yhat)-yhat.T)))`` —
    the j=i term contributes the constant log 2); preserved here, with padded
    rows/columns masked out of the mean.
    """
    n = scores.shape[0]
    diag = jnp.take_along_axis(scores, jnp.arange(n)[:, None], axis=1)
    ls = -jax.nn.log_sigmoid(diag - scores)  # [N, C]
    colw = valid_col[None, :].astype(jnp.float32)
    per_row = jnp.sum(ls * colw, axis=1) / jnp.maximum(jnp.sum(colw, axis=1), 1.0)
    w = valid_row.astype(jnp.float32)
    return jnp.sum(per_row * w) / jnp.maximum(jnp.sum(w), 1.0)


def top1_loss(scores, valid_row, valid_col, _bpreg=0.0):
    """TOP1: per-row mean of σ(r_ij − r_ii) + σ(r_ij²) over all columns with
    the diagonal's σ(r_ii²) contribution subtracted (gru4rec2.py ``top1``:
    ``mean(mean(sig(-diag+yhatT)+sig(yhatT**2), axis=0) − sig(diag**2)/C``)."""
    n = scores.shape[0]
    diag = jnp.take_along_axis(scores, jnp.arange(n)[:, None], axis=1)
    term = jax.nn.sigmoid(scores - diag) + jax.nn.sigmoid(jnp.square(scores))
    colw = valid_col[None, :].astype(jnp.float32)
    n_out = jnp.maximum(jnp.sum(colw, axis=1), 1.0)
    per_row = (
        jnp.sum(term * colw, axis=1) / n_out
        - jax.nn.sigmoid(jnp.square(diag[:, 0])) / n_out
    )
    w = valid_row.astype(jnp.float32)
    return jnp.sum(per_row * w) / jnp.maximum(jnp.sum(w), 1.0)


def top1_max_loss(scores, valid_row, valid_col, _bpreg=0.0):
    """TOP1-max: softmax_neg-weighted TOP1 terms (gru4rec2.py ``top1_max``:
    ``mean(Σ_j s_ij · (σ(r_ij − r_ii) + σ(r_ij²)))`` with s excluding the
    diagonal)."""
    n = scores.shape[0]
    diag = jnp.take_along_axis(scores, jnp.arange(n)[:, None], axis=1)
    diag_mask = jnp.zeros(scores.shape, bool).at[jnp.arange(n), jnp.arange(n)].set(True)
    col_invalid = ~valid_col[None, :] & ~diag_mask
    masked_scores = jnp.where(col_invalid, -jnp.inf, scores)
    s = _softmax_neg(masked_scores, diag_mask | col_invalid)
    term = jax.nn.sigmoid(scores - diag) + jax.nn.sigmoid(jnp.square(scores))
    per_row = jnp.sum(s * term, axis=1)
    w = valid_row.astype(jnp.float32)
    return jnp.sum(per_row * w) / jnp.maximum(jnp.sum(w), 1.0)


LOSSES = {
    "bpr-max": bpr_max_loss,
    "cross-entropy": cross_entropy_loss,
    "bpr": bpr_loss,
    "top1": top1_loss,
    "top1-max": top1_max_loss,
}


def parse_loss(loss: str, bpreg: float = 0.5) -> Tuple[str, float]:
    """Accept the reference's loss strings (gru4rec2.py:138-147):
    'cross-entropy' | 'bpr' | 'bpr-max-<X>' | 'top1' | 'top1-max'
    (plus plain 'bpr-max', taking bpreg from the argument)."""
    if loss.startswith("bpr-max-"):
        return "bpr-max", float(loss[len("bpr-max-"):])
    if loss not in LOSSES:
        raise ValueError(f"unknown GRU4Rec loss {loss!r}; valid: {sorted(LOSSES)}")
    return loss, bpreg


# ---------------------------------------------------------------------------
# Optimizers — the reference's learning-rate adaptation rules
# (gru4rec2.py:270-344) as optax transformations.  The Theano versions keep
# sparse-row slots for the item-indexed matrices; on TPU the dense update is
# an XLA scatter and the slot math is identical, so one dense rule serves all
# parameters.
# ---------------------------------------------------------------------------

def _adapt_transform(adapt: str, decay: float, eps: float) -> optax.GradientTransformation:
    zeros_like = lambda params: jax.tree_util.tree_map(jnp.zeros_like, params)

    if adapt in (None, False, "", "sgd"):
        return optax.identity()

    if adapt == "adagrad":
        # acc += g²; g / sqrt(acc + eps)   (gru4rec2.py:295-304)
        def init(params):
            return zeros_like(params)

        def update(grads, acc, params=None):
            acc = jax.tree_util.tree_map(lambda a, g: a + g * g, acc, grads)
            out = jax.tree_util.tree_map(
                lambda g, a: g / jnp.sqrt(a + eps), grads, acc
            )
            return out, acc

        return optax.GradientTransformation(init, update)

    if adapt == "rmsprop":
        # acc = d·acc + (1−d)·g²; g / sqrt(acc + eps)   (gru4rec2.py:327-339)
        def init(params):
            return zeros_like(params)

        def update(grads, acc, params=None):
            acc = jax.tree_util.tree_map(
                lambda a, g: decay * a + (1.0 - decay) * g * g, acc, grads
            )
            out = jax.tree_util.tree_map(
                lambda g, a: g / jnp.sqrt(a + eps), grads, acc
            )
            return out, acc

        return optax.GradientTransformation(init, update)

    if adapt == "adadelta":
        # The reference's (nonstandard) variant (gru4rec2.py:305-326):
        # acc += g²; g ← sqrt(upd + eps)·g; upd = d·upd + (1−d)·g²;
        # return g / sqrt(acc + eps)
        def init(params):
            return {"acc": zeros_like(params), "upd": zeros_like(params)}

        def update(grads, state, params=None):
            acc = jax.tree_util.tree_map(
                lambda a, g: a + g * g, state["acc"], grads
            )
            scaled = jax.tree_util.tree_map(
                lambda u, g: jnp.sqrt(u + eps) * g, state["upd"], grads
            )
            upd = jax.tree_util.tree_map(
                lambda u, g2: decay * u + (1.0 - decay) * g2 * g2,
                state["upd"],
                scaled,
            )
            out = jax.tree_util.tree_map(
                lambda g2, a: g2 / jnp.sqrt(a + eps), scaled, acc
            )
            return out, {"acc": acc, "upd": upd}

        return optax.GradientTransformation(init, update)

    if adapt == "adam":
        # The reference's variant shares ONE decay for both moments
        # (gru4rec2.py:270-294): acc = d·acc + (1−d)·g²; m = d·m + (1−d)·g;
        # out = m̂ / (sqrt(â) + eps) with 1−dᵗ bias correction.
        def init(params):
            return {
                "acc": zeros_like(params),
                "meang": zeros_like(params),
                "count": jnp.zeros((), jnp.float32),
            }

        def update(grads, state, params=None):
            count = state["count"] + 1.0
            acc = jax.tree_util.tree_map(
                lambda a, g: decay * a + (1.0 - decay) * g * g,
                state["acc"],
                grads,
            )
            meang = jax.tree_util.tree_map(
                lambda m, g: decay * m + (1.0 - decay) * g,
                state["meang"],
                grads,
            )
            corr = 1.0 - decay ** count
            out = jax.tree_util.tree_map(
                lambda m, a: (m / corr) / (jnp.sqrt(a / corr) + eps),
                meang,
                acc,
            )
            return out, {"acc": acc, "meang": meang, "count": count}

        return optax.GradientTransformation(init, update)

    raise ValueError(
        f"unknown GRU4Rec optimizer {adapt!r}; "
        "valid: adagrad, adam, adadelta, rmsprop, sgd"
    )


def make_reference_optimizer(
    adapt: str = "adagrad",
    learning_rate: float = 0.05,
    decay: float = 0.9,
    momentum: float = 0.0,
    lmbd: float = 0.0,
    eps: float = 1e-6,
) -> optax.GradientTransformation:
    """Full update rule of the reference's RMSprop() driver
    (gru4rec2.py:345-391): adapted gradient, optional momentum velocity,
    L2 shrink ``p·(1 − lr·λ) − lr·g``."""
    chain = [_adapt_transform(adapt, decay, eps)]
    if lmbd > 0.0:
        chain.append(optax.add_decayed_weights(lmbd))
    if momentum > 0.0:
        chain.append(optax.trace(decay=momentum))
    chain.append(optax.scale(-learning_rate))
    return optax.chain(*chain)


class GRU4RecJax:
    """Trainer wrapper driving the jitted step over padded session batches."""

    def __init__(
        self,
        n_items: int,
        layers: Tuple[int, ...] = (300,),
        loss: str = "bpr-max",
        bpreg: float = 0.5,
        learning_rate: float = 0.05,
        n_sample: int = 200,
        dropout_p_hidden: float = 0.0,
        optimizer: str = "adagrad",
        decay: float = 0.9,
        momentum: float = 0.0,
        lmbd: float = 0.0,
        seed: int = 42,
        neg_pool_capacity: int = 20000,
    ):
        self.n_items = n_items
        self.layers = tuple(layers)
        self.loss_name, self.bpreg = parse_loss(loss, bpreg)
        self.n_sample = n_sample
        self.neg_pool_capacity = int(neg_pool_capacity)
        self.dropout_p_hidden = dropout_p_hidden
        self.rng = jax.random.PRNGKey(seed)
        self.rng, init_rng = jax.random.split(self.rng)
        self.params = init_gru4rec_params(init_rng, n_items, self.layers)
        self.optimizer = make_reference_optimizer(
            optimizer, learning_rate, decay=decay, momentum=momentum, lmbd=lmbd
        )
        self.opt_state = self.optimizer.init(self.params)
        self._train_step = jax.jit(self._train_step_fn)
        self._score_candidates = jax.jit(self._score_candidates_fn)

    def _loss_for_batch(self, params, items, labels, mask, neg_sample,
                        dropout_rng=None):
        layers = self.layers
        h = _forward_states(
            params, items, mask, layers,
            dropout_p_hidden=self.dropout_p_hidden, dropout_rng=dropout_rng,
        )  # [B, T, U]
        b, t, u = h.shape

        def per_step(h_t, labels_t, mask_t):
            cand = jnp.concatenate([labels_t, neg_sample])  # [B + n]
            sy = params.wy[cand]
            sby = params.by[cand]
            scores = h_t @ sy.T + sby[None, :]
            valid_col = jnp.concatenate([mask_t, jnp.ones_like(neg_sample, bool)])
            loss_fn = LOSSES[self.loss_name]
            return loss_fn(scores, mask_t, valid_col, self.bpreg), jnp.sum(
                mask_t.astype(jnp.float32)
            )

        losses, counts = jax.vmap(per_step, in_axes=(1, 1, 1))(
            h, labels, mask
        )
        total = jnp.sum(counts)
        return jnp.sum(losses * counts) / jnp.maximum(total, 1.0)

    def _train_step_fn(self, params, opt_state, items, labels, mask, pool,
                       n_valid, sample_rng, dropout_rng):
        idx = jax.random.randint(
            sample_rng, (self.n_sample,), 0, jnp.maximum(n_valid, 1)
        )
        neg_sample = pool[idx]
        loss, grads = jax.value_and_grad(self._loss_for_batch)(
            params, items, labels, mask, neg_sample, dropout_rng
        )
        updates, opt_state = self.optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    def _score_candidates_fn(self, params, items, mask, candidate_ids):
        """candidate_ids [B, T, C] → scores [B, T, C]."""
        h = _forward_states(params, items, mask, self.layers)
        sy = params.wy[candidate_ids]  # [B, T, C, U]
        sby = params.by[candidate_ids]
        return jnp.einsum("btu,btcu->btc", h, sy) + sby

    # -- public API ---------------------------------------------------------
    def fit_batch(self, items: np.ndarray, labels: np.ndarray, buffer_ids: np.ndarray):
        """One padded [B, T] batch: items = clicks[:-1], labels = clicks[1:].

        Negative sampling happens INSIDE the jitted step over a
        fixed-capacity pool: the recent-clicks buffer is a sliding time
        window whose length changes every batch, and an eager
        ``jax.random.choice`` over it re-specialized (recompiled) per batch
        — ~1-3 s/batch through a remote-compile backend.  Padding the pool
        to ``neg_pool_capacity`` and drawing uniform indices in [0, n_valid)
        in-graph keeps one compiled program for the whole stream and is the
        same with-replacement uniform draw over the buffer's entries.

        Returns the LOSS AS A DEVICE SCALAR so a training loop can average
        an hour's losses with a single host fetch."""
        mask = jnp.asarray(labels != 0)
        nonzero = buffer_ids[buffer_ids != 0]
        if len(nonzero) == 0:
            nonzero = np.array([1])
        nonzero = nonzero[: self.neg_pool_capacity]
        pool = np.zeros(self.neg_pool_capacity, np.int64)
        pool[: len(nonzero)] = nonzero
        self.rng, k, drop_rng = jax.random.split(self.rng, 3)
        self.params, self.opt_state, loss = self._train_step(
            self.params, self.opt_state, jnp.asarray(items), jnp.asarray(labels),
            mask, jnp.asarray(pool), len(nonzero), k, drop_rng,
        )
        return loss

    def rank_candidates(
        self, items: np.ndarray, labels: np.ndarray, neg_items: np.ndarray
    ) -> np.ndarray:
        """Ranked candidate ids [B, T, 1+K] (positive first column), the
        framework's shared eval contract."""
        candidates = np.concatenate([labels[..., None], neg_items], axis=2)
        mask = jnp.asarray(labels != 0)
        scores = np.asarray(
            self._score_candidates(
                self.params, jnp.asarray(items), mask, jnp.asarray(candidates)
            )
        )
        # candidates with id 0 (padding) must rank last
        scores = np.where(candidates == 0, -np.inf, scores)
        order = np.argsort(-scores, axis=2, kind="stable")
        return np.take_along_axis(candidates, order, axis=2)
