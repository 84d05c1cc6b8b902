"""SR-GNN re-expressed in JAX (the reference bundles a TF1 implementation,
nar_module/nar/benchmarks/sr-gnn/gnn_ml_fast.py, utils.py).

Semantics preserved:
  * per-session graph: nodes = unique session items; edges = consecutive
    clicks; in/out adjacency column-/row-normalized by degree
    (utils.py:100-126);
  * gated GNN propagation: node messages ``[A_in·(X·W_in+b_in) ‖
    A_out·(X·W_out+b_out)]`` feed a GRU cell updating node states, repeated
    ``step`` times (gnn_ml_fast.py:134-150);
  * attention readout: ``coef = v·σ(W1·h_last + W2·h_pos + b)``, session
    embedding = Σ coef·h_pos (nonhybrid; gnn_ml_fast.py:31-52);
  * logits = session_emb · embedding[candidates]ᵀ; softmax XE loss; Adam
    with staircase LR decay (gnn_ml_fast.py:71-76).

TPU re-design: everything is batched with static shapes — node sets padded
to the session length, adjacency as dense [B, N, N] (N ≤ 20, tiny), graph
building vectorized in numpy at collation; training and scoring are jitted.
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax


class SRGNNParams(NamedTuple):
    embedding: jax.Array  # [n_items, d]
    w_in: jax.Array  # [d, d]
    b_in: jax.Array  # [d]
    w_out: jax.Array  # [d, d]
    b_out: jax.Array  # [d]
    gru_wx: jax.Array  # [2d, 3d]  (input projection r,z,n)
    gru_wh: jax.Array  # [d, 3d]
    gru_b: jax.Array  # [3d]
    nasr_w1: jax.Array  # [d, d]
    nasr_w2: jax.Array  # [d, d]
    nasr_v: jax.Array  # [d]
    nasr_b: jax.Array  # [d]


def init_srgnn_params(rng, n_items: int, hidden: int) -> SRGNNParams:
    stdv = 1.0 / np.sqrt(hidden)

    def u(key, shape):
        return jax.random.uniform(key, shape, jnp.float32, -stdv, stdv)

    keys = jax.random.split(rng, 12)
    return SRGNNParams(
        embedding=u(keys[0], (n_items, hidden)),
        w_in=u(keys[1], (hidden, hidden)),
        b_in=u(keys[2], (hidden,)),
        w_out=u(keys[3], (hidden, hidden)),
        b_out=u(keys[4], (hidden,)),
        gru_wx=u(keys[5], (2 * hidden, 3 * hidden)),
        gru_wh=u(keys[6], (hidden, 3 * hidden)),
        gru_b=jnp.zeros((3 * hidden,), jnp.float32),
        nasr_w1=u(keys[7], (hidden, hidden)),
        nasr_w2=u(keys[8], (hidden, hidden)),
        nasr_v=u(keys[9], (hidden,)),
        nasr_b=u(keys[10], (hidden,)),
    )


def build_session_graphs(sessions_items: np.ndarray):
    """[B, T] padded click sequences → (nodes, adj_in, adj_out, alias).

    nodes: [B, T] unique items (0-padded); adjacency normalized like the
    reference (utils.py:106-118); alias: [B, T] position → node index.
    """
    b, t = sessions_items.shape
    nodes = np.zeros((b, t), np.int64)
    adj = np.zeros((b, t, t), np.float32)
    alias = np.zeros((b, t), np.int64)
    for i in range(b):
        seq = sessions_items[i]
        uniq = np.unique(seq[seq != 0])
        nodes[i, : len(uniq)] = uniq
        node_index = {item: idx for idx, item in enumerate(uniq)}
        for pos in range(t - 1):
            if seq[pos] == 0 or seq[pos + 1] == 0:
                continue
            adj[i, node_index[seq[pos]], node_index[seq[pos + 1]]] = 1.0
        for pos in range(t):
            alias[i, pos] = node_index.get(seq[pos], 0)
    sum_in = adj.sum(axis=1, keepdims=True)
    sum_in[sum_in == 0] = 1.0
    adj_in = adj / sum_in
    sum_out = adj.sum(axis=2, keepdims=True)
    sum_out[sum_out == 0] = 1.0
    adj_out = np.swapaxes(adj / sum_out, 1, 2)
    return nodes, adj_in, adj_out, alias


def _gru_cell(h, x, wx, wh, b, d):
    gates_x = x @ wx
    gates_h = h @ wh
    r = jax.nn.sigmoid(gates_x[:, :d] + gates_h[:, :d] + b[:d])
    z = jax.nn.sigmoid(gates_x[:, d : 2 * d] + gates_h[:, d : 2 * d] + b[d : 2 * d])
    n = jnp.tanh(gates_x[:, 2 * d :] + r * gates_h[:, 2 * d :] + b[2 * d :])
    return (1.0 - z) * n + z * h


def _propagate(params: SRGNNParams, nodes, adj_in, adj_out, steps: int):
    """Gated graph propagation over node states [B, N, d]."""
    d = params.embedding.shape[1]
    h = params.embedding[nodes]  # [B, N, d]
    for _ in range(steps):
        msg_in = adj_in @ (h @ params.w_in + params.b_in)
        msg_out = adj_out @ (h @ params.w_out + params.b_out)
        av = jnp.concatenate([msg_in, msg_out], axis=-1)  # [B, N, 2d]
        b_, n_, _ = av.shape
        h = _gru_cell(
            h.reshape(-1, d), av.reshape(-1, 2 * d),
            params.gru_wx, params.gru_wh, params.gru_b, d,
        ).reshape(b_, n_, d)
    return h


def _session_embedding(params: SRGNNParams, h, alias, mask):
    """Attention readout (gnn_ml_fast.py:31-52, nonhybrid)."""
    b, t = alias.shape
    seq_h = jnp.take_along_axis(h, alias[..., None], axis=1)  # [B, T, d]
    lengths = jnp.maximum(jnp.sum(mask.astype(jnp.int32), axis=1), 1)
    last_h = jnp.take_along_axis(seq_h, (lengths - 1)[:, None, None], axis=1)[:, 0]
    m = jax.nn.sigmoid(
        (last_h @ params.nasr_w1)[:, None, :]
        + seq_h @ params.nasr_w2
        + params.nasr_b
    )
    coef = (m @ params.nasr_v) * mask.astype(jnp.float32)  # [B, T]
    return jnp.sum(coef[..., None] * seq_h, axis=1)  # [B, d]


class SRGNNJax:
    """Session-graph recommender with the framework's padded-batch contract.

    Scores the LAST click of each session (SR-GNN's native task); ranking is
    restricted to [label ‖ negatives] per the shared eval protocol."""

    def __init__(
        self,
        n_items: int,
        hidden_size: int = 100,
        steps: int = 1,
        lr: float = 1e-3,
        l2: float = 1e-5,
        lr_dc: float = 0.1,
        lr_dc_steps: int = 3000,
        seed: int = 42,
    ):
        self.n_items = n_items
        self.hidden = hidden_size
        self.steps = steps
        self.l2 = l2
        rng = jax.random.PRNGKey(seed)
        self.params = init_srgnn_params(rng, n_items, hidden_size)
        schedule = optax.exponential_decay(
            lr, transition_steps=lr_dc_steps, decay_rate=lr_dc, staircase=True
        )
        self.optimizer = optax.adam(schedule)
        self.opt_state = self.optimizer.init(self.params)
        self._train_step = jax.jit(self._train_step_fn)
        self._score = jax.jit(self._score_fn)

    def _logits(self, params, nodes, adj_in, adj_out, alias, mask, candidates):
        h = _propagate(params, nodes, adj_in, adj_out, self.steps)
        sess_emb = _session_embedding(params, h, alias, mask)
        cand_emb = params.embedding[candidates]  # [B, C, d]
        return jnp.einsum("bd,bcd->bc", sess_emb, cand_emb)

    def _train_step_fn(self, params, opt_state, nodes, adj_in, adj_out, alias,
                       mask, target, neg_sample):
        def loss_fn(p):
            cand = jnp.concatenate(
                [target[:, None], jnp.broadcast_to(neg_sample, (target.shape[0], neg_sample.shape[0]))],
                axis=1,
            )
            logits = self._logits(p, nodes, adj_in, adj_out, alias, mask, cand)
            valid = target != 0
            log_probs = jax.nn.log_softmax(logits, axis=1)
            xe = -log_probs[:, 0]
            w = valid.astype(jnp.float32)
            loss = jnp.sum(xe * w) / jnp.maximum(jnp.sum(w), 1.0)
            l2 = sum(
                jnp.sum(jnp.square(leaf)) / 2.0
                for leaf in jax.tree_util.tree_leaves(p)
            )
            return loss + self.l2 * l2, loss

        (total, xe_loss), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = self.optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, xe_loss

    def _score_fn(self, params, nodes, adj_in, adj_out, alias, mask, candidates):
        return self._logits(params, nodes, adj_in, adj_out, alias, mask, candidates)

    # -- public API ---------------------------------------------------------
    def fit_batch(self, sessions_items: np.ndarray, targets: np.ndarray,
                  buffer_ids: np.ndarray, n_sample: int = 200,
                  rng: Optional[np.random.RandomState] = None):
        """sessions_items [B, T] (inputs), targets [B] (last label)."""
        rng = rng or np.random.RandomState(0)
        nodes, adj_in, adj_out, alias = build_session_graphs(sessions_items)
        mask = sessions_items != 0
        nonzero = buffer_ids[buffer_ids != 0]
        if len(nonzero) == 0:
            nonzero = np.array([1])
        neg = rng.choice(nonzero, size=n_sample)
        self.params, self.opt_state, loss = self._train_step(
            self.params, self.opt_state,
            jnp.asarray(nodes), jnp.asarray(adj_in), jnp.asarray(adj_out),
            jnp.asarray(alias), jnp.asarray(mask), jnp.asarray(targets),
            jnp.asarray(neg),
        )
        # device scalar: lets a training loop pipeline an hour of steps and
        # fetch once (see NeuralBaselineRunner.train_hour)
        return loss

    def rank_candidates(self, sessions_items: np.ndarray, targets: np.ndarray,
                        neg_items: np.ndarray) -> np.ndarray:
        """Ranked [B, 1+K] candidate ids for the last click of each session."""
        nodes, adj_in, adj_out, alias = build_session_graphs(sessions_items)
        mask = sessions_items != 0
        candidates = np.concatenate([targets[:, None], neg_items], axis=1)
        scores = np.asarray(
            self._score(
                self.params, jnp.asarray(nodes), jnp.asarray(adj_in),
                jnp.asarray(adj_out), jnp.asarray(alias), jnp.asarray(mask),
                jnp.asarray(candidates),
            )
        )
        scores = np.where(candidates == 0, -np.inf, scores)
        order = np.argsort(-scores, axis=1, kind="stable")
        return np.take_along_axis(candidates, order, axis=1)


class SRGNNSessionAdapter:
    """Adapts SRGNNJax to the framework's per-click [B, T] eval contract
    (the reference evaluates SR-GNN per click by expanding sessions into
    prefixes, run_sr_gnn.py protocol).

    Training uses full sessions with the final label as target; per-click
    ranking builds one graph per session prefix."""

    recommender_name = "sr-gnn"  # CSV column suffix (reference's naming)

    def __init__(self, model: SRGNNJax, n_sample: int = 200, seed: int = 0):
        self.model = model
        self.n_sample = n_sample
        self.rng = np.random.RandomState(seed)

    def fit_batch(self, items: np.ndarray, labels: np.ndarray, buffer_ids):
        lengths = (labels != 0).sum(axis=1)
        valid = lengths > 0
        if not valid.any():
            return 0.0
        targets = np.zeros(len(labels), np.int64)
        targets[valid] = labels[
            np.arange(len(labels))[valid], lengths[valid] - 1
        ]
        return self.model.fit_batch(
            items, targets, np.asarray(buffer_ids), n_sample=self.n_sample,
            rng=self.rng,
        )

    def rank_candidates(self, items, labels, neg_items):
        b, t = labels.shape
        k = neg_items.shape[-1]
        # expand every valid click into a prefix pseudo-session
        rows, cols = np.nonzero(labels)
        if len(rows) == 0:
            return np.zeros((b, t, 1 + k), np.int64)
        # bucket the row count to a multiple of 256: the number of valid
        # clicks varies every batch, and an exact-shape score program would
        # recompile per batch (minutes per compile on a remote-compile
        # backend); padded rows are all-zero prefixes whose scores are
        # discarded below
        n_rows = len(rows)
        cap = max(256, -(-n_rows // 256) * 256)
        prefixes = np.zeros((cap, t), np.int64)
        for n, (r, c) in enumerate(zip(rows, cols)):
            prefixes[n, : c + 1] = items[r, : c + 1]
        targets = np.zeros(cap, np.int64)
        targets[:n_rows] = labels[rows, cols]
        negs = np.zeros((cap, k), np.int64)
        negs[:n_rows] = neg_items[rows, cols]
        ranked_flat = self.model.rank_candidates(prefixes, targets, negs)
        ranked = np.zeros((b, t, 1 + k), np.int64)
        ranked[rows, cols] = ranked_flat[:n_rows]
        return ranked
