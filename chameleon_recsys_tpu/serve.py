"""Production serving: next-article recommendation for live sessions.

The reference stops at offline evaluation; a production deployment needs an
inference path.  ``NARServer`` wraps a trained harness checkpoint and serves
``recommend(sessions) → top-k article ids`` with one jitted scoring program:

  * the FULL session (every click observed so far) is the input — the
    prediction target is the as-yet-unseen next click, so serving collation
    treats the last click as an input rather than a label;
  * candidates default to the recent-clicks buffer's most recent distinct
    items (the live recommendable pool) and can be overridden per request;
  * scoring reuses the training model's negative-candidate tower verbatim
    (same params, same CAR/matching path), reading the candidate scores at
    each session's last valid position.

The streaming state keeps evolving in production exactly as in training:
``observe()`` folds served sessions' clicks into the device StreamState so
popularity/recency features track the live stream.
"""
from __future__ import annotations

import functools
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .config import ArticleFeaturesSchema, NARConfig, SessionFeaturesSchema
from .data.collate import Session
from .models.nar import NARAux, NARModel
from .state.stream_state import StreamState, init_stream_state, update_stream_state


class NARServer:
    def __init__(
        self,
        cfg: NARConfig,
        session_schema: SessionFeaturesSchema,
        article_schema: ArticleFeaturesSchema,
        params,
        stream: StreamState,
        ace_matrix,
        metadata: Dict[str, np.ndarray],
    ):
        self.cfg = cfg
        self.session_schema = session_schema
        self.article_schema = article_schema
        self.model = NARModel(cfg, session_schema, article_schema)
        self.params = params
        self.stream = stream
        self.ace_matrix = jnp.asarray(ace_matrix)
        self.metadata = {k: jnp.asarray(v) for k, v in dict(metadata).items()}

        @functools.partial(jax.jit, static_argnames=("top_k",))
        def _score(params, stream, batch, candidates, top_k):
            aux = NARAux(
                ace_matrix=self.ace_matrix,
                metadata=self.metadata,
                recent_pop_norm=stream.recent_pop_norm,
                buffer_ids=stream.buffer_ids,
            )
            # the model at position t predicts click t+1 → score candidates
            # ONLY at each session's last valid position (candidate_positions
            # fast path: T× less candidate-tower work than broadcasting)
            last_pos = jnp.maximum(
                batch["session_size"].astype(jnp.int32) - 2, 0
            )
            neg = candidates[:, None, :]  # [B, 1, C]
            out = self.model.apply(
                {"params": params}, batch, aux, neg, train=False,
                candidate_positions=last_pos,
            )
            cand_probs = out.items_prob[:, 0, 1:]  # [B, C]
            cand_probs = jnp.where(candidates != 0, cand_probs, -jnp.inf)
            top_scores, top_idx = jax.lax.top_k(cand_probs, top_k)
            top_ids = jnp.take_along_axis(candidates, top_idx, axis=1)
            return top_ids, top_scores

        self._score = _score

        @jax.jit
        def _observe(stream, clicked_ids, clicked_ts):
            return update_stream_state(stream, clicked_ids, clicked_ts, cfg)

        self._observe = _observe

    # ------------------------------------------------------------------
    @classmethod
    def from_checkpoint(
        cls,
        checkpoint_path,
        cfg: NARConfig,
        session_schema: SessionFeaturesSchema,
        article_schema: ArticleFeaturesSchema,
        ace_matrix,
        metadata,
    ) -> "NARServer":
        """Load the harness checkpoint (params + streaming state)."""
        from .utils.io import deserialize

        payload = deserialize(checkpoint_path)
        state = payload["state"]
        params = jax.tree_util.tree_map(jnp.asarray, state.params)
        stream = jax.tree_util.tree_map(jnp.asarray, state.stream)
        return cls(
            cfg, session_schema, article_schema, params, stream, ace_matrix,
            metadata,
        )

    # ------------------------------------------------------------------
    def _collate_serving(self, sessions: Sequence[Session]) -> Dict[str, jnp.ndarray]:
        """Serving collation: ALL clicks are inputs (no label shift); the
        next click is the prediction target."""
        t = self.cfg.max_inputs_length
        b = len(sessions)
        batch = {
            "item_clicked": np.zeros((b, t), np.int32),
            "label_next_item": np.zeros((b, t), np.int32),
            "label_last_item": np.zeros((b, 1), np.int32),
            "event_timestamp": np.zeros((b, t), np.int32),
            "session_size": np.zeros((b,), np.int32),
            "session_id": np.zeros((b,), np.int64),
            "user_id": np.zeros((b,), np.int64),
            "session_start": np.zeros((b,), np.int64),
        }
        for spec in self.session_schema.context_sequence_features():
            dtype = np.float32 if spec.dtype == "float" else np.int32
            batch[spec.name] = np.zeros((b, t), dtype)
        for i, s in enumerate(sessions):
            items = s.item_ids[-t:]  # most recent clicks fit the window
            ts = s.timestamps[-t:]
            n = len(items)
            batch["item_clicked"][i, :n] = items
            batch["event_timestamp"][i, :n] = ts
            batch["session_size"][i] = n + 1  # all n clicks are inputs
            batch["session_id"][i] = s.session_id
            batch["user_id"][i] = s.user_id
            for spec in self.session_schema.context_sequence_features():
                vals = s.context.get(spec.name, [0] * n)[-t:]
                batch[spec.name][i, : len(vals)] = vals
        return {k: jnp.asarray(v) for k, v in batch.items()}

    def default_candidates(self, num_candidates: int) -> np.ndarray:
        """Most recent distinct items from the live buffer (the
        recommendable pool)."""
        buffer_ids = np.asarray(self.stream.buffer_ids)
        nonzero = buffer_ids[buffer_ids != 0]
        _, first_idx = np.unique(nonzero, return_index=True)
        recent_distinct = nonzero[np.sort(first_idx)][:num_candidates]
        out = np.zeros(num_candidates, np.int32)
        out[: len(recent_distinct)] = recent_distinct
        return out

    def recommend(
        self,
        sessions: Sequence[Session],
        candidates: Optional[np.ndarray] = None,
        top_k: int = 10,
        num_candidates: int = 500,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Top-k next-article recommendations per session.

        Returns (ids [B, top_k], scores [B, top_k]); score ordering follows
        the model's softmax over the candidate set."""
        if len(sessions) == 0:
            return (np.zeros((0, top_k), np.int32),
                    np.zeros((0, top_k), np.float32))
        if candidates is None:
            pool = self.default_candidates(num_candidates)
            candidates = np.broadcast_to(
                pool, (len(sessions), len(pool))
            ).copy()
        batch = self._collate_serving(sessions)
        ids, scores = self._score(
            self.params, self.stream, batch, jnp.asarray(candidates), top_k
        )
        return np.asarray(ids), np.asarray(scores)

    def observe(self, sessions: Sequence[Session]):
        """Fold served sessions' clicks into the streaming state so
        popularity/recency features track the live stream."""
        if not sessions:
            return
        max_len = max(len(s.item_ids) for s in sessions)
        b = len(sessions)
        ids = np.zeros((b, max_len), np.int32)
        ts = np.zeros((b, max_len), np.int32)
        for i, s in enumerate(sessions):
            ids[i, : len(s.item_ids)] = s.item_ids
            ts[i, : len(s.timestamps)] = s.timestamps
        self.stream = self._observe(self.stream, jnp.asarray(ids), jnp.asarray(ts))
