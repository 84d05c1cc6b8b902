"""SkNN / V-SkNN — session-based k-nearest-neighbors
(reference nar_module/nar/benchmarks/session_knn.py:30-319; Jannach &
Ludewig 2017, StreamingRec's fixed V-SkNN).

A bounded buffer of recent sessions plus an item→sessions inverted index.
Per click: candidate sessions sharing any item with the active prefix are
sampled ("recent" = highest session ids, which encode first-click time),
scored by cosine/jaccard similarity — with positional decay of the active
session's early clicks when ``first_session_clicks_decay != 'same'``
(= V-SkNN) — and neighbor similarities vote for their sessions' items.
"""
from __future__ import annotations

import math
import random
from collections import defaultdict
from typing import Dict, List, Set, Tuple

import numpy as np

from .benchmarks import BenchmarkRecommender, fill_ranked_topk

POS_DECAY_FNS = {
    "same": lambda i: 1.0,
    "div": lambda i: 1.0 / i,
    "linear": lambda i: 1.0 - 0.1 * i if i <= 100 else 0.0,
    "log": lambda i: 1.0 / math.log10(i + 1.7),
    "quadratic": lambda i: 1.0 / (i * i),
}


class SessionBasedKNNRecommender(BenchmarkRecommender):
    def __init__(self, state_view, params, streaming_metrics):
        super().__init__(state_view, params, streaming_metrics)
        self.sessions_buffer_size = params["sessions_buffer_size"]
        self.candidate_sample_size = params["candidate_sessions_sample_size"]
        self.sampling_strategy = params.get("sampling_strategy", "recent")
        self.nearest_neighbors = params["nearest_neighbor_session_for_scoring"]
        self.similarity = params.get("similarity", "cosine")
        self.first_clicks_decay = params.get("first_session_clicks_decay", "div")
        self.pos_decay_fn = POS_DECAY_FNS[self.first_clicks_decay]

        states = state_view.benchmarks_states
        if self.get_clf_suffix() not in states:
            states[self.get_clf_suffix()] = {
                # session_id -> item set; insertion-ordered dict doubles as
                # the recency-bounded buffer
                "sessions": {},
                "item_sessions": defaultdict(set),
            }

    def _state(self):
        # read through the host state EVERY access (never cache the dicts):
        # save/restore_state_checkpoint REBINDS benchmarks_states around each
        # eval hour, and cached references would keep eval-hour pollution
        states = self.state_view.benchmarks_states
        if self.get_clf_suffix() not in states:
            states[self.get_clf_suffix()] = {
                "sessions": {},
                "item_sessions": defaultdict(set),
            }
        return states[self.get_clf_suffix()]

    @property
    def sessions(self) -> Dict[int, Set[int]]:
        return self._state()["sessions"]

    @property
    def item_sessions(self) -> Dict[int, Set[int]]:
        return self._state()["item_sessions"]

    def get_clf_suffix(self):
        return "sknn" if self.first_clicks_decay == "same" else "v-sknn"

    def get_description(self):
        return "Session-KNN over a recent-sessions buffer"

    # -- training: maintain the bounded session buffer ----------------------
    def train(self, users_ids, sessions_ids, sessions_items, sessions_next_items):
        all_items = np.hstack([sessions_items, sessions_next_items])
        for sid, row in zip(np.asarray(sessions_ids).tolist(), all_items):
            items = set(int(x) for x in row if x != 0)
            if not items:
                continue
            self.sessions[sid] = items
            for item in items:
                self.item_sessions[item].add(sid)
        while len(self.sessions) > self.sessions_buffer_size:
            oldest_sid = next(iter(self.sessions))
            for item in self.sessions.pop(oldest_sid):
                self.item_sessions[item].discard(oldest_sid)

    # -- scoring -------------------------------------------------------------
    def _candidate_sessions(self, prefix_items) -> List[int]:
        candidates = [
            sid
            for item in prefix_items
            for sid in self.item_sessions.get(item, ())
            if sid in self.sessions
        ]
        if 0 < self.candidate_sample_size < len(candidates):
            if self.sampling_strategy == "recent":
                # session ids encode first-click timestamps: larger = newer
                candidates = sorted(candidates, reverse=True)[
                    : self.candidate_sample_size
                ]
            else:
                candidates = random.sample(candidates, self.candidate_sample_size)
        return candidates

    def _session_similarity(self, prefix_items, neighbor_items: Set[int]) -> float:
        prefix_set = set(prefix_items)
        if self.first_clicks_decay == "same":
            numerator = float(len(prefix_set & neighbor_items))
        else:
            # V-SkNN: recent clicks of the active prefix weigh more
            numerator = sum(
                self.pos_decay_fn(pos + 1)
                for pos, item in enumerate(reversed(list(prefix_items)))
                if item in neighbor_items
            )
        if self.similarity == "cosine":
            denom = math.sqrt(len(prefix_set)) * math.sqrt(len(neighbor_items))
        elif self.similarity == "jaccard":
            denom = float(len(prefix_set | neighbor_items))
        else:
            raise ValueError(f"invalid similarity: {self.similarity}")
        return numerator / denom if denom else 0.0

    def _score_items(self, prefix_items) -> Dict[int, float]:
        scored: List[Tuple[int, float]] = []
        for sid in self._candidate_sessions(prefix_items):
            sim = self._session_similarity(prefix_items, self.sessions[sid])
            if sim > 0.0:
                scored.append((sid, sim))
        # keep strictly (0, 1) similarities like the reference's filter
        # (session_knn.py:178) and the top-N neighbors
        scored = [x for x in sorted(scored, key=lambda x: -x[1]) if x[1] < 1.0]
        scored = scored[: self.nearest_neighbors]

        item_scores: Dict[int, float] = defaultdict(float)
        for sid, sim in scored:
            for item in self.sessions[sid]:
                item_scores[item] += sim
        return item_scores

    def predict(self, users_ids, sessions_items, topk=5, valid_items=None):
        preds = np.zeros(
            (sessions_items.shape[0], sessions_items.shape[1], topk), np.int64
        )
        for r, c, _ in self._valid_click_coords(sessions_items):
            prefix = [int(x) for x in sessions_items[r, : c + 1] if x != 0]
            scores = self._score_items(prefix)
            ranked = sorted(scores, key=lambda k: -scores[k])
            preds[r, c] = fill_ranked_topk(ranked, valid_items[r, c], topk)
        return preds
