"""CO — Most co-occurrent in sessions
(reference nar_module/nar/benchmarks/item_cooccurrences.py:11-41).
Co-occurrence counts live in HostState's csr matrix, updated per batch."""
from __future__ import annotations

import numpy as np

from .benchmarks import BenchmarkRecommender, fill_ranked_topk


def rank_sparse_row(values: np.ndarray, indices: np.ndarray) -> np.ndarray:
    """Column indices of a sparse row ordered by value descending."""
    if len(values) == 0:
        return np.zeros(0, np.int64)
    order = np.argsort(-values, kind="stable")
    return np.asarray(indices)[order]


class ItemCooccurrenceRecommender(BenchmarkRecommender):
    def get_clf_suffix(self):
        return "coocurrent"

    def get_description(self):
        return "Most co-ocurrent in sessions"

    def predict(self, users_ids, sessions_items, topk=5, valid_items=None):
        cooc = self.state_view.get_items_coocurrences()
        preds = np.zeros(
            (sessions_items.shape[0], sessions_items.shape[1], topk), np.int64
        )
        for r, c, item in self._valid_click_coords(sessions_items):
            row = cooc[item]
            ranked = rank_sparse_row(row.data, row.indices)
            preds[r, c] = fill_ranked_topk(ranked, valid_items[r, c], topk)
        return preds
