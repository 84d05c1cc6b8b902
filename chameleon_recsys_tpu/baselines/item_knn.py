"""ItemKNN — co-occurrence similarity normalized by item supports
(reference nar_module/nar/benchmarks/item_knn.py:12-58; Hidasi-style,
``sim(i,j) = cooc(i,j) / ((support_j + λ)^α · (support_i + λ)^(1−α))``).
G1 params λ=20, α=0.75; Adressa α=0.5 (nar_trainer_gcom.py:284-287)."""
from __future__ import annotations

import numpy as np

from .benchmarks import BenchmarkRecommender, fill_ranked_topk
from .item_cooccurrence import rank_sparse_row


class ItemKNNRecommender(BenchmarkRecommender):
    def __init__(self, state_view, params, streaming_metrics):
        super().__init__(state_view, params, streaming_metrics)
        self.reg_lambda = params["reg_lambda"]
        self.alpha = params["alpha"]

    def get_clf_suffix(self):
        return "item_knn"

    def get_description(self):
        return (
            "Item-KNN: most similar items based on support-normalized "
            "session co-occurrence"
        )

    def predict(self, users_ids, sessions_items, topk=5, valid_items=None):
        cooc = self.state_view.get_items_coocurrences()
        support = self.state_view.get_articles_pop().astype(np.float64)
        support_norm = np.power(support + self.reg_lambda, self.alpha)

        preds = np.zeros(
            (sessions_items.shape[0], sessions_items.shape[1], topk), np.int64
        )
        for r, c, item in self._valid_click_coords(sessions_items):
            row = cooc[item]
            if len(row.indices) == 0:
                continue
            denom = support_norm[row.indices] * np.power(
                support[item] + self.reg_lambda, 1.0 - self.alpha
            )
            sims = row.data / denom
            ranked = rank_sparse_row(sims, row.indices)
            preds[r, c] = fill_ranked_topk(ranked, valid_items[r, c], topk)
        return preds
