"""Streaming evaluation metrics — full parity with the reference suite.

Re-implements every metric class of nar_module/nar/metrics.py (16 streaming
metrics) with the reference's exact per-(session, click) semantics, but
vectorized over the batch's valid clicks instead of python double loops (the
reference's eval-time wall-clock bottleneck, nar_model.py:1607-1612).

Semantics preserved bit-for-bit, including the reference's quirks:
  * clicks whose label is 0 (padding) are skipped everywhere;
  * ESI-R / ESI-RR iterate ``range(topn-1)`` and therefore IGNORE the last
    ranked item (metrics.py:246, 291);
  * EILD-R weights pairs by a *relative*-rank discount 1/log2(max(0,j−i−1)+2)
    over all j≠i, EILD-RR only over j>i with relevance weighting
    (metrics.py:538-560, 603-632);
  * cosine distance is sklearn's pairwise distance halved into [0, 1]
    (metrics.py:11-14);
  * ItemCoverage's clicked-item set is seeded with the raw recent-clicks
    buffer (including padding zeros) (metrics.py:321-343).
"""
from __future__ import annotations

import math
import threading
from collections import defaultdict
from typing import Dict, Optional

import numpy as np


def cosine_distance(v1: np.ndarray, v2: np.ndarray) -> np.ndarray:
    """Normalized cosine distance in [0, 1] (reference metrics.py:11-14).

    Zero vectors get similarity 0 (sklearn's convention for zero rows)."""
    def _norm(x):
        n = np.linalg.norm(x, axis=-1, keepdims=True)
        return np.divide(x, n, out=np.zeros_like(x, dtype=np.float64), where=n > 0)

    sim = _norm(np.asarray(v1, np.float64)) @ _norm(np.asarray(v2, np.float64)).T
    return (1.0 - sim) / 2.0


def log_rank_discount(k) -> np.ndarray:
    """1/log2(k+2), rank index starting at 0 (reference metrics.py:19-20)."""
    return 1.0 / np.log2(np.asarray(k, np.float64) + 2.0)


def _valid_clicks(predictions, labels):
    """Flatten to per-valid-click arrays: preds [N, C], labels [N], plus the
    (row, col) coordinates of each valid click."""
    predictions = np.asarray(predictions)
    labels = np.asarray(labels)
    rows, cols = np.nonzero(labels)
    return predictions[rows, cols], labels[rows, cols], rows, cols


# The ILD/EILD metric family needs the row-normalized f64 ACE matrix; the
# conversion + norm over the full [num_items, D] matrix is ~100 MB of work
# and the metric set is rebuilt per eval hour for 5 metrics × every
# recommender — profiled at ~2/3 of a G1-scale eval hour when recomputed per
# add() call.  Cache keyed by source-array identity (the harness passes the
# same object for the whole run; the strong ref keeps ids stable).
_EMB_NORM_CACHE: list = []
_EMB_NORM_LOCK = threading.Lock()


def _normalized_embeddings(matrix) -> np.ndarray:
    # Locked: the harness may run several recommenders' metric updates on a
    # thread pool (train/temporal.py), and the normalization of a full
    # [num_items, D] matrix is expensive enough that concurrent first-miss
    # threads must not each recompute it.
    with _EMB_NORM_LOCK:
        for src, normed in _EMB_NORM_CACHE:
            if src is matrix:
                return normed
        m = np.asarray(matrix, np.float64)
        norms = np.linalg.norm(m, axis=-1, keepdims=True)
        normed = np.divide(m, norms, out=np.zeros_like(m), where=norms > 0)
        _EMB_NORM_CACHE.append((matrix, normed))
        del _EMB_NORM_CACHE[:-2]  # keep the two most recent source matrices
        return normed


# One-slot distance memo: every ILD/EILD metric in a recommender's set
# computes the distances of the SAME top-n slice each batch (5 metric
# classes in the full set), so keying on content makes 4 of the 5 calls a
# lookup.  Content hash, not identity: each metric slices preds itself.
# Thread-LOCAL: each pool worker in the harness's parallel benchmark tier
# updates one recommender's metric set, so per-thread slots both isolate
# concurrent writers and keep the hit pattern identical to the serial path.
_PAIR_DIST_TLS = threading.local()


def _pairwise_click_distances(ace_matrix, top_preds):
    """[N, n, n] pairwise normalized cosine distances of each click's top-n."""
    cache = getattr(_PAIR_DIST_TLS, "slots", None)
    if cache is None:
        cache = _PAIR_DIST_TLS.slots = []
    key = (id(ace_matrix), top_preds.shape, top_preds.tobytes())
    for k, dists in cache:
        if k == key:  # bytes compare = C memcmp, exact
            return dists
    emb = _normalized_embeddings(ace_matrix)[top_preds]  # [N, n, D]
    # batched BLAS gemm — np.einsum("nid,njd->nij") takes the non-BLAS
    # c_einsum loop path and is several times slower here
    sim = np.matmul(emb, emb.transpose(0, 2, 1))
    dists = (1.0 - sim) / 2.0
    cache.append((key, dists))
    del cache[:-2]  # the current batch's slice + one spare
    return dists


class StreamingMetric:
    name = "undefined"

    def __init__(self, topn: int):
        self.topn = topn
        self.reset()

    def reset(self):
        pass

    def add(self, predictions, labels):
        raise NotImplementedError

    def result(self):
        raise NotImplementedError


class _MeanOfResults(StreamingMetric):
    """Accumulate per-click scalars, report their mean."""

    def reset(self):
        self._sum = 0.0
        self._count = 0

    def _extend(self, values: np.ndarray):
        self._sum += float(np.sum(values))
        self._count += int(np.size(values))

    def result(self):
        if self._count == 0:
            return float("nan")
        return self._sum / self._count


class MRR(_MeanOfResults):
    name = "mrr_at_n"

    def add(self, predictions, labels):
        preds, labs, _, _ = _valid_clicks(predictions, labels)
        if len(labs) == 0:
            return
        hits = preds[:, : self.topn] == labs[:, None]
        found = hits.any(axis=1)
        first = np.argmax(hits, axis=1)
        rr = np.where(found, 1.0 / (1.0 + first), 0.0)
        self._extend(rr)


class NDCG(_MeanOfResults):
    name = "ndcg_at_n"

    def add(self, predictions, labels):
        # Binary relevance over the FULL ranked list, DCG truncated at topn,
        # ideal DCG from the sorted full list (reference metrics.py:79-106).
        preds, labs, _, _ = _valid_clicks(predictions, labels)
        if len(labs) == 0:
            return
        hits = preds == labs[:, None]
        found = hits.any(axis=1)
        first = np.argmax(hits, axis=1)
        in_topn = found & (first < self.topn)
        ndcg = np.where(in_topn, 1.0 / np.log2(first + 2.0), 0.0)
        self._extend(ndcg)


class HitRate(StreamingMetric):
    name = "hitrate_at_n"

    def reset(self):
        self.hitrate_total = 0
        self.hitrate_matches = 0

    def add(self, predictions, labels):
        preds, labs, _, _ = _valid_clicks(predictions, labels)
        self.hitrate_total += len(labs)
        if len(labs):
            self.hitrate_matches += int(
                (preds[:, : self.topn] == labs[:, None]).any(axis=1).sum()
            )

    def result(self):
        if self.hitrate_total == 0:
            return float("nan")
        return self.hitrate_matches / float(self.hitrate_total)


class HitRateBySessionPosition(StreamingMetric):
    name = "hitrate_at_n_by_pos"

    def reset(self):
        self.matches_by_pos = defaultdict(int)
        self.total_by_pos = defaultdict(int)
        self.norm_pop_by_pos = defaultdict(float)

    def add(self, predictions, labels, labels_norm_pop):
        preds, labs, rows, cols = _valid_clicks(predictions, labels)
        labels_norm_pop = np.asarray(labels_norm_pop)
        hits = (preds[:, : self.topn] == labs[:, None]).any(axis=1)
        for i in range(len(labs)):
            pos = int(cols[i]) + 1
            self.total_by_pos[pos] += 1
            self.norm_pop_by_pos[pos] += float(labels_norm_pop[rows[i], cols[i]])
            if hits[i]:
                self.matches_by_pos[pos] += 1

    def result(self):
        hitrate = {
            k: self.matches_by_pos[k] / float(v) for k, v in self.total_by_pos.items()
        }
        avg_pop = {
            k: self.norm_pop_by_pos[k] / float(v)
            for k, v in self.total_by_pos.items()
        }
        return hitrate, avg_pop, dict(self.total_by_pos)


class PopularityBias(_MeanOfResults):
    name = "pop_bias_at_n"

    def add(self, predictions, labels, predictions_norm_pop):
        pops, labs, _, _ = _valid_clicks(predictions_norm_pop, labels)
        if len(labs):
            self._extend(pops[:, : self.topn])


class Novelty(_MeanOfResults):
    name = "novelty_at_n"

    def add(self, predictions, labels, predictions_norm_pop):
        pops, labs, _, _ = _valid_clicks(predictions_norm_pop, labels)
        if len(labs):
            self._extend(-np.log2(pops[:, : self.topn]))


class ExpectedRankSensitiveNovelty(_MeanOfResults):
    """ESI-R: rank-discounted expected self-information
    (reference metrics.py:226-265; last ranked item excluded by the
    range(topn-1) loop)."""

    name = "esi-r_at_n"

    def add(self, predictions, labels, predictions_norm_pop):
        pops, labs, _, _ = _valid_clicks(predictions_norm_pop, labels)
        if len(labs) == 0:
            return
        top = pops[:, : self.topn]
        n = top.shape[1]
        if n < 2:
            return
        w = log_rank_discount(np.arange(n - 1))
        novelty = -np.log2(top[:, : n - 1])
        self._extend((novelty * w).sum(axis=1) / w.sum())


class ExpectedRankRelevanceSensitiveNovelty(_MeanOfResults):
    """ESI-RR: ESI-R weighted by candidate relevance
    (reference metrics.py:269-313)."""

    name = "esi-rr_at_n"

    def __init__(self, topn, relevance_positive_sample, relevance_negative_samples):
        self.relevance_positive_sample = relevance_positive_sample
        self.relevance_negative_samples = relevance_negative_samples
        super().__init__(topn)

    def add(self, predictions, labels, predictions_norm_pop):
        preds, labs, rows, cols = _valid_clicks(predictions, labels)
        pops = np.asarray(predictions_norm_pop)[rows, cols]
        if len(labs) == 0:
            return
        top = pops[:, : self.topn]
        top_ids = preds[:, : self.topn]
        n = top.shape[1]
        if n < 2:
            return
        w = log_rank_discount(np.arange(n - 1))
        novelty = -np.log2(top[:, : n - 1])
        rel = np.where(
            top_ids[:, : n - 1] == labs[:, None],
            self.relevance_positive_sample,
            self.relevance_negative_samples,
        )
        self._extend((novelty * w * rel).sum(axis=1) / w.sum())


class ItemCoverage(StreamingMetric):
    name = "item_coverage_at_n"

    def __init__(self, topn, recent_clicks_buffer):
        self.recent_clicks_buffer = np.asarray(recent_clicks_buffer)
        super().__init__(topn)

    def reset(self):
        self.clicked_items = set(self.recent_clicks_buffer.tolist())
        self.recommended_items = set()

    def add(self, predictions, labels, clicked_items):
        preds, labs, _, _ = _valid_clicks(predictions, labels)
        if len(labs):
            self.recommended_items.update(preds[:, : self.topn].reshape(-1).tolist())
        labels = np.asarray(labels)
        clicked_items = np.asarray(clicked_items)
        batch_clicked = set(
            np.hstack(
                [labels[np.nonzero(labels)], clicked_items[np.nonzero(clicked_items)]]
            ).tolist()
        )
        self.clicked_items.update(batch_clicked)

    def result(self):
        if not self.clicked_items:
            return float("nan")
        return len(self.recommended_items) / float(len(self.clicked_items))


class _ContentILDBase(_MeanOfResults):
    def __init__(self, topn, content_article_embeddings_matrix):
        self.content_article_embeddings_matrix = np.asarray(
            content_article_embeddings_matrix
        )
        super().__init__(topn)

    def _distances(self, predictions, labels):
        preds, labs, _, _ = _valid_clicks(predictions, labels)
        if len(labs) == 0:
            return None, None, None
        top = preds[:, : self.topn]
        dists = _pairwise_click_distances(self.content_article_embeddings_matrix, top)
        return dists, top, labs


class ContentAverageIntraListDiversity(_ContentILDBase):
    name = "content_avg_ild_at_n"

    def add(self, predictions, labels):
        dists, top, labs = self._distances(predictions, labels)
        if dists is None or top.shape[1] < 2:
            return
        n = top.shape[1]
        iu = np.triu_indices(n, k=1)
        self._extend(dists[:, iu[0], iu[1]].mean(axis=1))


class ContentMedianIntraListDiversity(_ContentILDBase):
    name = "content_median_ild_at_n"

    def add(self, predictions, labels):
        dists, top, labs = self._distances(predictions, labels)
        if dists is None or top.shape[1] < 2:
            return
        n = top.shape[1]
        iu = np.triu_indices(n, k=1)
        self._extend(np.median(dists[:, iu[0], iu[1]], axis=1))


class ContentMinIntraListDiversity(_ContentILDBase):
    name = "content_min_ild_at_n"

    def add(self, predictions, labels):
        dists, top, labs = self._distances(predictions, labels)
        if dists is None or top.shape[1] < 2:
            return
        n = top.shape[1]
        iu = np.triu_indices(n, k=1)
        self._extend(dists[:, iu[0], iu[1]].min(axis=1))


class ContentExpectedRankSensitiveIntraListDiversity(_ContentILDBase):
    """EILD-R v2: plain upper-triangle averages with outer rank discount
    (reference metrics.py:462-510)."""

    name = "content_eild-r_v2_at_n"

    def add(self, predictions, labels):
        dists, top, labs = self._distances(predictions, labels)
        if dists is None or top.shape[1] < 2:
            return
        n = top.shape[1]
        disc = log_rank_discount(np.arange(n - 1))
        avg_i = np.stack(
            [dists[:, i, i + 1 :].mean(axis=1) for i in range(n - 1)], axis=1
        )
        self._extend((avg_i * disc).sum(axis=1) / disc.sum())


class ContentExpectedRankRelativeSensitiveIntraListDiversity(_ContentILDBase):
    """EILD-R: relative-rank-discounted pair weights over all j≠i
    (reference metrics.py:513-573)."""

    name = "content_eild-r_at_n"

    def add(self, predictions, labels):
        dists, top, labs = self._distances(predictions, labels)
        if dists is None or top.shape[1] < 2:
            return
        n = top.shape[1]
        i_idx = np.arange(n)[:, None]
        j_idx = np.arange(n)[None, :]
        w = log_rank_discount(np.maximum(0, j_idx - i_idx - 1))
        np.fill_diagonal(w, 0.0)
        weighted = (dists * w).sum(axis=2) / w.sum(axis=1)  # [N, n]
        disc = log_rank_discount(np.arange(n - 1))
        self._extend((weighted[:, : n - 1] * disc).sum(axis=1) / disc.sum())


class ContentExpectedRankRelativeRelevanceSensitiveIntraListDiversity(_ContentILDBase):
    """EILD-RR: relevance-weighted, pairs restricted to j>i
    (reference metrics.py:577-643)."""

    name = "content_eild-rr_at_n"

    def __init__(
        self,
        topn,
        content_article_embeddings_matrix,
        relevance_positive_sample,
        relevance_negative_samples,
    ):
        self.relevance_positive_sample = relevance_positive_sample
        self.relevance_negative_samples = relevance_negative_samples
        super().__init__(topn, content_article_embeddings_matrix)

    def add(self, predictions, labels):
        dists, top, labs = self._distances(predictions, labels)
        if dists is None or top.shape[1] < 2:
            return
        n = top.shape[1]
        rel = np.where(
            top == labs[:, None],
            self.relevance_positive_sample,
            self.relevance_negative_samples,
        )  # [N, n]
        i_idx = np.arange(n)[:, None]
        j_idx = np.arange(n)[None, :]
        tri = (j_idx > i_idx).astype(np.float64)
        rel_disc = log_rank_discount(np.maximum(0, j_idx - i_idx - 1)) * tri
        w = rel_disc[None] * rel[:, None, :]  # [N, n, n]
        num = (dists * w).sum(axis=2)
        den = w.sum(axis=2)
        avg_i = np.divide(num, den, out=np.zeros_like(num), where=den > 0)
        disc = log_rank_discount(np.arange(n - 1))
        outer = avg_i[:, : n - 1] * disc * rel[:, : n - 1]
        self._extend(outer.sum(axis=1) / disc.sum())


class ContentExpectedRankRelevanceSensitiveIntraListDiversity(_ContentILDBase):
    """EILD-RR v2: plain pair averages (j>i), relevance on the outer term only
    (reference metrics.py:646-719)."""

    name = "content_eild-rr_v2_at_n"

    def __init__(
        self,
        topn,
        content_article_embeddings_matrix,
        relevance_positive_sample,
        relevance_negative_samples,
    ):
        self.relevance_positive_sample = relevance_positive_sample
        self.relevance_negative_samples = relevance_negative_samples
        super().__init__(topn, content_article_embeddings_matrix)

    def add(self, predictions, labels):
        dists, top, labs = self._distances(predictions, labels)
        if dists is None or top.shape[1] < 2:
            return
        n = top.shape[1]
        rel = np.where(
            top == labs[:, None],
            self.relevance_positive_sample,
            self.relevance_negative_samples,
        )
        avg_i = np.stack(
            [dists[:, i, i + 1 :].mean(axis=1) for i in range(n - 1)], axis=1
        )
        disc = log_rank_discount(np.arange(n - 1))
        outer = avg_i * disc * rel[:, : n - 1]
        self._extend(outer.sum(axis=1) / disc.sum())


class CategoryExpectedIntraListDiversity(_MeanOfResults):
    """Category-based EILD (reference metrics.py:722-779)."""

    name = "category_eild_at_n"

    def __init__(self, topn, categories):
        self.categories = np.asarray(categories)
        super().__init__(topn)

    def add(self, predictions, labels):
        preds, labs, _, _ = _valid_clicks(predictions, labels)
        if len(labs) == 0:
            return
        top = preds[:, : self.topn]
        n = top.shape[1]
        if n < 2:
            return
        cats = self.categories[top]  # [N, n]
        dists = (cats[:, :, None] != cats[:, None, :]).astype(np.float64)
        i_idx = np.arange(n)[:, None]
        j_idx = np.arange(n)[None, :]
        w = log_rank_discount(np.maximum(0, j_idx - i_idx - 1))
        np.fill_diagonal(w, 0.0)
        weighted = (dists * w).sum(axis=2) / w.sum(axis=1)
        disc = log_rank_discount(np.arange(n - 1))
        self._extend((weighted[:, : n - 1] * disc).sum(axis=1) / disc.sum())
