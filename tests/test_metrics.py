"""Vectorized streaming metrics vs literal per-click looped oracles.

The oracles below transliterate the reference algorithms' double loops
(nar_module/nar/metrics.py) as straight numpy/python, including the quirks
(range(topn-1) in ESI, relative-rank discounts in EILD), and the vectorized
implementations must match them to float precision.
"""
import math

import numpy as np
import pytest

from chameleon_recsys_tpu.metrics.streaming import (
    CategoryExpectedIntraListDiversity,
    ContentAverageIntraListDiversity,
    ContentExpectedRankRelativeRelevanceSensitiveIntraListDiversity,
    ContentExpectedRankRelativeSensitiveIntraListDiversity,
    ContentMinIntraListDiversity,
    ExpectedRankRelevanceSensitiveNovelty,
    ExpectedRankSensitiveNovelty,
    HitRate,
    ItemCoverage,
    MRR,
    NDCG,
    Novelty,
    PopularityBias,
    cosine_distance,
    log_rank_discount,
)

TOPN = 5
NUM_ITEMS = 60
REL_POS, REL_NEG = 1.0, 0.02


@pytest.fixture(scope="module")
def data():
    rng = np.random.RandomState(7)
    b, t, c = 6, 4, 12
    labels = rng.randint(0, NUM_ITEMS, size=(b, t))
    preds = rng.randint(1, NUM_ITEMS, size=(b, t, c))
    # plant some hits in the top-n
    for (i, j) in [(0, 0), (1, 2), (3, 1), (5, 3)]:
        if labels[i, j] != 0:
            preds[i, j, rng.randint(0, TOPN)] = labels[i, j]
    pops = rng.uniform(1e-4, 0.2, size=(b, t, c))
    ace = rng.randn(NUM_ITEMS, 16)
    ace[0] = 0.0
    cats = rng.randint(0, 5, size=NUM_ITEMS)
    buffer = np.concatenate([rng.randint(1, NUM_ITEMS, 30), np.zeros(10, np.int64)])
    clicked = rng.randint(0, NUM_ITEMS, size=(b, t))
    return dict(
        labels=labels, preds=preds, pops=pops, ace=ace, cats=cats,
        buffer=buffer, clicked=clicked,
    )


def valid_clicks(labels):
    for i in range(labels.shape[0]):
        for j in range(labels.shape[1]):
            if labels[i, j] != 0:
                yield i, j


def test_mrr_oracle(data):
    m = MRR(TOPN)
    m.add(data["preds"], data["labels"])
    expected = []
    for i, j in valid_clicks(data["labels"]):
        correct = (data["labels"][i, j] == data["preds"][i, j])[:TOPN]
        where = np.where(correct)[0]
        expected.append(1.0 / (1 + where[0]) if len(where) else 0.0)
    assert m.result() == pytest.approx(np.mean(expected))


def test_ndcg_oracle(data):
    m = NDCG(TOPN)
    m.add(data["preds"], data["labels"])

    def dcg(r, k):
        r = np.asarray(r, float)[:k]
        return np.sum((2 ** r - 1) / np.log2(np.arange(2, r.size + 2))) if r.size else 0.0

    expected = []
    for i, j in valid_clicks(data["labels"]):
        r = (data["labels"][i, j] == data["preds"][i, j]).astype(int)
        dcg_max = dcg(sorted(r, reverse=True), TOPN)
        expected.append(dcg(r, TOPN) / dcg_max if dcg_max else 0.0)
    assert m.result() == pytest.approx(np.mean(expected))


def test_hitrate_oracle(data):
    m = HitRate(TOPN)
    m.add(data["preds"], data["labels"])
    total = matches = 0
    for i, j in valid_clicks(data["labels"]):
        total += 1
        if data["labels"][i, j] in data["preds"][i, j][:TOPN]:
            matches += 1
    assert m.result() == pytest.approx(matches / total)


def test_pop_bias_and_novelty_oracle(data):
    pb = PopularityBias(TOPN)
    nv = Novelty(TOPN)
    pb.add(data["preds"], data["labels"], data["pops"])
    nv.add(data["preds"], data["labels"], data["pops"])
    pops_all, novs_all = [], []
    for i, j in valid_clicks(data["labels"]):
        top = data["pops"][i, j][:TOPN]
        pops_all.extend(top)
        novs_all.extend(-np.log2(top))
    assert pb.result() == pytest.approx(np.mean(pops_all))
    assert nv.result() == pytest.approx(np.mean(novs_all))


def test_esi_r_oracle(data):
    m = ExpectedRankSensitiveNovelty(TOPN)
    m.add(data["preds"], data["labels"], data["pops"])
    expected = []
    for i, j in valid_clicks(data["labels"]):
        top = data["pops"][i, j][:TOPN]
        novs, ws = [], []
        for r in range(len(top) - 1):  # reference drops the last rank
            w = log_rank_discount(r)
            novs.append(-np.log2(top[r]) * w)
            ws.append(w)
        expected.append(sum(novs) / sum(ws))
    assert m.result() == pytest.approx(np.mean(expected))


def test_esi_rr_oracle(data):
    m = ExpectedRankRelevanceSensitiveNovelty(TOPN, REL_POS, REL_NEG)
    m.add(data["preds"], data["labels"], data["pops"])
    expected = []
    for i, j in valid_clicks(data["labels"]):
        top_ids = data["preds"][i, j][:TOPN]
        top = data["pops"][i, j][:TOPN]
        novs, ws = [], []
        for r in range(len(top) - 1):
            w = log_rank_discount(r)
            rel = REL_POS if top_ids[r] == data["labels"][i, j] else REL_NEG
            novs.append(-np.log2(top[r]) * w * rel)
            ws.append(w)
        expected.append(sum(novs) / sum(ws))
    assert m.result() == pytest.approx(np.mean(expected))


def test_item_coverage_oracle(data):
    m = ItemCoverage(TOPN, data["buffer"])
    m.add(data["preds"], data["labels"], data["clicked"])
    clicked = set(data["buffer"].tolist())
    recommended = set()
    for i, j in valid_clicks(data["labels"]):
        recommended.update(data["preds"][i, j][:TOPN].tolist())
    labels, clicks = data["labels"], data["clicked"]
    clicked.update(
        np.hstack(
            [labels[np.nonzero(labels)], clicks[np.nonzero(clicks)]]
        ).tolist()
    )
    assert m.result() == pytest.approx(len(recommended) / len(clicked))


def test_content_avg_min_ild_oracle(data):
    avg_m = ContentAverageIntraListDiversity(TOPN, data["ace"])
    min_m = ContentMinIntraListDiversity(TOPN, data["ace"])
    avg_m.add(data["preds"], data["labels"])
    min_m.add(data["preds"], data["labels"])
    avgs, mins = [], []
    for i, j in valid_clicks(data["labels"]):
        top = data["preds"][i, j][:TOPN]
        d = cosine_distance(data["ace"][top], data["ace"][top])
        ds = [d[a, b] for a in range(len(top) - 1) for b in range(a + 1, len(top))]
        avgs.append(np.mean(ds))
        mins.append(np.min(ds))
    assert avg_m.result() == pytest.approx(np.mean(avgs))
    assert min_m.result() == pytest.approx(np.mean(mins))


def test_eild_r_oracle(data):
    m = ContentExpectedRankRelativeSensitiveIntraListDiversity(TOPN, data["ace"])
    m.add(data["preds"], data["labels"])
    expected = []
    for i, j in valid_clicks(data["labels"]):
        top = data["preds"][i, j][:TOPN]
        d = cosine_distance(data["ace"][top], data["ace"][top])
        outer, disc_ws = [], []
        for a in range(len(top) - 1):
            dists, ws = [], []
            for b in range(len(top)):
                if b == a:
                    continue
                w = log_rank_discount(max(0, b - a - 1))
                dists.append(d[a, b] * w)
                ws.append(w)
            disc = log_rank_discount(a)
            outer.append(sum(dists) / sum(ws) * disc)
            disc_ws.append(disc)
        expected.append(sum(outer) / sum(disc_ws))
    assert m.result() == pytest.approx(np.mean(expected))


def test_eild_rr_oracle(data):
    m = ContentExpectedRankRelativeRelevanceSensitiveIntraListDiversity(
        TOPN, data["ace"], REL_POS, REL_NEG
    )
    m.add(data["preds"], data["labels"])
    expected = []
    for i, j in valid_clicks(data["labels"]):
        label = data["labels"][i, j]
        top = data["preds"][i, j][:TOPN]
        d = cosine_distance(data["ace"][top], data["ace"][top])
        outer, disc_ws = [], []
        for a in range(len(top) - 1):
            dists, ws = [], []
            for b in range(a + 1, len(top)):
                rel_b = REL_POS if top[b] == label else REL_NEG
                w = log_rank_discount(max(0, b - a - 1)) * rel_b
                dists.append(d[a, b] * w)
                ws.append(w)
            rel_a = REL_POS if top[a] == label else REL_NEG
            disc = log_rank_discount(a)
            outer.append(sum(dists) / sum(ws) * disc * rel_a)
            disc_ws.append(disc)
        expected.append(sum(outer) / sum(disc_ws))
    assert m.result() == pytest.approx(np.mean(expected))


def test_category_eild_oracle(data):
    m = CategoryExpectedIntraListDiversity(TOPN, data["cats"])
    m.add(data["preds"], data["labels"])
    expected = []
    for i, j in valid_clicks(data["labels"]):
        top = data["preds"][i, j][:TOPN]
        outer, disc_ws = [], []
        for a in range(len(top) - 1):
            dists, ws = [], []
            for b in range(len(top)):
                if b == a:
                    continue
                dist = 0.0 if data["cats"][top[a]] == data["cats"][top[b]] else 1.0
                w = log_rank_discount(max(0, b - a - 1))
                dists.append(dist * w)
                ws.append(w)
            disc = log_rank_discount(a)
            outer.append(sum(dists) / sum(ws) * disc)
            disc_ws.append(disc)
        expected.append(sum(outer) / sum(disc_ws))
    assert m.result() == pytest.approx(np.mean(expected))


def test_streaming_accumulation_across_batches(data):
    """add() twice must equal one metric fed both batches' clicks."""
    m1 = MRR(TOPN)
    m1.add(data["preds"], data["labels"])
    m1.add(data["preds"], data["labels"])
    m2 = MRR(TOPN)
    m2.add(data["preds"], data["labels"])
    assert m1.result() == pytest.approx(m2.result())
