"""Oracle tests for the remaining streaming metrics: HitRateBySessionPosition,
median ILD, and the v2 EILD variants."""
import numpy as np
import pytest

from chameleon_recsys_tpu.metrics.streaming import (
    ContentExpectedRankRelevanceSensitiveIntraListDiversity,
    ContentExpectedRankSensitiveIntraListDiversity,
    ContentMedianIntraListDiversity,
    HitRateBySessionPosition,
    cosine_distance,
    log_rank_discount,
)

TOPN = 4
REL_POS, REL_NEG = 1.0, 0.02


@pytest.fixture(scope="module")
def data():
    rng = np.random.RandomState(3)
    b, t, c = 5, 3, 9
    labels = rng.randint(0, 40, size=(b, t))
    preds = rng.randint(1, 40, size=(b, t, c))
    preds[0, 0, 1] = labels[0, 0]
    pops = rng.uniform(1e-3, 0.3, size=(b, t, c))
    ace = rng.randn(40, 8)
    return labels, preds, pops, ace


def valid(labels):
    for i in range(labels.shape[0]):
        for j in range(labels.shape[1]):
            if labels[i, j] != 0:
                yield i, j


def test_hitrate_by_session_position(data):
    labels, preds, pops, ace = data
    m = HitRateBySessionPosition(TOPN)
    labels_pop = pops[..., 0]
    m.add(preds, labels, labels_pop)
    hitrate, avg_pop, totals = m.result()
    for pos in range(1, labels.shape[1] + 1):
        total = matches = 0
        pop_sum = 0.0
        for i in range(labels.shape[0]):
            j = pos - 1
            if labels[i, j] != 0:
                total += 1
                pop_sum += labels_pop[i, j]
                if labels[i, j] in preds[i, j][:TOPN]:
                    matches += 1
        if total:
            assert totals[pos] == total
            assert hitrate[pos] == pytest.approx(matches / total)
            assert avg_pop[pos] == pytest.approx(pop_sum / total)


def test_median_ild(data):
    labels, preds, pops, ace = data
    m = ContentMedianIntraListDiversity(TOPN, ace)
    m.add(preds, labels)
    expected = []
    for i, j in valid(labels):
        top = preds[i, j][:TOPN]
        d = cosine_distance(ace[top], ace[top])
        ds = [d[a, b] for a in range(len(top) - 1) for b in range(a + 1, len(top))]
        expected.append(np.median(ds))
    assert m.result() == pytest.approx(np.mean(expected))


def test_eild_r_v2(data):
    labels, preds, pops, ace = data
    m = ContentExpectedRankSensitiveIntraListDiversity(TOPN, ace)
    m.add(preds, labels)
    expected = []
    for i, j in valid(labels):
        top = preds[i, j][:TOPN]
        d = cosine_distance(ace[top], ace[top])
        outer, ws = [], []
        for a in range(len(top) - 1):
            dists = [d[a, b] for b in range(a + 1, len(top))]
            disc = log_rank_discount(a)
            outer.append(np.mean(dists) * disc)
            ws.append(disc)
        expected.append(sum(outer) / sum(ws))
    assert m.result() == pytest.approx(np.mean(expected))


def test_eild_rr_v2(data):
    labels, preds, pops, ace = data
    m = ContentExpectedRankRelevanceSensitiveIntraListDiversity(
        TOPN, ace, REL_POS, REL_NEG
    )
    m.add(preds, labels)
    expected = []
    for i, j in valid(labels):
        top = preds[i, j][:TOPN]
        d = cosine_distance(ace[top], ace[top])
        outer, ws = [], []
        for a in range(len(top) - 1):
            dists = [d[a, b] for b in range(a + 1, len(top))]
            rel_a = REL_POS if top[a] == labels[i, j] else REL_NEG
            disc = log_rank_discount(a)
            outer.append(np.mean(dists) * disc * rel_a)
            ws.append(disc)
        expected.append(sum(outer) / sum(ws))
    assert m.result() == pytest.approx(np.mean(expected))
