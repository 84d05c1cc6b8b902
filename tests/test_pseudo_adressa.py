"""Pseudo-Adressa raw-bundle generator (data/pseudo_adressa.py):
determinism, schema compliance with the CLI parsers, and round-trip
through the reference sessionization rule."""
import json

import numpy as np
import pytest

from chameleon_recsys_tpu.data.pseudo_adressa import (
    PseudoAdressaSpec,
    write_bundle,
)

SPEC = PseudoAdressaSpec(
    num_articles=80,
    num_categories=12,
    hours=3,
    mean_sessions_per_hour=30,
    vocab_size=300,
    word_dim=8,
    body_words=36,
    category_band=20,  # bands must fit the tiny vocab to stay distinct
    seed=3,
)


@pytest.fixture(scope="module")
def bundle(tmp_path_factory):
    out = tmp_path_factory.mktemp("pa")
    totals = write_bundle(SPEC, str(out), verbose=False)
    return out, totals


def test_bundle_totals_and_determinism(bundle, tmp_path):
    out, totals = bundle
    assert totals["articles"] == SPEC.num_articles
    assert totals["sessions"] > 0
    assert totals["clicks"] >= 2 * totals["sessions"]
    totals2 = write_bundle(SPEC, str(tmp_path / "again"), verbose=False)
    assert totals2 == totals
    a = (out / "clicks.jsonl").read_bytes()
    b = (tmp_path / "again" / "clicks.jsonl").read_bytes()
    assert a == b


def test_articles_schema_and_category_text_signal(bundle):
    out, _ = bundle
    recs = [json.loads(l) for l in open(out / "articles.jsonl")]
    assert len(recs) == SPEC.num_articles
    for r in recs[:5]:
        for key in ("id", "title", "body", "category0", "category1",
                    "author", "createtime", "keywords"):
            assert key in r
    # text carries the category signal: two articles of the same category
    # share far more tokens than two articles of different categories
    by_cat = {}
    for r in recs:
        by_cat.setdefault(r["category0"], []).append(
            set(r["body"].replace(".", " ").split())
        )
    cats = [c for c, arts in by_cat.items() if len(arts) >= 2]
    same = np.mean([
        len(by_cat[c][0] & by_cat[c][1]) for c in cats[:5]
    ])
    diff = np.mean([
        len(by_cat[cats[i]][0] & by_cat[cats[i + 1]][0])
        for i in range(min(5, len(cats) - 1))
    ])
    assert same > diff * 1.5, (same, diff)


def test_clicks_schema_and_sessionization_round_trip(bundle):
    out, totals = bundle
    from chameleon_recsys_tpu.data.preprocessing.sessionization import (
        Click,
        sessionize_clicks,
    )

    recs = [json.loads(l) for l in open(out / "clicks.jsonl")]
    assert len(recs) == totals["clicks"]
    for r in recs[:5]:
        for key in ("userId", "id", "time", "city", "region", "country",
                    "deviceType", "os", "referrerClass", "activeTime"):
            assert key in r
    clicks = [
        Click(user_id=r["userId"], article_id=r["id"],
              timestamp_ms=r["time"] * 1000, context=r)
        for r in recs
    ]
    t0 = min(r["time"] for r in recs) * 1000
    sessions = list(sessionize_clicks(clicks, dataset_start_ms=t0))
    # userId is unique per generated session and in-session gaps are 8-45 s,
    # so the 30-min-idle rule reproduces the generated sessions up to the
    # de-dup/min-2-clicks drops
    assert 0 < len(sessions) <= totals["sessions"]
    assert len(sessions) >= 0.5 * totals["sessions"]
    for s in sessions[:10]:
        items = [c.article_id for c in s.clicks]
        assert len(items) >= 2
        assert len(set(items)) == len(items)  # de-duped
