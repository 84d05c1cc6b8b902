"""Host-tier microbench: per-baseline evaluate() cost at G1 eval scale.

The eval hour's host tier (TemporalHarness.evaluate_hour's "benchmarks"
phase) runs each classical baseline's train + evaluate per batch.  This
script isolates that tier on fabricated G1-scale state — no TPU needed —
and prints a per-baseline table (train ms/batch, evaluate ms/batch split
into predict vs metric-update) so optimization effort lands on the real
top cost.  Numbers feed PERFORMANCE.md's eval-hour section.

Usage: python scripts/bench_eval_tier_host.py [--batches 4] [--repeat 3]
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

from chameleon_recsys_tpu.baselines.benchmarks import StreamStateView
from chameleon_recsys_tpu.baselines.content_based import ContentBasedRecommender
from chameleon_recsys_tpu.baselines.item_cooccurrence import (
    ItemCooccurrenceRecommender,
)
from chameleon_recsys_tpu.baselines.item_knn import ItemKNNRecommender
from chameleon_recsys_tpu.baselines.recently_popular import (
    RecentlyPopularRecommender,
)
from chameleon_recsys_tpu.baselines.sequential_rules import (
    SequentialRulesRecommender,
)
from chameleon_recsys_tpu.baselines.session_knn import SessionBasedKNNRecommender
from chameleon_recsys_tpu.metrics.evaluation import create_eval_metrics
from chameleon_recsys_tpu.state.host_state import HostState

NUM_ITEMS = 46_034
ACE_DIM = 250
B, T = 256, 19
TOPK = 10
NEGATIVES = 50
BUFFER = 20_000


def make_batch(rng):
    # 2 + geometric(0.55) - 1 -> mean ~2.8 clicks, the pseudo-G1 distribution
    lengths = np.minimum(1 + rng.geometric(0.55, size=B), T)
    items = np.zeros((B, T), np.int64)
    nxt = np.zeros((B, T), np.int64)
    for i, L in enumerate(lengths):
        seq = (rng.zipf(1.25, size=L + 1) % (NUM_ITEMS - 1)) + 1
        items[i, :L] = seq[:-1]
        nxt[i, :L] = seq[1:]
    negs = (rng.zipf(1.25, size=(B, T, NEGATIVES)) % (NUM_ITEMS - 1)) + 1
    negs *= (items != 0)[:, :, None]
    users = rng.randint(1, 300_000, size=B)
    sids = rng.randint(1, 1 << 30, size=B)
    return users, sids, items, nxt, negs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, default=4)
    ap.add_argument("--repeat", type=int, default=3)
    args = ap.parse_args()

    rng = np.random.RandomState(0)
    ace = rng.randn(NUM_ITEMS, ACE_DIM).astype(np.float32)
    ace /= np.linalg.norm(ace, axis=1, keepdims=True)

    host_state = HostState(NUM_ITEMS)
    buffer_ids = (rng.zipf(1.25, size=BUFFER) % (NUM_ITEMS - 1)) + 1
    pop = np.bincount(buffer_ids, minlength=NUM_ITEMS).astype(np.float64)
    pop_norm = pop / pop.sum()
    view = StreamStateView(host_state, buffer_ids, pop_norm, pop)

    def metrics():
        return create_eval_metrics(TOPK, 0.02, False, ace, buffer_ids)

    specs = [
        ("pop", RecentlyPopularRecommender, {}),
        ("cooc", ItemCooccurrenceRecommender, {}),
        ("iknn", ItemKNNRecommender, {"reg_lambda": 20, "alpha": 0.75}),
        ("sknn", SessionBasedKNNRecommender, {
            "sessions_buffer_size": 3000,
            "candidate_sessions_sample_size": 1000,
            "sampling_strategy": "recent",
            "nearest_neighbor_session_for_scoring": 500,
            "similarity": "cosine",
            "first_session_clicks_decay": "div",
        }),
        ("cb", ContentBasedRecommender,
         {"content_article_embeddings_matrix": ace}),
        ("sr", SequentialRulesRecommender,
         {"max_clicks_dist": 10, "dist_between_clicks_decay": "div"}),
    ]

    train_batches = [make_batch(rng) for _ in range(12)]
    eval_batches = [make_batch(rng) for _ in range(args.batches)]
    for users, sids, items, nxt, _ in train_batches:
        host_state.update_items_coocurrences(
            np.concatenate([items, nxt[:, -1:]], axis=1)
        )

    print(f"{'clf':>6} {'train':>9} {'predict':>9} {'metrics':>9} {'eval':>9}  ms/batch (min of {args.repeat})")
    totals = {}
    for name, cls, params in specs:
        clf = cls(view, params, metrics())
        t_tr = []
        for users, sids, items, nxt, _ in train_batches:
            t0 = time.perf_counter()
            clf.train(users, sids, items, nxt)
            t_tr.append(time.perf_counter() - t0)
        t_pred, t_eval = [], []
        for _ in range(args.repeat):
            for users, sids, items, nxt, negs in eval_batches:
                valid = clf.get_valid_candidate_items(nxt, negs)
                t0 = time.perf_counter()
                clf.predict(users, items, topk=TOPK, valid_items=valid)
                t_pred.append(time.perf_counter() - t0)
                t0 = time.perf_counter()
                clf.evaluate(users, items, nxt, topk=TOPK,
                             eval_negative_items=negs)
                t_eval.append(time.perf_counter() - t0)
        tr = np.mean(t_tr) * 1e3
        pr = min(t_pred) * 1e3
        ev = min(t_eval) * 1e3
        totals[name] = ev
        print(f"{name:>6} {tr:9.1f} {pr:9.1f} {ev - pr:9.1f} {ev:9.1f}")
    per_hour = sum(totals.values()) * args.batches / 1e3
    print(f"\nserial benchmarks tier at {args.batches} batches/hour: "
          f"{per_hour:.2f}s  ({args.batches * B} sessions -> "
          f"{args.batches * B / per_hour:.0f} sessions/s serial)")


if __name__ == "__main__":
    main()
