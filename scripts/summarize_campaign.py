"""Summarize a pseudo-G1 campaign's eval CSV into RESULTS.md tables.

Usage: python scripts/summarize_campaign.py MODEL_DIR [--every 4]
       [--extra name=csv ...]   # merge neural-baseline runner CSVs
"""
import argparse
import csv
import json
import os


def load(path):
    with open(path) as f:
        return list(csv.DictReader(f))


def f(x):
    try:
        return float(x)
    except (TypeError, ValueError):
        return float("nan")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("model_dir")
    ap.add_argument("--every", type=int, default=4,
                    help="print every Nth eval row (all rows feed the aggregates)")
    ap.add_argument("--extra", nargs="*", default=[],
                    help="name=csv pairs of neural-runner outputs to merge")
    args = ap.parse_args()

    rows = load(os.path.join(args.model_dir, "eval_stats_benchmarks.csv"))
    extras = {}
    for pair in args.extra:
        name, path = pair.split("=", 1)
        extras[name] = load(path)

    recs = ["chameleon", "pop_recent", "coocurrent", "item_knn", "v-sknn",
            "cb", "sr"]
    short = {"chameleon": "CHAMELEON", "pop_recent": "RP", "coocurrent": "CO",
             "item_knn": "IKNN", "v-sknn": "V-SkNN", "cb": "CB", "sr": "SR"}

    if not rows:
        raise SystemExit(
            "eval CSV has no rows yet (no eval hour completed) - nothing "
            "to summarize"
        )
    print("### Accuracy trajectory (HR@10 / MRR@10 per eval hour)\n")
    header = ["eval", "sessions"] + [short[r] for r in recs] + list(extras)
    print("| " + " | ".join(header) + " |")
    print("|" + "---|" * len(header))
    n = len(rows)
    idxs = sorted(set(list(range(0, n, args.every)) + [n - 1]))
    for i in idxs:
        r = rows[i]
        cells = [str(i + 1), r.get("sessions_count", "")]
        for rec in recs:
            hr = f(r.get(f"hitrate_at_n_{rec}"))
            mrr = f(r.get(f"mrr_at_n_{rec}"))
            cells.append(f"{hr:.3f}/{mrr:.3f}")
        for name, ex in extras.items():
            if i < len(ex):
                cells.append(
                    f"{f(ex[i].get('hitrate_at_n_' + name, ex[i].get('hitrate_at_n'))):.3f}/"
                    f"{f(ex[i].get('mrr_at_n_' + name, ex[i].get('mrr_at_n'))):.3f}"
                )
            else:
                cells.append("—")
        print("| " + " | ".join(cells) + " |")

    # stream-level aggregates (click-weighted over all eval hours)
    print("\n### Full-stream aggregates (click-weighted means over all "
          f"{n} eval hours)\n")
    metrics = ["hitrate_at_n", "mrr_at_n", "ndcg_at_n", "item_coverage_at_n",
               "esi-r_at_n", "esi-rr_at_n", "content_eild-r_at_n",
               "content_eild-rr_at_n"]
    avail = [m for m in metrics if any(f"{m}_{recs[0]}" in r for r in rows[:1])]
    header = ["metric"] + [short[r] for r in recs]
    print("| " + " | ".join(header) + " |")
    print("|" + "---|" * len(header))
    w = [f(r.get("clicks_count", r.get("sessions_count", 1))) for r in rows]
    tot_w = sum(w)
    for m in avail:
        cells = [m]
        for rec in recs:
            vals = [f(r.get(f"{m}_{rec}")) for r in rows]
            good = [(v, wi) for v, wi in zip(vals, w) if v == v]
            cells.append(
                f"{sum(v * wi for v, wi in good) / max(sum(wi for _, wi in good), 1):.4f}"
                if good else "—"
            )
        print("| " + " | ".join(cells) + " |")

    total_sessions = sum(int(f(r.get("sessions_count", 0))) for r in rows)
    total_clicks = sum(int(f(r.get("clicks_count", 0))) for r in rows)
    print(f"\nevals: {n}; eval sessions: {total_sessions:,}; "
          f"eval clicks: {total_clicks:,}")
    last = rows[-1]
    if "train_sessions_per_s" in last:
        print(f"harness train throughput (wall, incl. everything): "
              f"{last['train_sessions_per_s']} sessions/s")


if __name__ == "__main__":
    main()
