"""End-to-end demo / quality experiment on a learnable synthetic stream.

Runs the full temporal protocol on Markov-structured synthetic sessions —
next clicks follow a sparse transition graph, so sequential models SHOULD
beat popularity — and prints per-eval-hour HR/MRR for CHAMELEON and the
classical baselines.  This is the framework's model-quality smoke test
(run it on CPU for a quick check; on TPU for a bigger catalog).

  JAX_PLATFORMS=cpu python examples/train_nar_synthetic.py --hours 6
"""
import argparse
import logging
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--hours", type=int, default=6)
    parser.add_argument("--sessions_per_hour", type=int, default=128)
    parser.add_argument("--num_items", type=int, default=2000)
    parser.add_argument("--eval_every", type=int, default=2)
    parser.add_argument("--batch_size", type=int, default=32)
    parser.add_argument("--rnn_units", type=int, default=64)
    parser.add_argument("--car_size", type=int, default=128)
    parser.add_argument("--negatives", type=int, default=20)
    parser.add_argument("--top_n", type=int, default=10)
    parser.add_argument("--platform", default=None)
    parser.add_argument("--approx_topk", action="store_true",
                        help="use the approximate negative-sampler top-k "
                        "(the bench config's fast path)")
    parser.add_argument("--stream", default="markov",
                        choices=["markov", "contextual", "churn"],
                        help="markov: item->item transitions; contextual: "
                             "(item, device)->item transitions that counting "
                             "baselines cannot separate; churn: news-like "
                             "article churn + category-correlated ACEs — "
                             "the item cold-start regime where content/"
                             "recency generalization beats counting")
    parser.add_argument("--item_lifetime_hours", type=float, default=4.0)
    parser.add_argument("--category_signal", type=float, default=0.8)
    args = parser.parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    logging.basicConfig(level=logging.INFO, format="%(message)s")

    from chameleon_recsys_tpu.baselines import (
        ItemCooccurrenceRecommender,
        RecentlyPopularRecommender,
        SequentialRulesRecommender,
    )
    from chameleon_recsys_tpu.config import (
        ArticleFeaturesSchema,
        FeatureSpec,
        NARConfig,
        RunConfig,
        SessionFeaturesSchema,
    )
    from chameleon_recsys_tpu.baselines import ContentBasedRecommender
    from chameleon_recsys_tpu.data.synthetic import (
        make_churn_corpus,
        make_synthetic_corpus,
        make_transition_graph,
        synthetic_churn_hour_sessions,
        synthetic_contextual_hour_sessions,
        synthetic_markov_hour_sessions,
    )
    from chameleon_recsys_tpu.train.temporal import BenchmarkSpec, TemporalHarness

    num_items = args.num_items
    art = ArticleFeaturesSchema(
        features=(
            FeatureSpec("article_id", "categorical", num_items),
            FeatureSpec("created_at_ts", "numerical", dtype="int"),
            FeatureSpec("category_id", "categorical", 20),
        )
    )
    sess = SessionFeaturesSchema(
        single=(
            FeatureSpec("user_id", "categorical", 100000),
            FeatureSpec("session_id", "numerical", dtype="int"),
            FeatureSpec("session_start", "numerical", dtype="int"),
            FeatureSpec("session_size", "numerical", dtype="int"),
        ),
        sequence=(
            FeatureSpec("event_timestamp", "numerical", dtype="int"),
            FeatureSpec("item_clicked", "categorical", num_items),
            FeatureSpec("device", "categorical", 5),
            FeatureSpec("hour_sin", "numerical", dtype="float"),
        ),
    )
    cfg = NARConfig(
        car_embedding_size=args.car_size,
        rnn_units=args.rnn_units,
        rnn_num_layers=2,
        matching_layer_sizes=(128, 64, 32),
        learning_rate=1e-3,
        negative_samples=args.negatives,
        negative_sample_from_buffer=500,
        eval_negative_samples=args.negatives,
        eval_negative_sample_from_buffer=500,
        recent_clicks_buffer_max_size=5000,
        recent_clicks_for_normalization=1000,
        batch_size=args.batch_size,
        max_session_length=12,
        metrics_top_n=args.top_n,
        approx_negative_topk=args.approx_topk,
    )
    if args.stream == "churn":
        corpus = make_churn_corpus(
            art, ace_dim=64, stream_hours=args.hours,
            item_lifetime_hours=args.item_lifetime_hours,
            category_signal=args.category_signal,
        )
    else:
        corpus = make_synthetic_corpus(art, ace_dim=64)
    graph = make_transition_graph(num_items)
    run_cfg = RunConfig(
        model_dir=tempfile.mkdtemp(prefix="chameleon_demo_"),
        training_hours_for_each_eval=args.eval_every,
    )
    benchmarks = [
        BenchmarkSpec(RecentlyPopularRecommender, {}),
        BenchmarkSpec(ItemCooccurrenceRecommender, {}),
        BenchmarkSpec(
            SequentialRulesRecommender,
            {"max_clicks_dist": 10, "dist_between_clicks_decay": "div"},
        ),
    ]
    if args.stream == "churn":
        benchmarks.append(BenchmarkSpec(
            ContentBasedRecommender,
            {"content_article_embeddings_matrix": corpus.ace_matrix},
        ))
    harness = TemporalHarness(
        cfg, run_cfg, sess, art, corpus.ace_matrix, corpus.metadata,
        benchmarks=benchmarks,
    )

    def hour_source(h):
        if args.stream == "contextual":
            return synthetic_contextual_hour_sessions(
                corpus, sess, h, args.sessions_per_hour,
                successors_per_context=5,
                max_session_length=cfg.max_session_length,
            )
        if args.stream == "churn":
            return synthetic_churn_hour_sessions(
                corpus, sess, h, args.sessions_per_hour,
                item_lifetime_hours=args.item_lifetime_hours,
                max_session_length=cfg.max_session_length,
            )
        return synthetic_markov_hour_sessions(
            corpus, sess, graph, h, args.sessions_per_hour,
            cfg.max_session_length,
        )

    rows = harness.run(hour_source, hours=range(args.hours))
    print(f"\n=== per-eval-hour accuracy (HR@{args.top_n} / MRR@{args.top_n}) ===")
    for i, row in enumerate(rows):
        line = (
            f"eval {i}: chameleon {row['hitrate_at_n_chameleon']:.4f}/"
            f"{row['mrr_at_n_chameleon']:.4f} | pop "
            f"{row.get('hitrate_at_n_pop_recent', float('nan')):.4f} | cooc "
            f"{row.get('hitrate_at_n_coocurrent', float('nan')):.4f} | sr "
            f"{row.get('hitrate_at_n_sr', float('nan')):.4f}"
        )
        if "hitrate_at_n_cb" in row:
            line += f" | cb {row['hitrate_at_n_cb']:.4f}"
        line += f" | {row.get('train_sessions_per_s', 0):.0f} sess/s"
        print(line)
    harness.export_artifacts()
    print("artifacts:", run_cfg.model_dir)


if __name__ == "__main__":
    main()
