"""Benchmark: NAR training throughput (sessions/sec/chip) at G1 scale.

Runs the full jitted train step — negative sampling, forward, backward, Adam,
streaming-state transition — at the reference's G1 reproduction configuration
(batch 256, session length 20, CAR 1024, UGRNN 255×2, 50 negatives from a
20k-click buffer, 46k-article catalog; reference README.md:264-306) on
synthetic sessions, and prints one JSON line.

``vs_baseline``: the reference publishes no throughput numbers
(BASELINE.md — "Throughput: never measured in repo").  The north-star target
is ≥5× the TF1.12 single-GPU (K80) baseline.  We use a nominal estimate of
1000 sessions/sec for that baseline (256-session batches at ~4 steps/sec,
optimistic for a feed_dict-bound TF1 Estimator loop with per-batch host
round-trips); vs_baseline = measured / 1000.
"""
import json
import time

import numpy as np

NOMINAL_TF1_K80_SESSIONS_PER_SEC = 1000.0


def main():
    import jax

    # persistent compile cache: repeat runs skip the multi-minute XLA compile
    # (harmless no-op if the backend can't serialize executables)
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/chameleon_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
    except Exception:
        pass

    import jax.numpy as jnp

    from chameleon_recsys_tpu.config import (
        ArticleFeaturesSchema,
        FeatureSpec,
        NARConfig,
        SessionFeaturesSchema,
    )
    from chameleon_recsys_tpu.data.collate import batches_from_sessions
    from chameleon_recsys_tpu.data.synthetic import (
        make_synthetic_corpus,
        synthetic_hour_sessions,
    )
    from chameleon_recsys_tpu.train.steps import build_nar_train, nar_init_state

    num_items = 46033  # G1 articles (README.md:29)
    article_schema = ArticleFeaturesSchema(
        features=(
            FeatureSpec("article_id", "categorical", num_items),
            FeatureSpec("created_at_ts", "numerical", dtype="int"),
            FeatureSpec("category_id", "categorical", 461),
        )
    )
    session_schema = SessionFeaturesSchema(
        single=(
            FeatureSpec("user_id", "categorical", 322897),
            FeatureSpec("session_id", "numerical", dtype="int"),
            FeatureSpec("session_start", "numerical", dtype="int"),
            FeatureSpec("session_size", "numerical", dtype="int"),
        ),
        sequence=(
            FeatureSpec("event_timestamp", "numerical", dtype="int"),
            FeatureSpec("item_clicked", "categorical", num_items),
            FeatureSpec("environment", "categorical", 5),
            FeatureSpec("deviceGroup", "categorical", 6),
            FeatureSpec("os", "categorical", 23),
            FeatureSpec("country", "categorical", 12),
            FeatureSpec("region", "categorical", 29),
            FeatureSpec("local_hour_sin", "numerical", dtype="float"),
            FeatureSpec("local_hour_cos", "numerical", dtype="float"),
            FeatureSpec("weekday", "numerical", dtype="float"),
            FeatureSpec("referrer_class", "categorical", 8),
        ),
    )
    cfg = NARConfig(
        car_embedding_size=1024,
        rnn_units=255,
        rnn_num_layers=2,
        negative_samples=50,
        negative_sample_from_buffer=3000,
        recent_clicks_buffer_max_size=20000,
        recent_clicks_for_normalization=5000,
        batch_size=256,
        max_session_length=20,
        metrics_top_n=10,
        keep_prob=1.0,
        compute_dtype="bfloat16",
        # fused Pallas candidate scorer: PreCAR+CAR+matching MLP in one
        # kernel, nothing [B,T,K,C]-shaped reaches HBM (+6% end-to-end,
        # ops/pallas/cand_scorer.py). The fused Pallas RNN
        # (cfg.use_pallas_rnn) stays off: throughput-neutral at this config
        # (the RNN is a small slice of the step) and adds compile time.
        use_pallas_scorer=True,
    )

    corpus = make_synthetic_corpus(article_schema, ace_dim=250)
    metadata = {k: jnp.asarray(v) for k, v in corpus.metadata.items()}
    ace = jnp.asarray(corpus.ace_matrix)

    batches = []
    for h in range(2):
        sessions = synthetic_hour_sessions(
            corpus, session_schema, h, 2 * cfg.batch_size, cfg.max_session_length
        )
        for b in batches_from_sessions(
            sessions, session_schema, cfg.batch_size, cfg.max_session_length
        ):
            batches.append({k: jnp.asarray(v) for k, v in b.items()})

    programs = build_nar_train(cfg, session_schema, article_schema)
    _, _, state = nar_init_state(
        cfg, session_schema, article_schema, batches[0], ace, metadata
    )

    # warmup: compile + populate the buffer
    for b in batches[:2]:
        state, metrics = programs.train_step(state, b, ace, metadata)
    jax.block_until_ready(metrics["loss"])

    n_steps = 30
    t0 = time.perf_counter()
    for i in range(n_steps):
        state, metrics = programs.train_step(
            state, batches[i % len(batches)], ace, metadata
        )
    jax.block_until_ready(metrics["loss"])
    elapsed = time.perf_counter() - t0

    sessions_per_sec = cfg.batch_size * n_steps / elapsed
    print(
        json.dumps(
            {
                "metric": "nar_train_sessions_per_sec_per_chip",
                "value": round(sessions_per_sec, 1),
                "unit": "sessions/s",
                "vs_baseline": round(
                    sessions_per_sec / NOMINAL_TF1_K80_SESSIONS_PER_SEC, 2
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
