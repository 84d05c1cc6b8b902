"""Execute the G1-configuration sharded NAR step on a virtual CPU mesh
and assert parity against single-device execution.

Round-4 gap: the G1-scale sharded program (46,034-row sharded tables,
CAR 1024, UGRNN 255x2, capacity-2688 grouped valid-row compaction) had
only ever been AOT-compiled (scripts/collective_accounting.py); every
*executed* mesh program ran at toy dims.  This script runs REAL steps +
an eval slice of the exact production ``TemporalHarness`` mesh path at
the paper's G1 configuration (reference README.md:255-308 flags) on
``--xla_force_host_platform_device_count`` virtual devices and checks:

- train losses per hour agree with the single-device run (bf16-tolerant);
- the integer streaming state (click buffer, popularity counters) is
  EXACTLY equal after training — the replicated-state determinism claim;
- eval ranked lists agree click-by-click modulo documented Adam last-bit
  reduction-order noise (same falsifiable thresholds as
  tests/test_multichip.py::test_single_vs_mesh_losses_and_eval);
- device-tier HR equals the streaming-metric-tier HR within each path.

Importable: ``run_g1_mesh_parity`` is called from
``__graft_entry__.dryrun_multichip`` (driver MULTICHIP gate) with a
reduced session count, and from tests/test_multichip_g1.py (slow).

Usage: python scripts/g1_mesh_parity.py [--dp 4 --mp 2 --hours 2]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

NUM_ITEMS = 46_034  # G1-campaign catalog (g1data bundle cardinality)
ACE_DIM = 250       # reference articles_embeddings.pickle width


def _g1_cfg(dp: int, capacity: int = 2688, compute_dtype: str = "bfloat16"):
    from chameleon_recsys_tpu.config import NARConfig

    # the paper-reproduction G1 flags (scripts/run_nar_train_gcom_full.sh)
    return NARConfig(
        car_embedding_size=1024,
        rnn_units=255,
        rnn_num_layers=2,
        learning_rate=1e-4,
        reg_weight_decay=1e-5,
        softmax_temperature=0.1,
        negative_samples=50,
        negative_sample_from_buffer=3000,
        eval_negative_samples=50,
        eval_negative_sample_from_buffer=5000,
        recent_clicks_buffer_max_size=20000,
        recent_clicks_for_normalization=5000,
        batch_size=256,
        max_session_length=20,
        metrics_top_n=10,
        compute_dtype=compute_dtype,
        train_valid_row_capacity=capacity,
        train_compaction_groups=dp,
    )


def run_g1_mesh_parity(
    dp: int = 4,
    mp: int = 2,
    train_hours: int = 1,
    sessions_per_hour: int = 256,
    eval_sessions: int = 256,
    quiet: bool = False,
    compute_dtype: str = "float32",
):
    """Returns a dict of parity stats; raises AssertionError on violation."""
    import jax
    import numpy as np

    from chameleon_recsys_tpu.config import (
        RunConfig,
        gcom_article_schema,
        gcom_session_schema,
    )
    from chameleon_recsys_tpu.data.synthetic import (
        make_synthetic_corpus,
        synthetic_hour_sessions,
    )
    from chameleon_recsys_tpu.parallel.mesh import make_mesh
    from chameleon_recsys_tpu.train.temporal import TemporalHarness

    t0 = time.time()
    article_schema = gcom_article_schema(num_items=NUM_ITEMS)
    session_schema = gcom_session_schema(num_items=NUM_ITEMS)
    corpus = make_synthetic_corpus(article_schema, ace_dim=ACE_DIM)
    cfg = _g1_cfg(dp, compute_dtype=compute_dtype)

    def hour_source(h):
        return synthetic_hour_sessions(
            corpus, session_schema, h, sessions_per_hour,
            cfg.max_session_length, length_distribution="g1",
        )

    plan = make_mesh(
        data_parallelism=dp, model_parallelism=mp,
        devices=jax.devices()[: dp * mp],
    )

    import tempfile

    stats = {"config": f"{dp}x{mp}", "items": NUM_ITEMS,
             "capacity": cfg.train_valid_row_capacity}
    with tempfile.TemporaryDirectory() as d1, \
            tempfile.TemporaryDirectory() as d2:
        h_single = TemporalHarness(
            cfg, RunConfig(model_dir=d1, training_hours_for_each_eval=1),
            session_schema, article_schema, corpus.ace_matrix,
            corpus.metadata, log_recommendations=True,
        )
        h_mesh = TemporalHarness(
            cfg, RunConfig(model_dir=d2, training_hours_for_each_eval=1),
            session_schema, article_schema, corpus.ace_matrix,
            corpus.metadata, mesh_plan=plan, log_recommendations=True,
        )
        losses = []
        for h in range(train_hours):
            s1 = h_single.train_hour(hour_source(h))
            s2 = h_mesh.train_hour(hour_source(h))
            losses.append((s1["avg_ce_loss"], s2["avg_ce_loss"]))
            rel = abs(s1["avg_ce_loss"] - s2["avg_ce_loss"]) / max(
                abs(s1["avg_ce_loss"]), 1e-9
            )
            assert rel < 2e-2, (
                f"hour {h} loss mismatch: single {s1['avg_ce_loss']:.6f} "
                f"vs mesh {s2['avg_ce_loss']:.6f} (rel {rel:.3e})"
            )
        # integer streaming state must agree EXACTLY (replicated-state
        # determinism at production buffer sizes)
        for field in ("buffer_ids", "buffer_ts", "recent_pop", "global_pop"):
            a = np.asarray(getattr(h_single.state.stream, field))
            b = np.asarray(getattr(h_mesh.state.stream, field))
            np.testing.assert_array_equal(a, b, err_msg=field)

        r1 = h_single.evaluate_hour(hour_source(train_hours))
        r2 = h_mesh.evaluate_hour(hour_source(train_hours))

        topn = cfg.metrics_top_n

        def ranked_lists(h):
            return {
                (row["session_id"], i): tuple(preds[:topn])
                for row in h.artifacts.sessions_chameleon_recommendations_log
                for i, preds in enumerate(row["predicted_item_ids"])
            }

        l1, l2 = ranked_lists(h_single), ranked_lists(h_mesh)
        assert set(l1) == set(l2) and len(l1) > 100, len(l1)
        identical = sum(l1[k] == l2[k] for k in l1) / len(l1)
        top1 = sum(l1[k][0] == l2[k][0] for k in l1) / len(l1)
        overlap = float(np.mean(
            [len(set(l1[k]) & set(l2[k])) / topn for k in l1]
        ))
        stats.update(
            dtype=compute_dtype,
            losses=losses,
            ranked_identical=round(identical, 4),
            ranked_top1=round(top1, 4),
            ranked_overlap=round(overlap, 4),
            hr_single=round(float(r1["hitrate_at_n"]), 4),
            hr_mesh=round(float(r2["hitrate_at_n"]), 4),
            clicks_compared=len(l1),
            wall_s=round(time.time() - t0, 1),
        )
        if not quiet:
            print(f"g1_mesh_parity stats: {stats}", flush=True)
        # Falsifiable floors: a hand-broken sharding (dropped psum) scores
        # ~0 identical and ~topn/candidates (≈0.2) overlap.  In f32 the
        # ranked lists are near-bit-stable; at the production bf16 the
        # 46k-item score field is dense with last-bit near-ties, so only
        # aggregate floors are meaningful there (the f32 run is the strict
        # ranked-list gate; both run the SAME sharded program).
        if compute_dtype == "float32":
            assert identical >= 0.45, f"identical ranked lists {identical:.3f}"
            assert top1 >= 0.85, f"top-1 agreement {top1:.3f}"
            assert overlap >= 0.9, f"mean top-{topn} overlap {overlap:.3f}"
        else:
            assert top1 >= 0.55, f"top-1 agreement {top1:.3f}"
            assert overlap >= 0.75, f"mean top-{topn} overlap {overlap:.3f}"
        assert abs(r1["hitrate_at_n"] - r2["hitrate_at_n"]) < 0.05
        assert abs(r1["mrr_at_n"] - r2["mrr_at_n"]) < 0.05
        for r in (r1, r2):  # device tier == streaming-metric tier
            assert abs(r["hitrate_at_n"] - r["hitrate_at_n_chameleon"]) < 1e-9
    if not quiet:
        print(f"g1_mesh_parity OK: {stats}")
    return stats


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dp", type=int, default=4)
    ap.add_argument("--mp", type=int, default=2)
    ap.add_argument("--hours", type=int, default=1)
    ap.add_argument("--sessions_per_hour", type=int, default=256)
    ap.add_argument("--dtype", default="float32",
                    choices=("float32", "bfloat16"))
    args = ap.parse_args()
    run_g1_mesh_parity(args.dp, args.mp, args.hours, args.sessions_per_hour,
                       compute_dtype=args.dtype)


if __name__ == "__main__":
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    from chameleon_recsys_tpu.utils.jax_cache import (
        enable_persistent_compile_cache,
    )

    enable_persistent_compile_cache()
    main()
