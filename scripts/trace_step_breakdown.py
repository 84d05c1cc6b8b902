"""Device-trace breakdown of the CURRENT bench train step (PERFORMANCE.md).

Reconstructs the exact bench.py configuration (G1 reproduction config,
fused Pallas scorer, valid-row compaction rounded to 128), traces N steps,
and prints per-op device totals bucketed into the cost centers used in
PERFORMANCE.md's roofline table.  Run on the live chip.

Usage: python scripts/trace_step_breakdown.py [--steps 10]
"""
import argparse
import dataclasses
import json
import os
import re
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--keep_trace", default="", help="save trace to this dir")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from chameleon_recsys_tpu.utils.jax_cache import (
        enable_persistent_compile_cache,
    )

    enable_persistent_compile_cache()

    import bench
    from chameleon_recsys_tpu.data.collate import batches_from_sessions
    from chameleon_recsys_tpu.data.synthetic import (
        make_synthetic_corpus,
        synthetic_hour_sessions,
    )
    from chameleon_recsys_tpu.train.steps import (
        build_nar_train,
        nar_init_state,
        round_up_to_scorer_tile,
        valid_click_mask,
    )
    from chameleon_recsys_tpu.utils.profiling import (
        device_op_durations,
        device_op_durations_by_track,
    )

    cfg, session_schema, article_schema = bench._g1_setup()
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
    max_valid = max(
        int(valid_click_mask(
            b["session_size"], b["item_clicked"].shape[1], xp=np
        ).sum())
        for b in batches
    )
    cap = min(round_up_to_scorer_tile(max_valid, tile=128),
              batches[0]["item_clicked"].shape[0]
              * batches[0]["item_clicked"].shape[1])
    cfg = dataclasses.replace(cfg, train_valid_row_capacity=cap)
    print(f"# capacity={cap} fused={cfg.use_pallas_scorer}", flush=True)

    programs = build_nar_train(cfg, session_schema, article_schema)
    _, _, state = nar_init_state(
        cfg, session_schema, article_schema, batches[0], ace, metadata
    )
    for b in batches[:2]:
        state, metrics = programs.train_step(state, b, ace, metadata)
    np.asarray(metrics["loss"])

    import contextlib
    td_ctx = (contextlib.nullcontext(args.keep_trace) if args.keep_trace
              else tempfile.TemporaryDirectory())
    with td_ctx as td:
        jax.profiler.start_trace(td)
        try:
            for i in range(args.steps):
                state, metrics = programs.train_step(
                    state, batches[i % len(batches)], ace, metadata
                )
            np.asarray(metrics["loss"])
        finally:
            jax.profiler.stop_trace()
        durs = device_op_durations(td)
        tracks = device_op_durations_by_track(td)

    total_prog = max(
        (sum(v) / args.steps for k, v in durs.items() if k.startswith("jit")),
        default=0.0,
    )
    print("# track totals (ms/step):")
    for tname, ops in sorted(tracks.items(), key=lambda kv: -sum(kv[1].values())):
        print(f"  {sum(ops.values())/args.steps:8.3f}  {tname}")
    # The "XLA Ops" track holds the mutually-exclusive leaf HLO ops — the
    # only rows that tile device-busy time without double counting (other
    # tracks are parallel annotation spans: module row, step row, scopes).
    ops_track = next((v for k, v in tracks.items() if "XLA Ops" in k), None)
    if ops_track is None:
        ops_track = max(tracks.values(), key=lambda v: len(v))
    per_op = {k: v / args.steps for k, v in ops_track.items()}
    busy = sum(per_op.values())
    print(f"# device busy (XLA Ops leaf rows): {busy:.3f} ms/step")

    BUCKETS = [
        ("scorer_bwd_kernel", r"cand_scorer.*(bwd|backward|vjp)|scorer_bwd|transpose_jvp_NARModel"),
        ("scorer_fwd_kernel", r"cand_scorer|scorer_fwd|^jvp_NARModel"),
        ("rnn_kernel", r"ugrnn"),
        ("sort_topk", r"sort|top-k|approx|partial-reduce"),
        ("scatter_gather", r"scatter|gather|dynamic-slice|dynamic-update"),
        ("copies", r"^copy|^bitcast|^transpose\.|^reshape"),
        ("convolutions_matmuls", r"convolution|dot|matmul"),
        ("reductions", r"reduce"),
        ("fusions_other", r"fusion|loop"),
    ]
    bucket_ms = {name: 0.0 for name, _ in BUCKETS}
    bucket_ms["unbucketed"] = 0.0
    rows = sorted(per_op.items(), key=lambda kv: -kv[1])
    for name, ms in rows:
        for bname, pat in BUCKETS:
            if re.search(pat, name, re.I):
                bucket_ms[bname] += ms
                break
        else:
            bucket_ms["unbucketed"] += ms

    print(f"# program total: {total_prog:.3f} ms/step over {args.steps} steps")
    print(json.dumps({k: round(v, 3) for k, v in sorted(
        bucket_ms.items(), key=lambda kv: -kv[1])}, indent=2))
    print("# top ops (ms/step):")
    for name, ms in rows[: args.top]:
        print(f"  {ms:8.3f}  {name[:110]}")


if __name__ == "__main__":
    main()
