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
import argparse
import json
import os
import sys
import time

import numpy as np

NOMINAL_TF1_K80_SESSIONS_PER_SEC = 1000.0

# bf16 peak matmul throughput per chip, FLOP/s (public spec sheets)
_PEAK_FLOPS_BY_KIND = {
    "v6": 918e12,  # Trillium
    "v5p": 459e12,
    "v5": 197e12,  # v5e / v5 lite
    "v4": 275e12,
}


def _peak_flops(device) -> float:
    kind = getattr(device, "device_kind", "").lower().replace(" ", "")
    for key, peak in _PEAK_FLOPS_BY_KIND.items():
        if key in kind:
            return peak
    return 0.0


def _step_flops(jitted, *args) -> float:
    """XLA's own FLOP count for one compiled step (0.0 if unavailable)."""
    try:
        cost = jitted.lower(*args).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        return float(cost.get("flops", 0.0))
    except Exception:
        return 0.0


def _traced_step_seconds(run_steps, n_steps: int) -> float:
    """Device-side per-step execution time from a JAX profiler trace.

    Wall-clock through a remote-dispatch backend (the tunneled dev
    environment) measures per-dispatch RPC latency — tens of ms — rather
    than the chip, and `block_until_ready` there returns before execution
    finishes.  The profiler's device timeline records what the hardware
    actually did, so the per-step figure comes from the summed durations of
    the step's device events.  ``run_steps`` must execute exactly
    ``n_steps`` compiled steps and end with a host fetch (so everything has
    completed before the trace stops).  Returns 0.0 if the trace cannot be
    captured or parsed (then the caller falls back to wall clock).
    """
    import collections
    import glob as globmod
    import gzip
    import json as jsonmod
    import tempfile

    try:
        import jax

        with tempfile.TemporaryDirectory() as td:
            jax.profiler.start_trace(td)
            try:
                run_steps()
            finally:
                jax.profiler.stop_trace()
            paths = globmod.glob(td + "/**/*.trace.json.gz", recursive=True)
            if not paths:
                return 0.0
            with gzip.open(paths[0]) as f:
                data = jsonmod.load(f)
            events = data.get("traceEvents", [])
            pids = {
                e["pid"]: e.get("args", {}).get("name", "")
                for e in events
                if e.get("ph") == "M" and e.get("name") == "process_name"
            }
            device_pids = {
                p for p, name in pids.items() if name.startswith("/device:")
            }
            totals = collections.defaultdict(float)
            for e in events:
                if (
                    e.get("ph") == "X"
                    and e.get("pid") in device_pids
                    and str(e.get("name", "")).startswith("jit")
                ):
                    totals[e["name"]] += float(e.get("dur", 0.0))
            if not totals:
                return 0.0
            # the step program dominates; smaller jit events (host fetches)
            # are filtered by taking the largest total
            total_us = max(totals.values())
            return total_us / 1e6 / n_steps
    except Exception:
        return 0.0


def scaling_main():
    """--scaling: weak-scaling sessions/s at 1/2/4/8 devices through the
    sharded production programs (parallel/sharded.py).

    On a multi-chip TPU slice this measures real hardware scaling.  With
    one chip (this environment) it falls back to N virtual CPU devices —
    there the numbers validate the sharded code path and collective layout,
    not hardware bandwidth (all virtual devices share the same host CPU)."""
    n_target = 8
    # Platform choice must happen BEFORE the first backend touch (the
    # device count / platform cannot change after initialization).  Real
    # multi-chip runs opt in via CHAMELEON_SCALING_REAL_DEVICES=1; the
    # default is the 8-virtual-device CPU mesh, which also keeps the one
    # tunneled TPU chip free (a second client can hang backend init).
    use_real = os.environ.get("CHAMELEON_SCALING_REAL_DEVICES") == "1"
    if not use_real:
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count={n_target}"
            ).strip()

    import jax

    if not use_real:
        jax.config.update("jax_platforms", "cpu")
    platform = jax.default_backend()

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
    from chameleon_recsys_tpu.parallel.mesh import make_mesh
    from chameleon_recsys_tpu.parallel.sharded import put_batch, shard_nar_programs
    from chameleon_recsys_tpu.train.steps import build_nar_train, nar_init_state

    num_items = 4096
    article_schema = ArticleFeaturesSchema(
        features=(
            FeatureSpec("article_id", "categorical", num_items),
            FeatureSpec("created_at_ts", "numerical", dtype="int"),
            FeatureSpec("category_id", "categorical", 32),
        )
    )
    session_schema = SessionFeaturesSchema(
        single=(
            FeatureSpec("user_id", "categorical", 10000),
            FeatureSpec("session_id", "numerical", dtype="int"),
            FeatureSpec("session_start", "numerical", dtype="int"),
            FeatureSpec("session_size", "numerical", dtype="int"),
        ),
        sequence=(
            FeatureSpec("event_timestamp", "numerical", dtype="int"),
            FeatureSpec("item_clicked", "categorical", num_items),
            FeatureSpec("os", "categorical", 23),
            FeatureSpec("local_hour_sin", "numerical", dtype="float"),
        ),
    )
    per_device_batch = 32
    corpus = make_synthetic_corpus(article_schema, ace_dim=64)
    metadata = {k: jnp.asarray(v) for k, v in corpus.metadata.items()}
    ace = jnp.asarray(corpus.ace_matrix)

    throughputs = {}
    counts = [n for n in (1, 2, 4, 8) if n <= len(jax.devices())]
    for n_dev in counts:
        model_par = 2 if n_dev >= 2 else 1
        plan = make_mesh(
            data_parallelism=n_dev // model_par,
            model_parallelism=model_par,
            devices=jax.devices()[:n_dev],
        )
        # weak scaling: per-device batch fixed, global batch grows with N
        cfg = NARConfig(
            car_embedding_size=128,
            rnn_units=64,
            rnn_num_layers=2,
            matching_layer_sizes=(64, 32, 16),
            negative_samples=10,
            negative_sample_from_buffer=300,
            eval_negative_samples=10,
            eval_negative_sample_from_buffer=300,
            recent_clicks_buffer_max_size=2048,
            recent_clicks_for_normalization=512,
            batch_size=per_device_batch * plan.data_parallelism,
            max_session_length=10,
            metrics_top_n=5,
        )
        sessions = synthetic_hour_sessions(
            corpus, session_schema, 0, 2 * cfg.batch_size,
            cfg.max_session_length,
        )
        np_batches = list(
            batches_from_sessions(
                sessions, session_schema, cfg.batch_size, cfg.max_session_length
            )
        )
        programs = build_nar_train(cfg, session_schema, article_schema)
        example = {k: jnp.asarray(v) for k, v in np_batches[0].items()}
        _, _, state = nar_init_state(
            cfg, session_schema, article_schema, example, ace, metadata
        )
        sharded = shard_nar_programs(
            programs, plan, state,
            {k: jax.ShapeDtypeStruct(v.shape, v.dtype)
             for k, v in np_batches[0].items()},
            ace, metadata, min_rows=1024,
        )
        state = jax.device_put(state, sharded.state_sharding)
        ace_d = jax.device_put(ace, sharded.ace_sharding)
        meta_d = jax.device_put(metadata, sharded.metadata_sharding)
        batches = [put_batch(sharded, b) for b in np_batches]

        for b in batches[:2]:  # compile + warm buffer
            state, metrics = sharded.train_step(state, b, ace_d, meta_d)
        np.asarray(metrics["loss"])  # host fetch: guaranteed completion
        n_steps = 20
        t0 = time.perf_counter()
        for i in range(n_steps):
            state, metrics = sharded.train_step(
                state, batches[i % len(batches)], ace_d, meta_d
            )
        np.asarray(metrics["loss"])
        throughputs[n_dev] = cfg.batch_size * n_steps / (
            time.perf_counter() - t0
        )

    n_max = counts[-1]
    if platform == "tpu":
        # a real multi-chip efficiency number
        efficiency = throughputs[n_max] / (n_max * throughputs[1])
        result = {
            "metric": "nar_train_weak_scaling_efficiency",
            "value": round(efficiency, 3),
            "unit": f"x{n_max}-vs-x1",
            "vs_baseline": round(efficiency / 0.85, 2),  # ≥0.85 target
            "platform": platform,
            "sessions_per_sec": {
                str(k): round(v, 1) for k, v in throughputs.items()
            },
        }
    else:
        # Virtual devices share one host CPU: an "efficiency" key here WOULD
        # be misquoted as hardware scaling the first time someone reads the
        # JSON without the note — emit a pass/fail program-validation metric
        # and the raw per-mesh tails only.
        result = {
            "metric": "nar_train_weak_scaling_program_ok",
            "value": 1.0,
            "unit": f"mesh-sizes-validated-{'-'.join(map(str, counts))}",
            "vs_baseline": 1.0,
            "platform": platform,
            "sessions_per_sec": {
                str(k): round(v, 1) for k, v in throughputs.items()
            },
            "note": (
                "virtual devices share one host CPU — this validates the "
                "sharded program + collectives at every mesh size, NOT "
                "hardware scaling (no efficiency figure is emitted off-TPU); "
                "run with CHAMELEON_SCALING_REAL_DEVICES=1 on a multi-chip "
                "slice for a real efficiency figure"
            ),
        }
    print(json.dumps(result))


def _g1_setup():
    """The reference's G1 reproduction schemas + NARConfig (README.md:264-306),
    shared by the train-throughput and eval-throughput benches."""
    from chameleon_recsys_tpu.config import (
        ArticleFeaturesSchema,
        FeatureSpec,
        NARConfig,
        SessionFeaturesSchema,
    )

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
        # approx_max_k instead of a full variadic sort for the per-click
        # candidate selection: the selection keys are i.i.d. uniforms, so a
        # recall<1 top-k is still an exact uniform draw (a near-boundary
        # candidate is swapped for another equally-random one) — the
        # sampler's sort is ~4 ms of the step (ops/sampling.py:134-144)
        approx_negative_topk=True,
    )
    return cfg, session_schema, article_schema


def _backend_or_cpu_fallback():
    """Probe the default backend; fall back to CPU if the (tunneled) TPU is
    unreachable so the bench always emits its JSON line instead of crashing.
    Returns the platform string actually in use."""
    import subprocess
    import sys

    # the probe must run in a CHILD process: a hanging/failed backend init
    # poisons the jax runtime state of the process that attempted it
    alive_platform = None
    try:
        out = subprocess.run(
            [sys.executable, "-c", "import jax; print(jax.default_backend())"],
            capture_output=True, text=True, timeout=180,
        )
        if out.returncode == 0 and out.stdout.strip():
            alive_platform = out.stdout.strip().splitlines()[-1]
    except subprocess.TimeoutExpired:
        pass
    import jax

    if alive_platform is None:
        jax.config.update("jax_platforms", "cpu")
        return "cpu (device backend unreachable)"
    return alive_platform


def main(g1_lengths: bool = False):
    platform_note = _backend_or_cpu_fallback()
    import jax

    # persistent compile cache: repeat runs skip the multi-minute XLA compile
    # (harmless no-op if the backend can't serialize executables)
    from chameleon_recsys_tpu.utils.jax_cache import (
        enable_persistent_compile_cache,
    )

    enable_persistent_compile_cache()

    import jax.numpy as jnp

    from chameleon_recsys_tpu.data.collate import batches_from_sessions
    from chameleon_recsys_tpu.data.synthetic import (
        make_synthetic_corpus,
        synthetic_hour_sessions,
    )
    from chameleon_recsys_tpu.train.steps import build_nar_train, nar_init_state

    cfg, session_schema, article_schema = _g1_setup()
    cpu_fallback = platform_note.startswith("cpu")
    if cpu_fallback:
        # The G1-scale program takes tens of minutes to compile+run on this
        # host's CPU (measured >40 min) — useless as a liveness fallback.
        # Emit a clearly-flagged reduced-config figure instead so the bench
        # ALWAYS produces its JSON line.
        import dataclasses

        cfg = dataclasses.replace(
            cfg,
            use_pallas_scorer=False,
            approx_negative_topk=False,
            car_embedding_size=128,
            rnn_units=64,
            matching_layer_sizes=(64, 32, 16),
            negative_samples=10,
            negative_sample_from_buffer=300,
            recent_clicks_buffer_max_size=2048,
            recent_clicks_for_normalization=512,
        )

    corpus = make_synthetic_corpus(article_schema, ace_dim=250)
    metadata = {k: jnp.asarray(v) for k, v in corpus.metadata.items()}
    ace = jnp.asarray(corpus.ace_matrix)

    batches = []
    for h in range(2):
        sessions = synthetic_hour_sessions(
            corpus, session_schema, h, 2 * cfg.batch_size,
            cfg.max_session_length,
            length_distribution="g1" if g1_lengths else "uniform",
        )
        for b in batches_from_sessions(
            sessions, session_schema, cfg.batch_size, cfg.max_session_length
        ):
            batches.append({k: jnp.asarray(v) for k, v in b.items()})

    # Valid-row compaction: run the candidate-scoring chain over only the
    # valid (session, step) rows.  The capacity is computed from the
    # materialized batches (max per-batch valid-click count, rounded up to
    # the scorer tile) so no clicks are ever dropped; at this synthetic
    # session-length distribution ~45% of the grid is padding (real G1
    # sessions average 2-4 clicks — far more).
    if not cpu_fallback:
        import dataclasses

        from chameleon_recsys_tpu.train.steps import (
            round_up_to_scorer_tile,
            valid_click_mask,
        )

        max_valid = max(
            int(valid_click_mask(
                b["session_size"], b["item_clicked"].shape[1], xp=np
            ).sum())
            for b in batches
        )
        # round to 128 rows (not just the kernel's 8-row tile): the nicer
        # multiple removes XLA pad/slice pairs around the scorer/gather at
        # [cap*K, C] scale — measured +1.7% (17.52 → 17.23 ms)
        cap = min(round_up_to_scorer_tile(max_valid, tile=128),
                  batches[0]["item_clicked"].shape[0]
                  * batches[0]["item_clicked"].shape[1])
        cfg = dataclasses.replace(cfg, train_valid_row_capacity=cap)

    def _build_and_warm(cfg):
        """Compile + warm the train step (np.asarray is a host fetch —
        unlike block_until_ready it is guaranteed to wait for execution
        even on remote-dispatch backends)."""
        programs = build_nar_train(cfg, session_schema, article_schema)
        _, _, state = nar_init_state(
            cfg, session_schema, article_schema, batches[0], ace, metadata
        )
        for b in batches[:2]:
            state, metrics = programs.train_step(state, b, ace, metadata)
        np.asarray(metrics["loss"])
        return programs, state

    # The warmup is where kernel compiles can fail (Mosaic lowering /
    # scoped-VMEM are only checked on the real chip — round 2's bench died
    # here).  On ANY failure of the fused-scorer program, degrade to the
    # XLA scorer and flag it in the JSON: the bench must always emit its
    # line, never a stack trace.
    # "ok" only when the model's OWN fused gate will actually route to the
    # kernel (3 matching layers + scored-row count divisible by the tile) —
    # a silently-gated-off kernel must not be reported as the measured
    # config (models/nar.py fused_scorer gate).
    scored_rows = cfg.train_valid_row_capacity or (
        cfg.batch_size * (cfg.max_session_length - 1)
    )
    fused_gate = (
        len(cfg.matching_layer_sizes) == 3 and scored_rows % 8 == 0
    )
    if not cfg.use_pallas_scorer:
        fused_note = "off"
    elif fused_gate:
        fused_note = "ok"
    else:
        fused_note = (
            f"gated-off: rows={scored_rows} "
            f"layers={len(cfg.matching_layer_sizes)}"
        )
    try:
        programs, state = _build_and_warm(cfg)
    except Exception as e:  # noqa: BLE001 — any compile/execute error
        if not cfg.use_pallas_scorer:
            raise
        import dataclasses

        reason = " ".join(str(e).split())[:300]
        fused_note = f"failed: {reason}"
        print(f"# fused scorer failed, falling back to XLA scorer: {reason}",
              file=sys.stderr)
        cfg = dataclasses.replace(cfg, use_pallas_scorer=False)
        programs, state = _build_and_warm(cfg)

    n_steps = 10 if cpu_fallback else 30
    t0 = time.perf_counter()
    for i in range(n_steps):
        state, metrics = programs.train_step(
            state, batches[i % len(batches)], ace, metadata
        )
    np.asarray(metrics["loss"])
    elapsed = time.perf_counter() - t0
    wall_step = elapsed / n_steps

    # ground truth: device-side step time from a profiler trace (wall clock
    # through the tunneled dev backend measures RPC latency, not the chip)
    n_trace = 0 if cpu_fallback else 10
    trace_state = state

    def _run_traced():
        s = trace_state
        for i in range(n_trace):
            s, m = programs.train_step(s, batches[i % len(batches)], ace, metadata)
        np.asarray(m["loss"])

    device_step = _traced_step_seconds(_run_traced, n_trace) if n_trace else 0.0
    if device_step:
        step_time_s = device_step
        timing_source = "device_trace"
    else:
        step_time_s = wall_step
        timing_source = "wall_clock"

    sessions_per_sec = cfg.batch_size / step_time_s
    result = {
        "metric": "nar_train_sessions_per_sec_per_chip",
        "value": round(sessions_per_sec, 1),
        "unit": "sessions/s",
        "vs_baseline": round(
            sessions_per_sec / NOMINAL_TF1_K80_SESSIONS_PER_SEC, 2
        ),
        "timing_source": timing_source,
        "wall_clock_sessions_per_sec": round(cfg.batch_size / wall_step, 1),
        "platform": platform_note,
        "fused_scorer": fused_note,
    }
    # MFU: XLA's FLOP count for the whole step ÷ measured step time ÷ the
    # chip's bf16 peak.  This step is embedding/sort/state-update heavy, so
    # MFU is intrinsically far below transformer-style figures — it tracks
    # how much of each step the MXU pipelines are actually busy.
    if cpu_fallback:
        result["note"] = (
            "no device backend (unreachable TPU or CPU-only host) — "
            "reduced-config CPU fallback; NOT comparable to the G1-scale "
            "TPU figure (see BENCH history)"
        )
        print(json.dumps(result))
        return
    flops = _step_flops(programs.train_step, state, batches[0], ace, metadata)
    peak = _peak_flops(jax.devices()[0])
    if flops:
        result["model_tflops_per_step"] = round(flops / 1e12, 3)
        result["step_time_ms"] = round(step_time_s * 1e3, 2)
    if flops and peak:
        result["mfu"] = round(flops / step_time_s / peak, 4)
    print(json.dumps(result))


def eval_main(g1_lengths: bool = False):
    """--eval: eval-hour throughput (sessions/s) through the FULL production
    eval tier at G1 scale — jitted eval_step + streaming metrics (17 classes)
    + all six classical baselines' train/evaluate + cold-start bookkeeping —
    i.e. everything `TemporalHarness.evaluate_hour` does per hour.

    The reference's eval hour was dominated by per-click Python loops in the
    baselines; this measures the batched replacements end-to-end.  Wall clock
    is the right meter here (the tier is host+device mixed and the host work
    overlaps nothing), so the number is conservative on the tunneled dev
    backend where every device dispatch pays RPC latency.
    """
    import tempfile

    platform_note = _backend_or_cpu_fallback()
    if platform_note.startswith("cpu"):
        # covers both the unreachable-probe marker AND a silent JAX fallback
        # to the CPU backend (e.g. missing libtpu) — either way the G1-scale
        # eval tier on host CPU is a >40-minute hang, not a benchmark
        print(json.dumps({
            "metric": "nar_eval_sessions_per_sec", "value": 0.0,
            "unit": "sessions/s", "vs_baseline": 0.0,
            "note": "no device backend — eval bench needs one",
        }))
        return

    import jax

    from chameleon_recsys_tpu.utils.jax_cache import (
        enable_persistent_compile_cache,
    )

    enable_persistent_compile_cache()

    from chameleon_recsys_tpu.baselines.content_based import (
        ContentBasedRecommender,
    )
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
    from chameleon_recsys_tpu.baselines.session_knn import (
        SessionBasedKNNRecommender,
    )
    from chameleon_recsys_tpu.config import RunConfig
    from chameleon_recsys_tpu.data.synthetic import (
        make_synthetic_corpus,
        synthetic_hour_sessions,
    )
    from chameleon_recsys_tpu.train.temporal import BenchmarkSpec, TemporalHarness

    cfg, session_schema, article_schema = _g1_setup()
    corpus = make_synthetic_corpus(article_schema, ace_dim=250)
    sessions_per_hour = 4 * cfg.batch_size

    # the G1 benchmark set and parameters (cli/nar_trainer_gcom.py)
    benchmarks = [
        BenchmarkSpec(RecentlyPopularRecommender, {}),
        BenchmarkSpec(ItemCooccurrenceRecommender, {}),
        BenchmarkSpec(ItemKNNRecommender, {"reg_lambda": 20, "alpha": 0.75}),
        BenchmarkSpec(
            SessionBasedKNNRecommender,
            {
                "sessions_buffer_size": 3000,
                "candidate_sessions_sample_size": 1000,
                "sampling_strategy": "recent",
                "nearest_neighbor_session_for_scoring": 500,
                "similarity": "cosine",
                "first_session_clicks_decay": "div",
            },
        ),
        BenchmarkSpec(
            ContentBasedRecommender,
            {"content_article_embeddings_matrix": corpus.ace_matrix},
        ),
        BenchmarkSpec(
            SequentialRulesRecommender,
            {"max_clicks_dist": 10, "dist_between_clicks_decay": "div"},
        ),
    ]
    harness = TemporalHarness(
        cfg,
        RunConfig(model_dir=tempfile.mkdtemp(prefix="chameleon_evalbench_")),
        session_schema,
        article_schema,
        corpus.ace_matrix,
        corpus.metadata,
        benchmarks=benchmarks,
        eval_cold_start=True,
    )

    def hour(h):
        return synthetic_hour_sessions(
            corpus, session_schema, h, sessions_per_hour,
            cfg.max_session_length,
            length_distribution="g1" if g1_lengths else "uniform",
        )

    # two training hours: compile both programs, fill buffers + baseline state
    harness.train_hour(hour(0))
    harness.train_hour(hour(1))
    harness.evaluate_hour(hour(2))  # warm the eval tier (metric set caches)

    t0 = time.perf_counter()
    row = harness.evaluate_hour(hour(3))
    elapsed = time.perf_counter() - t0
    phases = dict(harness.last_eval_phase_seconds)

    # On the tunneled dev backend the "device" phase is dominated by RPC
    # transfer of the eval fetches (MBs/batch over a slow link), which no
    # real deployment pays — there device→host is PCIe and the dispatch
    # overlaps host work.  The headline number therefore excludes transport:
    # host metric tier + the eval_step's device time (from the same
    # device-trace methodology as the train bench).  Wall clock is reported
    # alongside.
    host_seconds = sum(v for k, v in phases.items() if k != "device")
    trace_state = harness.state
    eval_batches = [b for b in harness._batches(hour(3))]

    def _run_traced():
        s = trace_state
        for b in eval_batches:
            s, m, f = harness.programs.eval_step(
                s, harness._put_batch(b), harness.ace_matrix, harness.metadata
            )
        np.asarray(m["hit_sum"])

    device_eval_seconds = _traced_step_seconds(_run_traced, 1)
    effective = host_seconds + device_eval_seconds
    sessions = int(row["sessions_count"])
    sessions_per_sec = sessions / effective if effective else sessions / elapsed

    # The reference never measured eval throughput either; its eval hour ran
    # the same per-click Python predict loops we replaced, so reuse the
    # nominal-TF1 floor for vs_baseline comparability with the train metric.
    print(
        json.dumps(
            {
                "metric": "nar_eval_sessions_per_sec",
                "value": round(sessions_per_sec, 1),
                "unit": "sessions/s",
                "vs_baseline": round(
                    sessions_per_sec / NOMINAL_TF1_K80_SESSIONS_PER_SEC, 2
                ),
                "timing_source": "host_phases+device_trace",
                "eval_hour_wall_seconds": round(elapsed, 2),
                "device_eval_step_seconds": round(device_eval_seconds, 3),
                "phase_seconds": {k: round(v, 3) for k, v in phases.items()},
                "sessions": sessions,
                "benchmarks": len(benchmarks),
                "length_distribution": "g1" if g1_lengths else "uniform",
            }
        )
    )


def acr_main(batch_size: int = 64):
    """--acr: ACR module training/inference throughput on the chip.

    The reference never measured the ACR module either; its configs are
    the G1/Adressa reproduction sets (README.md:114-141): CNN classifier
    (300-token texts, filters 3/4/5 x 128, ACE 250, category softmax) and
    the GRU-SDAE autoencoder, both over a 100k x 300 word-embedding
    matrix.  Reports device-trace step time + articles/s for both tasks
    plus ACE-inference throughput for the classifier.
    """
    platform_note = _backend_or_cpu_fallback()
    if platform_note.startswith("cpu"):
        print(json.dumps({
            "metric": "acr_train_articles_per_sec", "value": 0.0,
            "unit": "articles/s", "vs_baseline": 0.0,
            "note": "no device backend — acr bench needs one",
        }))
        return

    import jax
    import jax.numpy as jnp

    from chameleon_recsys_tpu.utils.jax_cache import (
        enable_persistent_compile_cache,
    )

    enable_persistent_compile_cache()

    from chameleon_recsys_tpu.acr.trainer import ACRTrainer
    from chameleon_recsys_tpu.config import ACRConfig
    from chameleon_recsys_tpu.models.acr import ACRLabelSpec

    VOCAB, DIM, LEN, N_CLASSES, BS = 100_000, 300, 300, 461, batch_size
    rng = np.random.RandomState(0)
    word_emb = (rng.randn(VOCAB, DIM) * 0.1).astype(np.float32)

    def make_batch():
        return {
            "text": rng.randint(1, VOCAB, size=(BS, LEN)).astype(np.int32),
            "text_length": rng.randint(40, LEN + 1, size=BS).astype(np.int32),
            "category_id": rng.randint(1, N_CLASSES, size=BS).astype(np.int32),
        }

    result = {
        "metric": "acr_train_articles_per_sec",
        "unit": "articles/s",
        "timing_source": "device_trace",
        "batch_size": BS,
        "config": f"{LEN} tokens, vocab {VOCAB}x{DIM}, ace 250",
    }
    for task, extractor, key in (
        ("metadata_classification", "CNN", "cnn_classifier"),
        ("metadata_classification", "GRU", "gru_classifier"),
        ("autoencoder", "GRU", "gru_sdae"),
    ):
        cfg = ACRConfig(
            training_task=task,
            text_feature_extractor=extractor,
            vocab_size=VOCAB,
            word_embedding_size=DIM,
            truncate_tokens_length=LEN,
            batch_size=BS,
            dropout_keep_prob=1.0,
            autoencoder_noise=0.2 if task == "autoencoder" else 0.0,
        )
        specs = (
            (ACRLabelSpec("category_id", N_CLASSES, "multiclass"),)
            if task == "metadata_classification" else ()
        )
        trainer = ACRTrainer(cfg, word_emb, specs)
        batch = make_batch()
        trainer.init(batch)
        jb = {k: jnp.asarray(v) for k, v in batch.items()}
        key0 = jax.random.PRNGKey(0)
        params, opt_state, loss, _ = trainer._train_step(
            trainer.params, trainer.opt_state, jb, key0, None
        )
        jax.block_until_ready(loss)
        n_steps = 10

        def run_train(params=params, opt_state=opt_state):
            p, o = params, opt_state
            l = None
            for i in range(n_steps):
                p, o, l, _ = trainer._train_step(
                    p, o, jb, jax.random.fold_in(key0, i), None
                )
            np.asarray(l)

        step_s = _traced_step_seconds(run_train, n_steps)
        result[f"{key}_step_ms"] = round(step_s * 1e3, 3)
        result[f"{key}_articles_per_sec"] = round(BS / step_s, 1)
        if key == "cnn_classifier":
            ace = trainer._predict_ace(params, jb)
            jax.block_until_ready(ace)

            def run_pred():
                out = None
                for _ in range(n_steps):
                    out = trainer._predict_ace(params, jb)
                np.asarray(out)

            pred_s = _traced_step_seconds(run_pred, n_steps)
            result["cnn_infer_articles_per_sec"] = round(BS / pred_s, 1)

    result["value"] = result["cnn_classifier_articles_per_sec"]
    # vs_baseline: the same nominal TF1-K80 floor used by the other modes
    # has no ACR twin; the reference logs no ACR timing at all.  Report the
    # ratio against a 1,000 articles/s nominal figure for comparability.
    result["vs_baseline"] = round(result["value"] / 1000.0, 2)
    print(json.dumps(result))


def serve_main():
    """--serve: production recommendation latency at G1 scale.

    The reference has NO serving path at all — it stops at offline eval —
    so this measures a net-new capability: ``NARServer.recommend`` (full
    jitted scoring over a 500-item live candidate pool, top-10) for online
    batch sizes 1 and 32.  Latency percentiles come from per-call device
    timeline durations (wall clock through the tunneled dev backend measures
    RPC dispatch, which no real deployment pays).  ``vs_baseline`` compares
    the batch-1 p99 against a 50 ms online-serving budget (a typical news
    recsys SLA) — >1 means fits the budget with room.
    """
    platform_note = _backend_or_cpu_fallback()
    if platform_note.startswith("cpu"):
        # see eval_main: a silent CPU fallback must not run the G1-scale
        # program on host CPU
        print(json.dumps({
            "metric": "nar_serve_p99_latency_ms_b1", "value": 0.0,
            "unit": "ms", "vs_baseline": 0.0,
            "note": "no device backend — serve bench needs one",
        }))
        return

    import jax

    from chameleon_recsys_tpu.utils.jax_cache import (
        enable_persistent_compile_cache,
    )

    enable_persistent_compile_cache()

    import jax.numpy as jnp

    from chameleon_recsys_tpu.data.collate import batches_from_sessions
    from chameleon_recsys_tpu.data.synthetic import (
        make_synthetic_corpus,
        synthetic_hour_sessions,
    )
    from chameleon_recsys_tpu.serve import NARServer
    from chameleon_recsys_tpu.train.steps import build_nar_train, nar_init_state
    from chameleon_recsys_tpu.utils.profiling import device_call_times_ms

    cfg, session_schema, article_schema = _g1_setup()
    corpus = make_synthetic_corpus(article_schema, ace_dim=250)
    metadata = {k: jnp.asarray(v) for k, v in corpus.metadata.items()}
    ace = jnp.asarray(corpus.ace_matrix)

    sessions = synthetic_hour_sessions(
        corpus, session_schema, 0, 2 * cfg.batch_size, cfg.max_session_length
    )
    batches = [
        {k: jnp.asarray(v) for k, v in b.items()}
        for b in batches_from_sessions(
            sessions, session_schema, cfg.batch_size, cfg.max_session_length
        )
    ]
    programs = build_nar_train(cfg, session_schema, article_schema)
    _, _, state = nar_init_state(
        cfg, session_schema, article_schema, batches[0], ace, metadata
    )
    # a couple of train steps: realistic params + a populated live buffer
    for b in batches[:2]:
        state, m = programs.train_step(state, b, ace, metadata)
    np.asarray(m["loss"])

    server = NARServer(
        cfg, session_schema, article_schema, state.params, state.stream,
        ace, corpus.metadata,
    )
    pool = server.default_candidates(500)

    result = {
        "metric": "nar_serve_p99_latency_ms_b1",
        "unit": "ms",
        "timing_source": "device_trace",
        "candidates": 500,
        "top_k": 10,
    }
    for bs in (1, 32):
        serve_sessions = sessions[:bs]
        cand = np.broadcast_to(pool, (bs, len(pool))).copy()

        # the PUBLIC entry point end-to-end; the device timeline isolates the
        # scoring program, so host collation inside recommend() does not
        # pollute the latency percentiles
        def call():
            return server.recommend(serve_sessions, candidates=cand, top_k=10)

        times = device_call_times_ms(call, (), iters=60)
        if not times:
            t0 = time.perf_counter()
            for _ in range(20):
                ids, scores = call()
            times = [(time.perf_counter() - t0) / 20 * 1e3]
            result["timing_source"] = "wall_clock"
        times = sorted(times)
        p50 = times[len(times) // 2]
        p99 = times[min(len(times) - 1, int(len(times) * 0.99))]
        result[f"b{bs}_p50_ms"] = round(p50, 3)
        result[f"b{bs}_p99_ms"] = round(p99, 3)
        if bs == 1:
            result["value"] = round(p99, 3)
            result["vs_baseline"] = round(50.0 / p99, 2)
        else:
            result[f"b{bs}_sessions_per_sec"] = round(bs / (p50 / 1e3), 1)
    print(json.dumps(result))


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--scaling", action="store_true",
        help="weak-scaling benchmark at 1/2/4/8 devices instead of the "
        "single-chip G1-scale throughput run",
    )
    parser.add_argument(
        "--eval", action="store_true",
        help="eval-hour throughput (jitted eval_step + streaming metrics + "
        "all six classical baselines) instead of train throughput",
    )
    parser.add_argument(
        "--serve", action="store_true",
        help="online recommendation latency (NARServer.recommend) at G1 "
        "scale instead of train throughput",
    )
    parser.add_argument(
        "--acr", action="store_true",
        help="ACR module throughput (CNN classifier + GRU-SDAE at the "
        "reference config, 100k-vocab embeddings) instead of NAR train",
    )
    parser.add_argument(
        "--acr_batch", type=int, default=64,
        help="batch size for --acr (reference local config is 8-64; TPU "
        "amortizes the SDAE's 600-step recurrence with bigger batches)",
    )
    parser.add_argument(
        "--g1_lengths", action="store_true",
        help="draw session lengths from the real G1 distribution (mean "
        "~2.9 clicks) instead of the historical uniform 2..20 synthetic "
        "default; the default stays uniform so BENCH_r* rounds compare",
    )
    _args = parser.parse_args()
    if _args.scaling:
        scaling_main()
    elif _args.eval:
        eval_main(g1_lengths=_args.g1_lengths)
    elif _args.serve:
        serve_main()
    elif _args.acr:
        acr_main(batch_size=_args.acr_batch)
    else:
        main(g1_lengths=_args.g1_lengths)
