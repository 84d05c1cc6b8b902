"""Streaming temporal train/eval harness.

The reference's primary entry point (nar_trainer_gcom.py:505-525): train on
hour chunks ``t..t+n``, evaluate on hour ``t+n+1``, repeat, with the
streaming state checkpointed around every eval so evaluation never pollutes
training-time popularity/recency (nar_model.py:1410-1415, 1691-1693).

Improvements over the reference (SURVEY.md §5.3 caveat): checkpoint/resume
persists the FULL unit — params, optimizer, device stream state, RNG, hour
cursor and metrics log — so a restart resumes the stream exactly where it
left off instead of silently resetting popularity state.
"""
from __future__ import annotations

import logging
import os
import time
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass, field
from pathlib import Path
from typing import Callable, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..baselines.benchmarks import BenchmarkRecommender, StreamStateView
from ..config import ArticleFeaturesSchema, NARConfig, RunConfig, SessionFeaturesSchema
from ..data.collate import Session, batches_from_sessions
from ..metrics.evaluation import (
    ColdStartAnalysisState,
    compute_metrics_results,
    create_eval_metrics,
    update_metrics,
)
from ..state.host_state import HostState
from ..utils.io import append_json_lines, save_eval_benchmark_metrics_csv, serialize
from ..utils.profiling import ThroughputMeter
from .steps import NARTrainState, build_nar_train, nar_init_state

log = logging.getLogger("chameleon_tpu.temporal")


def _local_rows(x) -> np.ndarray:
    """Host-local rows of a (possibly multi-host global) jax array."""
    if getattr(x, "is_fully_addressable", True):
        return np.asarray(x)
    shards = sorted(
        x.addressable_shards, key=lambda s: s.index[0].start or 0
    )
    return np.concatenate([np.asarray(s.data) for s in shards], axis=0)


@dataclass
class BenchmarkSpec:
    recommender: type
    params: dict = field(default_factory=dict)


@dataclass
class HarnessArtifacts:
    eval_sessions_metrics_log: List[Dict] = field(default_factory=list)
    sessions_negative_items_log: Optional[List[Dict]] = None
    sessions_chameleon_recommendations_log: Optional[List[Dict]] = None


class TemporalHarness:
    """Drives the jitted NAR programs over an hour-indexed session source.

    ``hour_source(hour) -> List[Session]`` abstracts the per-hour data files
    (one gzipped TFRecord per hour in the reference, datasets.py:166-178).
    """

    def __init__(
        self,
        cfg: NARConfig,
        run_cfg: RunConfig,
        session_schema: SessionFeaturesSchema,
        article_schema: ArticleFeaturesSchema,
        ace_matrix,
        metadata,
        benchmarks: Sequence[BenchmarkSpec] = (),
        log_negative_samples: bool = False,
        log_recommendations: bool = False,
        eval_metrics_by_session_position: bool = False,
        eval_cold_start: bool = False,
        artifact_store=None,
        artifact_remote_path: str = "",
        mesh_plan=None,
        mesh_min_rows: int = 4096,
        benchmark_workers: Optional[int] = None,
        save_scalars: bool = False,
        save_histograms: bool = False,
        histograms_every_n_hours: int = 1,
    ):
        # Remote artifact sync seam (reference GCS workflow shape,
        # gcs_utils.py:22-109): every export also uploads model_dir to the
        # store.  None = plain local files only.
        self.artifact_store = artifact_store
        self.artifact_remote_path = artifact_remote_path
        # Multi-chip production path: with a MeshPlan, train/eval steps are
        # re-jitted with explicit (data × model) shardings
        # (parallel/sharded.py) and batches are placed data-parallel.
        self.mesh_plan = mesh_plan
        self.mesh_min_rows = mesh_min_rows
        self._sharded = None
        if mesh_plan is not None and cfg.batch_size % mesh_plan.data_parallelism:
            raise ValueError(
                f"batch_size {cfg.batch_size} not divisible by "
                f"data_parallelism {mesh_plan.data_parallelism}"
            )
        self.cfg = cfg
        self.run_cfg = run_cfg
        self.session_schema = session_schema
        self.article_schema = article_schema
        self.ace_matrix = jnp.asarray(ace_matrix)
        self.ace_matrix_np = np.asarray(ace_matrix)
        self.metadata = {k: jnp.asarray(v) for k, v in dict(metadata).items()}
        # Full [B, T, 1+K] ranking (+ probs) fetched only when per-session
        # recommendation logs need it; otherwise top-N ids suffice for the
        # whole host metric tier and transfers shrink ~2 MB/batch.
        self.programs = build_nar_train(
            cfg,
            session_schema,
            article_schema,
            fetch_full_ranking=log_recommendations,
        )
        self.state: Optional[NARTrainState] = None
        self.host_state = HostState(article_schema.num_items)
        self.eval_cold_start = eval_cold_start
        self.cold_start_state = ColdStartAnalysisState()
        self.last_eval_phase_seconds: Dict[str, float] = {}
        self.eval_metrics_by_session_position = eval_metrics_by_session_position

        self.artifacts = HarnessArtifacts(
            sessions_negative_items_log=[] if log_negative_samples else None,
            sessions_chameleon_recommendations_log=(
                [] if log_recommendations else None
            ),
        )

        self._state_view = StreamStateView(
            self.host_state,
            np.zeros(cfg.recent_clicks_buffer_max_size, np.int32),
            np.full(
                article_schema.num_items,
                1.0 / cfg.recent_clicks_for_normalization,
                np.float32,
            ),
            np.zeros(article_schema.num_items, np.int64),
        )
        self.bench_classifiers: List[BenchmarkRecommender] = [
            spec.recommender(
                self._state_view,
                dict(spec.params),
                self._new_metric_set(),
            )
            for spec in benchmarks
        ]
        if eval_cold_start:
            for clf in self.bench_classifiers:
                clf.cold_start_state = ColdStartAnalysisState()
        # Parallel benchmark tier: each classical baseline's train/evaluate is
        # independent per batch (own metric set, own benchmarks_states slot,
        # read-only StreamStateView/co-occurrence), and the heavy work is
        # numpy (GIL-released), so the per-classifier loops run on a thread
        # pool.  Outputs are bit-identical to the serial order — no baseline
        # reads another's state.  ``benchmark_workers``: None = auto (one
        # thread per classifier, capped at cpu_count); 0/1 = serial.
        # Exception: a classifier drawing from the process-global Python RNG
        # (SkNN sampling_strategy='random') is order-sensitive across
        # threads, so auto falls back to serial for determinism.
        uses_global_rng = any(
            getattr(c, "sampling_strategy", "") == "random"
            for c in self.bench_classifiers
        )
        if benchmark_workers is None:
            benchmark_workers = (
                0
                if uses_global_rng
                else min(len(self.bench_classifiers), os.cpu_count() or 1)
            )
        self._bench_pool = (
            ThreadPoolExecutor(
                max_workers=benchmark_workers, thread_name_prefix="bench"
            )
            if benchmark_workers > 1 and len(self.bench_classifiers) > 1
            else None
        )
        if self._bench_pool is not None:
            # release the worker threads when the harness is collected (a
            # sweep builds one harness per trial)
            import weakref

            weakref.finalize(self, self._bench_pool.shutdown, False)
        # Per-step observability channel (reference TensorBoard scalars /
        # --save_histograms twin, nar_trainer_gcom.py:54): JSONL sinks under
        # model_dir, flushed per hour so no step ever syncs the device.
        self.scalar_writer = None
        self.histogram_writer = None
        self.histograms_every_n_hours = max(1, histograms_every_n_hours)
        if save_scalars:
            from ..utils.summary import ScalarWriter

            self.scalar_writer = ScalarWriter(run_cfg.model_dir)
        if save_histograms:
            from ..utils.summary import HistogramWriter

            self.histogram_writer = HistogramWriter(run_cfg.model_dir)
        self.hours_trained = 0
        # Count of completed chunk evals — checkpointed so a resume from a
        # checkpoint taken between a chunk's train and its eval re-runs that
        # eval instead of silently thinning the eval CSV.
        self.evals_done = 0
        self.train_meter = ThroughputMeter("train")
        self.eval_meter = ThroughputMeter("eval")

    # ------------------------------------------------------------------
    def _each_benchmark(self, fn):
        """Apply ``fn`` to every benchmark classifier, on the thread pool
        when one is configured.  ``list()`` re-raises worker exceptions."""
        if self._bench_pool is None:
            for clf in self.bench_classifiers:
                fn(clf)
        else:
            list(self._bench_pool.map(fn, self.bench_classifiers))

    def _new_metric_set(self):
        return create_eval_metrics(
            self.cfg.metrics_top_n,
            self.cfg.eval_negative_sample_relevance,
            self.eval_metrics_by_session_position,
            self.ace_matrix_np,
            self._state_view.get_recent_clicks_buffer(),
        )

    def _refresh_state_view(self, arrays=None):
        # one device_get batches the three device->host copies (they start
        # async and overlap); three serial np.asarray calls each paid a
        # full dispatch round-trip.  ``arrays`` overrides the source with a
        # per-batch capture — the pipelined eval loop dispatches the next
        # device step before host-processing this batch, so by then
        # self.state.stream is already one step ahead.
        if arrays is None:
            arrays = (
                self.state.stream.buffer_ids,
                self.state.stream.recent_pop_norm,
                self.state.stream.global_pop,
            )
        buf, pop_norm, pop = jax.device_get(arrays)
        self._state_view.refresh(buf, pop_norm, pop)

    def init_from_batch(self, example_batch: Dict[str, np.ndarray]):
        batch = {k: jnp.asarray(v) for k, v in example_batch.items()}
        _, _, self.state = nar_init_state(
            self.cfg,
            self.session_schema,
            self.article_schema,
            batch,
            self.ace_matrix,
            self.metadata,
            seed=self.run_cfg.random_seed,
        )
        self._install_mesh(example_batch)

    def _install_mesh(self, example_batch):
        """Build the sharded step programs and move state/aux onto the mesh."""
        if self.mesh_plan is None or self._sharded is not None:
            return
        from ..parallel.sharded import shard_nar_programs

        pc = jax.process_count()

        def global_struct(v):
            a = np.asarray(v)
            # each process collates 1/pc of the global batch rows
            return jax.ShapeDtypeStruct((a.shape[0] * pc,) + a.shape[1:], a.dtype)

        example = {k: global_struct(v) for k, v in example_batch.items()}
        self._sharded = shard_nar_programs(
            self.programs,
            self.mesh_plan,
            self.state,
            example,
            self.ace_matrix,
            self.metadata,
            min_rows=self.mesh_min_rows,
        )
        self.state = jax.device_put(self.state, self._sharded.state_sharding)
        self.ace_matrix = jax.device_put(
            self.ace_matrix, self._sharded.ace_sharding
        )
        self.metadata = jax.device_put(
            self.metadata, self._sharded.metadata_sharding
        )

    @property
    def _train_step(self):
        return (
            self._sharded.train_step if self._sharded else self.programs.train_step
        )

    @property
    def _eval_step(self):
        return (
            self._sharded.eval_step if self._sharded else self.programs.eval_step
        )

    def _put_batch(self, np_batch):
        if self._sharded is None:
            return {k: jnp.asarray(v) for k, v in np_batch.items()}
        from ..parallel.sharded import put_batch

        return put_batch(self._sharded, np_batch)

    def _batches(self, source):
        """Batch iterator over an hour's data.  ``source`` is either a
        Session sequence (Python collation) or any object exposing
        ``batches(batch_size, max_session_length)`` — e.g. the C++
        NativeSessionLoader (native/loader.py), which parses and collates
        TFRecords off the Python heap entirely."""
        batch_size = self.cfg.batch_size
        if self.mesh_plan is not None and jax.process_count() > 1:
            # each host collates its round-robin session shard into its
            # rows of the global batch (parallel/distributed.py)
            batch_size //= jax.process_count()
            if not hasattr(source, "batches"):
                from ..parallel.distributed import shard_sessions_for_process

                source = shard_sessions_for_process(source)
        if hasattr(source, "batches"):
            return source.batches(batch_size, self.cfg.max_session_length)
        return batches_from_sessions(
            source,
            self.session_schema,
            batch_size,
            self.cfg.max_session_length,
        )

    # ------------------------------------------------------------------
    def _ensure_initialized(self, sessions: Sequence[Session]):
        if self.state is None:
            self.init_from_batch(next(iter(self._batches(sessions))))

    def train_hour(self, sessions: Sequence[Session]) -> Dict[str, float]:
        self._ensure_initialized(sessions)
        n_steps, losses = 0, []
        pending_scalars = []  # (step, device metrics) — flushed per hour
        self.train_meter.start()
        for np_batch in self._batches(sessions):
            batch = self._put_batch(np_batch)
            self.state, metrics = self._train_step(
                self.state, batch, self.ace_matrix, self.metadata
            )
            # keep the device scalar — converting here would sync every step
            losses.append(metrics["ce_loss"])
            if self.scalar_writer is not None:
                pending_scalars.append(
                    (int(self.host_state.current_step) + 1, metrics)
                )
            n_steps += 1
            self.train_meter.stop(
                1, int((np_batch["session_size"] > 0).sum()), 0
            )
            # Host-side structures learn from train batches too
            # (reference nar_model.py:1628-1650 runs in both modes).
            # First-click tracking is UNCONDITIONAL like the reference hook
            # (nar_model.py:1481-1494): enabling cold-start analysis mid-run
            # (e.g. after a resume) must see correct elapsed-step stats.
            self._register_batch_clicks(np_batch)
            self._train_host_side(np_batch)
            self.train_meter.start()
        self.train_meter.stop(0)
        self.hours_trained += 1
        if self.scalar_writer is not None and pending_scalars:
            # One batched transfer for the whole hour's scalars: float(v)
            # per metric per step is a blocking fetch each on a
            # remote-dispatch backend (same rationale as
            # _refresh_state_view's batched device_get).
            fetched = jax.device_get([m for _, m in pending_scalars])
            for (step, _), m in zip(pending_scalars, fetched):
                self.scalar_writer.write(
                    step, {k: float(v) for k, v in m.items()}
                )
            self.scalar_writer.flush()
        if (
            self.histogram_writer is not None
            and self.hours_trained % self.histograms_every_n_hours == 0
        ):
            self.histogram_writer.write_tree(
                int(self.host_state.current_step), self.state.params,
                prefix="params/",
            )
        avg_loss = float(np.mean([float(x) for x in losses])) if losses else 0.0
        return {"steps": n_steps, "avg_ce_loss": avg_loss}

    def _register_batch_clicks(self, np_batch):
        """Step counter + first-click registration (must run BEFORE any
        cold-start recommendation check for this batch, reference
        nar_model.py:1481-1494)."""
        self.host_state.increment_current_step()
        clicked = np_batch["item_clicked"]
        labels = np_batch["label_next_item"]
        nonzero = set(clicked.reshape(-1)) | set(labels.reshape(-1))
        nonzero.discard(0)
        self.host_state.update_items_first_click_step(np.array(sorted(nonzero)))

    def _train_host_side(self, np_batch, force_refresh: bool = False,
                         refresh_arrays=None):
        if not self.bench_classifiers and not self.eval_cold_start:
            if force_refresh:
                self._refresh_state_view(refresh_arrays)
            return
        clicked = np_batch["item_clicked"]
        all_clicked = np.concatenate(
            [clicked, np_batch["label_last_item"]], axis=1
        )
        self.host_state.update_items_coocurrences(all_clicked)
        if force_refresh:
            self._refresh_state_view(refresh_arrays)
        # else: train hours — baselines' train() only touches host-side
        # dicts, and every eval consumer refreshes the view first
        # (evaluate_hour pre-loop, checkpoint restore), so the
        # per-train-batch device fetch is skipped entirely
        self._each_benchmark(
            lambda clf: clf.train(
                np_batch["user_id"],
                np_batch["session_id"],
                clicked,
                np_batch["label_next_item"],
            )
        )

    # ------------------------------------------------------------------
    def evaluate_hour(self, sessions: Sequence[Session]) -> Dict[str, float]:
        """Full eval pass over one hour; stream/host state snapshotted and
        restored afterwards (the temporal-protocol guard)."""
        self._ensure_initialized(sessions)
        # Deep-copy the device buffers: eval_step donates its input state, so
        # keeping a reference alone would point at deleted buffers.
        stream_snapshot = jax.tree_util.tree_map(
            lambda x: x.copy(), self.state.stream
        )
        self.host_state.save_state_checkpoint()

        # Metric sets are rebuilt per eval WITH the current buffer snapshot —
        # ItemCoverage seeds its clicked-items set from it, and a stale
        # construction-time buffer would overstate baseline coverage (the
        # reference rebuilds the hook's metrics each Estimator call).
        self._refresh_state_view()
        streaming = self._new_metric_set()
        for clf in self.bench_classifiers:
            clf.streaming_metrics = self._new_metric_set()

        hit_sum = rr_sum = label_count = 0.0
        sessions_count = clicks_count = 0
        t_start = time.time()
        # Per-phase wall accounting, exposed as self.last_eval_phase_seconds.
        # "device" bundles dispatch + device→host fetches — on a
        # remote-dispatch dev backend that is mostly tunnel transfer, so the
        # split lets bench/ops tell host-tier cost from transport artifacts.
        phases = {
            "device": 0.0,
            "chameleon_metrics": 0.0,
            "benchmarks": 0.0,
            "cold_start": 0.0,
            "host_state": 0.0,
        }

        # NOTE on view freshness: the pre-loop refresh above plus the
        # per-batch refresh inside _train_host_side keep self._state_view at
        # "state before the current batch" (before_run semantics,
        # nar_model.py:1434-1470) without an extra device→host sync of the
        # three [num_items] state arrays per eval batch.
        #
        # The loop is a one-step-lookahead pipeline: batch i+1's device step
        # (and host→device batch transfer) is DISPATCHED before batch i's
        # fetches are blocked on, so the device computes ahead of the host
        # metric/benchmark tiers (JAX async dispatch chains the state
        # dependency on-device).  Host processing stays strictly in batch
        # order, so every value — metrics, view contents, benchmark state —
        # is identical to the serial loop's.  The three view arrays are
        # captured per batch (cheap device copies) because the NEXT step
        # donates self.state.stream's buffers.
        def _dispatch(np_batch):
            batch = self._put_batch(np_batch)
            self.state, dev_metrics, fetches = self._eval_step(
                self.state, batch, self.ace_matrix, self.metadata
            )
            st = self.state.stream
            view_refs = (
                st.buffer_ids.copy(),
                st.recent_pop_norm.copy(),
                st.global_pop.copy(),
            )
            # Start the device→host copies NOW: the transfer of this batch's
            # fetches then overlaps its device step and the previous batch's
            # host tiers, instead of serializing inside the blocking
            # device_get (on a remote-dispatch backend the transfer IS the
            # bulk of the eval "device" phase).
            for arr in jax.tree_util.tree_leaves(
                (dev_metrics, fetches, view_refs)
            ):
                try:
                    arr.copy_to_host_async()
                except Exception:
                    pass  # non-addressable multi-host shard / CPU backend
            return np_batch, dev_metrics, fetches, view_refs

        batch_iter = iter(self._batches(sessions))
        pending = None
        while True:
            np_next = next(batch_iter, None)
            if np_next is not None:
                t0 = time.perf_counter()
                current = _dispatch(np_next)
                phases["device"] += time.perf_counter() - t0
            else:
                current = None
            if pending is None:
                if current is None:
                    break
                pending = current
                continue
            np_batch, dev_metrics, fetches, view_refs = pending

            t0 = time.perf_counter()
            hit_sum += float(dev_metrics["hit_sum"])
            rr_sum += float(dev_metrics["rr_sum"])
            label_count += float(dev_metrics["label_count"])
            clicks_count += int(dev_metrics["clicks"])
            sessions_count += int(dev_metrics["sessions"])

            # Multi-host: fetches are global arrays; each process reads back
            # its own addressable rows (matching its np_batch rows) and runs
            # the host-side metric tier on them.  Single-process: plain copy.
            preds = _local_rows(fetches["predicted_ids"])
            probs = (
                _local_rows(fetches["predicted_probs"])
                if "predicted_probs" in fetches
                else None
            )
            labels = _local_rows(fetches["labels"])
            neg_items = _local_rows(fetches["neg_items"])
            clicked = _local_rows(fetches["clicked_items"])
            pop_norm = self._state_view.get_articles_recent_pop_norm()
            phases["device"] += time.perf_counter() - t0

            t0 = time.perf_counter()
            update_metrics(
                preds,
                labels,
                pop_norm[labels],
                pop_norm[preds],
                clicked,
                streaming,
                recommender="chameleon",
            )
            self._log_eval_batch(np_batch, labels, neg_items, preds, probs, pop_norm)
            phases["chameleon_metrics"] += time.perf_counter() - t0

            t0 = time.perf_counter()
            self._each_benchmark(
                lambda clf: clf.evaluate(
                    np_batch["user_id"],
                    clicked,
                    labels,
                    topk=self.cfg.metrics_top_n,
                    eval_negative_items=neg_items,
                )
            )
            phases["benchmarks"] += time.perf_counter() - t0
            # Cold-start bookkeeping runs AFTER this batch's first-click
            # registration (reference order, nar_model.py:1481-1494: items
            # clicked AND recommended in the same batch count with elapsed 0).
            self._register_batch_clicks(np_batch)
            if self.eval_cold_start:
                t0 = time.perf_counter()
                self._update_cold_start(np_batch, labels, neg_items, preds)
                phases["cold_start"] += time.perf_counter() - t0
            # force_refresh: the eval metric tier needs the view advanced to
            # this batch's post-step state even when no benchmarks run.
            # refresh_arrays: self.state.stream is already one device step
            # ahead (pipeline) — the view must see THIS batch's post-step
            # state, captured at dispatch time.
            t0 = time.perf_counter()
            self._train_host_side(
                np_batch, force_refresh=True, refresh_arrays=view_refs
            )
            phases["host_state"] += time.perf_counter() - t0
            pending = current
            if pending is None:
                break
        self.last_eval_phase_seconds = phases

        row: Dict[str, float] = {
            "hitrate_at_n": hit_sum / max(label_count, 1.0),
            "mrr_at_n": rr_sum / max(label_count, 1.0),
        }
        row.update(compute_metrics_results(streaming, recommender="chameleon"))
        for clf in self.bench_classifiers:
            row.update(compute_metrics_results(clf.streaming_metrics, clf.get_clf_suffix()))
        row["clicks_count"] = clicks_count
        row["sessions_count"] = sessions_count
        row.update(self.train_meter.result())  # sessions/sec/chip since start
        if self.eval_cold_start:
            row["coldstart_chameleon"] = self.cold_start_state.get_statistics()
            for clf in self.bench_classifiers:
                row[f"coldstart_{clf.get_clf_suffix()}"] = (
                    clf.cold_start_state.get_statistics()
                )
        self.artifacts.eval_sessions_metrics_log.append(row)
        log.info(
            "eval done in %.1fs: HR@%d=%.4f MRR@%d=%.4f",
            time.time() - t_start,
            self.cfg.metrics_top_n,
            row["hitrate_at_n"],
            self.cfg.metrics_top_n,
            row["mrr_at_n"],
        )

        # restore pre-eval streaming state (train must not see eval's future)
        self.state = self.state._replace(stream=stream_snapshot)
        self.host_state.restore_state_checkpoint()
        self.evals_done += 1
        return row

    def _log_eval_batch(self, np_batch, labels, neg_items, preds, probs, pop_norm):
        neg_log = self.artifacts.sessions_negative_items_log
        if neg_log is not None:
            for sid, sess_labels, sess_negs in zip(
                np_batch["session_id"], labels, neg_items
            ):
                if sid == 0:  # padded batch row, not a session
                    continue
                neg_log.append(
                    {
                        "session_id": str(sid),
                        "negative_items": [
                            negs.tolist()
                            for lab, negs in zip(sess_labels, sess_negs)
                            if lab != 0
                        ],
                    }
                )
        rec_log = self.artifacts.sessions_chameleon_recommendations_log
        if rec_log is not None:
            probs_rounded = probs.round(decimals=7)
            for sid, sess_labels, sess_preds, sess_probs in zip(
                np_batch["session_id"], labels, preds, probs_rounded
            ):
                if sid == 0:  # padded batch row, not a session
                    continue
                pred_pops = pop_norm[sess_preds].round(decimals=7)
                mask = sess_labels != 0
                rec_log.append(
                    {
                        "session_id": str(sid),
                        "next_click_labels": sess_labels[mask].tolist(),
                        "predicted_item_ids": sess_preds[mask].tolist(),
                        "predicted_item_probs": sess_probs[mask].tolist(),
                        "predicted_item_norm_pop": pred_pops[mask].tolist(),
                    }
                )

    def _update_cold_start(self, np_batch, labels, neg_items, preds):
        """Cold-start tracking during eval (reference nar_model.py:1480-1501)."""
        top_n = self.cfg.metrics_top_n
        self.cold_start_state.update_items_num_steps_before_first_rec(
            preds[:, :, :top_n],
            self.host_state.items_first_click_step,
            self.host_state.current_step,
        )
        def one(clf):
            # Reuse this batch's eval predictions (stashed by clf.evaluate,
            # benchmarks.py): same inputs, same state, deterministic
            # classifier → bit-identical to the reference's second predict
            # call (nar_model.py:1496-1501).  Stochastic classifiers (SkNN
            # sampling_strategy='random') recompute like the reference.
            cached = getattr(clf, "_last_eval_preds", None)
            clf._last_eval_preds = None
            if cached is not None and cached[1] == top_n and not clf.is_stochastic():
                bench_preds = cached[0]
            else:
                valid = clf.get_valid_candidate_items(labels, neg_items)
                bench_preds = clf.predict(
                    np_batch["user_id"],
                    np_batch["item_clicked"],
                    valid_items=valid,
                    topk=top_n,
                )
            clf.cold_start_state.update_items_num_steps_before_first_rec(
                bench_preds,
                self.host_state.items_first_click_step,
                self.host_state.current_step,
            )

        self._each_benchmark(one)

    # ------------------------------------------------------------------
    def run(
        self,
        hour_source: Callable[[int], Sequence[Session]],
        hours: Sequence[int],
    ) -> List[Dict]:
        """The outer temporal loop (reference nar_trainer_gcom.py:505-525):
        for each chunk of ``training_hours_for_each_eval`` hours, train on the
        chunk then evaluate on the following hour."""
        chunk = self.run_cfg.training_hours_for_each_eval
        hours = list(hours)
        if self.state is None:
            first_sessions = hour_source(hours[0])
            example = next(iter(self._batches(first_sessions)))
            self.init_from_batch(example)

        # Resume support: skip hours already trained before this call (the
        # checkpoint persists hours_trained — unlike the reference, which
        # always restarts at train_files_from and silently re-trains).
        # Evals are gated on the persisted evals_done cursor, so a checkpoint
        # taken between a chunk's train and its eval re-runs exactly that
        # pending eval on resume (no dropped eval CSV row).
        initial_done = self.hours_trained

        for start in range(0, len(hours), chunk):
            train_hours = hours[start : start + chunk]
            for offset, h in enumerate(train_hours):
                if start + offset < initial_done:
                    continue
                stats = self.train_hour(hour_source(h))
                log.info("hour %d trained: %s", h, stats)
            eval_idx = start + chunk
            if eval_idx < len(hours) and self.evals_done < start // chunk + 1:
                self.evaluate_hour(hour_source(hours[eval_idx]))
            self._maybe_export()
        return self.artifacts.eval_sessions_metrics_log

    def _maybe_export(self):
        n = len(self.artifacts.eval_sessions_metrics_log)
        if n and n % self.run_cfg.save_results_each_n_evals == 0:
            self.export_artifacts()

    def export_artifacts(self):
        out = Path(self.run_cfg.model_dir)
        save_eval_benchmark_metrics_csv(
            self.artifacts.eval_sessions_metrics_log,
            out / "eval_stats_benchmarks.csv",
            self.run_cfg.training_hours_for_each_eval,
        )
        if self.artifacts.sessions_negative_items_log is not None:
            append_json_lines(
                out / "eval_sessions_negative_samples.json",
                self.artifacts.sessions_negative_items_log,
            )
            self.artifacts.sessions_negative_items_log.clear()
        if self.artifacts.sessions_chameleon_recommendations_log is not None:
            append_json_lines(
                out / "eval_chameleon_recommendations_log.json",
                self.artifacts.sessions_chameleon_recommendations_log,
            )
            self.artifacts.sessions_chameleon_recommendations_log.clear()
        if self.artifact_store is not None:
            self.artifact_store.upload_dir(out, self.artifact_remote_path)

    # ------------------------------------------------------------------
    # checkpoint/resume: the full unit, fixing the reference's silent
    # stream-state reset on restart (SURVEY.md §5.3)
    def save_checkpoint(self, path=None):
        path = Path(path or Path(self.run_cfg.model_dir) / "checkpoint.pkl")
        payload = {
            "state": jax.tree_util.tree_map(np.asarray, self.state),
            "hours_trained": self.hours_trained,
            "evals_done": self.evals_done,
            "metrics_log": self.artifacts.eval_sessions_metrics_log,
            "host_cooccurrence": self.host_state.items_coocurrences,
            "host_first_click_step": self.host_state.items_first_click_step,
            "host_current_step": self.host_state.current_step,
            "host_benchmarks_states": self.host_state.benchmarks_states,
        }
        serialize(path, payload)
        return path

    # -- orbax backend: production-grade atomic checkpointing of the device
    # state (async-capable, multi-host-aware), host structures in a pickle
    # sidecar (scipy csr / dicts are not array pytrees)
    def save_checkpoint_orbax(self, dir_path=None):
        import orbax.checkpoint as ocp

        dir_path = Path(
            dir_path or Path(self.run_cfg.model_dir) / "orbax_ckpt"
        ).absolute()
        ckptr = ocp.StandardCheckpointer()
        device_dir = dir_path / "device_state"
        if device_dir.exists():
            import shutil

            shutil.rmtree(device_dir)
        ckptr.save(device_dir, self.state)
        ckptr.wait_until_finished()
        serialize(
            dir_path / "host_state.pkl",
            {
                "hours_trained": self.hours_trained,
                "evals_done": self.evals_done,
                "metrics_log": self.artifacts.eval_sessions_metrics_log,
                "host_cooccurrence": self.host_state.items_coocurrences,
                "host_first_click_step": self.host_state.items_first_click_step,
                "host_current_step": self.host_state.current_step,
                "host_benchmarks_states": self.host_state.benchmarks_states,
            },
        )
        return dir_path

    def load_checkpoint_orbax(self, dir_path):
        """Requires an initialized harness (the abstract state template comes
        from the live pytree)."""
        import orbax.checkpoint as ocp

        from ..utils.io import deserialize

        assert self.state is not None, (
            "initialize the harness (init_from_batch / run one batch) before "
            "restoring an orbax checkpoint"
        )
        dir_path = Path(dir_path).absolute()
        ckptr = ocp.StandardCheckpointer()
        abstract = jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), self.state
        )
        self.state = ckptr.restore(dir_path / "device_state", abstract)
        if self._sharded is not None:
            self.state = jax.device_put(self.state, self._sharded.state_sharding)
        payload = deserialize(dir_path / "host_state.pkl")
        self.hours_trained = payload["hours_trained"]
        self.evals_done = payload.get("evals_done", len(payload["metrics_log"]))
        self.artifacts.eval_sessions_metrics_log = payload["metrics_log"]
        self.host_state.items_coocurrences = payload["host_cooccurrence"]
        self.host_state.items_first_click_step = payload["host_first_click_step"]
        self.host_state.current_step = payload["host_current_step"]
        self.host_state.benchmarks_states = payload.get(
            "host_benchmarks_states", {}
        )
        self._refresh_state_view()

    def load_checkpoint(self, path=None):
        from ..utils.io import deserialize

        path = Path(path or Path(self.run_cfg.model_dir) / "checkpoint.pkl")
        payload = deserialize(path)
        self.state = jax.tree_util.tree_map(jnp.asarray, payload["state"])
        if self._sharded is not None:
            self.state = jax.device_put(self.state, self._sharded.state_sharding)
        self.hours_trained = payload["hours_trained"]
        self.evals_done = payload.get("evals_done", len(payload["metrics_log"]))
        self.artifacts.eval_sessions_metrics_log = payload["metrics_log"]
        self.host_state.items_coocurrences = payload["host_cooccurrence"]
        self.host_state.items_first_click_step = payload["host_first_click_step"]
        self.host_state.current_step = payload["host_current_step"]
        self.host_state.benchmarks_states = payload.get("host_benchmarks_states", {})
        self._refresh_state_view()
