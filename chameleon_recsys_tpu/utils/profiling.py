"""Observability: step timing and XLA profiling.

The reference's observability is TensorBoard summaries plus a default-off
ProfilerHook (acr_trainer_adressa.py:191-197) and ad-hoc elapsed-time logs
(utils.py:37-39).  Here the first-class counters are throughput-oriented —
steps/sec, sessions/sec/chip, clicks/sec — because throughput is part of the
framework's north-star metric, and profiling uses the JAX/XLA trace viewer.
"""
from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field
from typing import Dict, List, Optional


@dataclass
class ThroughputMeter:
    """Streaming throughput counters for one phase (train or eval)."""

    name: str = "train"
    steps: int = 0
    sessions: int = 0
    clicks: int = 0
    elapsed: float = 0.0
    _t0: Optional[float] = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, steps: int = 1, sessions: int = 0, clicks: int = 0):
        if self._t0 is None:
            return
        self.elapsed += time.perf_counter() - self._t0
        self._t0 = None
        self.steps += steps
        self.sessions += sessions
        self.clicks += clicks

    @contextlib.contextmanager
    def measure(self, sessions: int = 0, clicks: int = 0):
        self.start()
        try:
            yield
        finally:
            self.stop(1, sessions, clicks)

    def result(self) -> Dict[str, float]:
        dt = max(self.elapsed, 1e-9)
        return {
            f"{self.name}_steps": self.steps,
            f"{self.name}_elapsed_s": round(self.elapsed, 3),
            f"{self.name}_steps_per_s": round(self.steps / dt, 2),
            f"{self.name}_sessions_per_s": round(self.sessions / dt, 1),
            f"{self.name}_clicks_per_s": round(self.clicks / dt, 1),
        }

    def reset(self):
        self.steps = self.sessions = self.clicks = 0
        self.elapsed = 0.0
        self._t0 = None


def device_op_durations(trace_dir: str) -> Dict[str, List[float]]:
    """Parse a JAX profiler trace dir → {device event name: [durations ms]}.

    Only device-timeline complete events are counted (process names starting
    with ``/device:``), so the result reflects what the hardware executed —
    immune to host dispatch latency.  Through a remote-dispatch backend
    (e.g. a tunneled dev TPU) wall-clock timing measures per-call RPC
    latency and ``block_until_ready`` can return early, so trace-derived
    device times are the only trustworthy per-op numbers there.
    """
    import collections
    import glob
    import gzip
    import json

    paths = glob.glob(trace_dir + "/**/*.trace.json.gz", recursive=True)
    if not paths:
        return {}
    with gzip.open(sorted(paths)[-1]) as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    pids = {
        e["pid"]: e.get("args", {}).get("name", "")
        for e in events
        if e.get("ph") == "M" and e.get("name") == "process_name"
    }
    device_pids = {p for p, name in pids.items() if name.startswith("/device:")}
    durs: Dict[str, List[float]] = collections.defaultdict(list)
    for e in events:
        if e.get("ph") == "X" and e.get("pid") in device_pids:
            durs[str(e.get("name", ""))].append(float(e.get("dur", 0.0)) / 1e3)
    return dict(durs)


def device_op_durations_by_track(trace_dir: str) -> Dict[str, Dict[str, float]]:
    """{device track name: {event name: total ms}} over a trace dir.

    A TPU device pid carries several PARALLEL tracks (tids) — "XLA Modules"
    (one row per program execution), "Steps" (one row per step marker),
    "TensorFlow Name Scope"/"TensorFlow Ops" (framework annotation spans)
    and "XLA Ops" (the mutually-exclusive leaf HLO ops).  Summing across
    tracks double-counts; per-step decompositions must read the
    "XLA Ops" track, whose rows tile device-busy time exactly.
    """
    import collections
    import glob
    import gzip
    import json

    paths = glob.glob(trace_dir + "/**/*.trace.json.gz", recursive=True)
    if not paths:
        return {}
    with gzip.open(sorted(paths)[-1]) as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    pids = {
        e["pid"]: e.get("args", {}).get("name", "")
        for e in events
        if e.get("ph") == "M" and e.get("name") == "process_name"
    }
    device_pids = {p for p, name in pids.items() if name.startswith("/device:")}
    tid_names = {
        (e["pid"], e.get("tid")): e.get("args", {}).get("name", "")
        for e in events
        if e.get("ph") == "M" and e.get("name") == "thread_name"
    }
    out: Dict[str, Dict[str, float]] = collections.defaultdict(
        lambda: collections.defaultdict(float)
    )
    for e in events:
        if e.get("ph") == "X" and e.get("pid") in device_pids:
            track = tid_names.get((e["pid"], e.get("tid")), str(e.get("tid")))
            out[track][str(e.get("name", ""))] += float(e.get("dur", 0.0)) / 1e3
    return {k: dict(v) for k, v in out.items()}


def device_op_totals(trace_dir: str) -> Dict[str, float]:
    """{device event name: total ms} over a trace dir
    (see device_op_durations for the methodology)."""
    return {k: sum(v) for k, v in device_op_durations(trace_dir).items()}


def _trace_call_durations(fn, args, iters: int) -> Dict[str, List[float]]:
    """Warm up ``fn(*args)``, then trace ``iters`` calls and return per-name
    device durations.  The trailing np.asarray is a host fetch — unlike
    block_until_ready it is guaranteed to wait on remote-dispatch backends."""
    import tempfile

    import jax
    import numpy as np

    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])  # warmup + compile
    with tempfile.TemporaryDirectory() as td:
        jax.profiler.start_trace(td)
        try:
            for _ in range(iters):
                out = fn(*args)
            np.asarray(jax.tree_util.tree_leaves(out)[0])
        finally:
            jax.profiler.stop_trace()
        return device_op_durations(td)


def device_call_times_ms(fn, args, iters: int = 50) -> List[float]:
    """Per-call device execution times (ms) of a jitted ``fn(*args)`` — the
    dominant ``jit*`` program's individual event durations, so callers can
    compute latency percentiles.  Empty list if no device events were
    captured (e.g. CPU backend); nested per-op events have other names."""
    durs = _trace_call_durations(fn, args, iters)
    jit_durs = [v for k, v in durs.items() if k.startswith("jit")]
    if not jit_durs:
        return []
    return max(jit_durs, key=sum)


def device_time_ms(fn, args, iters: int = 10) -> float:
    """Mean per-call device execution time of a jitted ``fn(*args)`` in ms
    (see device_call_times_ms); 0.0 if no device events were captured."""
    times = device_call_times_ms(fn, args, iters)
    return sum(times) / iters if times else 0.0


@contextlib.contextmanager
def xla_trace(log_dir: str, enabled: bool = True):
    """JAX profiler trace (the ProfilerHook equivalent; view with
    TensorBoard's trace viewer or xprof)."""
    if not enabled:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
