"""Trace-parser units (utils/profiling.py).

The roofline accounting (scripts/roofline_from_trace.py, PERFORMANCE.md
"Roofline close-out") depends on reading the RIGHT rows out of a profiler
trace: a TPU device pid carries parallel tracks (XLA Modules / Steps /
name scopes / XLA Ops) whose spans nest ACROSS tracks — summing them
double-counts.  These tests pin the track separation and the device-pid
filter on a synthetic trace file.
"""
import gzip
import json

from chameleon_recsys_tpu.utils.profiling import (
    device_op_durations,
    device_op_durations_by_track,
)


def _write_trace(tmp_path, events):
    d = tmp_path / "plugins" / "profile" / "run1"
    d.mkdir(parents=True)
    payload = json.dumps({"traceEvents": events}).encode()
    with gzip.open(d / "host.trace.json.gz", "wb") as f:
        f.write(payload)
    return str(tmp_path)


def _meta(pid, name, tid=None, thread=None):
    if thread is not None:
        return {"ph": "M", "pid": pid, "tid": tid, "name": "thread_name",
                "args": {"name": thread}}
    return {"ph": "M", "pid": pid, "name": "process_name",
            "args": {"name": name}}


def test_tracks_are_separated_and_host_pids_dropped(tmp_path):
    events = [
        _meta(1, "/device:TPU:0"),
        _meta(2, "/host:CPU"),
        _meta(1, None, tid=10, thread="XLA Modules"),
        _meta(1, None, tid=11, thread="XLA Ops"),
        # module row spans both leaf ops (parallel track, same wall window)
        {"ph": "X", "pid": 1, "tid": 10, "name": "jit_step", "ts": 0,
         "dur": 9000},
        {"ph": "X", "pid": 1, "tid": 11, "name": "fusion.1", "ts": 0,
         "dur": 4000},
        {"ph": "X", "pid": 1, "tid": 11, "name": "copy.2", "ts": 4000,
         "dur": 5000},
        # host event with a tempting name must be ignored
        {"ph": "X", "pid": 2, "tid": 1, "name": "fusion.1", "ts": 0,
         "dur": 999000},
    ]
    tracks = device_op_durations_by_track(_write_trace(tmp_path, events))
    assert set(tracks) == {"XLA Modules", "XLA Ops"}
    # leaf rows tile the module span without double counting
    assert tracks["XLA Ops"] == {"fusion.1": 4.0, "copy.2": 5.0}
    assert tracks["XLA Modules"] == {"jit_step": 9.0}
    # the flat parser sees the same events but mixes tracks — the by_track
    # separation is exactly what prevents the 9 + 4 + 5 double count
    flat = device_op_durations(_write_trace(tmp_path / "b", events))
    assert sum(sum(v) for v in flat.values()) == 18.0


def test_unnamed_tid_falls_back_to_tid_key(tmp_path):
    events = [
        _meta(1, "/device:TPU:0"),
        {"ph": "X", "pid": 1, "tid": 7, "name": "op", "ts": 0, "dur": 1000},
    ]
    tracks = device_op_durations_by_track(_write_trace(tmp_path, events))
    assert tracks == {"7": {"op": 1.0}}
