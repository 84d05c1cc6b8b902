"""Roofline line-item table from a kept train-step trace.

Reads a trace dir produced by ``trace_step_breakdown.py --keep_trace DIR``
and, for every XLA-Ops leaf op above a cutoff, reports measured ms/step
against its own roofline: attainable = max(model_flops / MXU peak,
bytes_accessed / HBM bandwidth) using the per-op ``model_flops`` and
``raw_bytes_accessed`` the XLA profiler embeds in the trace.  Custom-calls
(Pallas kernels) carry no XLA cost model — their FLOPs are supplied
analytically via --kernel_flops (defaults match the G1 bench scorer).

The sum of per-op attainables is the roofline-attainable step time the
PERFORMANCE.md accounting quotes (VERDICT round-3 item #3).

Usage:
  python scripts/trace_step_breakdown.py --steps 10 --keep_trace /tmp/tr
  python scripts/roofline_from_trace.py /tmp/tr --steps 10
"""
import argparse
import glob
import gzip
import json
import re
import sys

# TPU v5e (1 chip): bf16 MXU peak and HBM bandwidth.
MXU_PEAK_TFLOPS = 197.0
HBM_GBPS = 819.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir")
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--cutoff_ms", type=float, default=0.02)
    ap.add_argument(
        "--kernel_flops",
        default="jvp_NARModel_=0.317e12,transpose_jvp_NARModel_=0.634e12",
        help="name_prefix=total_flops_per_step comma list for custom-calls",
    )
    args = ap.parse_args()

    kflops = {}
    for part in args.kernel_flops.split(","):
        if "=" in part:
            k, v = part.split("=")
            kflops[k] = float(v)

    paths = sorted(glob.glob(args.trace_dir + "/**/*.trace.json.gz", recursive=True))
    if not paths:
        sys.exit("no trace found")
    data = json.load(gzip.open(paths[-1]))
    ev = data["traceEvents"]
    tid_names = {
        (e["pid"], e.get("tid")): e.get("args", {}).get("name", "")
        for e in ev
        if e.get("ph") == "M" and e.get("name") == "thread_name"
    }
    # aggregate XLA-Ops leaf rows: ms, flops, bytes are all per-occurrence
    ops = {}
    for e in ev:
        if e.get("ph") != "X":
            continue
        if "XLA Ops" not in tid_names.get((e["pid"], e.get("tid")), ""):
            continue
        a = e.get("args", {})
        name = str(e.get("name", ""))
        rec = ops.setdefault(
            name, {"ms": 0.0, "flops": 0.0, "bytes": 0.0, "n": 0,
                   "cat": a.get("hlo_category", ""), "src": a.get("source", "")}
        )
        rec["ms"] += float(e.get("dur", 0.0)) / 1e3
        rec["flops"] += float(a.get("model_flops", 0) or 0)
        rec["bytes"] += float(a.get("raw_bytes_accessed", 0) or 0)
        rec["n"] += 1

    rows = []
    for name, r in ops.items():
        ms = r["ms"] / args.steps
        if ms < args.cutoff_ms:
            continue
        flops = r["flops"] / args.steps
        byts = r["bytes"] / args.steps
        for pref, f in kflops.items():
            if name.startswith(pref):
                flops = max(flops, f)
        att_flop = flops / (MXU_PEAK_TFLOPS * 1e12) * 1e3
        att_mem = byts / (HBM_GBPS * 1e9) * 1e3
        att = max(att_flop, att_mem)
        bound = ("MXU" if att_flop >= att_mem else "HBM") if att > 0 else "-"
        rows.append((ms, att, bound, name, r["cat"], r["src"]))
    rows.sort(reverse=True)

    total_ms = sum(r["ms"] for r in ops.values()) / args.steps
    shown_ms = sum(r[0] for r in rows)
    shown_att = sum(r[1] for r in rows)
    print(f"{'ms':>7} {'attain':>7} {'eff':>5} {'bound':>5}  name  [category]  source")
    for ms, att, bound, name, cat, src in rows:
        eff = f"{att/ms:4.0%}" if att > 0 else "   -"
        src_short = re.sub(r".*/chameleon_recsys_tpu/", "", src)
        print(f"{ms:7.3f} {att:7.3f} {eff:>5} {bound:>5}  {name[:46]:<46} [{cat}] {src_short[:60]}")
    tail = total_ms - shown_ms
    print(f"\n# shown: {shown_ms:.3f} ms measured vs {shown_att:.3f} ms attainable")
    print(f"# long tail (<{args.cutoff_ms} ms ops): {tail:.3f} ms")
    print(f"# step total (XLA Ops track): {total_ms:.3f} ms")


if __name__ == "__main__":
    main()
