"""Device-time extraction from JAX profiler traces.

Wall-clock microbenches are unreliable on remote/tunneled runtimes (dispatch
latency, execution memoization of identical calls), so perf claims in this
repo are backed by profiler traces: capture with ``jax.profiler.start_trace``
(or ``utils.profiling.xla_trace`` / ``tools/bench_train.py --profile``), then
summarise with this tool.

Usage:
  python tools/trace_times.py LOGDIR [--top N]

Prints total busy time per device lane and the top-N ops by accumulated
device time (chrome-trace format parsing; no tensorboard needed).
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
from collections import defaultdict


def find_trace_file(logdir: str) -> str:
    pats = [
        os.path.join(logdir, "**", "*.trace.json.gz"),
        os.path.join(logdir, "**", "*.trace.json"),
    ]
    hits = []
    for p in pats:
        hits += glob.glob(p, recursive=True)
    if not hits:
        raise FileNotFoundError(f"no trace.json(.gz) under {logdir}")
    return max(hits, key=os.path.getmtime)


def load_events(path: str):
    op = gzip.open if path.endswith(".gz") else open
    with op(path, "rt") as f:
        data = json.load(f)
    return data.get("traceEvents", data)


def summarize(logdir: str, top: int = 25, device_filter: str = ""):
    """Returns (per_lane_busy_us, top_ops list, span_us)."""
    path = find_trace_file(logdir)
    events = load_events(path)

    # pid/tid -> names from metadata events
    pid_names = {}
    tid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tid_names[(e["pid"], e.get("tid"))] = e["args"].get("name", "")

    def is_device_lane(pid, tid):
        pn = pid_names.get(pid, "")
        tn = tid_names.get((pid, tid), "")
        hay = (pn + " " + tn).lower()
        if device_filter:
            return device_filter.lower() in hay
        return ("tpu" in hay or "/device" in hay or "xla" in tn.lower()) and (
            "python" not in hay and "plugin" not in hay
        )

    lane_busy = defaultdict(float)
    op_time = defaultdict(float)      # "XLA Ops" lanes: per-fusion/per-op
    module_time = defaultdict(float)  # "XLA Modules" lanes: whole programs
    t_min, t_max = float("inf"), 0.0
    for e in events:
        if e.get("ph") != "X":
            continue
        pid, tid = e.get("pid"), e.get("tid")
        if not is_device_lane(pid, tid):
            continue
        dur = float(e.get("dur", 0.0))
        ts = float(e.get("ts", 0.0))
        tn = tid_names.get((pid, tid), str(tid))
        lane = f"{pid_names.get(pid, pid)}/{tn}"
        lane_busy[lane] += dur
        if "module" in tn.lower():
            module_time[e.get("name", "?")] += dur
        else:
            op_time[e.get("name", "?")] += dur
        t_min = min(t_min, ts)
        t_max = max(t_max, ts + dur)

    top_ops = sorted(op_time.items(), key=lambda kv: -kv[1])[:top]
    modules = sorted(module_time.items(), key=lambda kv: -kv[1])
    span = (t_max - t_min) if t_max > t_min else 0.0
    return dict(lane_busy), top_ops, span, modules


def module_durations(logdir: str, device_filter: str = ""):
    """Per-execution durations (us) of each XLA module in the trace:
    {module_name: [dur_us, ...]} — the per-call device latencies that
    aggregate summaries can't give (needed for latency percentiles)."""
    path = find_trace_file(logdir)
    events = load_events(path)
    pid_names, tid_names = {}, {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tid_names[(e["pid"], e.get("tid"))] = e["args"].get("name", "")
    out = defaultdict(list)
    for e in events:
        if e.get("ph") != "X":
            continue
        pid, tid = e.get("pid"), e.get("tid")
        pn = pid_names.get(pid, "")
        tn = tid_names.get((pid, tid), "")
        hay = (pn + " " + tn).lower()
        if device_filter and device_filter.lower() not in hay:
            continue
        if not ("tpu" in hay or "/device" in hay or "xla" in tn.lower()):
            continue
        if "python" in hay or "plugin" in hay:
            continue
        if "module" in tn.lower():
            out[e.get("name", "?")].append(float(e.get("dur", 0.0)))
    return dict(out)


def main(argv=None):
    p = argparse.ArgumentParser("trace_times")
    p.add_argument("logdir")
    p.add_argument("--top", type=int, default=25)
    p.add_argument("--device-filter", type=str, default="")
    args = p.parse_args(argv)
    lanes, top_ops, span, modules = summarize(
        args.logdir, args.top, args.device_filter
    )
    print(f"trace span: {span/1e3:.2f} ms")
    for lane, busy in sorted(lanes.items(), key=lambda kv: -kv[1]):
        print(f"lane {lane}: busy {busy/1e3:.2f} ms")
    print("\nprograms (XLA Modules lane):")
    for name, t in modules[:10]:
        print(f"  {t/1e3:9.3f} ms  {name[:110]}")
    print(f"\ntop {args.top} ops by device time:")
    for name, t in top_ops:
        print(f"  {t/1e3:9.3f} ms  {name[:110]}")


if __name__ == "__main__":
    main()
