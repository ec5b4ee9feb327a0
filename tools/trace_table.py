"""Aggregate a jax.profiler device trace into a per-step attribution table.

Consumes the trace.json.gz written by tools/profile_trace.py and prints:
  (a) per-HLO-category totals (XLA's own categorization from the xplane),
  (b) the top individual ops with their source file attribution,
so the VERDICT-r3 "unattributed residual" question is answered from device
timestamps rather than slope probes.

  python tools/trace_table.py [--trace /tmp/frn_trace] [--steps N] [--top 30]

--steps defaults to the number of jit module invocations found in the trace.
"""

import argparse
import collections
import glob
import gzip
import json
import os
import re


def load_events(trace_dir):
    files = sorted(glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                             recursive=True))
    if not files:
        raise SystemExit(f"no *.trace.json.gz under {trace_dir}")
    with gzip.open(files[-1]) as f:
        data = json.load(f)
    return data.get("traceEvents", []), files[-1]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trace", default="/tmp/frn_trace")
    ap.add_argument("--steps", type=int, default=0)
    ap.add_argument("--top", type=int, default=30)
    args = ap.parse_args()

    ev, path = load_events(args.trace)
    tids = {}
    dev_pid = None
    for e in ev:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            if "TPU" in e["args"].get("name", ""):
                dev_pid = e["pid"]
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tids[(e["pid"], e["tid"])] = e["args"].get("name")
    if dev_pid is None:
        raise SystemExit("no TPU device process in trace (host-only capture)")
    op_tid = next(t for (p, t), n in tids.items()
                  if p == dev_pid and n == "XLA Ops")
    mod_tid = next((t for (p, t), n in tids.items()
                    if p == dev_pid and n == "XLA Modules"), None)

    mods = [e for e in ev if e.get("pid") == dev_pid and e.get("tid") == mod_tid
            and e.get("ph") == "X"]
    steps = args.steps or max(1, len(mods))
    ops = [e for e in ev if e.get("pid") == dev_pid and e.get("tid") == op_tid
           and e.get("ph") == "X"]

    print(f"trace: {path}")
    for m in mods[:1]:
        print(f"module: {m['name']}  n={len(mods)}  "
              f"avg={sum(x.get('dur', 0) for x in mods) / len(mods) / 1000:.2f} ms")

    by_cat = collections.defaultdict(float)
    cat_n = collections.Counter()
    by_op = collections.defaultdict(float)
    op_meta = {}
    for e in ops:
        a = e.get("args", {})
        cat = a.get("hlo_category", "uncategorized")
        d = e.get("dur", 0)
        by_cat[cat] += d
        cat_n[cat] += 1
        by_op[e["name"]] += d
        if e["name"] not in op_meta:
            src = a.get("source", "")
            long = a.get("long_name", "")
            shape = long.split(" = ", 1)[-1].split("{")[0] if long else ""
            op_meta[e["name"]] = (cat, shape, src)

    tot = sum(by_cat.values())
    print(f"\nper-HLO-category (device time, {steps} steps, "
          f"total {tot / steps / 1000:.2f} ms/step):")
    print(f"  {'category':28s} {'ms/step':>8s} {'pct':>6s} {'ops/step':>9s}")
    for c, d in sorted(by_cat.items(), key=lambda kv: -kv[1]):
        print(f"  {c:28s} {d / steps / 1000:8.3f} {100 * d / tot:5.1f}% "
              f"{cat_n[c] / steps:9.0f}")

    print(f"\ntop {args.top} ops (ms/step):")
    for n, d in sorted(by_op.items(), key=lambda kv: -kv[1])[:args.top]:
        cat, shape, src = op_meta[n]
        src = re.sub(r"^/root/repo/", "", src)
        print(f"  {d / steps / 1000:8.3f}  [{cat:22.22s}] {n:28.28s} "
              f"{shape:42.42s} {src}")


if __name__ == "__main__":
    main()
