"""Per-stage device-time budget from a jax.profiler trace.

Buckets every leaf HLO op (fusions are single kernels; `while`/`conditional`
are containers and excluded) of the steady-state `jit_process_sweep` programs
by the tensor shapes in its long_name:

  points    65536-element tensors     -> undistortion + extraction sorts/moments
  solver    1152/13824-dim tensors    -> J/H/g assembly, LM loop, PCG
  match     8192x / 16384x256 tensors -> KNN Gram, top-k, gathers, factor build
  windows   24576/16384-surfel ops    -> window insert/trim/migrate
  imu       96/1536-row ops           -> propagation, sample states, spline

Usage: python benchmarks/trace_budget.py TRACE.json.gz [n_sweeps]
"""

import collections
import gzip
import json
import re
import sys


def classify(long_name: str) -> str:
    # order matters: the first matching signature wins
    if re.search(r"\[65536|\[32768|\[131072", long_name):
        return "points (undistort+extract)"
    if re.search(r"\[16384,1152|\[1152,1152|\[1152\]|\[13824|\[96,12,12|\[1152,", long_name):
        return "solver (J/H/g + LM + PCG)"
    if re.search(r"\[8192,256|\[8192,24576|\[4096,256|\[8192,10|\[24576,10|\[8192,8\]|\[24576", long_name):
        return "match (gram+topk+filters)"
    if re.search(r"\[16384,|\[8192,|\[8192\]", long_name):
        return "windows/surfels"
    if re.search(r"\[1536|\[96,|\[96\]|\[104\]", long_name):
        return "imu/samples/spline"
    return "other"


def main():
    path = sys.argv[1]
    with gzip.open(path) as f:
        tr = json.load(f)
    ev = tr["traceEvents"]
    pids = {e["pid"]: e["args"].get("name", "") for e in ev
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    tpu = [p for p, n in pids.items() if "TPU" in n]
    sweeps = [e for e in ev if e.get("ph") == "X" and e.get("pid") in tpu
              and e["name"].startswith("jit_process_sweep")]
    n = len(sweeps)
    total = sum(e["dur"] for e in sweeps)
    print(f"{n} sweeps traced, {total/n/1e3:.2f} ms/sweep device (program envelope)")

    buckets = collections.Counter()
    ops = collections.defaultdict(collections.Counter)
    leaf_total = 0
    for e in ev:
        if e.get("ph") != "X" or e.get("pid") not in tpu:
            continue
        args = e.get("args", {})
        cat = args.get("hlo_category", "")
        if cat in ("while", "conditional", "") or e["name"].startswith("jit_"):
            continue
        d = int(args.get("device_duration_ps", 0)) / 1e6  # -> us
        b = classify(args.get("long_name", ""))
        buckets[b] += d
        ops[b][e["name"].split(".")[0] + " " + cat] += d
        leaf_total += d

    print(f"leaf-op device time: {leaf_total/n/1e3:.2f} ms/sweep\n")
    for b, d in buckets.most_common():
        print(f"{b:<30}{d/n/1e3:8.2f} ms/sweep  ({100*d/leaf_total:5.1f}%)")
        for op, od in ops[b].most_common(4):
            print(f"    {op:<40}{od/n/1e3:7.2f} ms")


if __name__ == "__main__":
    main()
