"""Top leaf HLO ops from a jax.profiler trace, with long_names.

Companion to trace_budget.py: where trace_budget buckets by subsystem, this
dumps the top-N individual leaf ops (fusion granularity) so a specific fusion
seen in the budget ("slice_reduce_fusion.18", "fusion.1636", ...) can be
attributed to source shapes. Optionally filters by a regex over the long_name.

Usage: python benchmarks/trace_ops.py TRACE.json.gz [top_n] [long_name_regex]
"""

import collections
import gzip
import json
import re
import sys


def main():
    path = sys.argv[1]
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    pat = re.compile(sys.argv[3]) if len(sys.argv) > 3 else None
    with gzip.open(path) as f:
        tr = json.load(f)
    ev = tr["traceEvents"]
    pids = {e["pid"]: e["args"].get("name", "") for e in ev
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    tpu = [p for p, n in pids.items() if "TPU" in n]
    sweeps = [e for e in ev if e.get("ph") == "X" and e.get("pid") in tpu
              and e["name"].startswith("jit_process_sweep")]
    n = max(len(sweeps), 1)
    if sweeps:
        print(f"{len(sweeps)} sweeps, envelope {sum(e['dur'] for e in sweeps)/n/1e3:.2f} ms/sweep")

    agg = collections.defaultdict(lambda: [0.0, 0, ""])
    for e in ev:
        if e.get("ph") != "X" or e.get("pid") not in tpu:
            continue
        args = e.get("args", {})
        cat = args.get("hlo_category", "")
        if cat in ("while", "conditional", "") or e["name"].startswith("jit_"):
            continue
        ln = args.get("long_name", "")
        if pat and not pat.search(ln):
            continue
        d = int(args.get("device_duration_ps", 0)) / 1e6  # us
        a = agg[e["name"]]
        a[0] += d
        a[1] += 1
        a[2] = ln
    rows = sorted(agg.items(), key=lambda kv: -kv[1][0])[:top_n]
    tot = sum(v[0] for _, v in agg.items())
    print(f"filtered leaf total: {tot/n/1e3:.3f} ms/sweep over {len(agg)} distinct ops\n")
    for name, (d, c, ln) in rows:
        print(f"{d/n/1e3:7.3f} ms  x{c//n:<3} {name}")
        print(f"          {ln[:240]}")


if __name__ == "__main__":
    main()
