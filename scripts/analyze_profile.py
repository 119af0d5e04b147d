#!/usr/bin/env python
"""Summarize a jax.profiler/xprof trace (as captured by
`run_experiment.py --profile` or jax.profiler.start_trace) without a
TensorBoard UI: per-op-type totals, the top individual ops with roofline
info (FLOP rate, memory bandwidth, bound-by), and device busy analysis.

  python scripts/analyze_profile.py runs/synth/entklerg_0000/profile
"""

import argparse
import collections
import glob
import gzip
import json
import os
import sys


def find_xplane(root: str):
    hits = glob.glob(os.path.join(root, "**", "*.xplane.pb"), recursive=True)
    if not hits:
        sys.exit(f"no .xplane.pb under {root}")
    return hits


def op_stats(paths):
    from xprof.convert import raw_to_tool_data as rtd

    data, _ = rtd.xspace_to_tool_data(paths, "framework_op_stats",
                                      {"tqx": "out:csv"})
    obj = json.loads(data if isinstance(data, str) else data.decode())
    rows = obj[0]["rows"] if isinstance(obj, list) else obj["rows"]
    out = []
    for r in rows:
        c = [x["v"] for x in r["c"]]
        if c[1] != "Device":
            continue
        out.append(dict(type=c[2], name=c[3], occurrences=c[4],
                        total_self_us=c[7], flop_rate=c[13],
                        mem_bw=c[15], bound_by=c[17]))
    return out


def busy(root: str):
    for f in glob.glob(os.path.join(root, "**", "*.trace.json.gz"),
                       recursive=True):
        obj = json.loads(gzip.open(f).read())
        evs = obj["traceEvents"] if isinstance(obj, dict) else obj
        names, by_pid = {}, collections.defaultdict(list)
        for e in evs:
            if e.get("ph") == "M" and e.get("name") == "process_name":
                names[e["pid"]] = e["args"].get("name", "")
            elif e.get("ph") == "X" and "ts" in e:
                by_pid[e["pid"]].append((e["ts"], e["ts"] + e.get("dur", 0)))
        for pid, iv in sorted(by_pid.items()):
            if "TPU" not in names.get(pid, ""):
                continue
            iv.sort()
            span = iv[-1][1] - iv[0][0]
            tot, cs, ce = 0, None, None
            for s, t in iv:
                if ce is None or s > ce:
                    if ce is not None:
                        tot += ce - cs
                    cs, ce = s, t
                else:
                    ce = max(ce, t)
            tot += ce - cs
            print(f"\ndevice {names[pid]}: span {span/1e3:.1f} ms, busy "
                  f"{tot/1e3:.1f} ms ({tot/span*100:.0f}%), "
                  f"{len(iv)} events")
        return


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir")
    ap.add_argument("--top", type=int, default=15)
    args = ap.parse_args()

    rows = [r for r in op_stats(find_xplane(args.trace_dir))
            if r["type"] != "while"]
    agg = collections.defaultdict(float)
    total = 0.0
    for r in rows:
        agg[r["type"]] += r["total_self_us"]
        total += r["total_self_us"]
    print("== device self-time by op type ==")
    for k, v in sorted(agg.items(), key=lambda kv: -kv[1])[:args.top]:
        print(f"  {k:32s} {v/1e3:9.2f} ms  {v/total*100:5.1f}%")
    print(f"  {'TOTAL':32s} {total/1e3:9.2f} ms")

    print(f"\n== top {args.top} ops (roofline) ==")
    rows.sort(key=lambda r: -r["total_self_us"])
    print(f"{'self ms':>9} {'occur':>6} {'GFLOP/s':>9} {'GB/s':>7} "
          f"{'bound':>6}  name")
    for r in rows[:args.top]:
        short = r["name"].split("closed_call/")[-1]
        print(f"{r['total_self_us']/1e3:9.2f} {r['occurrences']:6.0f} "
              f"{r['flop_rate']:9.1f} {r['mem_bw']:7.0f} "
              f"{str(r['bound_by']):>6}  {short[:90]}")

    busy(args.trace_dir)


if __name__ == "__main__":
    main()
