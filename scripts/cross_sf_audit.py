#!/usr/bin/env python3
"""Cross-SF growth audit (r12, VERDICT item 4): compare per-query bench
detail files from two scale factors and flag quadratic creepers.

A query is flagged when its wall time grows faster than FLAG_FACTOR x the
data ratio (sf0.1/sf0.01 = 10x data => flag above 15x time) AND its large-SF
time is above NOISE_FLOOR_SEC (fixed per-query overhead — session setup,
plan time, tiny-table scans — dominates sub-second queries at these SFs, so
ratios on them measure noise, not growth).

Usage: cross_sf_audit.py <detail_small.json> <detail_large.json> <data_ratio> [out.json]
Writes a JSON artifact with per-query times, ratios, and the flag list.
"""
import json, sys

FLAG_FACTOR = 1.5
NOISE_FLOOR_SEC = 0.5

small = json.load(open(sys.argv[1]))
large = json.load(open(sys.argv[2]))
data_ratio = float(sys.argv[3])
out_path = sys.argv[4] if len(sys.argv) > 4 else None

qs, ql = small["queries"], large["queries"]
rows = []
for name in sorted(set(qs) & set(ql)):
    ts, tl = qs[name], ql[name]
    ratio = (tl / ts) if ts > 0 else float("inf")
    flagged = ratio > FLAG_FACTOR * data_ratio and tl > NOISE_FLOOR_SEC
    rows.append({"query": name, "t_small": ts, "t_large": tl,
                 "ratio": round(ratio, 2), "flagged": flagged})

flags = [r for r in rows if r["flagged"]]
print(f"{len(rows)} queries compared, data ratio {data_ratio}x, "
      f"flag threshold {FLAG_FACTOR * data_ratio}x time growth "
      f"(above {NOISE_FLOOR_SEC}s at the large SF)")
print(f"flagged: {len(flags)}")
for r in flags:
    print(f"  {r['query']}: {r['t_small']:.3f}s -> {r['t_large']:.3f}s ({r['ratio']}x)")
top = sorted(rows, key=lambda r: -r["ratio"])[:15]
print("top growth ratios:")
for r in top:
    print(f"  {r['query']:40s} {r['t_small']:7.3f}s -> {r['t_large']:7.3f}s  {r['ratio']:6.2f}x")

art = {"data_ratio": data_ratio, "flag_factor": FLAG_FACTOR,
       "noise_floor_sec": NOISE_FLOOR_SEC,
       "sf_small": small.get("sf"), "sf_large": large.get("sf"),
       "n_queries": len(rows), "flagged_queries": [r["query"] for r in flags],
       "rows": rows}
if out_path:
    json.dump(art, open(out_path, "w"), indent=1)
    print(f"wrote {out_path}")
