"""Summarize a jax.profiler chrome trace: top kernels by total device time.
Usage: python scratch/trace_top.py TRACE_DIR [N]
Finds the newest *.trace.json.gz under TRACE_DIR, aggregates event durations
per (pid-track, name-prefix), prints the top-N with % of the busiest track.
"""
import gzip
import json
import pathlib
import re
import sys

root = pathlib.Path(sys.argv[1])
topn = int(sys.argv[2]) if len(sys.argv) > 2 else 25
files = sorted(root.rglob("*.trace.json.gz"), key=lambda p: p.stat().st_mtime)
if not files:
    sys.exit(f"no trace.json.gz under {root}")
path = files[-1]
with gzip.open(path, "rt") as f:
    data = json.load(f)

events = data.get("traceEvents", [])
pids = {}
for e in events:
    if e.get("ph") == "M" and e.get("name") == "process_name":
        pids[e["pid"]] = e["args"].get("name", str(e["pid"]))

# keep device-side tracks (TPU core / XLA ops), drop host python threads
by_key = {}
track_total = {}
for e in events:
    if e.get("ph") != "X":
        continue
    pname = pids.get(e.get("pid"), "")
    if not re.search(r"TPU|/device|XLA", pname, re.I):
        continue
    dur = e.get("dur", 0)
    # strip trailing autogen ids so fusions aggregate: fusion.123 -> fusion
    name = re.sub(r"[.\d]+$", "", e.get("name", "?"))
    by_key[(pname, name)] = by_key.get((pname, name), 0) + dur
    track_total[pname] = track_total.get(pname, 0) + dur

if not by_key:
    names = sorted(set(pids.values()))
    sys.exit(f"no device events; tracks present: {names}")

busiest = max(track_total, key=track_total.get)
print(f"trace: {path}")
print(f"busiest track: {busiest} ({track_total[busiest]/1e3:.2f} ms total)")
for (pname, name), dur in sorted(by_key.items(), key=lambda kv: -kv[1])[:topn]:
    pct = 100.0 * dur / track_total[busiest] if pname == busiest else 0.0
    print(f"{dur/1e3:10.2f} ms  {pct:5.1f}%  [{pname}] {name}")
