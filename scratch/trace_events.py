"""Dump individual device events matching a name regex from a jax trace:
per-instance durations + occurrence counts, to attribute aggregate buckets.
Usage: python scratch/trace_events.py TRACE_DIR PATTERN [N]
"""
import gzip
import json
import pathlib
import re
import sys

root = pathlib.Path(sys.argv[1])
pat = re.compile(sys.argv[2])
topn = int(sys.argv[3]) if len(sys.argv) > 3 else 20
files = sorted(root.rglob("*.trace.json.gz"), key=lambda p: p.stat().st_mtime)
path = files[-1]
with gzip.open(path, "rt") as f:
    data = json.load(f)

events = data.get("traceEvents", [])
pids = {}
for e in events:
    if e.get("ph") == "M" and e.get("name") == "process_name":
        pids[e["pid"]] = e["args"].get("name", str(e["pid"]))

agg = {}
for e in events:
    if e.get("ph") != "X":
        continue
    if not re.search(r"TPU|/device|XLA", pids.get(e.get("pid"), ""), re.I):
        continue
    name = e.get("name", "?")
    if not pat.search(name):
        continue
    a = agg.setdefault(name, [0, 0.0])
    a[0] += 1
    a[1] += e.get("dur", 0)

for name, (n, tot) in sorted(agg.items(), key=lambda kv: -kv[1][1])[:topn]:
    print(f"{tot/1e3:9.2f} ms  n={n:5d}  {tot/n:8.1f} us/ea  {name[:110]}")
