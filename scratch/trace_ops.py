"""Top individual XLA ops (ungrouped) from a jax.profiler trace.
Usage: python scratch/trace_ops.py TRACE_DIR [N] [FILTER_REGEX]"""
import gzip, json, pathlib, re, sys

root = pathlib.Path(sys.argv[1])
topn = int(sys.argv[2]) if len(sys.argv) > 2 else 30
filt = re.compile(sys.argv[3]) if len(sys.argv) > 3 else None
files = sorted(root.rglob("*.trace.json.gz"), key=lambda p: p.stat().st_mtime)
path = files[-1]
with gzip.open(path, "rt") as f:
    data = json.load(f)
events = data.get("traceEvents", [])
pids = {}
for e in events:
    if e.get("ph") == "M" and e.get("name") == "process_name":
        pids[e["pid"]] = e["args"].get("name", str(e["pid"]))
by_key = {}
cnt = {}
for e in events:
    if e.get("ph") != "X":
        continue
    pname = pids.get(e.get("pid"), "")
    if not re.search(r"TPU|/device", pname, re.I):
        continue
    name = e.get("name", "?")
    if filt and not filt.search(name):
        continue
    by_key[name] = by_key.get(name, 0) + e.get("dur", 0)
    cnt[name] = cnt.get(name, 0) + 1
for name, dur in sorted(by_key.items(), key=lambda kv: -kv[1])[:topn]:
    print(f"{dur/1e3:10.2f} ms  x{cnt[name]:<5d} {name}")
