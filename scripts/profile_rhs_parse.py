"""Summarize the newest /tmp/rhs_trace capture: total device time per
XLA op name, printed per-RHS (the capture loop runs 3 RHS).

Run: python scripts/profile_rhs_parse.py [trace_dir]
"""

import collections
import glob
import gzip
import json
import sys

root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/rhs_trace"
runs = sorted(glob.glob(root + "/plugins/profile/*"))
path = glob.glob(runs[-1] + "/*.trace.json.gz")[0]
with gzip.open(path) as f:
    data = json.load(f)
events = data["traceEvents"]
pids = {e["pid"]: e["args"].get("name", "") for e in events
        if e.get("ph") == "M" and e.get("name") == "process_name"}
byname = collections.defaultdict(float)
for e in events:
    if e.get("ph") == "X" and "TPU" in pids.get(e["pid"], ""):
        byname[e["name"]] += e.get("dur", 0)
for name, us in sorted(byname.items(), key=lambda kv: -kv[1])[:40]:
    print(f"{us / 3e3:9.1f} ms/rhs  {name[:100]}")
