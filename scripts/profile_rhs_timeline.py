"""Timeline/gap analysis of the newest /tmp/rhs_trace capture (round-5
verdict item 4: use or close the latency shadow).

Reconstructs the serialized TPU op stream, buckets ops into stages
(per-sample stream kernel, Gram strip contractions, int8 cross/quant,
solve/spectrum, other), and reports:

  * device-busy time per bucket (ms per RHS),
  * total idle (gap) time between ops -- the dispatch/serialization cost
    that per-op sums cannot see,
  * the 15 longest individual gaps with their neighbor ops (what stalls),
  * per-op mean duration for the top stream/Gram ops.

The TPU executes ONE op at a time (no concurrent compute streams), so
"overlap" between the VPU-bound stream and the MXU-bound Gram can only
come from intra-op pipelining (Mosaic double-buffering inside the kernel,
XLA fusion). If the stream ops' busy time matches the stage wall time
(no large gaps), the stream is NOT latency-stalled -- it is serialized
compute, and the only further lever would be a fused stream+Gram
mega-kernel (the round-3 kill: BENCHMARKS.md "Fused backward+Gram
kernel").

Run: python scripts/profile_rhs_timeline.py [trace_dir] [n_rhs]
"""

import collections
import glob
import gzip
import json
import re
import sys

root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/rhs_trace"
n_rhs = int(sys.argv[2]) if len(sys.argv) > 2 else 3

runs = sorted(glob.glob(root + "/plugins/profile/*"))
path = glob.glob(runs[-1] + "/*.trace.json.gz")[0]
with gzip.open(path) as f:
    data = json.load(f)
events = data["traceEvents"]
pids = {e["pid"]: e["args"].get("name", "") for e in events
        if e.get("ph") == "M" and e.get("name") == "process_name"}

ops = [e for e in events
       if e.get("ph") == "X" and "TPU" in pids.get(e["pid"], "")
       and e.get("dur", 0) > 0]
ops.sort(key=lambda e: (e["ts"], -e["dur"]))

# leaf extraction: the XLA trace nests containers (jit_loop > while >
# fusions); busy-time accounting must count each device interval once.
# Sweep with a stack of open intervals; an event that contains a later
# event is a container and is dropped.
leaves = []
stack = []
for e in ops:
    end = e["ts"] + e["dur"]
    while stack and stack[-1][1] <= e["ts"] + 1e-9:
        st = stack.pop()
        if st[2]:
            leaves.append(st[3])
    if stack:
        stack[-1] = (stack[-1][0], stack[-1][1], False, stack[-1][3])
    stack.append((e["ts"], end, True, e))
while stack:
    st = stack.pop()
    if st[2]:
        leaves.append(st[3])
ops = sorted(leaves, key=lambda e: e["ts"])


def bucket(name):
    n = name.lower()
    if "custom-call" in n or "tpu_custom_call" in n or "persample" in n:
        return "stream-kernel (pallas per-sample)"
    if re.search(r"convert|quant|round|clamp", n) and "dot" not in n:
        return "quant/convert"
    if "dot" in n or "fusion" in n and "dot" in n:
        return "dot (gram/solve/mlp)"
    if "cholesky" in n or "triangular" in n or "eigh" in n:
        return "solve"
    if "all-reduce" in n or "reduce-scatter" in n:
        return "collective"
    if "fusion" in n:
        return "fusion (elementwise)"
    return "other"


busy = collections.defaultdict(float)
for e in ops:
    busy[bucket(e["name"])] += e["dur"]

span = ops[-1]["ts"] + ops[-1]["dur"] - ops[0]["ts"]
total_busy = sum(e["dur"] for e in ops)

# gap scan (the serialized stream means gaps = true idle)
gaps = []
prev_end = ops[0]["ts"]
prev_name = "<start>"
for e in ops:
    g = e["ts"] - prev_end
    if g > 0:
        gaps.append((g, prev_name, e["name"]))
    prev_end = max(prev_end, e["ts"] + e["dur"])
    prev_name = e["name"]
total_gap = sum(g for g, _, _ in gaps)

print(f"trace: {path}")
print(f"ops: {len(ops)}  span {span / 1e3 / n_rhs:.1f} ms/rhs  "
      f"busy {total_busy / 1e3 / n_rhs:.1f}  "
      f"idle {total_gap / 1e3 / n_rhs:.1f} "
      f"({100 * total_gap / span:.1f}% of span)")
print("\nbusy by bucket (ms/rhs):")
for b, us in sorted(busy.items(), key=lambda kv: -kv[1]):
    print(f"  {us / 1e3 / n_rhs:9.1f}  {b}")

print("\nlongest 15 gaps (ms, after-op -> before-op):")
for g, a, b in sorted(gaps, reverse=True)[:15]:
    print(f"  {g / 1e3:8.3f}  {a[:60]} -> {b[:60]}")

print("\ntop ops by total time (ms/rhs, count, mean us):")
agg = collections.defaultdict(lambda: [0.0, 0])
for e in ops:
    a = agg[e["name"]]
    a[0] += e["dur"]
    a[1] += 1
for name, (us, c) in sorted(agg.items(), key=lambda kv: -kv[1][0])[:25]:
    print(f"  {us / 1e3 / n_rhs:9.1f} ms  n={c:5d}  mean {us / c:8.1f} us"
          f"  {name[:80]}")
