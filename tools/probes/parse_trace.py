"""Parse a jax.profiler chrome trace (vm.trace.json.gz): per-op device time.

Usage: python tools/probes/parse_trace.py <trace.json.gz> [top_n]
Groups TPU-lane complete events by name, prints total duration descending and
a category rollup (fusion / copy-pad / custom-call kernels / etc).
"""
import gzip
import json
import re
import sys
from collections import defaultdict

path = sys.argv[1]
top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 40

with gzip.open(path, "rt") as f:
    data = json.load(f)

events = data["traceEvents"]
# identify process/thread names; keep device lanes (TPU ... XLA Op or similar)
pids = {}
tids = {}
for e in events:
    if e.get("ph") == "M":
        if e.get("name") == "process_name":
            pids[e["pid"]] = e["args"].get("name", "")
        elif e.get("name") == "thread_name":
            tids[(e["pid"], e["tid"])] = e["args"].get("name", "")

dev_pids = {p for p, n in pids.items() if "TPU" in n or "/device" in n.lower()}
print("processes:", {p: n for p, n in pids.items()})

by_name = defaultdict(float)
by_lane = defaultdict(float)
lane_events = defaultdict(list)
t_min, t_max = float("inf"), 0.0
for e in events:
    if e.get("ph") != "X" or e.get("pid") not in dev_pids:
        continue
    lane = tids.get((e["pid"], e["tid"]), "")
    dur = e.get("dur", 0) / 1e3  # ms
    by_lane[lane] += dur
    if "XLA Op" in lane or re.search(r"(?i)ops", lane):
        lane_events[(e["pid"], e["tid"])].append(e)
        t_min = min(t_min, e["ts"])
        t_max = max(t_max, e["ts"] + e.get("dur", 0))

# self-time: per lane, stack-based nesting by (ts, dur)
for lane, evs in lane_events.items():
    evs.sort(key=lambda e: (e["ts"], -e.get("dur", 0)))
    stack = []  # (end_ts, name, child_total)
    def pop_into_parent(end_ts, name, child_total, dur):
        self_ms = (dur - child_total) / 1e3
        by_name[name] += self_ms
    for e in evs:
        ts, dur, name = e["ts"], e.get("dur", 0), e["name"]
        while stack and ts >= stack[-1][0]:
            end, nm, ch, d = stack.pop()
            pop_into_parent(end, nm, ch, d)
            if stack:
                stack[-1][2] += d
        stack.append([ts + dur, name, 0, dur])
    while stack:
        end, nm, ch, d = stack.pop()
        pop_into_parent(end, nm, ch, d)
        if stack:
            stack[-1][2] += d

print("\nlanes:")
for k, v in sorted(by_lane.items(), key=lambda x: -x[1])[:10]:
    print(f"  {v:10.2f} ms  {k}")

if not by_name:
    # fall back: all device-pid events
    for e in events:
        if e.get("ph") == "X" and e.get("pid") in dev_pids:
            by_name[e["name"]] += e.get("dur", 0) / 1e3

total = sum(by_name.values())
span = (t_max - t_min) / 1e3 if t_max > t_min else 0
print(f"\ndevice busy total {total:.1f} ms, span {span:.1f} ms")

cats = defaultdict(float)
def cat(name: str) -> str:
    n = name.lower()
    if "flash" in n or "custom-call" in n or "custom_call" in n:
        return "pallas-kernels"
    if n.startswith("copy") or ".copy" in n or "pad" in n or "slice" in n or "transpose" in n:
        return "copy/pad/slice/transpose"
    if "rematted" in n or "remat" in n:
        return "remat-fusions"
    if "convert" in n:
        return "convert"
    if "fusion" in n or "multiply" in n or "add" in n or "reduce" in n:
        return "fusions"
    return "other"

for k, v in by_name.items():
    cats[cat(k)] += v
print("\ncategories:")
for k, v in sorted(cats.items(), key=lambda x: -x[1]):
    print(f"  {v:10.2f} ms ({100*v/total:4.1f}%)  {k}")

print(f"\ntop {top_n} ops:")
for k, v in sorted(by_name.items(), key=lambda x: -x[1])[:top_n]:
    print(f"  {v:9.2f} ms  {k[:150]}")
