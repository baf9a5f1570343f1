"""Detail view of the non-matmul overhead in the batch-1 decode trace:
prints individual copy/fusion/reshape/dus events with their HLO metadata
(shapes live in args) to identify what is being copied and why."""
import collections
import glob
import gzip
import json
import sys

TRACE_DIR = "/tmp/xprof_r2b1"
STEPS = 32

path = sorted(glob.glob(f"{TRACE_DIR}/plugins/profile/*/*.trace.json.gz"))[-1]
with gzip.open(path) as f:
    data = json.load(f)
ev = data["traceEvents"]
pids = {e["pid"]: e["args"].get("name", "") for e in ev
        if e.get("ph") == "M" and e.get("name") == "process_name"}

agg = {}
for e in ev:
    if e.get("ph") != "X" or "dur" not in e:
        continue
    if "TPU" not in pids.get(e["pid"], ""):
        continue
    nm = e["name"]
    fam = nm.rsplit(".", 1)[0] if nm.rsplit(".", 1)[-1].isdigit() else nm
    if fam not in ("copy", "dynamic_update_slice", "reshape", "fusion",
                   "add_convert_fusion", "convert_add_fusion",
                   "multiply_reduce_fusion"):
        continue
    a = agg.setdefault(nm, {"dur": 0.0, "n": 0, "args": e.get("args", {})})
    a["dur"] += e["dur"]
    a["n"] += 1

rows = sorted(agg.items(), key=lambda kv: -kv[1]["dur"])
famtot = collections.defaultdict(float)
for nm, a in rows:
    fam = nm.rsplit(".", 1)[0]
    famtot[fam] += a["dur"]
for fam, d in sorted(famtot.items(), key=lambda kv: -kv[1]):
    print(f"== {fam}: {d/STEPS:.1f} us/step")
    shown = 0
    for nm, a in rows:
        if not nm.startswith(fam + "."):
            continue
        meta = {k: v for k, v in a["args"].items() if k != "name"}
        print(f"  {a['dur']/STEPS:7.2f} us/step n={a['n']:3d} {nm[:30]} {str(meta)[:220]}")
        shown += 1
        if shown >= 8:
            break
