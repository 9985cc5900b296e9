#!/usr/bin/env python3
"""Merge an incremental ScaleBench run into BENCH_SCALE.json.

ScaleBench's only-filter runs re-measure a subset of the family; the
committed artifact must stay the union of every member's latest numbers.
Usage: merge_scale.py <scalebench_stdout_log> [BENCH_SCALE.json]
Lines may carry an sbt "[info] " prefix; totals are recomputed from the
merged per-query map so the artifact stays self-consistent.
"""
import json
import re
import sys

log = sys.argv[1]
artifact = sys.argv[2] if len(sys.argv) > 2 else "BENCH_SCALE.json"

merged = {}
with open(artifact) as f:
    for line in f:
        line = line.strip()
        if line:
            r = json.loads(line)
            merged[r["k"]] = r

with open(log) as f:
    for line in f:
        # accepts both curve artifacts: ScaleBench's scale_family and
        # RelScale's relscale_family
        m = re.search(r'\{"metric":"(?:rel)?scale_family".*\}', line)
        if not m:
            continue
        r = json.loads(m.group(0))
        base = merged.setdefault(r["k"], r)
        base["queries"].update(r["queries"])
        if r.get("recalls"):
            base.setdefault("recalls", {}).update(r["recalls"])
        base["dir"] = r["dir"]
        base["total"] = round(sum(base["queries"].values()), 6)
        # result_rows from partial runs aren't comparable; keep the
        # full-run value when present, else the incremental one
        base.setdefault("result_rows", r.get("result_rows"))

with open(artifact, "w") as f:
    for k in sorted(merged):
        f.write(json.dumps(merged[k]) + "\n")
print(f"merged {log} -> {artifact}: " +
      ", ".join(f"x{k}={len(merged[k]['queries'])}q" for k in sorted(merged)))
