#!/usr/bin/env python3
"""Join two Bench JSON artifacts (a 1x run and a 10x run of the SAME
query surface) into PROBES10X.tsv — the machine-checked scale-probe
table ProbeRegistrySpec enforces against the production tag registry.

Usage:
  tools/make_probe_table.py bench_1x.json bench_10x.json \
      [--overlay bench_other10x.json] > PROBES10X.tsv

--overlay replaces the 10x leg for the queries it contains, for
families whose scale axis lives in a dedicated corpus: the main
replicated dir strides ORDER keys only, so the distinct part<->supplier
edge set is unchanged there and a graph ratio over it measures nothing
(ScaleProbe's own scaladoc) — the graph family's 10x leg comes from
graft_scale10/graph10, where all three keys stride and edges grow 10x.
"""
import json
import re
import subprocess
import sys


def queries(path):
    with open(path) as f:
        d = json.load(f)
    q = dict(d["queries"])
    # prefer the isolated re-measure when the in-suite median was an
    # ambient outlier (Bench ships both; `requeried` is the settled one)
    q.update(d.get("requeried", {}))
    return {k: v for k, v in q.items() if v >= 0}, d.get("sf", "?")


def main():
    overlays = []
    rest = sys.argv[1:]
    while "--overlay" in rest:
        i = rest.index("--overlay")
        overlays.append(rest[i + 1])
        rest = rest[:i] + rest[i + 2:]
    one, sf1 = queries(rest[0])
    ten, sf10 = queries(rest[1])
    from_overlay = set()
    for ov in overlays:
        o, _ = queries(ov)
        ten.update(o)
        from_overlay |= set(o)
    res = subprocess.run(["git", "rev-parse", "HEAD"], capture_output=True,
                         text=True, cwd=sys.path[0] or ".")
    commit = res.stdout.strip()
    if res.returncode != 0 or not re.fullmatch(r"[0-9a-f]{40}", commit):
        sys.exit(f"git rev-parse HEAD failed (rc={res.returncode}, out='{commit}', "
                 f"err='{res.stderr.strip()}') - run from inside the repo checkout; "
                 "an empty commit stamp would ship a malformed table")
    print(f"# commit: {commit}")
    print(f"# 10x scale-probe table: sec at {sf1} vs {sf10} (same host, local[32],")
    print("# median-of-reps with per-query warmup). Rows marked axis=edge take their")
    print("# 10x leg from graft_scale10/graph10 (all three lineitem keys strided ->")
    print("# edges actually grow 10x; the main dir leaves the distinct edge set flat).")
    print("# Regenerate with tools/make_probe_table.py after any bench run pair;")
    print("# ProbeRegistrySpec fails if a production-tagged query lacks a row here")
    print("# or exceeds the declared linear bound.")
    print("name\tsec_1x\tsec_10x\tratio\taxis")
    for name in sorted(set(one) & set(ten)):
        a, b = one[name], ten[name]
        ratio = b / a if a > 0 else -1.0
        axis = "edge" if name in from_overlay else "corpus"
        print(f"{name}\t{a:.3f}\t{b:.3f}\t{ratio:.2f}\t{axis}")


if __name__ == "__main__":
    main()
