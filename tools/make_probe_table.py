#!/usr/bin/env python3
"""Join two Bench JSON artifacts (a 1x run and a 10x run of the SAME
query surface) into PROBES10X.tsv — the machine-checked scale-probe
table ProbeRegistrySpec enforces against the production tag registry.

Usage: tools/make_probe_table.py bench_1x.json bench_10x.json > PROBES10X.tsv
"""
import json
import sys


def queries(path):
    with open(path) as f:
        d = json.load(f)
    q = dict(d["queries"])
    # prefer the isolated re-measure when the in-suite median was an
    # ambient outlier (Bench ships both; `requeried` is the settled one)
    q.update(d.get("requeried", {}))
    return q, d.get("sf", "?")


def main():
    one, sf1 = queries(sys.argv[1])
    ten, sf10 = queries(sys.argv[2])
    print(f"# 10x scale-probe table: sec at {sf1} vs {sf10} (same host, local[32],")
    print("# median-of-reps with per-query warmup). Regenerate with")
    print("# tools/make_probe_table.py after any bench run pair; ProbeRegistrySpec")
    print("# fails if a production-tagged query lacks a row here or exceeds the")
    print("# declared linear bound.")
    print("name\tsec_1x\tsec_10x\tratio")
    for name in sorted(set(one) & set(ten)):
        a, b = one[name], ten[name]
        if a <= 0 or b < 0:
            ratio = -1.0
        else:
            ratio = b / a
        print(f"{name}\t{a:.3f}\t{b:.3f}\t{ratio:.2f}")


if __name__ == "__main__":
    main()
