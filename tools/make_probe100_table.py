#!/usr/bin/env python3
"""Join three Bench JSON artifacts (1x / 10x / 100x runs of the SAME
query subset) into PROBES100X.tsv — the second-decade scale table
ProbeRegistrySpec enforces for the watchlist rows that have recorded
1x/10x/100x triples.

Why a separate table from PROBES10X: the 10x-only probe gate is blind
to steepness that only shows on the SECOND decade (round-17 finding:
txt_repetition_stats passes its 10x probe at ~2.8x while its 10x->100x
ratio is 6.1x — a regression there to, say, the 33x/decade the old
hard-negatives plan showed would ship silently). This table pins the
10x->100x ratio for the rows where the 100x corpus is the decade that
matters, so a superlinear rewrite trips a test instead of a judge.

Usage:
  tools/make_probe100_table.py bench_1x.json bench_10x.json bench_100x.json \
      > PROBES100X.tsv

The three runs should share the query subset (SPARK_GRAFT_BENCH_ONLY),
rep protocol, and host; the 10x/100x corpora are ScaleProbe's
(/tmp/graft_scale10, /tmp/graft_scale100 — regenerated on demand).
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
    one, sf1 = queries(sys.argv[1])
    ten, sf10 = queries(sys.argv[2])
    hundred, sf100 = queries(sys.argv[3])
    res = subprocess.run(["git", "rev-parse", "HEAD"], capture_output=True,
                         text=True, cwd=sys.path[0] or ".")
    commit = res.stdout.strip()
    if res.returncode != 0 or not re.fullmatch(r"[0-9a-f]{40}", commit):
        sys.exit(f"git rev-parse HEAD failed (rc={res.returncode}, out='{commit}', "
                 f"err='{res.stderr.strip()}') - run from inside the repo checkout; "
                 "an empty commit stamp would ship a malformed table")
    print(f"# commit: {commit}")
    print(f"# 100x second-decade table: sec at {sf1} / {sf10} / {sf100}")
    print("# (same host, local[32], median-of-reps with per-query warmup).")
    print("# d2_ratio = sec_100x / sec_10x, the decade the 10x probe gate cannot")
    print("# see; ProbeRegistrySpec bounds it per row. Regenerate with")
    print("# tools/make_probe100_table.py after reworking any watchlist row.")
    print("name\tsec_1x\tsec_10x\tsec_100x\td1_ratio\td2_ratio")
    for name in sorted(set(one) & set(ten) & set(hundred)):
        a, b, c = one[name], ten[name], hundred[name]
        d1 = b / a if a > 0 else -1.0
        d2 = c / b if b > 0 else -1.0
        print(f"{name}\t{a:.3f}\t{b:.3f}\t{c:.3f}\t{d1:.2f}\t{d2:.2f}")


if __name__ == "__main__":
    main()
