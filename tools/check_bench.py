#!/usr/bin/env python3
"""Bench regression check — the official rule (r12 policy).

SURVEY §8.12's cross-day data shows the single-thread calib carries
±25% error on this host (turbo/thermal regimes), wider than the 10%
drift threshold it was built to guard. So the regression rule is RAW
and gated, not calib-normalized:

  1. the artifact must have host_contended == false — a flagged run is
     not evidence of anything; rerun on a quiet host instead,
  2. regression iff shared_total_sec / baseline_shared_sec > 1.10
     (raw seconds over the baseline's own query set),
  3. any single shared query > 1.5x its baseline entry -> investigate
     the plan (or rerun: agreement across two clean runs is the
     tie-breaker).

Calib-normalized ratios remain a DIAGNOSTIC within one run's thermal
regime (pre/post drift, par ratio); they are never the cross-day rule.

Usage: check_bench.py [BENCH_LAST.json [BASELINE_BENCH.json]]
Exit: 0 ok, 1 regression, 2 contended (rerun).
"""
import json
import sys


def main():
    bench_path = sys.argv[1] if len(sys.argv) > 1 else "BENCH_LAST.json"
    base_path = sys.argv[2] if len(sys.argv) > 2 else "BASELINE_BENCH.json"
    b = json.load(open(bench_path))
    base = json.load(open(base_path))
    if b.get("host_contended"):
        print("HOST CONTENDED (max_spread %.2f, calib %.3f->%.3f, par %.3f): "
              "rerun on a quiet host before comparing" % (
                  b.get("max_spread", -1), b.get("calib_sec", -1),
                  b.get("calib_post_sec", -1), b.get("calib_par_sec", -1)))
        sys.exit(2)
    if "queries" not in b or "queries" not in base:
        print("no 'queries' key in artifact or baseline - "
              "check artifact format (compact line lacks per-query times)")
        sys.exit(3)
    shared = {k: v for k, v in b["queries"].items()
              if k in base["queries"] and v >= 0}
    st = sum(shared.values())
    bt = sum(base["queries"][k] for k in shared)
    if not shared or bt <= 0:
        print("no comparable shared queries - check artifact format")
        sys.exit(3)
    ratio = st / bt
    print("raw shared ratio: %.2f / %.2f = %.3f over %d queries"
          % (st, bt, ratio, len(shared)))
    bad = [(k, v, base["queries"][k]) for k, v in shared.items()
           if base["queries"][k] > 0.05 and v / base["queries"][k] > 1.5]
    reruns = b.get("reruns", {})
    for k, v, bv in sorted(bad, key=lambda x: -x[1] / x[2]):
        # r15: rows over 1.5x got ONE deferred re-run at sweep end
        # (min taken); a row still elevated here survived temporal
        # de-correlation, so it's a plan signal, not a window artifact
        rr = reruns.get(k)
        note = (" [rerun: first %.2fs -> %.2fs, min kept]"
                % (rr["first"], rr["rerun"])) if rr else ""
        print("  elevated: %-24s %.2fs vs baseline %.2fs (%.2fx)%s"
              % (k, v, bv, v / bv, note))
    if ratio > 1.10:
        print("REGRESSION: raw shared total > 1.10x baseline")
        print("  adjudicate before believing it: tools/ab_tree.sh <pinned-commit>"
              " <worst-query> interleaves the same query on the old tree in the"
              " same window; if the old tree reproduces the elevated number the"
              " host moved, not the plan (r15: the d26/d30/d43 text family read"
              " ~2x its r10/r11-era baseline rows on BOTH trees while calib_str"
              " drifted and calib_sec did not)")
        sys.exit(1)
    print("OK" + (" (%d elevated single queries - check plans or rerun)"
                  % len(bad) if bad else ""))


if __name__ == "__main__":
    main()
