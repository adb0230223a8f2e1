#!/usr/bin/env python3
"""Bench-budget regression guard (round-6 lesson: BENCH_r06.json was
rc 124 / parsed null because the suite outgrew the driver's wall budget
and nothing locally tripped first).

Reads a local bench capture (graft.Bench stdout: per-query
`{"progress":"query",...}` JSONL lines and/or the final
`{"metric":"total",...}` summary), estimates the DRIVER-side wall for a
full bench run, and exits non-zero when the estimate exceeds the budget:

    estimate = (sum(cold) + sum(warm)) * SLOWDOWN + OVERHEAD

 - SLOWDOWN 1.3: observed driver/builder wall ratio (r05: driver 232 s
   vs builder-local ~180 s including compile);
 - OVERHEAD 100 s: sbt launch + incremental compile + SparkSession
   start on the driver, outside the per-query timings;
 - BUDGET 480 s (override with --budget): conservative floor for the
   driver timeout — r05's 232 s passed, r06's ~600 s estimate was
   killed, so the true limit lies between; staying under 480 leaves
   margin for driver-machine contention.

Usage:
    benchguard.py <bench_capture.jsonl> [--budget SECONDS]
    benchguard.py --selftest
"""
import json
import sys

SLOWDOWN = 1.3
OVERHEAD_S = 100.0
DEFAULT_BUDGET_S = 480.0


def parse_capture(lines):
    """Per-query (cold, warm) seconds from a bench stdout capture.

    Prefers the summary line (complete by construction); falls back to
    accumulating progress lines, so a capture from a run that was itself
    killed mid-flight still guards (under-estimating: what it saw).
    """
    cold, warm = {}, {}
    for line in lines:
        line = line.strip()
        if not line.startswith("{"):
            continue
        try:
            d = json.loads(line)
        except json.JSONDecodeError:
            continue
        if d.get("metric") == "total":
            return dict(d.get("queries", {})), dict(d.get("queries_warm", {}))
        if d.get("progress") == "query" and "name" in d:
            cold[d["name"]] = float(d.get("cold", 0.0))
            if "warm" in d:
                warm[d["name"]] = float(d["warm"])
    return cold, warm


def estimate_s(cold, warm):
    return (sum(cold.values()) + sum(warm.values())) * SLOWDOWN + OVERHEAD_S


def check(lines, budget_s, label):
    cold, warm = parse_capture(lines)
    if not cold:
        print(f"benchguard: no per-query timings found in {label}")
        return 2
    est = estimate_s(cold, warm)
    verdict = "OK" if est <= budget_s else "OVER BUDGET"
    print(f"benchguard: {len(cold)} queries, measured "
          f"{sum(cold.values()):.1f}s cold + {sum(warm.values()):.1f}s warm "
          f"-> estimated driver wall {est:.1f}s vs budget {budget_s:.0f}s "
          f"[{verdict}]")
    if est > budget_s:
        top = sorted(cold.items(), key=lambda kv: -kv[1])[:5]
        print("  heaviest cold queries: "
              + ", ".join(f"{n}={t:.1f}s" for n, t in top))
        print("  cut passes or query cost before the DRIVER discovers this "
              "as an rc-124 bench.")
        return 1
    return 0


def selftest():
    # over budget: 120 queries x 4 s cold + 3 s warm ~= 1190 s estimate
    over = [json.dumps({"progress": "query", "name": f"q{i}", "cold": 4.0,
                        "warm": 3.0}) for i in range(120)]
    assert check(over, DEFAULT_BUDGET_S, "selftest-over") == 1, \
        "guard failed to trip on a synthetic over-budget table"
    # under budget: 100 queries x 1.5 s cold + 1 s warm ~= 425 s estimate
    under = [json.dumps({"metric": "total", "value": 150.0,
                         "queries": {f"q{i}": 1.5 for i in range(100)},
                         "queries_warm": {f"q{i}": 1.0 for i in range(100)}})]
    assert check(under, DEFAULT_BUDGET_S, "selftest-under") == 0, \
        "guard tripped on a synthetic under-budget table"
    # empty capture is an error, never a silent pass
    assert check([], DEFAULT_BUDGET_S, "selftest-empty") == 2
    print("benchguard selftest: PASS")
    return 0


def main():
    args = sys.argv[1:]
    if args and args[0] == "--selftest":
        return selftest()
    if not args:
        print(__doc__)
        return 2
    budget = DEFAULT_BUDGET_S
    if "--budget" in args:
        i = args.index("--budget")
        budget = float(args[i + 1])
        del args[i:i + 2]
    with open(args[0]) as f:
        return check(f.readlines(), budget, args[0])


if __name__ == "__main__":
    sys.exit(main())
