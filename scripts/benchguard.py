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
   vs builder-local ~180 s including compile). Round-8 calibration
   point: driver wall 1,988 s vs driver-measured query totals
   1,945.6 s — ratio ~1.0 when the capture comes from the SAME
   environment and fixtures, so 1.3 is conservative for a fresh
   same-round capture;
 - OVERHEAD 100 s: sbt launch + incremental compile + SparkSession
   start on the driver, outside the per-query timings;
 - BUDGET 1000 s (override with --budget): the operational target, not
   the kill threshold. Evidence: r05's 232 s passed; r06 died at
   rc 124 with an estimated ~600 s; r08's 1,988 s driver wall
   completed at rc 0 — so the hard timeout (if any) now sits above
   2,000 s and r06's kill likely had a different cause. The round-8
   verdict set ~1,000 s as the wall to stay under; a 1,000 s budget
   trips on a genuine suite blow-up (r08-policy warm-all at r08 env
   speed estimated ~2,630 s) without tripping on the ~2x environment
   drift observed round-over-round.

ROUND-8 LESSON — STALENESS IS THE FAILURE MODE, NOT THE MODEL: the
guard said OK (est 358 s) to a 1,988 s driver run because its input,
the committed bench_local.jsonl, predated a driver-side fixture
regeneration AND an environment slowdown. A capture older than the
fixtures it benchmarked cannot predict anything. The guard now
REFUSES (exit 2) a capture file older than the newest fixture under
--fixtures (default /root/testdata), so a regen forces a re-baseline
before the guard will pass again.

Usage:
    benchguard.py <bench_capture.jsonl | BENCH_r{N}.json> [--budget SECONDS]
                  [--fixtures DIR | --no-staleness-check]
                  [--compare-warm OTHER_CAPTURE]
                  [--compare-cold OTHER_CAPTURE]
    benchguard.py --selftest

Round-17 additions (VERDICT r16 ask #1): the bench summary now echoes
budget-trimmed `top_cold` / `warm_echo` per-query maps, so the guard

 - always prints the heaviest cold queries (per-line records win for
   precision; the summary echo fills what the driver tail truncated);
 - adjudicates WARM contention: a warm row exceeding its OWN cold
   ([WARM-SUSPECT]) is a contention artifact, not a regression — the
   warm pass re-runs the identical plan with codegen already cached and
   the inter-pass cache cleared, so it is structurally <= cold (r16's
   smoking gun: q79 warm 11.26 s vs ~1.5 s cold, which nothing named);
 - `--compare-warm OTHER` compares warm totals across two captures on
   the cohort INTERSECTION only, refusing when the cohorts are disjoint
   (the warm cohort is re-derived from each run's own cold ranking, so
   r15-vs-r16's "+59 %" compared different query sets).

The capture argument accepts BOTH shapes (round-15 lesson: the guard
could adjudicate a raw stdout capture but printed [NO CANARY]/RC 2 on
the driver's own artifact): a raw JSONL stdout capture, or the
driver's BENCH_r{N}.json wrapper — a single JSON object whose string
`tail` holds the last ~2,000 chars of bench stdout. The wrapper is
detected by parsing the whole file as one JSON object with a string
`tail`, which is then re-split into capture lines.
"""
import json
import os
import sys

SLOWDOWN = 1.3
OVERHEAD_S = 100.0
DEFAULT_BUDGET_S = 1000.0
DEFAULT_FIXTURES = "/root/testdata"

# Host-noise canary calibration (round-12 ask: make captures
# self-adjudicating). graft.Bench times a fixed single-threaded spin
# (3e8 xorshift64 iterations) at start/mid/end. Calibrated clean-host
# range on this container: 0.45-0.58 s over repeated runs (~±15%
# turbo/thermal jitter), so nominal 0.50 s and a 2x threshold: any
# spin above 1.0 s means the canary thread was being descheduled by
# co-tenant load during the run -> the capture is [NOISY] and a
# slower-than-last-round total is NOT evidence of a code regression.
CANARY_NOMINAL_S = 0.50
CANARY_NOISY_FACTOR = 2.0

# IO-noise annotation from the write-path rows the bench already
# emits: the CPU spin cannot see disk contention, but r12's second
# noise signature was exactly that — the pure-IO
# write_s5_silver_partitioned row swinging 1.4 -> 12.2 s (8.7x) while
# plans were unchanged. Nominals are clean-host captures (driver r13 /
# local r14 agree within noise); 3x headroom because small absolute
# numbers jitter more than the spin does.
WRITE_NOMINAL_S = {
    "write_s5_silver_partitioned": 1.4,
    "write_s5b_dynamic_overwrite": 0.8,
    "write_s7_gold": 0.45,
}
WRITE_NOISY_FACTOR = 3.0
# positional order of the summary line's compact `write_secs` echo
# (kept in Bench.scala's write-bench emission order)
WRITE_SUMMARY_ORDER = ["write_s5_silver_partitioned",
                       "write_s5b_dynamic_overwrite", "write_s7_gold"]


def parse_capture(lines):
    """Per-query (cold, warm) seconds from a bench stdout capture.

    Accumulates the flushed progress lines (cold lines carry
    progress=query, top-K warm lines carry progress=warm), so a capture
    from a run that was itself killed mid-flight still guards
    (under-estimating: what it saw). A pre-round-8 summary line that
    still embeds full per-query maps is honored when present; the
    round-8+ compact summary carries no per-query data and is ignored
    in favor of the accumulated lines.
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
        if d.get("metric") == "total" and d.get("queries"):
            return dict(d["queries"]), dict(d.get("queries_warm", {}))
        if d.get("progress") == "query" and "name" in d:
            cold[d["name"]] = float(d.get("cold", 0.0))
            if "warm" in d:
                warm[d["name"]] = float(d["warm"])
        if d.get("progress") == "warm" and "name" in d and "warm" in d:
            warm[d["name"]] = float(d["warm"])
    return cold, warm


def estimate_s(cold, warm, slowdown=SLOWDOWN):
    return (sum(cold.values()) + sum(warm.values())) * slowdown + OVERHEAD_S


def parse_summary_echo(lines):
    """(top_cold, warm_echo) dicts from the round-17+ summary echo;
    empty dicts for an older capture. Values are the 2-decimal echoes —
    attribution-grade, not ulp-comparable to the per-line precision."""
    top_cold, warm_echo = {}, {}
    for line in lines:
        line = line.strip()
        if not line.startswith("{"):
            continue
        try:
            d = json.loads(line)
        except json.JSONDecodeError:
            continue
        if d.get("metric") == "total":
            if isinstance(d.get("top_cold"), dict):
                top_cold = {k: float(v) for k, v in d["top_cold"].items()}
            if isinstance(d.get("warm_echo"), dict):
                warm_echo = {k: float(v) for k, v in d["warm_echo"].items()}
    return top_cold, warm_echo


def merged_attribution(lines):
    """(cold, warm) per-query maps merging the per-line records with the
    summary echo. Per-line wins per name (full precision); the echo
    fills names whose per-lines scrolled out of the driver tail — the
    same merge rule as the canary and write echoes. Cold from the echo
    covers only the echoed top-K heaviest, which is exactly the
    attribution the guard prints."""
    pq_cold, pq_warm = parse_capture(lines)
    top_cold, warm_echo = parse_summary_echo(lines)
    cold = dict(top_cold)
    cold.update(pq_cold)
    warm = dict(warm_echo)
    warm.update(pq_warm)
    return cold, warm


def print_heaviest(cold, k=5):
    """Names the heaviest cold queries (round-17 ask: the driver tail
    keeps ~20 lines, so BENCH_r{N}.json alone must answer 'which
    queries are heavy' — previously unanswerable after truncation)."""
    if not cold:
        print("benchguard: heaviest colds [NO COLD ATTRIBUTION] — no "
              "per-query lines survived and the summary carries no "
              "top_cold echo (pre-round-17 capture)")
        return
    top = sorted(cold.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    print("benchguard: heaviest colds — "
          + ", ".join(f"{n}={t:.2f}s" for n, t in top))


# A warm pass re-executes the identical physical plan with codegen
# already JIT-compiled and the inter-pass cache cleared: structurally
# it can only be FASTER than its cold. A warm exceeding its own cold by
# more than jitter (20% + 0.1 s absolute — small rows jitter more in
# relative terms) means the warm pass ran under contention and the row
# is a host artifact, not a steady-state measurement. r16's smoking
# gun: q79_semantic_dedup warm 11.26 s vs ~1.5 s cold, flagged by
# nothing at the time.
WARM_SUSPECT_FACTOR = 1.2
WARM_SUSPECT_MIN_EXCESS_S = 0.1


def annotate_warm(lines):
    """Print the [WARM-SUSPECT]/[WARM-CLEAN]/[NO WARM DATA] verdict:
    each warm row against its OWN cold (merged per-line + echo). Warm
    rows whose cold is unknown (echo trimmed, tail truncated) are named
    as unadjudicated rather than silently skipped. Returns the verdict
    string."""
    cold, warm = merged_attribution(lines)
    if not warm:
        print("benchguard: warm [NO WARM DATA] — no warm rows in the "
              "capture (filtered run, streaming-only, or pre-round-8 "
              "shape)")
        return "NO WARM DATA"
    suspects = []
    unknown = []
    for name, w in sorted(warm.items()):
        c = cold.get(name)
        if c is None:
            unknown.append(name)
        elif w > c * WARM_SUSPECT_FACTOR + WARM_SUSPECT_MIN_EXCESS_S:
            suspects.append((name, w, c))
    if suspects:
        verdict = "WARM-SUSPECT"
        # cold can be 0.00: the summary echo renders at 2 decimals, so a
        # sub-5ms cold arrives as 0.0 — print the ratio only when it
        # divides
        detail = ", ".join(
            f"{n} warm {w:.2f}s vs cold {c:.2f}s"
            + (f" ({w / c:.1f}x)" if c > 0 else " (cold ~0: ratio n/a)")
            for n, w, c in suspects)
        print(f"benchguard: warm [WARM-SUSPECT] — {detail}; a warm pass "
              "re-runs the identical plan with codegen cached, so "
              "exceeding its own cold means the row is a contention "
              "artifact — exclude it from warm-total comparisons")
    elif len(unknown) == len(warm):
        # "clean" would overclaim when NOTHING was actually checked
        # (pre-round-17 capture whose colds all scrolled out)
        verdict = "WARM-UNADJUDICATED"
        print(f"benchguard: warm [WARM-UNADJUDICATED] — {len(warm)} warm "
              "rows but no cold attribution for any of them; cannot "
              "check warm-vs-own-cold")
    else:
        verdict = "WARM-CLEAN"
        print(f"benchguard: warm [WARM-CLEAN] — {len(warm) - len(unknown)} "
              f"warm rows each within {WARM_SUSPECT_FACTOR:.1f}x of their "
              "own cold")
    if unknown:
        print("benchguard: warm NOTE — no cold attribution for "
              + ", ".join(unknown)
              + " (echo trimmed or pre-round-17 capture): those rows are "
                "unadjudicated")
    return verdict


def compare_warm(lines_a, label_a, lines_b, label_b):
    """Compare two captures' warm totals on the cohort INTERSECTION
    only (round-17 ask #1b: the warm cohort is re-derived from each
    run's own cold ranking, so raw total_warm deltas compare different
    query sets — r15 vs r16's '+59 % regression' was partly set-shift).
    Refuses (returns 'REFUSED') when the cohorts are disjoint: there is
    nothing comparable, and printing a ratio anyway would manufacture
    the exact artifact this exists to kill. Returns 'OK' otherwise."""
    _, warm_a = merged_attribution(lines_a)
    _, warm_b = merged_attribution(lines_b)
    inter = sorted(set(warm_a) & set(warm_b))
    if not warm_a or not warm_b:
        missing = label_a if not warm_a else label_b
        print(f"benchguard: warm-compare [REFUSED] — no warm rows in "
              f"{missing}; nothing to compare")
        return "REFUSED"
    if not inter:
        print(f"benchguard: warm-compare [REFUSED] — cohorts are "
              f"disjoint ({len(warm_a)} rows in {label_a}, "
              f"{len(warm_b)} in {label_b}, 0 shared): the warm cohort "
              "is each run's own top-K cold ranking, so these totals "
              "measure different query sets and comparing them would "
              "manufacture a set-shift artifact, not a regression")
        return "REFUSED"
    ta = sum(warm_a[n] for n in inter)
    tb = sum(warm_b[n] for n in inter)
    only_a = len(warm_a) - len(inter)
    only_b = len(warm_b) - len(inter)
    ratio = f" ({ta / tb:.2f}x)" if tb > 0 else ""
    print(f"benchguard: warm-compare [OK] — intersection {len(inter)} "
          f"queries: {label_a} {ta:.2f}s vs {label_b} {tb:.2f}s{ratio}")
    if only_a or only_b:
        print(f"benchguard: warm-compare NOTE — excluded {only_a} rows "
              f"only in {label_a} and {only_b} only in {label_b} "
              "(cohort set-shift)")
    return "OK"


# Cold cross-capture comparison (round-17 self-review addition): the
# judge's round-over-round cold reasoning is "normalize by the canary
# spin ratio, then ask if anything moved" (r16: 0.554 -> 0.498 s spins
# explained the apparent improvement; r17: 0.50 -> 0.62 s explained the
# apparent 1.35x regression). compare_cold institutionalizes that math.
COLD_DRIFT_BAND = 0.10            # |normalized ratio - 1| <= this = drift
COLD_REGRESSION_FACTOR = 1.5      # per-query normalized naming threshold
COLD_REGRESSION_MIN_EXCESS_S = 0.5


def mean_spin(lines):
    """Mean canary spin of a capture, or None (pre-round-14 shape)."""
    spins = [s for _, s, _ in parse_canary(lines)]
    return (sum(spins) / len(spins)) if spins else None


def compare_cold(lines_a, label_a, lines_b, label_b):
    """Compare two captures' cold totals on the query INTERSECTION,
    normalized by the canary-spin ratio so host drift reads as
    [DRIFT-EXPLAINED] instead of a fake regression (and a real
    regression can't hide behind "the host got slower" — the spin pins
    how much slower). Per-query normalized outliers are named whatever
    the aggregate verdict. Refuses on disjoint cohorts like
    compare_warm; [NO-CANARY] (raw ratio only) when either capture
    predates the canary. Advisory: never changes the exit code."""
    cold_a, _ = merged_attribution(lines_a)
    cold_b, _ = merged_attribution(lines_b)
    if not cold_a or not cold_b:
        missing = label_a if not cold_a else label_b
        print(f"benchguard: cold-compare [REFUSED] — no cold "
              f"attribution in {missing}; nothing to compare")
        return "REFUSED"
    inter = sorted(set(cold_a) & set(cold_b))
    if not inter:
        print(f"benchguard: cold-compare [REFUSED] — cohorts are "
              f"disjoint ({len(cold_a)} queries in {label_a}, "
              f"{len(cold_b)} in {label_b}, 0 shared); a driver "
              "artifact carries only its top-K echo, so compare "
              "full local captures (or overlapping echoes)")
        return "REFUSED"
    ta = sum(cold_a[n] for n in inter)
    tb = sum(cold_b[n] for n in inter)
    if tb <= 0:
        print(f"benchguard: cold-compare [REFUSED] — zero cold total "
              f"in {label_b}; ratio undefined")
        return "REFUSED"
    raw = ta / tb
    sa, sb = mean_spin(lines_a), mean_spin(lines_b)
    drift = (sa / sb) if (sa and sb) else None
    if drift is None:
        verdict = "NO-CANARY"
        print(f"benchguard: cold-compare [NO-CANARY] — intersection "
              f"{len(inter)} queries: {label_a} {ta:.1f}s vs {label_b} "
              f"{tb:.1f}s (raw {raw:.2f}x); no canary spins in at "
              "least one capture, so host drift cannot be separated "
              "from real movement")
    else:
        norm = raw / drift
        inside = abs(norm - 1.0) <= COLD_DRIFT_BAND
        verdict = "DRIFT-EXPLAINED" if inside else "COLD-SHIFT"
        print(f"benchguard: cold-compare [{verdict}] — intersection "
              f"{len(inter)} queries: {label_a} {ta:.1f}s vs {label_b} "
              f"{tb:.1f}s (raw {raw:.2f}x); canary spins {sa:.2f}s vs "
              f"{sb:.2f}s (host drift {drift:.2f}x) -> drift-normalized "
              f"{norm:.2f}x, {'within' if inside else 'OUTSIDE'} the "
              f"±{COLD_DRIFT_BAND:.0%} band")
    # name per-query normalized outliers regardless of the aggregate
    # verdict (a single regressed query hides inside a clean total)
    d = drift if drift else 1.0
    regr = sorted(
        ((cold_a[n] / (cold_b[n] * d), n) for n in inter
         if cold_b[n] > 0
         and cold_a[n] > cold_b[n] * d * COLD_REGRESSION_FACTOR
         and cold_a[n] - cold_b[n] * d > COLD_REGRESSION_MIN_EXCESS_S),
        reverse=True)
    if regr:
        print("benchguard: cold-compare NOTE — normalized per-query "
              "outliers (vs drift-adjusted baseline): "
              + ", ".join(f"{n} {cold_a[n]:.2f}s vs {cold_b[n]:.2f}s "
                          f"({r:.1f}x)" for r, n in regr[:5]))
    only_a = len(cold_a) - len(inter)
    only_b = len(cold_b) - len(inter)
    if only_a or only_b:
        print(f"benchguard: cold-compare NOTE — excluded {only_a} "
              f"queries only in {label_a} and {only_b} only in "
              f"{label_b}")
    return verdict


def parse_canary(lines):
    """Canary observations from a capture: list of (phase, spin_s, load1).

    MERGES the two sources instead of either/or (r14 lesson: the
    driver's ~2,000-char stdout tail kept only the `end` per-line, and
    preferring per-lines dropped the summary echo's start/mid spins):
    per-line `{"progress":"canary",...}` records win for the phases
    they cover (they carry full-precision spin + 3-slot loadavg), and
    the summary line's compact `canary_spins`/`canary_load1` echo
    fills any phase whose per-line was truncated away. Returns [] for
    a pre-round-14 capture.
    """
    per_line, summary = {}, {}
    for line in lines:
        line = line.strip()
        if not line.startswith("{"):
            continue
        try:
            d = json.loads(line)
        except json.JSONDecodeError:
            continue
        if d.get("progress") == "canary" and "spin_sec" in d:
            load = d.get("loadavg") or [None]
            p = d.get("phase", "?")
            per_line[p] = (p, float(d["spin_sec"]), load[0])
        elif d.get("metric") == "total" and d.get("canary_spins"):
            # round-16+ summaries echo canary_phases alongside the
            # spins; decode by NAME so a phase the positional
            # convention doesn't know (a future 4th spin) merges with
            # its per-line record instead of double-counting under a
            # synthetic p{i} key. Positional start/mid/end is only the
            # legacy (r14/r15) fallback.
            phases = d.get("canary_phases")
            if phases is None:
                phases = ["start", "mid", "end"]
            loads = d.get("canary_load1") or []
            for i, s in enumerate(d["canary_spins"]):
                p = phases[i] if i < len(phases) else f"p{i}"
                summary[p] = (p, float(s),
                              loads[i] if i < len(loads) else None)
    merged = dict(summary)
    merged.update(per_line)
    rank = {"start": 0, "mid": 1, "end": 2}
    return sorted(merged.values(), key=lambda t: (rank.get(t[0], 99), t[0]))


def annotate_canary(lines):
    """Print the [NOISY]/[CLEAN]/[NO CANARY] host-noise annotation.

    Verdict comes from the spin times alone: the spin is fixed
    single-threaded work, so inflation beyond the calibrated threshold
    means CPU contention. loadavg is printed as supporting context but
    NOT thresholded — the bench's own 32 worker threads legitimately
    drive the 1-minute load into the tens at mid/end.
    Returns the verdict string for callers/selftest.
    """
    obs = parse_canary(lines)
    if not obs:
        print("benchguard: canary [NO CANARY] — pre-round-14 capture; "
              "host-noise adjudication needs out-of-band evidence")
        return "NO CANARY"
    threshold = CANARY_NOMINAL_S * CANARY_NOISY_FACTOR
    worst = max(s for _, s, _ in obs)
    noisy = worst > threshold
    detail = ", ".join(
        f"{p}={s:.2f}s" + (f" (load1 {l:.1f})" if l is not None else "")
        for p, s, l in obs)
    verdict = "NOISY" if noisy else "CLEAN"
    print(f"benchguard: canary [{verdict}] — spins {detail}; nominal "
          f"{CANARY_NOMINAL_S:.2f}s, threshold {threshold:.2f}s"
          + (f"; worst spin {worst:.2f}s = "
               f"{worst / CANARY_NOMINAL_S:.1f}x nominal: the host was "
               "contended during this capture — adjudicate regressions "
               "against per-query local numbers, not this total"
               if noisy else ""))
    return verdict


def annotate_io(lines):
    """Print the [IO-NOISY]/[IO-CLEAN]/[NO IO ROWS] annotation from the
    bench's write-path rows. Separate from the CPU canary: a clean spin
    with an inflated pure-IO write is disk/page-cache contention (the
    r12 signature), which still invalidates sink-row comparisons while
    leaving compute-bound query rows mostly credible.

    Per-line rows win per write name; the summary echo fills names
    whose per-lines were truncated away (same merge rule as the
    canary). The summary echo is decoded via its own `write_names`
    array when present (round-15+ Bench emits it); positional
    WRITE_SUMMARY_ORDER is only the legacy fallback and prints a
    warning when the slot count disagrees with the convention instead
    of silently dropping extras. Returns the verdict string."""
    nominals = WRITE_NOMINAL_S
    per_line, summary = {}, {}
    for line in lines:
        line = line.strip()
        if not line.startswith("{"):
            continue
        try:
            d = json.loads(line)
        except json.JSONDecodeError:
            continue
        if d.get("progress") == "write" and d.get("name") in nominals \
                and "sec" in d and "err" not in d:
            per_line[d["name"]] = float(d["sec"])
        elif d.get("metric") == "total" and d.get("write_secs"):
            secs = d["write_secs"]
            names = d.get("write_names")
            if names is None:
                # legacy capture: only the positional convention is
                # available — say so when the shape disagrees with it
                if len(secs) > len(WRITE_SUMMARY_ORDER):
                    print(f"benchguard: io WARNING — legacy write_secs "
                          f"echo has {len(secs)} slots but the positional "
                          f"convention names {len(WRITE_SUMMARY_ORDER)}; "
                          f"slots beyond the convention are ignored and "
                          f"the named ones may be misattributed")
                elif len(secs) < len(WRITE_SUMMARY_ORDER):
                    print(f"benchguard: io WARNING — legacy write_secs "
                          f"echo has {len(secs)} slots but the positional "
                          f"convention names {len(WRITE_SUMMARY_ORDER)}; "
                          f"all slots are used but their positional "
                          f"attribution may be wrong")
                names = WRITE_SUMMARY_ORDER
            summary = {names[i]: float(s) for i, s in enumerate(secs)
                       if s is not None and i < len(names)}
    merged = dict(summary)
    merged.update(per_line)
    obs = [(n, s) for n, s in merged.items() if n in nominals]
    obs.sort(key=lambda t: (WRITE_SUMMARY_ORDER.index(t[0])
                            if t[0] in WRITE_SUMMARY_ORDER else 99, t[0]))
    if not obs:
        print("benchguard: io [NO IO ROWS] — no usable write-path "
              "timings (filtered run, pre-round-14 summary with the "
              "per-line rows truncated away, or every write errored)")
        return "NO IO ROWS"
    worst_name, worst_ratio = max(
        ((n, s / nominals[n]) for n, s in obs), key=lambda t: t[1])
    noisy = worst_ratio > WRITE_NOISY_FACTOR
    detail = ", ".join(f"{n}={s:.2f}s ({s / nominals[n]:.1f}x of "
                       f"{nominals[n]:.2f}s)" for n, s in obs)
    verdict = "IO-NOISY" if noisy else "IO-CLEAN"
    print(f"benchguard: io [{verdict}] — {detail}; threshold "
          f"{WRITE_NOISY_FACTOR:.0f}x nominal"
          + (f"; {worst_name} at {worst_ratio:.1f}x means disk contention "
               "during the capture — sink rows are not comparable this "
               "round" if noisy else ""))
    return verdict


def newest_fixture_mtime(fixtures_dir):
    """Max mtime over every file under the fixtures root (parquet files
    sit in sf*/ subdirs); None when the root is absent (non-sandbox
    host) so the check degrades to a warning, never a false trip."""
    newest = None
    for root, _dirs, files in os.walk(fixtures_dir):
        for f in files:
            try:
                m = os.path.getmtime(os.path.join(root, f))
            except OSError:
                continue
            newest = m if newest is None else max(newest, m)
    return newest


def staleness_error(capture_path, fixtures_dir):
    """Non-None message when the capture predates the fixtures."""
    newest = newest_fixture_mtime(fixtures_dir)
    if newest is None:
        return None
    try:
        cap = os.path.getmtime(capture_path)
    except OSError:
        return None
    if cap < newest:
        return (f"capture {capture_path} (mtime {cap:.0f}) is OLDER than "
                f"the newest fixture under {fixtures_dir} (mtime "
                f"{newest:.0f}): the fixtures were regenerated after this "
                f"baseline was taken. Re-run scripts/run_bench.sh and "
                f"commit a fresh capture — a stale baseline is how the "
                f"round-8 guard passed a 4x overrun.")
    return None


def capture_lines(text):
    """Capture lines from either accepted input shape.

    A raw stdout capture is JSONL — one record per line — and is
    returned as its lines. The driver's BENCH_r{N}.json wrapper is a
    SINGLE JSON object (keys n/rc/cpus/sf/tail/parsed) whose string
    `tail` holds the last ~2,000 chars of bench stdout; the wrapper is
    unwrapped by re-splitting `tail` into lines (round-15 failure: the
    guard fed the wrapper's one line to check() and printed
    [NO CANARY]/[NO IO ROWS]/RC 2 on the very artifact it exists to
    adjudicate). Detection is by shape, not filename: the whole text
    parses as one JSON object with a string `tail` AND at least one
    other wrapper-only key (`rc` or `parsed`) — requiring the second
    key (r16 ADVICE) stops a future raw summary record or unrelated
    single-object JSON that happens to carry a string `tail` from
    being silently unwrapped and its timings exempted from the
    SLOWDOWN ratio. A raw capture never matches (each of its lines is
    a separate object, so the full text fails to parse as one; and no
    bench record carries a `tail`/`rc`/`parsed` key).

    Returns (lines, driver_origin): driver_origin is True for the
    wrapper — its timings were measured ON the driver, so the
    builder-to-driver SLOWDOWN ratio must not be applied to them again
    (round-8 calibration: driver wall 1,988 s vs driver-measured totals
    1,945.6 s, ratio ~1.0; applying 1.3x to a driver-side 700 s total
    would false-trip a 1,000 s budget at 1,010 s).
    """
    try:
        d = json.loads(text)
    except json.JSONDecodeError:
        return text.splitlines(), False
    if isinstance(d, dict) and isinstance(d.get("tail"), str) \
            and ("rc" in d or "parsed" in d):
        return d["tail"].splitlines(), True
    return text.splitlines(), False


def parse_summary_total(lines):
    """(measured_total_s, n_queries) from the compact summary line, or
    None when no summary survived. The budget fallback for tail-only
    captures where every per-query line scrolled out of the driver's
    stdout window but the summary's `value` (sum of cold secs) did not."""
    for line in lines:
        line = line.strip()
        if not line.startswith("{"):
            continue
        try:
            d = json.loads(line)
        except json.JSONDecodeError:
            continue
        if d.get("metric") == "total" and "value" in d:
            total = float(d["value"]) + float(d.get("total_warm", 0.0))
            return total, d.get("n_queries")
    return None


def check(lines, budget_s, label, driver_origin=False):
    # driver-origin timings already ARE driver wall: applying the
    # builder-to-driver ratio again would over-estimate ~30% and could
    # false-trip the budget on a run that fit (see capture_lines)
    slowdown = 1.0 if driver_origin else SLOWDOWN
    cold, warm = parse_capture(lines)
    # canary verdicts first: they must print even for a tail-only
    # capture (driver kept just the compact summary line, no per-query
    # timings) — that truncated case is what the summary echo exists for
    annotate_canary(lines)
    annotate_io(lines)
    # Two estimate sources, ONE adjudication path. A truncated driver
    # tail can keep a HANDFUL of trailing per-query lines alongside the
    # complete summary; adjudicating from that tiny partial sum would
    # silently pass an over-budget run (the guard's founding failure
    # mode). The summary basis wins exactly when the capture is
    # TRUNCATED (decided by coverage, below) and the summary's
    # estimate is the larger.
    summary = parse_summary_total(lines)
    est_pq = estimate_s(cold, warm, slowdown) if cold else None
    est_sum = summary[0] * slowdown + OVERHEAD_S if summary else None
    if est_pq is None and est_sum is None:
        print(f"benchguard: no per-query timings found in {label}")
        return 2
    # truncation is a COVERAGE fact, not an estimate-magnitude one:
    # the summary's n_queries vs the surviving per-query lines decides
    # it (a full capture's two estimates can differ by float-summation
    # ulps — magnitude alone could mislabel a complete capture as
    # truncated and drop the heaviest-query attribution). The
    # 1-second epsilon is the fallback for pre-n_queries summaries.
    truncated = False
    if cold and summary is not None:
        n = summary[1]
        truncated = (len(cold) < n) if n is not None \
            else (est_sum > est_pq + 1.0)
    from_summary = summary is not None and \
        (not cold or (truncated and est_sum > est_pq))
    if from_summary:
        est = est_sum
        total, n = summary
        basis = ("summary total " + f"{total:.1f}s"
                 + (f" over {n} queries" if n is not None else ""))
        if cold:
            basis += (f" (per-query lines cover only {len(cold)} — "
                      f"truncated capture)")
        else:
            basis = f"no per-query timings in {label}; using " + basis
    else:
        est = est_pq
        basis = (f"{len(cold)} queries, measured {sum(cold.values()):.1f}s "
                 f"cold + {sum(warm.values()):.1f}s warm")
    # round-17: per-query attribution + warm contention, straight from
    # the wrapper (per-line records win; the summary echo fills what the
    # driver tail truncated). For a TRUNCATED capture without an echo
    # the surviving per-line colds are arbitrary tail stragglers —
    # naming them "heaviest" would misdirect, so say so instead.
    top_cold_echo, _ = parse_summary_echo(lines)
    if top_cold_echo or (cold and not truncated):
        merged_cold, _ = merged_attribution(lines)
        print_heaviest(merged_cold)
    elif cold:
        print("benchguard: heaviest colds [NO COLD ATTRIBUTION] — "
              "truncated capture without a top_cold echo: the "
              f"{len(cold)} surviving per-query lines are tail "
              "stragglers, not the heaviest")
    else:
        print_heaviest({})
    annotate_warm(lines)
    verdict = "OK" if est <= budget_s else "OVER BUDGET"
    print(f"benchguard: {basis} -> estimated driver wall {est:.1f}s vs "
          f"budget {budget_s:.0f}s [{verdict}]")
    if est > budget_s:
        if from_summary:
            top_cold = top_cold_echo  # parsed once above
            if top_cold:
                # round-17+: the summary's own top_cold echo IS the
                # heavy-query attribution — no local re-run needed
                top = sorted(top_cold.items(),
                             key=lambda kv: (-kv[1], kv[0]))[:5]
                print("  heaviest cold queries (summary echo): "
                      + ", ".join(f"{n}={t:.2f}s" for n, t in top))
            else:
                # the surviving per-query lines (if any) are arbitrary
                # tail stragglers — naming them as "heaviest" would
                # misdirect
                print("  per-query attribution unavailable in a "
                      "truncated capture — re-run scripts/run_bench.sh "
                      "locally to find the heavy queries.")
        else:
            top = sorted(cold.items(), key=lambda kv: -kv[1])[:5]
            print("  heaviest cold queries: "
                  + ", ".join(f"{n}={t:.1f}s" for n, t in top))
            print("  cut passes or query cost before the DRIVER discovers "
                  "this as an rc-124 bench.")
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
    # round-8+ shape: progress lines + separate top-K warm lines + a
    # COMPACT summary (no per-query maps) — the parser must use the
    # accumulated lines, not return the summary's empty maps
    compact = (
        [json.dumps({"progress": "query", "name": f"q{i}", "cold": 1.5,
                     "streaming": False}) for i in range(100)]
        + [json.dumps({"progress": "warm", "name": f"q{i}", "warm": 1.0})
           for i in range(20)]
        + [json.dumps({"metric": "total", "value": 150.0, "unit": "sec",
                       "total_warm": 20.0, "n_warm": 20,
                       "n_queries": 100, "n_errors": 0})])
    c, w = parse_capture(compact)
    assert len(c) == 100 and len(w) == 20, \
        f"compact-shape parse failed: {len(c)} cold / {len(w)} warm"
    assert check(compact, DEFAULT_BUDGET_S, "selftest-compact") == 0
    # staleness: a capture older than the newest fixture must refuse
    import tempfile
    with tempfile.TemporaryDirectory() as d:
        fixtures = os.path.join(d, "fixtures")
        os.makedirs(fixtures)
        cap = os.path.join(d, "capture.jsonl")
        with open(cap, "w") as f:
            f.write(under[0] + "\n")
        os.utime(cap, (1000.0, 1000.0))
        fix = os.path.join(fixtures, "t.parquet")
        with open(fix, "w") as f:
            f.write("x")
        os.utime(fix, (2000.0, 2000.0))
        assert staleness_error(cap, fixtures) is not None, \
            "staleness check failed to flag a capture older than fixtures"
        os.utime(cap, (3000.0, 3000.0))
        assert staleness_error(cap, fixtures) is None, \
            "staleness check tripped on a capture newer than fixtures"
        assert staleness_error(cap, os.path.join(d, "missing")) is None, \
            "missing fixtures dir must degrade to no-check, not a trip"
    # canary: clean spins stay CLEAN, one contended spin flips NOISY,
    # a pre-canary capture says so instead of guessing
    clean_lines = [
        json.dumps({"progress": "canary", "phase": p, "spin_sec": s,
                    "loadavg": [0.8, 0.3, 0.2], "cpus": 32})
        for p, s in [("start", 0.46), ("mid", 0.55), ("end", 0.50)]]
    assert annotate_canary(clean_lines) == "CLEAN"
    noisy_lines = clean_lines[:2] + [json.dumps(
        {"progress": "canary", "phase": "end", "spin_sec": 2.4,
         "loadavg": [61.0, 40.0, 22.0], "cpus": 32})]
    assert annotate_canary(noisy_lines) == "NOISY"
    assert annotate_canary(compact) == "NO CANARY"
    # summary-echo fallback: only the compact summary line survived the
    # driver's stdout tail, canary verdict must still resolve
    tail_only = [json.dumps(
        {"metric": "total", "value": 300.0, "unit": "sec",
         "total_warm": 40.0, "n_warm": 20, "n_queries": 293,
         "n_errors": 0, "canary_spins": [0.47, 1.9, 0.52],
         "canary_load1": [0.9, 44.0, 3.1]})]
    assert annotate_canary(tail_only) == "NOISY"
    # the CLI path must reach the canary verdict BEFORE the per-query
    # bail, and a tail-only capture WITH a summary value now adjudicates
    # the budget from that total (round-15 ask's bonus) instead of RC 2
    assert check(tail_only, DEFAULT_BUDGET_S, "selftest-tail-cli") == 0
    # ... and still trips when that summary total blows the budget
    tail_over = [json.dumps({"metric": "total", "value": 900.0,
                             "total_warm": 100.0, "n_queries": 294})]
    assert check(tail_over, DEFAULT_BUDGET_S, "selftest-tail-over") == 1
    # a capture with NEITHER per-query lines NOR a summary stays RC 2
    assert check([json.dumps({"progress": "canary", "phase": "end",
                              "spin_sec": 0.5, "loadavg": [1.0]})],
                 DEFAULT_BUDGET_S, "selftest-no-data") == 2
    # PARTIAL-TAIL MERGE (the r14 truncation scenario the merge was
    # built for): the driver's tail kept only the `end` per-line record
    # plus the summary echo. All three phases must be reported, with
    # the per-line's full-precision spin winning for `end` — here the
    # summary echoes a rounded/noisy end spin of 1.9 while the per-line
    # says 0.52, so a per-line-wins merge stays CLEAN; either/or logic
    # would have dropped start/mid (per-line-only) or gone NOISY
    # (summary-only).
    partial_tail = [
        json.dumps({"progress": "canary", "phase": "end",
                    "spin_sec": 0.52, "loadavg": [3.1, 2.0, 1.0],
                    "cpus": 32}),
        json.dumps({"metric": "total", "value": 300.0, "unit": "sec",
                    "n_queries": 294, "n_errors": 0,
                    "canary_spins": [0.47, 0.55, 1.9],
                    "canary_load1": [0.9, 4.0, 3.1]})]
    merged = parse_canary(partial_tail)
    assert [p for p, _, _ in merged] == ["start", "mid", "end"], \
        f"partial-tail merge lost a phase: {merged}"
    assert dict((p, s) for p, s, _ in merged)["end"] == 0.52, \
        "per-line precision must win over the summary echo for `end`"
    assert annotate_canary(partial_tail) == "CLEAN"
    # round-16+ summary names its phases: a 4th phase (`post`) echoed in
    # the summary must merge with its per-line record by NAME — one
    # observation, not a double count under a synthetic p3 key
    named_phases = [
        json.dumps({"progress": "canary", "phase": "post",
                    "spin_sec": 0.51, "loadavg": [1.2], "cpus": 32}),
        json.dumps({"metric": "total", "value": 300.0,
                    "canary_phases": ["start", "mid", "end", "post"],
                    "canary_spins": [0.47, 0.5, 0.49, 0.6],
                    "canary_load1": [0.9, 1.0, 1.1, 1.2]})]
    named = parse_canary(named_phases)
    assert len(named) == 4, f"named-phase merge double-counted: {named}"
    assert dict((p, s) for p, s, _ in named)["post"] == 0.51, \
        "per-line must win for the named 4th phase"
    # io annotation: clean write rows, the r12 8.7x signature, a
    # filtered capture with no write rows, and an errored write row
    # (time-to-failure, never fed into the ratio)
    io_clean = [json.dumps({"progress": "write", "name": n, "sec": s})
                for n, s in [("write_s5_silver_partitioned", 1.35),
                             ("write_s5b_dynamic_overwrite", 0.79),
                             ("write_s7_gold", 0.33)]]
    assert annotate_io(io_clean) == "IO-CLEAN"
    io_noisy = io_clean[1:] + [json.dumps(
        {"progress": "write", "name": "write_s5_silver_partitioned",
         "sec": 12.2})]
    assert annotate_io(io_noisy) == "IO-NOISY"
    assert annotate_io([]) == "NO IO ROWS"
    io_err = [json.dumps({"progress": "write",
                          "name": "write_s5_silver_partitioned",
                          "sec": 0.01, "err": "IOException: disk full"})]
    assert annotate_io(io_err) == "NO IO ROWS"
    # tail-only fallback: the compact write_secs echo alone must still
    # resolve an IO verdict (r12's scenario WAS a driver tail capture),
    # with null slots (errored writes) skipped
    io_tail = [json.dumps(
        {"metric": "total", "value": 300.0, "write_secs": [12.2, None, 0.4],
         "canary_spins": [0.5, 0.5, 0.5]})]
    assert annotate_io(io_tail) == "IO-NOISY"
    io_tail_clean = [json.dumps(
        {"metric": "total", "value": 300.0,
         "write_secs": [1.3, 0.8, 0.4]})]
    assert annotate_io(io_tail_clean) == "IO-CLEAN"
    # write_names in NON-convention order: attribution must follow the
    # names, not the slots — 12.2 s in slot 0 belongs to the 0.45 s
    # nominal gold write here (27x -> IO-NOISY); positional decoding
    # would have read it as the 1.4 s-nominal silver write (8.7x, also
    # noisy) so pin the attribution itself via the printed detail
    import io as _io
    import contextlib
    io_named = [json.dumps(
        {"metric": "total", "value": 300.0,
         "write_names": ["write_s7_gold", "write_s5_silver_partitioned",
                         "write_s5b_dynamic_overwrite"],
         "write_secs": [12.2, 1.3, 0.8]})]
    buf = _io.StringIO()
    with contextlib.redirect_stdout(buf):
        verdict = annotate_io(io_named)
    assert verdict == "IO-NOISY"
    assert "write_s7_gold=12.20s (27." in buf.getvalue(), \
        f"write_names attribution ignored: {buf.getvalue()}"
    # legacy echo (no write_names) with MORE slots than the positional
    # convention: must warn that extras are ignored
    buf = _io.StringIO()
    with contextlib.redirect_stdout(buf):
        annotate_io([json.dumps({"metric": "total", "value": 300.0,
                                 "write_secs": [1.3, 0.8, 0.4, 9.9]})])
    assert "slots beyond the convention are ignored" in buf.getvalue(), \
        f"missing too-many-slots warning: {buf.getvalue()}"
    # ... and with FEWER slots: all slots ARE used, so the message must
    # say attribution-may-be-wrong, not extras-ignored
    buf = _io.StringIO()
    with contextlib.redirect_stdout(buf):
        v = annotate_io([json.dumps({"metric": "total", "value": 300.0,
                                     "write_secs": [1.3, 0.8]})])
    out = buf.getvalue()
    assert v == "IO-CLEAN" and "positional attribution may be wrong" in out \
        and "ignored" not in out, f"wrong few-slots warning: {out}"
    # DRIVER-WRAPPER shape (the round-15 front-door failure):
    # BENCH_r{N}.json is one JSON object whose string `tail` holds a
    # TRUNCATED stdout tail — a partial first line, one per-line canary,
    # and the summary echo. capture_lines must unwrap it so both
    # verdicts resolve and the summary total adjudicates the budget.
    wrapper = json.dumps({
        "n": 294, "rc": 0, "cpus": 32, "sf": "/root/testdata/sf0.1",
        "tail": ('...,"sf":"/root/testdata/sf0.1"}\n'
                 + json.dumps({"progress": "canary", "phase": "end",
                               "spin_sec": 0.54, "loadavg": [4.2, 5.0, 4.8],
                               "cpus": 32}) + "\n"
                 + json.dumps({"metric": "total", "value": 334.1,
                               "unit": "sec", "total_warm": 38.1,
                               "n_warm": 20, "n_queries": 294,
                               "n_errors": 0,
                               "canary_spins": [0.52, 0.61, 0.54],
                               "canary_load1": [2.8, 6.4, 4.2],
                               "write_names": WRITE_SUMMARY_ORDER,
                               "write_secs": [1.59, 0.75, 0.41]}) + "\n"),
        "parsed": {"metric": "total", "value": 334.1}})
    wl, wo = capture_lines(wrapper)
    assert wo, "wrapper must be flagged driver-origin"
    assert len(wl) == 3, f"wrapper unwrap produced {len(wl)} lines"
    buf = _io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = check(wl, DEFAULT_BUDGET_S, "selftest-wrapper",
                   driver_origin=True)
    out = buf.getvalue()
    assert rc == 0, f"wrapper capture must adjudicate, got rc {rc}: {out}"
    assert "canary [CLEAN]" in out and "start=0.52s" in out \
        and "end=0.54s" in out, f"wrapper canary verdict missing: {out}"
    assert "io [IO-CLEAN]" in out, f"wrapper io verdict missing: {out}"
    assert "using summary total" in out, \
        f"wrapper budget fallback missing: {out}"
    # a raw JSONL capture must pass through capture_lines untouched
    # and NOT be flagged driver-origin
    raw = "\n".join(io_clean) + "\n"
    assert capture_lines(raw) == (raw.splitlines(), False)
    # ... including a single-line raw capture (one summary line is one
    # valid JSON object but has no string `tail`, so NOT a wrapper)
    assert capture_lines(io_tail_clean[0]) == ([io_tail_clean[0]], False)
    # DRIVER-ORIGIN BUDGET MODEL: a 700s driver-side total fits a
    # 1000s budget (ratio ~1.0 + overhead = 800s); applying the
    # builder-to-driver SLOWDOWN again would false-trip at 1010s.
    drv_total = [json.dumps({"metric": "total", "value": 650.0,
                             "total_warm": 50.0, "n_queries": 294})]
    assert check(drv_total, DEFAULT_BUDGET_S, "selftest-driver-origin",
                 driver_origin=True) == 0
    assert check(drv_total, DEFAULT_BUDGET_S,
                 "selftest-local-origin") == 1
    # TRUNCATED-TAIL PARTIAL per-query lines must not preempt the
    # summary total: 5 surviving 1s query lines estimate ~105s, but
    # the summary says the run took 900s+100s warm — the larger
    # estimate (summary) must adjudicate, catching the over-budget run
    trunc = ([json.dumps({"progress": "query", "name": f"q{i}",
                          "cold": 1.0}) for i in range(5)]
             + [json.dumps({"metric": "total", "value": 900.0,
                            "total_warm": 100.0, "n_queries": 294})])
    buf = _io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = check(trunc, DEFAULT_BUDGET_S, "selftest-trunc-tail",
                   driver_origin=True)
    out = buf.getvalue()
    assert rc == 1, f"truncated-tail over-budget run must trip: {out}"
    assert "truncated capture" in out and "cover only 5" in out, \
        f"basis must name the summary + truncation: {out}"
    # pre-n_queries summary (no coverage signal): the 1-second-epsilon
    # magnitude fallback must still flag the truncation and trip
    trunc_legacy = trunc[:-1] + [json.dumps(
        {"metric": "total", "value": 900.0, "total_warm": 100.0})]
    buf = _io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = check(trunc_legacy, DEFAULT_BUDGET_S,
                   "selftest-trunc-legacy", driver_origin=True)
    out = buf.getvalue()
    assert rc == 1 and "truncated capture" in out, \
        f"epsilon fallback failed to flag a pre-n_queries truncation: {out}"
    # the 5 surviving ~1s stragglers are NOT the heavy queries — the
    # diagnostic must say attribution is unavailable, never list them
    assert "heaviest cold queries" not in out \
        and "attribution unavailable" in out, \
        f"truncated over-budget diagnostic misattributes: {out}"
    # ... and a FULL capture (all n_queries covered, warm lines plus a
    # matching total_warm echo) keeps the per-query basis — pinned via
    # the printed basis, not just the (identical) rc. The warm values
    # sum in a different order on each side, so the two estimates can
    # differ by float ulps: coverage, not magnitude, must decide.
    full = ([json.dumps({"progress": "query", "name": f"q{i}",
                         "cold": 3.0}) for i in range(100)]
            + [json.dumps({"progress": "warm", "name": f"q{i}",
                           "warm": 0.1 + i * 0.01}) for i in range(20)]
            + [json.dumps({"metric": "total", "value": 300.0,
                           "total_warm": sum(0.1 + i * 0.01
                                             for i in range(19, -1, -1)),
                           "n_queries": 100})])
    buf = _io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = check(full, DEFAULT_BUDGET_S, "selftest-full-capture")
    out = buf.getvalue()
    assert rc == 0 and "100 queries, measured 300.0s" in out \
        and "truncated capture" not in out, \
        f"full capture must keep the per-query basis: {out}"
    # ---- round-17 cases (VERDICT r16 ask #1) ----
    # (i) TOP_COLD ECHO SURVIVING A TAIL-ONLY CAPTURE: every per-query
    # line scrolled out of the driver tail, but the summary's top_cold
    # echo alone must still name the heaviest colds — the ask's literal
    # done-criterion ("BENCH_r{N}.json alone names the heavy queries
    # after the tail truncates the per-query lines").
    topcold_tail = [json.dumps(
        {"metric": "total", "value": 300.0, "unit": "sec",
         "total_warm": 40.0, "n_warm": 20, "n_queries": 295,
         "n_errors": 0,
         "top_cold": {"q110_wedge": 6.31, "q107_stream": 4.82,
                      "q102_shingle": 4.11, "q263_x": 3.9, "q176_y": 3.88},
         "warm_echo": {"q110_wedge": 4.1, "q102_shingle": 2.2},
         "canary_spins": [0.47, 0.5, 0.52],
         "canary_load1": [0.9, 1.0, 1.1]})]
    buf = _io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = check(topcold_tail, DEFAULT_BUDGET_S, "selftest-topcold-tail",
                   driver_origin=True)
    out = buf.getvalue()
    assert rc == 0, f"selftest-topcold-tail rc {rc}: {out}"
    assert "heaviest colds — q110_wedge=6.31s, q107_stream=4.82s" in out, \
        f"top_cold echo must name the heaviest in a tail-only capture: {out}"
    assert "warm [WARM-CLEAN]" in out, \
        f"tail-only warm rows must adjudicate against echoed colds: {out}"
    # ... and when a tail-only capture is ALSO over budget, the echo
    # replaces the old attribution-unavailable apology
    topcold_over = [json.dumps(
        {"metric": "total", "value": 900.0, "total_warm": 100.0,
         "n_queries": 295,
         "top_cold": {"q110_wedge": 55.0, "q263_x": 41.2}})]
    buf = _io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = check(topcold_over, DEFAULT_BUDGET_S, "selftest-topcold-over",
                   driver_origin=True)
    out = buf.getvalue()
    assert rc == 1 and "heaviest cold queries (summary echo): " \
        "q110_wedge=55.00s" in out \
        and "attribution unavailable" not in out, \
        f"over-budget tail must attribute from the echo: {out}"
    # (ii) WARM > COLD FLAGGED: the r16 smoking gun — q79 warm 11.26 s
    # against a ~1.5 s cold is a contention artifact that nothing named
    # at the time; it must come out [WARM-SUSPECT] with both numbers.
    warm_suspect = [
        json.dumps({"progress": "query", "name": "q79_semantic_dedup",
                    "cold": 1.46, "streaming": False}),
        json.dumps({"progress": "query", "name": "q110_wedge",
                    "cold": 6.3, "streaming": False}),
        json.dumps({"progress": "warm", "name": "q79_semantic_dedup",
                    "warm": 11.26}),
        json.dumps({"progress": "warm", "name": "q110_wedge",
                    "warm": 5.9})]
    buf = _io.StringIO()
    with contextlib.redirect_stdout(buf):
        v = annotate_warm(warm_suspect)
    out = buf.getvalue()
    assert v == "WARM-SUSPECT" and \
        "q79_semantic_dedup warm 11.26s vs cold 1.46s (7.7x)" in out, \
        f"selftest-warm-suspect: warm>cold not flagged: {out}"
    # warm within jitter of its own cold stays CLEAN (0.50 vs 0.49
    # would otherwise false-flag every light row)
    warm_clean = [
        json.dumps({"progress": "query", "name": "q1", "cold": 0.49}),
        json.dumps({"progress": "warm", "name": "q1", "warm": 0.50})]
    assert annotate_warm(warm_clean) == "WARM-CLEAN", \
        "selftest-warm-clean: sub-jitter warm excess must not flag"
    # a warm row with NO cold anywhere (echo trimmed) is named as
    # unadjudicated — and when NO row could be checked, the verdict says
    # so instead of overclaiming CLEAN
    buf = _io.StringIO()
    with contextlib.redirect_stdout(buf):
        v = annotate_warm([json.dumps(
            {"progress": "warm", "name": "q_orphan", "warm": 2.0})])
    assert v == "WARM-UNADJUDICATED" and "no cold attribution for q_orphan" \
        in buf.getvalue(), \
        f"orphan warm row must be named unadjudicated: {buf.getvalue()}"
    assert annotate_warm([]) == "NO WARM DATA"
    # a 0.00 cold (sub-5ms rendered at the echo's 2 decimals) must not
    # divide-by-zero the suspect detail — verdict still lands, ratio n/a
    warm_zero_cold = [
        json.dumps({"metric": "total", "value": 1.0, "n_queries": 1,
                    "top_cold": {"q_tiny": 0.00},
                    "warm_echo": {"q_tiny": 0.50}})]
    buf = _io.StringIO()
    with contextlib.redirect_stdout(buf):
        v = annotate_warm(warm_zero_cold)
    assert v == "WARM-SUSPECT" and "cold ~0: ratio n/a" in buf.getvalue(), \
        f"selftest-warm-zero-cold: 0.00 cold must not crash: {buf.getvalue()}"
    # (iii) DISJOINT-COHORT WARM COMPARISON REFUSING RATHER THAN
    # COMPARING: the warm cohort is each run's own top-K cold ranking;
    # r15-vs-r16 compared different sets and manufactured a "+59 %
    # regression". Zero shared queries -> REFUSED, no ratio printed.
    cohort_a = [json.dumps({"progress": "warm", "name": f"qa{i}",
                            "warm": 1.0}) for i in range(3)]
    cohort_b = [json.dumps({"progress": "warm", "name": f"qb{i}",
                            "warm": 2.0}) for i in range(3)]
    buf = _io.StringIO()
    with contextlib.redirect_stdout(buf):
        v = compare_warm(cohort_a, "selftest-warm-disjoint-a",
                         cohort_b, "selftest-warm-disjoint-b")
    out = buf.getvalue()
    assert v == "REFUSED" and "cohorts are disjoint" in out \
        and "x)" not in out, \
        f"selftest-warm-disjoint: must refuse, not compare: {out}"
    # overlapping cohorts compare on the INTERSECTION only, naming the
    # set-shift exclusions
    overlap_b = cohort_a[:2] + [json.dumps(
        {"progress": "warm", "name": "qb9", "warm": 5.0})]
    buf = _io.StringIO()
    with contextlib.redirect_stdout(buf):
        v = compare_warm(cohort_a, "capA", overlap_b, "capB")
    out = buf.getvalue()
    assert v == "OK" and "intersection 2 queries" in out \
        and "excluded 1 rows only in capA and 1 only in capB" in out, \
        f"intersection compare wrong: {out}"
    # an empty warm side refuses too (nothing comparable)
    assert compare_warm(cohort_a, "a", [], "b") == "REFUSED"
    # COLD-COMPARE (round-17 self-review addition): cross-capture cold
    # ratios normalized by the canary-spin ratio. (i) a uniformly
    # 1.3x-slower capture whose spins are ALSO 1.3x slower is host
    # drift, not a regression — the r17 363.9s-vs-269.7s case.
    def cold_cap(times, spin):
        per = [json.dumps({"progress": "query", "name": n, "cold": t,
                           "streaming": False}) for n, t in times.items()]
        return per + [json.dumps({"progress": "canary", "phase": "start",
                                  "spin_sec": spin, "loadavg": [0.5]})]
    base = {"q1": 1.0, "q2": 2.0, "q3": 4.0}
    drifted = {n: t * 1.3 for n, t in base.items()}
    buf = _io.StringIO()
    with contextlib.redirect_stdout(buf):
        v = compare_cold(cold_cap(drifted, 0.65), "now",
                         cold_cap(base, 0.50), "baseline")
    out = buf.getvalue()
    assert v == "DRIFT-EXPLAINED" and "drift-normalized 1.00x" in out \
        and "outliers" not in out, \
        f"selftest-cold-drift: uniform drift must be explained: {out}"
    # (ii) a real regression can't hide behind drift: same spins, one
    # query 5x — aggregate verdict flips and the query is NAMED
    regressed = dict(base, q3=20.0)
    buf = _io.StringIO()
    with contextlib.redirect_stdout(buf):
        v = compare_cold(cold_cap(regressed, 0.50), "now",
                         cold_cap(base, 0.50), "baseline")
    out = buf.getvalue()
    assert v == "COLD-SHIFT" and "q3 20.00s vs 4.00s (5.0x)" in out, \
        f"selftest-cold-regression: regression must be named: {out}"
    # (iii) disjoint cohorts refuse; (iv) no canary -> raw ratio only
    buf = _io.StringIO()
    with contextlib.redirect_stdout(buf):
        v = compare_cold(cold_cap({"qa": 1.0}, 0.5), "a",
                         cold_cap({"qb": 1.0}, 0.5), "b")
    assert v == "REFUSED" and "disjoint" in buf.getvalue()
    no_canary = [json.dumps({"progress": "query", "name": "q1",
                             "cold": 1.3, "streaming": False})]
    buf = _io.StringIO()
    with contextlib.redirect_stdout(buf):
        v = compare_cold(no_canary, "a", cold_cap(base, 0.5), "b")
    assert v == "NO-CANARY" and "raw 1.30x" in buf.getvalue(), \
        f"selftest-cold-nocanary: {buf.getvalue()}"
    # wrapper detection TIGHTENED (r16 ADVICE): a single JSON object
    # with a string `tail` but NO rc/parsed is NOT the driver wrapper —
    # it must pass through as a raw capture, keeping the SLOWDOWN ratio
    not_wrapper = json.dumps({"metric": "total", "value": 300.0,
                              "tail": "some unrelated string"})
    nl, no = capture_lines(not_wrapper)
    assert not no and nl == [not_wrapper], \
        "tail-only object without rc/parsed must not unwrap as wrapper"
    # per-line precision beats the 2-decimal echo in the merge
    echo_merge = [
        json.dumps({"progress": "query", "name": "q110_wedge",
                    "cold": 6.312345}),
        json.dumps({"metric": "total", "value": 300.0,
                    "top_cold": {"q110_wedge": 6.31, "q263_x": 3.9}})]
    mc, _ = merged_attribution(echo_merge)
    assert mc["q110_wedge"] == 6.312345 and mc["q263_x"] == 3.9, \
        f"per-line must win in the attribution merge: {mc}"
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
    fixtures = DEFAULT_FIXTURES
    if "--fixtures" in args:
        i = args.index("--fixtures")
        fixtures = args[i + 1]
        del args[i:i + 2]
    if "--no-staleness-check" in args:
        args.remove("--no-staleness-check")
        fixtures = None
    compare_path = None
    if "--compare-warm" in args:
        i = args.index("--compare-warm")
        compare_path = args[i + 1]
        del args[i:i + 2]
    compare_cold_path = None
    if "--compare-cold" in args:
        i = args.index("--compare-cold")
        compare_cold_path = args[i + 1]
        del args[i:i + 2]
    if fixtures is not None:
        err = staleness_error(args[0], fixtures)
        if err is not None:
            print(f"benchguard: STALE BASELINE — {err}")
            return 2
    with open(args[0]) as f:
        lines, driver_origin = capture_lines(f.read())
    rc = check(lines, budget, args[0], driver_origin=driver_origin)
    if compare_path is not None:
        # advisory: a REFUSED comparison is the CORRECT outcome for
        # disjoint cohorts (a fact about the two captures, not a defect
        # of this one), so it never changes the exit code
        with open(compare_path) as f:
            other, _ = capture_lines(f.read())
        compare_warm(lines, args[0], other, compare_path)
    if compare_cold_path is not None:
        # advisory like --compare-warm
        with open(compare_cold_path) as f:
            other, _ = capture_lines(f.read())
        compare_cold(lines, args[0], other, compare_cold_path)
    return rc


if __name__ == "__main__":
    sys.exit(main())
