#!/usr/bin/env python3
"""Cross-scale row-count trend sentinel (round-20, VERDICT r19 #5).

The zero-row gate (check.py, round-19) catches a query whose result
COLLAPSED ALL THE WAY to empty — but SURVEY §7.10's empty-graph class
decays gradually: a fixture or constant change first shrinks a result
to a couple of degenerate groups at the larger SF while the oracle
(same SQL, same data) keeps hash-matching. This sentinel compares the
two-scale sweep's outputs: a query whose row count at the LARGER scale
factor is both SMALLER than at the smaller SF and <= LOW_CARD rows is
flagged — more data producing fewer, near-constant groups is the
degeneracy signature, never a healthy aggregate shape (constant-size
results compare equal, growing results grow, and the emptyOk pair is
covered by the strict '<').

The predicate is deliberately narrow (<= 2 rows AND strictly shrinking)
so legitimate fixed-cardinality results (|enum| groups, top-k limits,
one-row corpus stats) can never trip it: those are equal across SFs.

Usage:
    rowtrend.py <outDirSmall> <outDirBig>   # two Verify output dirs
    rowtrend.py --selftest

Exit: 0 clean, 1 suspect(s), 2 unusable inputs.
"""
import json
import os
import sys

LOW_CARD = 2


def query_rows(out_dir):
    """{query_name: row_count} for every per-query parquet dir under a
    Verify output dir — metadata-only reads, no data scan."""
    import pyarrow.parquet as pq
    rows = {}
    for name in sorted(os.listdir(out_dir)):
        p = os.path.join(out_dir, name)
        if not os.path.isdir(p) or name.startswith("_"):
            continue
        try:
            rows[name] = pq.ParquetDataset(p).read(columns=[]).num_rows
        except Exception:
            # a non-parquet dir (staging leftovers) is not a query result
            continue
    return rows


def check_trend(rows_small, rows_big, label_small, label_big):
    """Prints the verdict line; returns the suspect list."""
    shared = sorted(set(rows_small) & set(rows_big))
    if not shared:
        print("rowtrend: [UNUSABLE] — no query appears in both output "
              f"dirs ({len(rows_small)} vs {len(rows_big)} results)")
        return None
    suspects = [(q, rows_small[q], rows_big[q]) for q in shared
                if rows_big[q] < rows_small[q] and rows_big[q] <= LOW_CARD]
    if suspects:
        detail = ", ".join(f"{q} {a} rows @{label_small} -> {b} rows "
                           f"@{label_big}" for q, a, b in suspects)
        print(f"rowtrend: [SUSPECT] — {detail}; a result that SHRINKS to "
              f"<= {LOW_CARD} rows as the data grows is the degeneracy "
              "signature the oracle cannot see (same SQL, same data — "
              "SURVEY §7.10): inspect the query before trusting the "
              "hash match")
    else:
        print(f"rowtrend: [CLEAN] — {len(shared)} queries, none shrink "
              f"to <= {LOW_CARD} rows at the larger scale")
    return suspects


def selftest():
    # healthy shapes: constant |enum| result, growing result, top-k
    small = {"q_enum": 5, "q_grow": 100, "q_topk": 20, "q_one": 1}
    big = {"q_enum": 5, "q_grow": 1000, "q_topk": 20, "q_one": 1}
    assert check_trend(small, big, "sf0.01", "sf0.1") == []
    # the §7.10 class BEFORE it reaches zero: 9 groups -> 2 groups
    import io
    import contextlib
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        sus = check_trend({"q_graph": 9}, {"q_graph": 2}, "a", "b")
    assert sus == [("q_graph", 9, 2)] and "SUSPECT" in buf.getvalue(), \
        buf.getvalue()
    # ... and all the way to zero (the round-19 gate's class) still trips
    assert check_trend({"q_g": 9}, {"q_g": 0}, "a", "b") == [("q_g", 9, 0)]
    # the emptyOk pair's real shapes never trip: q09 0 -> 1 (grows),
    # q193 0 -> 0 (not strictly shrinking)
    assert check_trend({"q09": 0, "q193": 0}, {"q09": 1, "q193": 0},
                       "a", "b") == []
    # shrinking but still high-cardinality is NOT this sentinel's class
    # (dedup survivor counts can legitimately dip); stays clean
    assert check_trend({"q_dedup": 500}, {"q_dedup": 480}, "a", "b") == []
    # disjoint dirs are an error, not a silent pass
    assert check_trend({"qa": 1}, {"qb": 1}, "a", "b") is None
    print("rowtrend selftest: PASS")
    return 0


def main():
    args = sys.argv[1:]
    if args and args[0] == "--selftest":
        return selftest()
    if len(args) != 2:
        print(__doc__)
        return 2
    rows_small, rows_big = query_rows(args[0]), query_rows(args[1])
    suspects = check_trend(rows_small, rows_big, args[0], args[1])
    if suspects is None:
        return 2
    return 1 if suspects else 0


if __name__ == "__main__":
    sys.exit(main())
