"""Generate BENCH_COMPARE.md — the committed per-round bench comparison.

Inputs: the driver-recorded BENCH_r01.json (single-shot r1 anchor), the
committed r3 defended runs (bench_runs/r3_run{A,B}.json — the previous
fully-defended baseline), and two consecutive self-defending bench.py runs
from the current round.  Emits a per-query table, checks the two current
runs agree (the 20% reproducibility gate), normalizes cross-round totals by
the fixed busy-loop probe (identical code every round: if the probe slowed
down, the MACHINE did), and flags any query whose probe-adjusted best time
is >2x its r3 best so a root cause can be written next to it.

Usage: python tools/bench_compare.py RUN_A.json RUN_B.json > BENCH_COMPARE.md
"""

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Root causes for queries whose probe-adjusted best exceeds 2x their r3
# best (anything not listed here and still >2x is unexplained and should
# block the round).
KNOWN = {
    "multimodal_features": (
        "mapInPandas Python-worker startup variance: per-run samples span "
        "0.6-5.4 s with min 0.62 s = r3's 0.46 s x the machine factor — "
        "no plan change this round; median is startup-luck."),
    "udf_vectorized": (
        "ROOT CAUSE (r10, measured): Python-worker pool lifecycle, not the "
        "operator. Cold pool (first pandas_udf of a session, 32 workers "
        "importing pandas/pyarrow) = 3.7 s; back-to-back warm = 0.32-0.42 s; "
        "after a 70 s idle gap = 0.63 s (workers idle-reaped, partial "
        "respawn). The r3->r9 drift (0.20->0.35->0.72 s) tracks CATALOG "
        "GROWTH (57->174 queries): the sweep gap between Python-worker "
        "queries grew past the reap horizon, so every sample pays respawn. "
        "bench.py now warms the worker pool beside the JVM warm-up; "
        "remaining inter-sweep idle cost is a harness artifact, bounded "
        "~0.3 s, shared by all pandas_udf/mapInPandas queries."),
}


def _load_r1() -> dict:
    try:
        with open(os.path.join(REPO, "BENCH_r01.json")) as f:
            return json.load(f)["parsed"]["queries"]
    except Exception:
        return {}


def _load_run(path: str) -> dict | None:
    try:
        with open(path) as f:
            return json.load(f)
    except OSError:
        return None


def main() -> None:
    a = _load_run(sys.argv[1])
    b = _load_run(sys.argv[2])
    if a is None or b is None:
        sys.exit(f"cannot read bench run files: {sys.argv[1]} / {sys.argv[2]}")
    r1 = _load_r1()
    p3a = _load_run(os.path.join(REPO, "bench_runs", "r3_runA.json"))
    p3b = _load_run(os.path.join(REPO, "bench_runs", "r3_runB.json"))

    def best3(n):
        vals = [r["queries"].get(n) for r in (p3a, p3b) if r]
        vals = [v for v in vals if v is not None]
        return min(vals) if vals else None

    def probe_mean(runs):
        ps = [x for r in runs if r
              for x in (r["machine"]["probe_sec_start"],
                        r["machine"]["probe_sec_end"])]
        return sum(ps) / len(ps) if ps else None

    probe_now = probe_mean([a, b])
    probe_r3 = probe_mean([p3a, p3b])
    adjusted = bool(probe_now and probe_r3)
    machine_factor = (probe_now / probe_r3) if adjusted else 1.0
    ratio_label = "vs r3 (adj)" if adjusted else "vs r3 (raw)" 

    names = sorted(set(a["queries"]) | set(r1))
    agree = abs(a["value"] - b["value"]) / max(a["value"], b["value"])

    print("# BENCH_COMPARE — per-round, per-query bench history")
    print()
    print("r1 is the driver's single-shot recording; r3 is the previous")
    print("fully-defended round (committed bench_runs/r3_run{A,B}.json);")
    print(f"'now' is this round: median of {a['reps']} interleaved sweeps,")
    print("two consecutive full runs on an otherwise-idle machine.")
    print()
    print(f"- run A total (sum of medians): **{a['value']} s** "
          f"(min-sum {a['total_min']} s); machine {a['machine']}")
    print(f"- run B total (sum of medians): **{b['value']} s** "
          f"(min-sum {b['total_min']} s); machine {b['machine']}")
    print(f"- A/B agreement: **{agree * 100:.1f}% apart** "
          f"({'PASS' if agree <= 0.20 else 'FAIL'} vs the 20% gate)")
    if adjusted:
        print(f"- fixed-probe machine factor vs r3: **{machine_factor:.2f}x**"
              f" (probe {probe_r3:.3f} s -> {probe_now:.3f} s; the probe "
              "code never changes, so this measures the sandbox, not the "
              "engine — 'vs r3' ratios below are divided by it)")
    else:
        print("- no probe evidence for the r3 baseline: 'vs r3' ratios "
              "below are RAW (not machine-normalized)")
    print()
    print("| query | r1 | r3 best | now A med | now B med | now min | "
          f"{ratio_label} | note |")
    print("|---|---|---|---|---|---|---|---|")
    flagged = []
    common_now = common_r3 = 0.0
    n_common = 0
    for n in names:
        va, vb = a["queries"].get(n), b["queries"].get(n)
        mins = [x for x in (a["queries_min"].get(n), b["queries_min"].get(n))
                if x is not None]
        m = min(mins) if mins else None
        base = best3(n)
        ratio = None
        if m is not None and base:
            ratio = round(m / base / machine_factor, 2)
            common_now += m
            common_r3 += base
            n_common += 1
        note = ""
        if ratio is not None and ratio > 2:
            note = KNOWN.get(n, "UNEXPLAINED")
            if note == "UNEXPLAINED":
                flagged.append(n)
        elif m is not None and base is None:
            note = "new this round"
        cells = [n] + [
            ("—" if v is None else f"{v:.2f}")
            for v in (r1.get(n), base, va, vb, m)
        ] + [("—" if ratio is None else f"{ratio}x"), note]
        print("| " + " | ".join(str(c) for c in cells) + " |")
    print()
    if common_r3:
        adj = common_now / common_r3 / machine_factor
        print(f"On the {n_common} "
              f"queries shared with r3: best-of-run sums "
              f"{common_r3:.1f} s (r3) vs {common_now:.1f} s (now) — "
              + (f"**{common_now / common_r3:.2f}x raw, {adj:.2f}x "
                 "probe-adjusted** (≤1.0 means at-or-faster than r3 per "
                 "machine-equivalent second)." if adjusted else
                 f"**{common_now / common_r3:.2f}x raw** (no probe "
                 "evidence to machine-normalize)."))
    if flagged:
        print(f"\n**UNEXPLAINED >2x-vs-r3 queries: {flagged}** — root-cause "
              "these before shipping the round.")
    else:
        print("\nNo query exceeds 2x its r3 best after machine "
              "normalization without a written root cause above.")


if __name__ == "__main__":
    main()
