#!/usr/bin/env python3
"""Enforce SCALE.md's declared per-face budgets against bench_metric.json.

The bench's own `breaches` list governs only the r1-comparable subset
(BASELINE.md policy); every post-r17 face instead declares a budget row
in SCALE.md (`| `q_x` | <= N s | ...`). Those declarations were
documentation until round 20, when a 29x budget breach (q_meta_refresh,
43.6 s against <= 1.5 s — a codegen fallback) sailed through a
breach_count=0 bench line because nothing machine-checked the tables.
This closes the loop: parse every budget row (later tables override
earlier — re-basing), compare against the bench's min-of-passes
per-face seconds, exit 1 on any breach.

Usage: tools/check_budgets.py [SCALE.md] [bench_metric.json]
"""
import json
import re
import sys


def main() -> int:
    scale_path = sys.argv[1] if len(sys.argv) > 1 else "SCALE.md"
    bench_path = sys.argv[2] if len(sys.argv) > 2 else "bench_metric.json"

    text = open(scale_path, encoding="utf-8").read()
    budgets = {}
    # face cell may carry annotations ("(re-based)"); budget cell is the
    # first "<= N s" after it. Document order: the LAST declaration wins.
    for m in re.finditer(
            r"\|\s*`(q_\w+)`[^|]*\|\s*≤\s*([0-9.]+)\s*s", text):
        budgets[m.group(1)] = float(m.group(2))

    bench = json.load(open(bench_path, encoding="utf-8"))
    times = bench["queries"]  # min-of-passes: the quiet-direction reading

    missing = sorted(q for q in budgets if q not in times)
    breaches = []
    warns = []
    for q, limit in sorted(budgets.items()):
        if q not in times:
            continue
        t = times[q]
        if t > limit:
            breaches.append((q, t, limit))
        elif t > 0.75 * limit:
            warns.append((q, t, limit))

    for q, t, limit in warns:
        print(f"warn   {q}: {t:.3f} s of <= {limit} s budget (>75%)")
    for q, t, limit in breaches:
        print(f"BREACH {q}: {t:.3f} s over its <= {limit} s budget")
    if missing:
        print(f"note: {len(missing)} budgeted faces absent from the bench: "
              + ", ".join(missing[:8]))
    print(f"{len(budgets)} budgets checked: {len(breaches)} breach, "
          f"{len(warns)} near-limit, "
          f"{len(budgets) - len(breaches) - len(warns) - len(missing)} clear")
    return 1 if breaches else 0


if __name__ == "__main__":
    sys.exit(main())
