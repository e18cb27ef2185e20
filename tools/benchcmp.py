"""Compare a bench run against BASELINE.md §3's per-query table.

Usage: python tools/benchcmp.py [BENCH_FULL.json]

Prints geomean ratio, the worst/best movers, and queries missing a
baseline entry (new this round — add them to BASELINE.md §3 from a
quiet-machine run). The per-query self-ratchet is the operative bar
(BASELINE.md §2): each query within 2x of its first recorded number.
"""

from __future__ import annotations

import json
import math
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load_baseline() -> dict[str, float]:
    base: dict[str, float] = {}
    for line in open(os.path.join(REPO, "BASELINE.md")):
        if not line.startswith("|"):
            continue
        cells = [c.strip() for c in line.strip().strip("|").split("|")]
        for name, sec in zip(cells[::2], cells[1::2]):
            if re.fullmatch(r"[A-Za-z_]\w*", name or "") and re.fullmatch(
                r"[0-9.]+", sec or ""
            ):
                base[name] = float(sec)
    return base


def main() -> int:
    path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, "BENCH_FULL.json")
    bench = json.load(open(path))["queries"]
    base = load_baseline()
    ratios = {q: t / base[q] for q, t in bench.items() if base.get(q, 0) > 0 and t >= 0}
    new = sorted(q for q in bench if q not in base)
    g = math.exp(sum(math.log(r) for r in ratios.values()) / len(ratios))
    print(f"geomean ratio vs baseline: {g:.3f} over {len(ratios)} queries")
    print(f"no baseline entry ({len(new)}): {', '.join(new) or '-'}")
    over = [(q, r) for q, r in ratios.items() if r > 2.0]
    print(f"over the 2x ratchet: {len(over)}")
    for q, r in sorted(ratios.items(), key=lambda kv: -kv[1])[:10]:
        print(f"  {r:5.2f}x  {q:32s} {base[q]:6.2f} -> {bench[q]:6.2f}s")
    print("biggest improvements:")
    for q, r in sorted(ratios.items(), key=lambda kv: kv[1])[:5]:
        print(f"  {r:5.2f}x  {q:32s} {base[q]:6.2f} -> {bench[q]:6.2f}s")
    # Cold first-build vs warm median (recorded since round 9): a big
    # ratio on a non-trivial query is the inferred-filter bug class —
    # plan-level double compute hidden by the logical-plan cache.
    colds = json.load(open(path)).get("cold_queries", {})
    cr = {
        q: colds[q] / bench[q]
        for q in colds
        if bench.get(q, 0) > 0.2 and colds[q] / bench[q] >= 3
    }
    print(f"cold first-build >=3x warm median ({len(cr)}):")
    for q, r in sorted(cr.items(), key=lambda kv: -kv[1])[:10]:
        print(f"  {r:5.1f}x  {q:32s} cold {colds[q]:6.2f}s vs warm {bench[q]:6.2f}s")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
