"""Render BASELINE.md §3's two-column timing table from a bench.py JSON
line. Usage: python bench.py > run.json; python tools/baseline_table.py run.json
Prints the markdown table + total, ready to paste into BASELINE.md."""

from __future__ import annotations

import json
import sys


def main() -> int:
    with open(sys.argv[1]) as f:
        d = json.loads(f.read().strip().splitlines()[-1])
    qs = sorted(d["queries"].items())
    half = (len(qs) + 1) // 2
    left, right = qs[:half], qs[half:]
    print(f"Total: **{d['value']:.1f} s** over {len(qs)} bench queries (sf {d['sf']}).\n")
    print("| Query | sec | Query | sec |")
    print("|---|---|---|---|")
    for i in range(half):
        l_name, l_sec = left[i]
        if i < len(right):
            r_name, r_sec = right[i]
            print(f"| {l_name} | {l_sec:.2f} | {r_name} | {r_sec:.2f} |")
        else:
            print(f"| {l_name} | {l_sec:.2f} | | |")
    return 0


if __name__ == "__main__":
    sys.exit(main())
