"""Regenerate COVERAGE.md — the SURVEY.md §2 row -> registered-query
matrix, derived from registry tags. Usage: python tools/coverage.py"""

from __future__ import annotations

import os
import sys
from collections import defaultdict

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from music_database_spark.registry import load_all  # noqa: E402

ROWS = {
    "S1": "CREATE TABLE / fixed schemas",
    "S2": "DROP/re-create idempotency",
    "S3": "INSERT VALUES fixture load",
    "S4": "FK-check toggle -> validation",
    "S5": "Table scan / sources",
    "S6": "Result sink",
    "P1": "Projection+alias",
    "P2": "Conjunctive filter",
    "P3": "Boolean-flag equality",
    "P4": "IS NULL predicate",
    "P5": "Sargable year-range",
    "P6": "DISTINCT",
    "J1": "Inner equi-join dim x fact",
    "J2": "3-way join chain",
    "J3": "IN-subquery semi-join",
    "J4": "Anti-join",
    "J5": "Broadcast-hash join",
    "J6": "Sort-merge large x large",
    "J7": "Left outer join",
    "J8": "Range/interval join",
    "J9": "Theta/cross join",
    "A1": "GROUP BY + COUNT(col)",
    "A2": "Implicit-grouping rewrite",
    "A3": "HAVING over derived agg",
    "A4": "MAX",
    "A5": "AVG family",
    "A6": "COUNT(DISTINCT)/approx",
    "A7": "SUM/MIN",
    "A8": "ROLLUP/CUBE/pivot",
    "A9": "UDAF",
    "O1": "Multi-key sort",
    "O2": "LIMIT/top-k",
    "O3": "Ranking window",
    "O4": "Analytic window",
    "O5": "Frame specs",
    "U1": "INTERSECT",
    "U2": "UNION",
    "U3": "EXCEPT",
    "F1": "YEAR()",
    "F2": "Date/ts literals",
    "F3": "String functions",
    "F4": "Math functions",
    "F5": "Array functions",
    "F6": "JSON functions",
    "F7": "CASE/COALESCE",
    "T1": "Tumbling window",
    "T2": "Sliding window",
    "T3": "Session window",
    "T4": "Watermark",
    "T5": "Stateful stream ops",
    "T6": "Stream-static join",
    "D1": "Scalar UDF (Arrow)",
    "D2": "Grouped-map",
    "D3": "UDTF/explode",
    "X1": "Exact dedup",
    "X2": "Near-dup dedup",
    "X3": "Similarity search",
    "X4": "Text analysis",
    "X5": "Multimodal columns",
}


def main() -> int:
    reg = load_all()
    by_row = defaultdict(list)
    for name, spec in sorted(reg.items()):
        kind = "oracle" if spec.oracle else "rows-only"
        for t in spec.tags:
            if t in ROWS:
                by_row[t].append(f"`{name}` ({kind})")
    lines = [
        "# COVERAGE — SURVEY.md §2 rows -> registered driver queries",
        "",
        "Generated from registry tags (`python tools/coverage.py` regenerates).",
        f"Registry: **{len(reg)} queries**, "
        f"{sum(1 for s in reg.values() if s.oracle)} with DuckDB oracles.",
        "T4-T6 additionally have streaming smoke tests (tests/test_streaming.py);",
        "A2/O1 MySQL-semantics pins live in tests/test_music_fixtures.py.",
        "",
        "| §2 row | Operator | Registered queries |",
        "|---|---|---|",
    ]
    missing = []
    for rid, desc in ROWS.items():
        qs = by_row.get(rid)
        if not qs:
            missing.append(rid)
        lines.append(f"| {rid} | {desc} | {', '.join(qs) if qs else '—'} |")
    with open(os.path.join(REPO, "COVERAGE.md"), "w") as f:
        f.write("\n".join(lines) + "\n")
    print("rows with no tagged query:", missing or "none")
    return 1 if missing else 0


if __name__ == "__main__":
    raise SystemExit(main())
